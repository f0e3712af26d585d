package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.etl.{EventGrammar, ForwardLabels, Indicators, MarketData}
import graft.ml.{Bootstrap, Scalers}
import graft.ops.Cols

/** Research/validation surface (SURVEY §2.9): scalers (M1), bootstrap CIs
  * (M7, portable-LCG resampling — fully oracle-checked), state profiles
  * (A2-A6 + J9), rolling-window stability with least-squares trend slopes
  * (M8, slope = covar_pop/var_pop), and scorecard grading (M10).
  */
object ResearchQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // M1 per-key robust scaler (median/IQR) with clip — J4 params join
    Q("q_scaler_robust", Some("""
      WITH p AS (
        SELECT event_type, quantile_cont(value, 0.5) AS center,
               quantile_cont(value, 0.75) - quantile_cont(value, 0.25)
                 AS spread
        FROM events GROUP BY 1)
      SELECT e.event_id,
             round(greatest(least((e.value - coalesce(p.center, 0.0))
               / (CASE WHEN abs(coalesce(p.spread, 1.0)) > 0.000000000001
                  THEN p.spread ELSE 1.0 END), 8.0), -8.0), 9) AS scaled
      FROM events e LEFT JOIN p USING (event_type)
      ORDER BY e.event_id""")) { (s, dir) =>
      val ev = t(s, dir, "events")
      val params = Scalers.robustParamsByKey(ev, "event_type", "value")
      Scalers.transform(ev, params, "event_type", "value", "scaled")
        .select(col("event_id"), round(col("scaled"), 9).as("scaled"))
        .orderBy("event_id")
    },

    // M1 global standard scaler (mean/std ddof=0)
    Q("q_scaler_standard", Some("""
      WITH p AS (SELECT avg(value) AS c, stddev_pop(value) AS s FROM events)
      SELECT e.event_id,
             round(greatest(least((e.value - p.c) / p.s, 8.0), -8.0), 6)
               AS zscore
      FROM events e CROSS JOIN p ORDER BY e.event_id""")) { (s, dir) =>
      val ev = t(s, dir, "events")
      val p = ev.agg(avg("value").as("c"), stddev_pop(col("value")).as("s"))
      ev.crossJoin(broadcast(p))
        .select(col("event_id"),
          round(Cols.clip((col("value") - col("c")) / col("s"),
            -Scalers.ZClip, Scalers.ZClip), 6).as("zscore"))
        .orderBy("event_id")
    },

    // M7 bootstrap mean CI per event_type (portable LCG resampler)
    Q("q_bootstrap_ci", Some(s"""
      WITH bv AS (SELECT event_type, value AS v FROM events),
      ${Bootstrap.sql("event_type", nBoot = 200)}
      SELECT * FROM boot ORDER BY event_type""")) { (s, dir) =>
      Bootstrap.meanCi(t(s, dir, "events"), "event_type", "value",
          nBoot = 200)
        .orderBy("event_type")
    },

    // M7 full battery: moving-block bootstrap (block_length 10) with
    // mean/median/hit-rate CIs per flow state over fwd_ret_10
    // (ref validation/bootstrap.py:98-125 block resampler, 232-292 stats)
    Q("q_bootstrap_block", Some(s"""
      WITH RECURSIVE ${MarketData.barsSql},
      ${Indicators.twiggsSql},
      ${EventGrammar.grammarSql},
      ${ForwardLabels.sql},
      bv AS (
        SELECT g.flow_state_code AS state, g.ticker, g.bar_ts, g.bar_id,
               f.fwd_ret_10 AS v
        FROM grammar g JOIN fwd f USING (ticker, bar_ts, bar_id)
        WHERE f.fwd_ret_10 IS NOT NULL),
      ${Bootstrap.sqlStats("state", "ticker, bar_ts, bar_id", nBoot = 200,
        mode = "block", blockLength = 10)}
      SELECT * FROM bstats ORDER BY state""")) { (s, dir) =>
      val gram = Stage.slimGrammar(s, dir)
      val fwd = Stage.slimFwd(s, dir)
      val keys = Seq("ticker", "bar_ts", "bar_id")
      val bv = gram.select((keys :+ "flow_state_code").map(col): _*)
        .join(fwd.select((keys :+ "fwd_ret_10").map(col): _*), keys)
        .filter(col("fwd_ret_10").isNotNull)
        .withColumnRenamed("flow_state_code", "state")
      Bootstrap.statsCi(bv, "state", "fwd_ret_10", keys, nBoot = 200,
          mode = "block", blockLength = 10)
        .orderBy("state")
    },

    // M7 pairwise: state-vs-state mean-difference CIs with sign
    // consistency (ref validation/bootstrap.py:316-345)
    Q("q_bootstrap_pairwise", Some(s"""
      WITH RECURSIVE ${MarketData.barsSql},
      ${Indicators.twiggsSql},
      ${EventGrammar.grammarSql},
      ${ForwardLabels.sql},
      bv AS (
        SELECT g.flow_state_code AS state, f.fwd_ret_10 AS v
        FROM grammar g JOIN fwd f USING (ticker, bar_ts, bar_id)
        WHERE f.fwd_ret_10 IS NOT NULL),
      ${Bootstrap.sqlPairwise("state", nBoot = 200)}
      SELECT * FROM bpair ORDER BY state_a, state_b""")) { (s, dir) =>
      val gram = Stage.slimGrammar(s, dir)
      val fwd = Stage.slimFwd(s, dir)
      val keys = Seq("ticker", "bar_ts", "bar_id")
      val bv = gram.select((keys :+ "flow_state_code").map(col): _*)
        .join(fwd.select((keys :+ "fwd_ret_10").map(col): _*), keys)
        .filter(col("fwd_ret_10").isNotNull)
        .withColumnRenamed("flow_state_code", "state")
      Bootstrap.pairwiseDiffCi(bv, "state", "fwd_ret_10", nBoot = 200)
        .orderBy("state_a", "state_b")
    },

    // Profiles: forward-outcome stats per flow state (A2-A6 + J9)
    Q("q_profiles", Some(s"""
      WITH RECURSIVE ${MarketData.barsSql},
      ${Indicators.twiggsSql},
      ${EventGrammar.grammarSql},
      ${ForwardLabels.sql}
      SELECT g.flow_state_code,
             count(*) AS n_rows,
             count(f.fwd_ret_10) AS n_fwd,
             round(avg(f.fwd_ret_10), 6) AS mean_fwd,
             round(median(f.fwd_ret_10), 6) AS med_fwd,
             round(quantile_cont(f.fwd_ret_10, 0.1), 6) AS p10_fwd,
             round(quantile_cont(f.fwd_ret_10, 0.9), 6) AS p90_fwd,
             CAST(count(CASE WHEN f.fwd_ret_10 > 0 THEN 1 END) AS DOUBLE)
               / count(f.fwd_ret_10) AS hit_rate
      FROM grammar g JOIN fwd f USING (ticker, bar_ts, bar_id)
      GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val gram = Stage.slimGrammar(s, dir)
      val fwd = Stage.slimFwd(s, dir)
      val keys = Seq("ticker", "bar_ts", "bar_id")
      gram.select((keys :+ "flow_state_code").map(col): _*)
        .join(fwd.select((keys :+ "fwd_ret_10").map(col): _*), keys)
        .groupBy("flow_state_code")
        .agg(count(lit(1)).as("n_rows"),
          count(col("fwd_ret_10")).as("n_fwd"),
          round(avg(col("fwd_ret_10")), 6).as("mean_fwd"),
          round(median(col("fwd_ret_10")), 6).as("med_fwd"),
          round(percentile(col("fwd_ret_10"), lit(0.1)), 6).as("p10_fwd"),
          round(percentile(col("fwd_ret_10"), lit(0.9)), 6).as("p90_fwd"),
          (Cols.countIf(col("fwd_ret_10") > 0).cast("double")
            / count(col("fwd_ret_10"))).as("hit_rate"))
        .orderBy("flow_state_code")
    },

    // M8 stability: daily windows → per-(window,state) share → per-state
    // least-squares trend slope via covar_pop/var_pop
    Q("q_stability", Some(s"""
      WITH RECURSIVE ${MarketData.barsSql},
      ${Indicators.twiggsSql},
      ${EventGrammar.grammarSql},
      wins AS (
        SELECT CAST(date_diff('day', DATE '2024-01-01',
                 CAST(to_timestamp(bar_ts / 1000000) AS DATE)) AS INT)
                 AS win,
               flow_state_code AS state
        FROM grammar),
      ws AS (
        SELECT win, state, count(*) AS n FROM wins GROUP BY 1, 2),
      shares AS (
        SELECT win, state, n,
               CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY win) AS share
        FROM ws)
      SELECT state, count(*) AS n_windows,
             CAST(SUM(n) AS BIGINT) AS n_total,
             round(avg(share), 9) AS mean_share,
             round(CASE WHEN var_pop(win) > 0.000000000001
               THEN covar_pop(win, share) / var_pop(win) END, 9)
               AS share_slope
      FROM shares GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val gram = Stage.slimGrammar(s, dir)
      val wins = gram.select(
        datediff(to_date(timestamp_seconds(col("bar_ts") / 1000000)),
          lit("2024-01-01").cast("date")).as("win"),
        col("flow_state_code").as("state"))
      val ws = wins.groupBy("win", "state").agg(count(lit(1)).as("n"))
      val shares = ws.withColumn("share",
        col("n").cast("double") / sum("n").over(Window.partitionBy("win")))
      shares.groupBy("state")
        .agg(count(lit(1)).as("n_windows"), sum("n").as("n_total"),
          round(avg("share"), 9).as("mean_share"),
          round(when(var_pop(col("win")) > Cols.Eps,
            covar_pop(col("win"), col("share")) / var_pop(col("win"))), 9)
            .as("share_slope"))
        .orderBy("state")
    },

    // M8 transition-matrix stability: overlapping day windows (length 7,
    // step 2) → per-window transition matrix vs the global matrix →
    // Frobenius distance over the union of (prev,next) keys
    // (ref validation/stability.py:72-111 transition matrices + Frobenius,
    // 278-300 per-window loop)
    Q("q_stability_tm", Some(s"""
      WITH RECURSIVE ${MarketData.barsSql},
      ${Indicators.twiggsSql},
      ${EventGrammar.grammarSql},
      sbase AS (
        SELECT ticker, bar_ts, bar_id, flow_state_code AS state,
               CAST(date_diff('day', DATE '2024-01-01',
                 CAST(to_timestamp(bar_ts / 1000000) AS DATE)) AS INT)
                 AS day
        FROM grammar),
      sbounds AS (SELECT min(day) AS min_day, max(day) AS max_day
                  FROM sbase),
      swin AS (
        SELECT CAST(unnest(range(0, (max_day - min_day) // 2 + 1)) AS INT)
                 AS window_seq,
               min_day
        FROM sbounds),
      swin2 AS (
        SELECT window_seq,
               min_day + window_seq * 2 AS start_day,
               min_day + window_seq * 2 + 6 AS end_day
        FROM swin),
      wrows AS (
        SELECT w.window_seq, w.start_day, w.end_day,
               b.ticker, b.bar_ts, b.bar_id, b.state
        FROM swin2 w JOIN sbase b ON b.day BETWEEN w.start_day
          AND w.end_day),
      ltr AS (
        SELECT * FROM (
          SELECT window_seq,
                 lag(state) OVER (PARTITION BY window_seq, ticker
                   ORDER BY bar_ts, bar_id) AS sp,
                 state AS sc
          FROM wrows) WHERE sp IS NOT NULL),
      lmat AS (
        SELECT window_seq, sp, sc, count(*) AS cnt
        FROM ltr GROUP BY 1, 2, 3),
      lnorm AS (
        SELECT *, CAST(cnt AS DOUBLE)
          / sum(cnt) OVER (PARTITION BY window_seq, sp) AS lprob
        FROM lmat),
      lcnt AS (
        SELECT window_seq, CAST(sum(cnt) AS BIGINT) AS transition_count
        FROM lmat GROUP BY 1),
      gtr AS (
        SELECT * FROM (
          SELECT lag(state) OVER (PARTITION BY ticker
                   ORDER BY bar_ts, bar_id) AS sp,
                 state AS sc
          FROM sbase) WHERE sp IS NOT NULL),
      gmat AS (
        SELECT sp, sc, CAST(count(*) AS DOUBLE)
          / sum(count(*)) OVER (PARTITION BY sp) AS gprob
        FROM gtr GROUP BY 1, 2),
      wkeys AS (SELECT DISTINCT window_seq, start_day, end_day FROM wrows),
      gw AS (
        SELECT w.window_seq, g.sp, g.sc, g.gprob
        FROM wkeys w CROSS JOIN gmat g),
      fj AS (
        SELECT coalesce(gw.window_seq, l.window_seq) AS window_seq,
               coalesce(gw.gprob, 0.0) AS g, coalesce(l.lprob, 0.0) AS l
        FROM gw FULL JOIN lnorm l
          ON gw.window_seq = l.window_seq AND gw.sp = l.sp
            AND gw.sc = l.sc),
      sfrob AS (
        SELECT window_seq,
               round(sqrt(sum((g - l) * (g - l))), 9)
                 AS frobenius_distance
        FROM fj GROUP BY 1)
      SELECT w.window_seq, w.start_day, w.end_day,
             coalesce(c.transition_count, 0) AS transition_count,
             f.frobenius_distance
      FROM wkeys w
      LEFT JOIN lcnt c USING (window_seq)
      JOIN sfrob f USING (window_seq)
      ORDER BY w.window_seq""")) { (s, dir) =>
      val gram = Stage.slimGrammar(s, dir)
      val base = gram.select(col("ticker"), col("bar_ts"), col("bar_id"),
        col("flow_state_code").as("state"),
        datediff(to_date(timestamp_seconds(col("bar_ts") / 1000000)),
          lit("2024-01-01").cast("date")).as("day"))
      val windows = base
        .agg(min("day").as("min_day"), max("day").as("max_day"))
        .select(explode(sequence(lit(0),
          ((col("max_day") - col("min_day")) / 2).cast("int")))
          .as("window_seq"), col("min_day"))
        .select(col("window_seq"),
          (col("min_day") + col("window_seq") * 2).as("start_day"))
        .withColumn("end_day", col("start_day") + 6)
      val wrows = base.join(broadcast(windows),
        col("day").between(col("start_day"), col("end_day")))
      val wW = Window.partitionBy("window_seq", "ticker")
        .orderBy("bar_ts", "bar_id")
      val lmat = wrows
        .select(col("window_seq"), lag("state", 1).over(wW).as("sp"),
          col("state").as("sc"))
        .filter(col("sp").isNotNull)
        .groupBy("window_seq", "sp", "sc").agg(count(lit(1)).as("cnt"))
      val lnorm = lmat.withColumn("lprob", col("cnt").cast("double")
        / sum("cnt").over(Window.partitionBy("window_seq", "sp")))
      val lcnt = lmat.groupBy("window_seq")
        .agg(sum("cnt").as("transition_count"))
      val gW = Window.partitionBy("ticker").orderBy("bar_ts", "bar_id")
      val gmat = base
        .select(lag("state", 1).over(gW).as("sp"), col("state").as("sc"))
        .filter(col("sp").isNotNull)
        .groupBy("sp", "sc").agg(count(lit(1)).as("gcnt"))
        .withColumn("gprob", col("gcnt").cast("double")
          / sum("gcnt").over(Window.partitionBy("sp")))
        .select("sp", "sc", "gprob")
      val wkeys = wrows.select("window_seq", "start_day", "end_day")
        .distinct()
      val gw = wkeys.select("window_seq").crossJoin(broadcast(gmat))
      val fj = gw.join(lnorm.select("window_seq", "sp", "sc", "lprob"),
          Seq("window_seq", "sp", "sc"), "full_outer")
        .select(col("window_seq"),
          coalesce(col("gprob"), lit(0.0)).as("g"),
          coalesce(col("lprob"), lit(0.0)).as("l"))
      val frob = fj.groupBy("window_seq")
        .agg(round(sqrt(sum((col("g") - col("l"))
          * (col("g") - col("l")))), 9).as("frobenius_distance"))
      wkeys
        .join(lcnt, Seq("window_seq"), "left")
        .join(frob, Seq("window_seq"))
        .select(col("window_seq"), col("start_day"), col("end_day"),
          coalesce(col("transition_count"), lit(0L))
            .as("transition_count"),
          col("frobenius_distance"))
        .orderBy("window_seq")
    },

    // M10 scorecard: sample/stability/consistency components → weighted
    // confidence 0-100 → A/B/C grade
    Q("q_scorecard", Some(s"""
      WITH RECURSIVE ${MarketData.barsSql},
      ${Indicators.twiggsSql},
      ${EventGrammar.grammarSql},
      wins AS (
        SELECT CAST(date_diff('day', DATE '2024-01-01',
                 CAST(to_timestamp(bar_ts / 1000000) AS DATE)) AS INT)
                 AS win,
               flow_state_code AS state
        FROM grammar),
      ws AS (SELECT win, state, count(*) AS n FROM wins GROUP BY 1, 2),
      shares AS (
        SELECT win, state, n,
               CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY win) AS share
        FROM ws),
      stab AS (
        SELECT state, CAST(SUM(n) AS BIGINT) AS n_total,
               avg(share) AS mean_share,
               CASE WHEN var_pop(win) > 0.000000000001
                 THEN covar_pop(win, share) / var_pop(win) ELSE 0.0 END
                 AS slope
        FROM shares GROUP BY 1),
      scored AS (
        SELECT state, n_total,
               40 * least(ln(1 + n_total) / ln(1 + 5000.0), 1.0)
                 + 30 * (1 - least(abs(slope) * 50, 1.0))
                 + 30 * least(mean_share * 5, 1.0) AS confidence
        FROM stab)
      SELECT state, n_total, round(confidence, 6) AS confidence,
             CASE WHEN confidence >= 70 THEN 'A'
                  WHEN confidence >= 40 THEN 'B' ELSE 'C' END AS grade
      FROM scored ORDER BY state""")) { (s, dir) =>
      val gram = Stage.slimGrammar(s, dir)
      val wins = gram.select(
        datediff(to_date(timestamp_seconds(col("bar_ts") / 1000000)),
          lit("2024-01-01").cast("date")).as("win"),
        col("flow_state_code").as("state"))
      val ws = wins.groupBy("win", "state").agg(count(lit(1)).as("n"))
      val shares = ws.withColumn("share",
        col("n").cast("double") / sum("n").over(Window.partitionBy("win")))
      val stab = shares.groupBy("state")
        .agg(sum("n").as("n_total"), avg("share").as("mean_share"),
          coalesce(when(var_pop(col("win")) > Cols.Eps,
            covar_pop(col("win"), col("share")) / var_pop(col("win"))),
            lit(0.0)).as("slope"))
      val confidence =
        lit(40) * least(log(lit(1) + col("n_total")) / math.log(1 + 5000.0),
          lit(1.0)) +
        lit(30) * (lit(1) - least(abs(col("slope")) * 50, lit(1.0))) +
        lit(30) * least(col("mean_share") * 5, lit(1.0))
      stab.withColumn("confidence_raw", confidence)
        .select(col("state"), col("n_total"),
          round(col("confidence_raw"), 6).as("confidence"),
          when(col("confidence_raw") >= 70, "A")
            .when(col("confidence_raw") >= 40, "B").otherwise("C")
            .as("grade"))
        .orderBy("state")
    }
  )
}
