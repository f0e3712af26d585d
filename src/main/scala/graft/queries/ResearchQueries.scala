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

  /** cluster_hardening thresholds/penalties/weights, Settings-resolved
    * (ref configs/settings.yaml:101-126) — interpolated into BOTH the
    * engine column program and the oracle SQL per build, so an
    * override can never desynchronize the two. */
  private def H = graft.Settings.clusterHardening

  private val BvKeys = Seq("ticker", "bar_ts", "bar_id")

  /** (state, keys, fwd_ret_10) non-null forward-outcome frame shared by
    * the bootstrap/scorecard/hardening family. */
  private[queries] def bvFrame(s: SparkSession, dir: String): DataFrame =
    Stage.slimGrammar(s, dir)
      .select((BvKeys :+ "flow_state_code").map(col): _*)
      .join(Stage.slimFwd(s, dir)
        .select((BvKeys :+ "fwd_ret_10").map(col): _*), BvKeys)
      .filter(col("fwd_ret_10").isNotNull)
      .withColumnRenamed("flow_state_code", "state")

  /** iid bootstrap stats (nBoot 200) — tiny per-state table, cached and
    * shared by q_scorecard_full / q_cluster_hardening_full. */
  private[queries] def bootStats(s: SparkSession, dir: String): DataFrame =
    Stage.cached(s, dir, "boot_stats") {
      Bootstrap.statsCi(bvFrame(s, dir), "state", "fwd_ret_10", BvKeys,
        nBoot = 200)
    }

  /** Pairwise mean-diff CIs (nBoot 200) — shared likewise. */
  private[queries] def bootPair(s: SparkSession, dir: String): DataFrame =
    Stage.cached(s, dir, "boot_pair") {
      Bootstrap.pairwiseDiffCi(bvFrame(s, dir), "state", "fwd_ret_10",
        nBoot = 200)
    }

  /** Per-(day-window, state) counts and forward-return means — the tiny
    * (#windows × #states) table every stability/scorecard/hardening
    * consumer re-derives; built once per run. */
  private[queries] def dayWindows(s: SparkSession, dir: String): DataFrame =
    Stage.cached(s, dir, "day_windows") {
      Stage.slimGrammar(s, dir)
        .select((BvKeys :+ "flow_state_code").map(col): _*)
        .join(Stage.slimFwd(s, dir)
          .select((BvKeys :+ "fwd_ret_10").map(col): _*), BvKeys)
        .select(
          datediff(to_date(timestamp_seconds(col("bar_ts") / 1000000)),
            lit("2024-01-01").cast("date")).as("win"),
          col("flow_state_code").as("state"), col("fwd_ret_10").as("v"))
        .groupBy("win", "state")
        .agg(count(lit(1)).as("wn"), avg("v").as("mret"))
    }

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
      Bootstrap.statsCi(ResearchQueries.bvFrame(s, dir), "state",
          "fwd_ret_10", Seq("ticker", "bar_ts", "bar_id"), nBoot = 200,
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
      ResearchQueries.bootPair(s, dir).orderBy("state_a", "state_b")
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

    // M10 full-fidelity scorecard (ref validation/scorecards.py:28-232):
    // bootstrap mean/hit CIs + CI-WIDTH component + pairwise-separation
    // share + rolling-stability sign consistency & CVs → weighted
    // confidence (sample .2, ci_width .25, sign .2, stability .25,
    // separation .1) + notes, sorted by confidence desc
    Q("q_scorecard_full", Some(s"""
      WITH RECURSIVE ${MarketData.barsSql},
      ${Indicators.twiggsSql},
      ${EventGrammar.grammarSql},
      ${ForwardLabels.sql},
      bv AS (
        SELECT g.flow_state_code AS state, g.ticker, g.bar_ts, g.bar_id,
               f.fwd_ret_10 AS v
        FROM grammar g JOIN fwd f USING (ticker, bar_ts, bar_id)
        WHERE f.fwd_ret_10 IS NOT NULL),
      ${Bootstrap.sqlStats("state", "ticker, bar_ts, bar_id", nBoot = 200)},
      ${Bootstrap.sqlPairwise("state", nBoot = 200)},
      psh AS (
        SELECT state,
               avg(CASE WHEN sig THEN 1.0 ELSE 0.0 END) AS separation_share
        FROM (SELECT state_a AS state, diff_sign_consistent AS sig
              FROM bpair
              UNION ALL
              SELECT state_b AS state, diff_sign_consistent AS sig
              FROM bpair)
        GROUP BY 1),
      swins AS (
        SELECT CAST(date_diff('day', DATE '2024-01-01',
                 CAST(to_timestamp(g.bar_ts / 1000000) AS DATE)) AS INT)
                 AS win,
               g.flow_state_code AS state, f.fwd_ret_10 AS v
        FROM grammar g JOIN fwd f USING (ticker, bar_ts, bar_id)),
      sws AS (SELECT win, state, count(*) AS wn, avg(v) AS mret
              FROM swins GROUP BY 1, 2),
      sshare AS (
        SELECT *, CAST(wn AS DOUBLE) / sum(wn) OVER (PARTITION BY win)
          AS share
        FROM sws),
      sstab AS (
        SELECT state,
               avg(CASE WHEN mret > 0 THEN 1.0
                        WHEN mret IS NOT NULL THEN 0.0 END)
                 AS sign_stability,
               stddev_pop(mret) / (abs(avg(mret)) + 1e-12) AS ret_mean_cv,
               avg(share) AS state_share_mean,
               stddev_pop(share) / (abs(avg(share)) + 1e-12) AS share_cv
        FROM sshare GROUP BY 1),
      nref AS (SELECT greatest(1.0, floor(quantile_cont(n, 0.9)))
                 AS n_ref FROM bstats),
      sc AS (
        SELECT b.state, b.n AS n_rows, b.mean_obs AS fwd_ret_10_mean,
               b.mean_ci_lo AS fwd_ret_10_ci_lo,
               b.mean_ci_hi AS fwd_ret_10_ci_hi,
               b.mean_ci_hi - b.mean_ci_lo AS ci_width,
               b.hit_rate_obs AS hit_rate,
               (b.mean_ci_lo > 0 OR b.mean_ci_hi < 0)
                 AS sign_confidence_flag,
               s.sign_stability, s.ret_mean_cv, s.state_share_mean,
               s.share_cv,
               coalesce(p.separation_share, 0.0) AS separation_share,
               r.n_ref
        FROM bstats b
        LEFT JOIN sstab s USING (state)
        LEFT JOIN psh p USING (state)
        CROSS JOIN nref r),
      scored AS (
        SELECT *,
               least(1.0, ln(1 + n_rows) / ln(1 + n_ref))
                 AS sample_component,
               greatest(0.0, 1 - least(ci_width, 0.2) / 0.2)
                 AS ci_component,
               CASE WHEN sign_confidence_flag THEN 1.0 ELSE 0.0 END
                 AS sign_component,
               0.5 * coalesce(greatest(least(sign_stability, 1.0), 0.0),
                 0.0)
                 + 0.5 * coalesce(greatest(0.0,
                     1 - least(ret_mean_cv, 3.0) / 3.0), 0.0)
                 AS stability_component,
               greatest(least(separation_share, 1.0), 0.0)
                 AS separation_component
        FROM sc),
      noted AS (
        SELECT *, concat_ws(',',
                 CASE WHEN n_rows < 500 THEN 'low_sample' END,
                 CASE WHEN ci_width > 0.04 THEN 'wide_ci' END,
                 CASE WHEN NOT sign_confidence_flag
                   THEN 'sign_uncertain' END,
                 CASE WHEN ret_mean_cv > 1.5 THEN 'unstable_returns' END)
                 AS notes_raw
        FROM scored)
      SELECT state, n_rows, fwd_ret_10_mean, fwd_ret_10_ci_lo,
             fwd_ret_10_ci_hi, round(ci_width, 9) AS ci_width, hit_rate,
             sign_confidence_flag,
             round(sign_stability, 9) AS stability_sign_consistency,
             round(ret_mean_cv, 9) AS ret_mean_cv,
             round(state_share_mean, 9) AS state_share_mean,
             round(share_cv, 9) AS state_share_cv,
             round(separation_share, 9) AS pairwise_diff_significant_share,
             round(100 * (0.2 * sample_component + 0.25 * ci_component
               + 0.2 * sign_component + 0.25 * stability_component
               + 0.1 * separation_component), 3) AS confidence_score,
             CASE WHEN length(notes_raw) = 0 THEN 'ok' ELSE notes_raw END
               AS notes
      FROM noted ORDER BY confidence_score DESC, state""")) { (s, dir) =>
      val gram = Stage.slimGrammar(s, dir)
      val fwd = Stage.slimFwd(s, dir)
      val keys = Seq("ticker", "bar_ts", "bar_id")
      val joined = gram.select((keys :+ "flow_state_code").map(col): _*)
        .join(fwd.select((keys :+ "fwd_ret_10").map(col): _*), keys)
      val bv = joined.filter(col("fwd_ret_10").isNotNull)
        .withColumnRenamed("flow_state_code", "state")
      val stats = ResearchQueries.bootStats(s, dir)
      val pair = ResearchQueries.bootPair(s, dir)
      val psh = pair.select(col("state_a").as("state"),
          col("diff_sign_consistent").as("sig"))
        .unionByName(pair.select(col("state_b").as("state"),
          col("diff_sign_consistent").as("sig")))
        .groupBy("state")
        .agg(avg(when(col("sig"), 1.0).otherwise(0.0))
          .as("separation_share"))
      val sws = ResearchQueries.dayWindows(s, dir)
      val sshare = sws.withColumn("share",
        col("wn").cast("double") / sum("wn").over(Window.partitionBy("win")))
      val sstab = sshare.groupBy("state").agg(
        avg(when(col("mret") > 0, 1.0)
          .when(col("mret").isNotNull, 0.0)).as("sign_stability"),
        (stddev_pop(col("mret")) / (abs(avg(col("mret"))) + 1e-12))
          .as("ret_mean_cv"),
        avg("share").as("state_share_mean"),
        (stddev_pop(col("share")) / (abs(avg(col("share"))) + 1e-12))
          .as("share_cv"))
      val nref = stats.agg(
        greatest(lit(1.0), floor(percentile(col("n"), lit(0.9))))
          .as("n_ref"))
      val sc = stats.select(col("state"), col("n").as("n_rows"),
          col("mean_obs"), col("mean_ci_lo"), col("mean_ci_hi"),
          (col("mean_ci_hi") - col("mean_ci_lo")).as("ci_width"),
          col("hit_rate_obs"),
          (col("mean_ci_lo") > 0 || col("mean_ci_hi") < 0)
            .as("sign_confidence_flag"))
        .join(sstab, Seq("state"), "left")
        .join(psh.withColumnRenamed("separation_share", "sep0"),
          Seq("state"), "left")
        .withColumn("separation_share", coalesce(col("sep0"), lit(0.0)))
        .crossJoin(broadcast(nref))
      val clip01 = (c: org.apache.spark.sql.Column) =>
        greatest(least(c, lit(1.0)), lit(0.0))
      val scored = sc
        .withColumn("sample_component",
          least(lit(1.0), log(lit(1) + col("n_rows"))
            / log(lit(1) + col("n_ref"))))
        .withColumn("ci_component",
          greatest(lit(0.0),
            lit(1) - least(col("ci_width"), lit(0.2)) / 0.2))
        .withColumn("sign_component",
          when(col("sign_confidence_flag"), 1.0).otherwise(0.0))
        .withColumn("stability_component",
          lit(0.5) * coalesce(clip01(col("sign_stability")), lit(0.0))
            + lit(0.5) * coalesce(greatest(lit(0.0),
                lit(1) - least(col("ret_mean_cv"), lit(3.0)) / 3.0),
                lit(0.0)))
        .withColumn("separation_component", clip01(col("separation_share")))
        .withColumn("notes_raw", concat_ws(",",
          when(col("n_rows") < 500, "low_sample"),
          when(col("ci_width") > 0.04, "wide_ci"),
          when(!col("sign_confidence_flag"), "sign_uncertain"),
          when(col("ret_mean_cv") > 1.5, "unstable_returns")))
      scored.select(col("state"), col("n_rows"),
          col("mean_obs").as("fwd_ret_10_mean"),
          col("mean_ci_lo").as("fwd_ret_10_ci_lo"),
          col("mean_ci_hi").as("fwd_ret_10_ci_hi"),
          round(col("ci_width"), 9).as("ci_width"),
          col("hit_rate_obs").as("hit_rate"),
          col("sign_confidence_flag"),
          round(col("sign_stability"), 9)
            .as("stability_sign_consistency"),
          round(col("ret_mean_cv"), 9).as("ret_mean_cv"),
          round(col("state_share_mean"), 9).as("state_share_mean"),
          round(col("share_cv"), 9).as("state_share_cv"),
          round(col("separation_share"), 9)
            .as("pairwise_diff_significant_share"),
          round(lit(100) * (lit(0.2) * col("sample_component")
            + lit(0.25) * col("ci_component")
            + lit(0.2) * col("sign_component")
            + lit(0.25) * col("stability_component")
            + lit(0.1) * col("separation_component")), 3)
            .as("confidence_score"),
          when(length(col("notes_raw")) === 0, "ok")
            .otherwise(col("notes_raw")).as("notes"))
        .orderBy(col("confidence_score").desc, col("state"))
    },

    // M11 full hardening policy (ref validation/cluster_hardening.py:
    // 199-439 + cluster_qa.py:199-260, thresholds settings.yaml
    // cluster_hardening): QA labels (LOW_N, LOW_OCCUPANCY,
    // WINDOW_DRIFT_HIGH, MEAN_NEAR_ZERO_CV_INFLATION, WIDE_CI,
    // SIGN_FLIP_ACROSS_WINDOWS, TRANSITIONS_TOO_SPARSE,
    // LIKELY_OUTLIER_WINDOW), 7-component weighted tradability score with
    // per-label penalties, hard-fail rules, ALLOW/WATCH/BLOCK + reasons,
    // direction hints and dense ranks. Transitions counted on
    // state-CHANGE events (the event-study transition table).
    // Cluster-QA flag battery (ref validation/cluster_qa.py:161-265
    // `analyze_cluster_validation_run`): the SOFT-threshold twin of the
    // hardening classifier — per-state root-cause issue labels under
    // the `cluster_qa:` settings block (ret_cv 5.0 / min_n 200 / share
    // 0.03 / sign 0.55 / ci-quantile 0.8 / eps 1e-12, plus the two
    // derived thresholds the module computes: sparse transitions =
    // max(10, min_n//5), near-zero mean = max(0.001, 1000*eps)). Reads
    // the SAME shared stages as the hardening query; thresholds
    // interpolate live Settings on both sides.
    Q("q_qa_cluster_flags", Some {
      val Qa = graft.Settings.clusterQa
      s"""
      WITH RECURSIVE ${MarketData.barsSql},
      ${Indicators.twiggsSql},
      ${EventGrammar.grammarSql},
      ${ForwardLabels.sql},
      bv AS (
        SELECT g.flow_state_code AS state, g.ticker, g.bar_ts, g.bar_id,
               f.fwd_ret_10 AS v
        FROM grammar g JOIN fwd f USING (ticker, bar_ts, bar_id)
        WHERE f.fwd_ret_10 IS NOT NULL),
      ${Bootstrap.sqlStats("state", "ticker, bar_ts, bar_id", nBoot = 200)},
      swins AS (
        SELECT CAST(date_diff('day', DATE '2024-01-01',
                 CAST(to_timestamp(g.bar_ts / 1000000) AS DATE)) AS INT)
                 AS win,
               g.flow_state_code AS state, f.fwd_ret_10 AS v
        FROM grammar g JOIN fwd f USING (ticker, bar_ts, bar_id)),
      sws AS (SELECT win, state, count(*) AS wn, avg(v) AS mret
              FROM swins GROUP BY 1, 2),
      sshare AS (
        SELECT *, CAST(wn AS DOUBLE) / sum(wn) OVER (PARTITION BY win)
          AS share
        FROM sws),
      sstab AS (
        SELECT state,
               avg(CASE WHEN mret > 0 THEN 1.0
                        WHEN mret IS NOT NULL THEN 0.0 END)
                 AS sign_stability,
               stddev_pop(mret) / (abs(avg(mret)) + ${Qa.eps})
                 AS ret_mean_cv,
               avg(share) AS state_share_mean
        FROM sshare GROUP BY 1),
      wd AS (
        SELECT state, mret,
               avg(mret) OVER (PARTITION BY state) AS m_avg,
               stddev_pop(mret) OVER (PARTITION BY state) AS m_std,
               count(mret) OVER (PARTITION BY state) AS m_cnt
        FROM sws),
      wout AS (
        SELECT state,
               max(CASE WHEN m_cnt >= 4 AND m_std > 0
                 AND abs(mret - m_avg) > 2.0 * m_std THEN 1 ELSE 0 END)
                 = 1 AS likely_outlier
        FROM wd GROUP BY 1),
      ttr AS (
        SELECT * FROM (
          SELECT lag(flow_state_code) OVER (PARTITION BY ticker
                   ORDER BY bar_ts, bar_id) AS sp,
                 flow_state_code AS sc
          FROM grammar)
        WHERE sp IS NOT NULL AND sp <> sc),
      tcnt AS (
        SELECT state, CAST(count(*) AS BIGINT) AS transition_event_count
        FROM (SELECT sp AS state FROM ttr
              UNION ALL SELECT sc AS state FROM ttr)
        GROUP BY 1),
      ciq AS (
        SELECT quantile_cont(mean_ci_hi - mean_ci_lo,
          ${Qa.ciWidthQuantileThreshold}) AS ci_thr FROM bstats),
      qaf AS (
        SELECT b.state, b.n AS n_rows,
               b.mean_obs AS fwd_ret_10_mean,
               b.mean_ci_hi - b.mean_ci_lo AS ci_width,
               s.sign_stability, s.ret_mean_cv, s.state_share_mean,
               coalesce(t.transition_event_count, 0)
                 AS transition_event_count,
               coalesce(w.likely_outlier, false) AS likely_outlier,
               c.ci_thr
        FROM bstats b
        LEFT JOIN sstab s USING (state)
        LEFT JOIN tcnt t USING (state)
        LEFT JOIN wout w USING (state)
        CROSS JOIN ciq c)
      SELECT state, n_rows,
             round(fwd_ret_10_mean, 9) AS fwd_ret_10_mean,
             round(ci_width, 9) AS ci_width,
             round(sign_stability, 9) AS stability_sign_consistency,
             round(ret_mean_cv, 9) AS ret_mean_cv,
             round(state_share_mean, 9) AS state_share_mean,
             transition_event_count,
             concat_ws(',',
               CASE WHEN likely_outlier THEN 'LIKELY_OUTLIER_WINDOW' END,
               CASE WHEN n_rows < ${Qa.minNRows} THEN 'LOW_N' END,
               CASE WHEN state_share_mean < ${Qa.minStateShare}
                 THEN 'LOW_OCCUPANCY' END,
               CASE WHEN ret_mean_cv > ${Qa.retCvThreshold}
                 AND abs(fwd_ret_10_mean) <= ${Qa.nearZeroMeanThreshold}
                 THEN 'MEAN_NEAR_ZERO_CV_INFLATION' END,
               CASE WHEN sign_stability < ${Qa.signConsistencyThreshold}
                 THEN 'SIGN_FLIP_ACROSS_WINDOWS' END,
               CASE WHEN transition_event_count
                 < ${Qa.transitionsSparseThreshold}
                 THEN 'TRANSITIONS_TOO_SPARSE' END,
               CASE WHEN ci_width >= ci_thr THEN 'WIDE_CI' END,
               CASE WHEN ret_mean_cv > ${Qa.retCvThreshold}
                 THEN 'WINDOW_DRIFT_HIGH' END) AS issues,
             (likely_outlier OR n_rows < ${Qa.minNRows}
               OR state_share_mean < ${Qa.minStateShare}
               OR ret_mean_cv > ${Qa.retCvThreshold}
               OR sign_stability < ${Qa.signConsistencyThreshold}
               OR transition_event_count
                 < ${Qa.transitionsSparseThreshold}
               OR ci_width >= ci_thr) AS is_flagged
      FROM qaf ORDER BY state"""
    }) { (s, dir) =>
      val Qa = graft.Settings.clusterQa
      val gram = Stage.slimGrammar(s, dir)
      val stats = ResearchQueries.bootStats(s, dir)
      val sws = ResearchQueries.dayWindows(s, dir)
      val sshare = sws.withColumn("share",
        col("wn").cast("double")
          / sum("wn").over(Window.partitionBy("win")))
      val sstab = sshare.groupBy("state").agg(
        avg(when(col("mret") > 0, 1.0)
          .when(col("mret").isNotNull, 0.0)).as("sign_stability"),
        (stddev_pop(col("mret")) / (abs(avg(col("mret"))) + Qa.eps))
          .as("ret_mean_cv"),
        avg("share").as("state_share_mean"))
      val wAvg = Window.partitionBy("state")
      val wout = sws
        .withColumn("m_avg", avg("mret").over(wAvg))
        .withColumn("m_std", stddev_pop(col("mret")).over(wAvg))
        .withColumn("m_cnt", count(col("mret")).over(wAvg))
        .groupBy("state")
        .agg((max(when(col("m_cnt") >= 4 && col("m_std") > 0
          && abs(col("mret") - col("m_avg")) > lit(2.0) * col("m_std"),
          1).otherwise(0)) === 1).as("likely_outlier"))
      val gW = Window.partitionBy("ticker").orderBy("bar_ts", "bar_id")
      val ttr = gram
        .select(lag("flow_state_code", 1).over(gW).as("sp"),
          col("flow_state_code").as("sc"))
        .filter(col("sp").isNotNull && col("sp") =!= col("sc"))
      val tcnt = ttr.select(col("sp").as("state"))
        .unionByName(ttr.select(col("sc").as("state")))
        .groupBy("state")
        .agg(count(lit(1)).as("transition_event_count"))
      val ciW = col("mean_ci_hi") - col("mean_ci_lo")
      val ciq = stats.agg(
        percentile(ciW, lit(Qa.ciWidthQuantileThreshold)).as("ci_thr"))
      val qaf = stats
        .join(sstab, Seq("state"), "left")
        .join(tcnt, Seq("state"), "left")
        .join(wout, Seq("state"), "left")
        .crossJoin(broadcast(ciq))
        .select(col("state"), col("n").as("n_rows"),
          col("mean_obs").as("fwd_ret_10_mean"), ciW.as("ci_width"),
          col("sign_stability"), col("ret_mean_cv"),
          col("state_share_mean"),
          coalesce(col("transition_event_count"), lit(0L))
            .as("transition_event_count"),
          coalesce(col("likely_outlier"), lit(false))
            .as("likely_outlier"),
          col("ci_thr"))
      qaf.select(col("state"), col("n_rows"),
          round(col("fwd_ret_10_mean"), 9).as("fwd_ret_10_mean"),
          round(col("ci_width"), 9).as("ci_width"),
          round(col("sign_stability"), 9)
            .as("stability_sign_consistency"),
          round(col("ret_mean_cv"), 9).as("ret_mean_cv"),
          round(col("state_share_mean"), 9).as("state_share_mean"),
          col("transition_event_count"),
          concat_ws(",",
            when(col("likely_outlier"), "LIKELY_OUTLIER_WINDOW"),
            when(col("n_rows") < Qa.minNRows, "LOW_N"),
            when(col("state_share_mean") < Qa.minStateShare,
              "LOW_OCCUPANCY"),
            when(col("ret_mean_cv") > Qa.retCvThreshold
              && abs(col("fwd_ret_10_mean")) <= Qa.nearZeroMeanThreshold,
              "MEAN_NEAR_ZERO_CV_INFLATION"),
            when(col("sign_stability") < Qa.signConsistencyThreshold,
              "SIGN_FLIP_ACROSS_WINDOWS"),
            when(col("transition_event_count")
              < Qa.transitionsSparseThreshold,
              "TRANSITIONS_TOO_SPARSE"),
            when(col("ci_width") >= col("ci_thr"), "WIDE_CI"),
            when(col("ret_mean_cv") > Qa.retCvThreshold,
              "WINDOW_DRIFT_HIGH")).as("issues"),
          (col("likely_outlier") || col("n_rows") < Qa.minNRows
            || col("state_share_mean") < Qa.minStateShare
            || col("ret_mean_cv") > Qa.retCvThreshold
            || col("sign_stability") < Qa.signConsistencyThreshold
            || col("transition_event_count")
              < Qa.transitionsSparseThreshold
            || col("ci_width") >= col("ci_thr")).as("is_flagged"))
        .orderBy("state")
    },

    Q("q_cluster_hardening_full", Some(s"""
      WITH RECURSIVE ${MarketData.barsSql},
      ${Indicators.twiggsSql},
      ${EventGrammar.grammarSql},
      ${ForwardLabels.sql},
      bv AS (
        SELECT g.flow_state_code AS state, g.ticker, g.bar_ts, g.bar_id,
               f.fwd_ret_10 AS v
        FROM grammar g JOIN fwd f USING (ticker, bar_ts, bar_id)
        WHERE f.fwd_ret_10 IS NOT NULL),
      ${Bootstrap.sqlStats("state", "ticker, bar_ts, bar_id", nBoot = 200)},
      ${Bootstrap.sqlPairwise("state", nBoot = 200)},
      psh AS (
        SELECT state,
               avg(CASE WHEN sig THEN 1.0 ELSE 0.0 END) AS separation_share
        FROM (SELECT state_a AS state, diff_sign_consistent AS sig
              FROM bpair
              UNION ALL
              SELECT state_b AS state, diff_sign_consistent AS sig
              FROM bpair)
        GROUP BY 1),
      swins AS (
        SELECT CAST(date_diff('day', DATE '2024-01-01',
                 CAST(to_timestamp(g.bar_ts / 1000000) AS DATE)) AS INT)
                 AS win,
               g.flow_state_code AS state, f.fwd_ret_10 AS v
        FROM grammar g JOIN fwd f USING (ticker, bar_ts, bar_id)),
      sws AS (SELECT win, state, count(*) AS wn, avg(v) AS mret
              FROM swins GROUP BY 1, 2),
      sshare AS (
        SELECT *, CAST(wn AS DOUBLE) / sum(wn) OVER (PARTITION BY win)
          AS share
        FROM sws),
      sstab AS (
        SELECT state,
               avg(CASE WHEN mret > 0 THEN 1.0
                        WHEN mret IS NOT NULL THEN 0.0 END)
                 AS sign_stability,
               stddev_pop(mret) / (abs(avg(mret)) + 1e-12) AS ret_mean_cv,
               avg(share) AS state_share_mean
        FROM sshare GROUP BY 1),
      nref AS (SELECT greatest(1.0, floor(quantile_cont(n, 0.9)))
                 AS n_ref FROM bstats),
      confd AS (
        -- scorecard confidence (weights .2/.25/.2/.25/.1, scorecards.py)
        SELECT b.state, b.n AS n_rows, b.mean_obs,
               b.mean_ci_lo, b.mean_ci_hi,
               b.mean_ci_hi - b.mean_ci_lo AS ci_width,
               b.hit_rate_obs AS hit_rate,
               (b.mean_ci_lo > 0 OR b.mean_ci_hi < 0)
                 AS sign_confidence_flag,
               s.sign_stability, s.ret_mean_cv, s.state_share_mean,
               round(100 * (
                 0.2 * least(1.0, ln(1 + b.n) / ln(1 + r.n_ref))
                 + 0.25 * greatest(0.0,
                     1 - least(b.mean_ci_hi - b.mean_ci_lo, 0.2) / 0.2)
                 + 0.2 * (CASE WHEN b.mean_ci_lo > 0 OR b.mean_ci_hi < 0
                     THEN 1.0 ELSE 0.0 END)
                 + 0.25 * (0.5 * coalesce(greatest(least(
                       s.sign_stability, 1.0), 0.0), 0.0)
                     + 0.5 * coalesce(greatest(0.0,
                         1 - least(s.ret_mean_cv, 3.0) / 3.0), 0.0))
                 + 0.1 * greatest(least(coalesce(p.separation_share, 0.0),
                     1.0), 0.0)), 3) AS confidence_score
        FROM bstats b
        LEFT JOIN sstab s USING (state)
        LEFT JOIN psh p USING (state)
        CROSS JOIN nref r),
      wd AS (
        SELECT state, win, mret,
               avg(mret) OVER (PARTITION BY state) AS m_avg,
               stddev_pop(mret) OVER (PARTITION BY state) AS m_std,
               count(mret) OVER (PARTITION BY state) AS m_cnt
        FROM sws),
      wstats AS (
        SELECT state, CAST(count(*) AS BIGINT) AS window_count,
               max(mret) AS best_window, min(mret) AS worst_window,
               max(mret) - min(mret) AS drift_span,
               max(CASE WHEN m_cnt >= 4 AND m_std > 0
                 AND abs(mret - m_avg) > 2.0 * m_std THEN 1 ELSE 0 END)
                 = 1 AS likely_outlier
        FROM wd GROUP BY 1),
      wsign AS (
        SELECT state, win,
               CASE WHEN mret > 0 THEN 1 ELSE -1 END AS sgn
        FROM sws WHERE mret IS NOT NULL AND mret <> 0),
      wflips AS (
        SELECT state,
               CAST(count(CASE WHEN prev IS NOT NULL AND sgn <> prev
                 THEN 1 END) AS BIGINT) AS sign_flip_count
        FROM (SELECT state, sgn,
                lag(sgn) OVER (PARTITION BY state ORDER BY win) AS prev
              FROM wsign)
        GROUP BY 1),
      ttr AS (
        SELECT * FROM (
          SELECT lag(flow_state_code) OVER (PARTITION BY ticker
                   ORDER BY bar_ts, bar_id) AS sp,
                 flow_state_code AS sc
          FROM grammar)
        WHERE sp IS NOT NULL AND sp <> sc),
      tcnt AS (
        SELECT state, CAST(count(*) AS BIGINT) AS transition_event_count
        FROM (SELECT sp AS state FROM ttr
              UNION ALL SELECT sc AS state FROM ttr)
        GROUP BY 1),
      hmax AS (SELECT max(n_rows) AS max_n,
                      max(state_share_mean) AS max_share FROM confd),
      cihard AS (SELECT quantile_cont(ci_width, ${H.ciWidthHardQuantile}) AS ci_hard
                 FROM confd),
      qa AS (
        SELECT c.*,
               coalesce(w.window_count, 0) AS window_count,
               coalesce(f.sign_flip_count, 0) AS sign_flip_count,
               w.best_window, w.worst_window, w.drift_span,
               coalesce(t.transition_event_count, 0)
                 AS transition_event_count,
               h.max_n, h.max_share, ch.ci_hard,
               (c.n_rows < ${H.minNRowsHard}) AS qa_low_n,
               (c.state_share_mean < ${H.minStateShareHard}) AS qa_low_occ,
               (c.ret_mean_cv > ${H.retCvHard}) AS qa_drift,
               (c.ret_mean_cv > ${H.retCvHard}
                 AND abs(c.mean_obs) <= ${H.nearZeroAbsMean})
                 AS qa_near_zero,
               (c.ci_width >= ch.ci_hard) AS qa_wide_ci,
               (c.sign_stability < ${H.signConsistencyHard}) AS qa_sign_flip,
               (coalesce(t.transition_event_count, 0)
                 < ${H.minTransitionEvents}) AS qa_sparse,
               coalesce(w.likely_outlier, false) AS qa_outlier
        FROM confd c
        LEFT JOIN wstats w USING (state)
        LEFT JOIN wflips f USING (state)
        LEFT JOIN tcnt t USING (state)
        CROSS JOIN hmax h CROSS JOIN cihard ch),
      scored AS (
        SELECT *,
               100 * (${H.wSampleSize}
                   * least(1.0, ln(1 + n_rows) / ln(1 + max_n))
                 + ${H.wOccupancy} * least(1.0, state_share_mean / max_share)
                 + ${H.wSignConfidence} * (CASE WHEN sign_confidence_flag
                     THEN 1.0 ELSE 0.0 END)
                 + ${H.wCiWidth} * greatest(0.0,
                     1 - ci_width / greatest(ci_hard, 1e-12))
                 + ${H.wSignConsistency}
                   * greatest(least(sign_stability, 1.0), 0.0)
                 + ${H.wRetCv} * greatest(0.0, 1 - ret_mean_cv / ${H.retCvHard})
                 + ${H.wConfidenceScore}
                   * greatest(least(confidence_score / 100.0, 1.0),
                     0.0)) AS base_score,
               CAST(CASE WHEN qa_low_n THEN ${H.penLowN} ELSE 0.0 END
                 + CASE WHEN qa_low_occ THEN ${H.penLowOccupancy} ELSE 0.0 END
                 + CASE WHEN qa_near_zero THEN ${H.penNearZero} ELSE 0.0 END
                 + CASE WHEN qa_wide_ci THEN ${H.penWideCi} ELSE 0.0 END
                 + CASE WHEN qa_sign_flip THEN ${H.penSignFlip} ELSE 0.0 END
                 + CASE WHEN qa_drift THEN ${H.penDrift} ELSE 0.0 END
                 + CASE WHEN qa_outlier THEN ${H.penOutlier} ELSE 0.0 END
                 + CASE WHEN qa_sparse THEN ${H.penSparse} ELSE 0.0 END
                 AS DOUBLE) AS risk_penalty
        FROM qa),
      hardf AS (
        SELECT *,
               greatest(least(base_score - risk_penalty, 100.0), 0.0)
                 AS score,
               (qa_low_n OR qa_low_occ OR ret_mean_cv > ${H.retCvHard}
                 OR sign_stability < ${H.signConsistencyHard}
                 OR (ci_width > ci_hard AND NOT sign_confidence_flag)
                 OR (qa_sign_flip AND qa_wide_ci AND qa_outlier))
                 AS hard_fail
        FROM scored),
      classed AS (
        SELECT *,
               CASE WHEN hard_fail OR score < ${H.scoreMinWatch} THEN 'BLOCK'
                    WHEN score >= ${H.scoreMinAllow} AND sign_confidence_flag
                      AND NOT qa_wide_ci AND NOT qa_sign_flip THEN 'ALLOW'
                    ELSE 'WATCH' END AS class_label,
               CASE WHEN mean_ci_lo > 0 AND mean_ci_hi > 0 THEN 1
                    WHEN mean_ci_lo < 0 AND mean_ci_hi < 0 THEN -1
                    ELSE 0 END AS directional_edge_sign
        FROM hardf)
      SELECT state, n_rows,
             mean_obs AS fwd_ret_10_mean,
             mean_ci_lo AS fwd_ret_10_ci_lo,
             mean_ci_hi AS fwd_ret_10_ci_hi,
             round(ci_width, 9) AS ci_width, hit_rate,
             sign_confidence_flag,
             round(sign_stability, 9) AS stability_sign_consistency,
             round(ret_mean_cv, 9) AS ret_mean_cv,
             round(state_share_mean, 9) AS state_share_mean,
             confidence_score, window_count, sign_flip_count,
             round(worst_window, 9) AS worst_window_fwd_ret_10,
             round(best_window, 9) AS best_window_fwd_ret_10,
             round(drift_span, 9) AS drift_span,
             transition_event_count, directional_edge_sign,
             CASE WHEN directional_edge_sign > 0 THEN 'LONG_BIAS'
                  WHEN directional_edge_sign < 0 THEN 'SHORT_BIAS'
                  ELSE 'UNCONFIRMED' END AS allow_direction_hint,
             risk_penalty,
             round(score, 3) AS tradability_score,
             class_label,
             concat_ws(',',
               CASE WHEN qa_outlier THEN 'LIKELY_OUTLIER_WINDOW' END,
               CASE WHEN qa_low_n THEN 'LOW_N' END,
               CASE WHEN qa_low_occ THEN 'LOW_OCCUPANCY' END,
               CASE WHEN qa_near_zero
                 THEN 'MEAN_NEAR_ZERO_CV_INFLATION' END,
               CASE WHEN qa_sign_flip THEN 'SIGN_FLIP_ACROSS_WINDOWS' END,
               CASE WHEN qa_sparse THEN 'TRANSITIONS_TOO_SPARSE' END,
               CASE WHEN qa_wide_ci THEN 'WIDE_CI' END,
               CASE WHEN qa_drift THEN 'WINDOW_DRIFT_HIGH' END)
               AS qa_labels,
             concat_ws(',',
               CASE WHEN qa_low_n THEN 'HARD_LOW_N' END,
               CASE WHEN qa_low_occ THEN 'HARD_LOW_OCCUPANCY' END,
               CASE WHEN ret_mean_cv > ${H.retCvHard}
                 THEN 'HARD_HIGH_RET_CV' END,
               CASE WHEN sign_stability < ${H.signConsistencyHard}
                 THEN 'HARD_LOW_SIGN_CONSISTENCY' END,
               CASE WHEN ci_width > ci_hard AND NOT sign_confidence_flag
                 THEN 'HARD_WIDE_CI_WITHOUT_SIGN_CONF' END,
               CASE WHEN qa_sign_flip AND qa_wide_ci AND qa_outlier
                 THEN 'HARD_SEVERE_QA_COMBINATION' END,
               CASE WHEN NOT hard_fail AND score < ${H.scoreMinWatch}
                 THEN 'BLOCK_LOW_SCORE' END,
               CASE WHEN class_label = 'ALLOW'
                 THEN 'ALLOW_SCORE_AND_STABILITY_OK' END,
               CASE WHEN class_label = 'WATCH'
                 THEN 'WATCH_MIXED_SIGNALS' END) AS reasons,
             CAST(dense_rank() OVER (ORDER BY ci_width)
               AS INT) AS ci_relative_rank,
             CAST(dense_rank() OVER (ORDER BY state_share_mean DESC)
               AS INT) AS occupancy_rank,
             CAST(dense_rank() OVER (ORDER BY sign_stability DESC)
               AS INT) AS stability_rank
      FROM classed
      ORDER BY class_label, tradability_score DESC, state""")) { (s, dir) =>
      val gram = Stage.slimGrammar(s, dir)
      val fwd = Stage.slimFwd(s, dir)
      val keys = Seq("ticker", "bar_ts", "bar_id")
      val joined = gram.select((keys :+ "flow_state_code").map(col): _*)
        .join(fwd.select((keys :+ "fwd_ret_10").map(col): _*), keys)
      val bv = joined.filter(col("fwd_ret_10").isNotNull)
        .withColumnRenamed("flow_state_code", "state")
      val stats = ResearchQueries.bootStats(s, dir)
      val pair = ResearchQueries.bootPair(s, dir)
      val psh = pair.select(col("state_a").as("state"),
          col("diff_sign_consistent").as("sig"))
        .unionByName(pair.select(col("state_b").as("state"),
          col("diff_sign_consistent").as("sig")))
        .groupBy("state")
        .agg(avg(when(col("sig"), 1.0).otherwise(0.0))
          .as("separation_share"))
      val sws = ResearchQueries.dayWindows(s, dir)
      val sshare = sws.withColumn("share",
        col("wn").cast("double") / sum("wn").over(Window.partitionBy("win")))
      val sstab = sshare.groupBy("state").agg(
        avg(when(col("mret") > 0, 1.0)
          .when(col("mret").isNotNull, 0.0)).as("sign_stability"),
        (stddev_pop(col("mret")) / (abs(avg(col("mret"))) + 1e-12))
          .as("ret_mean_cv"),
        avg("share").as("state_share_mean"))
      val nref = stats.agg(
        greatest(lit(1.0), floor(percentile(col("n"), lit(0.9))))
          .as("n_ref"))
      val clip01 = (c: org.apache.spark.sql.Column) =>
        greatest(least(c, lit(1.0)), lit(0.0))
      val ciW = col("mean_ci_hi") - col("mean_ci_lo")
      val signFlag = col("mean_ci_lo") > 0 || col("mean_ci_hi") < 0
      val confidence = round(lit(100) * (
        lit(0.2) * least(lit(1.0),
          log(lit(1) + col("n")) / log(lit(1) + col("n_ref")))
          + lit(0.25) * greatest(lit(0.0),
              lit(1) - least(ciW, lit(0.2)) / 0.2)
          + lit(0.2) * when(signFlag, 1.0).otherwise(0.0)
          + lit(0.25) * (lit(0.5)
              * coalesce(clip01(col("sign_stability")), lit(0.0))
              + lit(0.5) * coalesce(greatest(lit(0.0),
                  lit(1) - least(col("ret_mean_cv"), lit(3.0)) / 3.0),
                  lit(0.0)))
          + lit(0.1) * clip01(coalesce(col("separation_share"),
              lit(0.0)))), 3)
      val confd = stats
        .join(sstab, Seq("state"), "left")
        .join(psh, Seq("state"), "left")
        .crossJoin(broadcast(nref))
        .select(col("state"), col("n").as("n_rows"), col("mean_obs"),
          col("mean_ci_lo"), col("mean_ci_hi"), ciW.as("ci_width"),
          col("hit_rate_obs").as("hit_rate"),
          signFlag.as("sign_confidence_flag"),
          col("sign_stability"), col("ret_mean_cv"),
          col("state_share_mean"),
          confidence.as("confidence_score"))
      val wAvg = Window.partitionBy("state")
      val wstats = sws
        .withColumn("m_avg", avg("mret").over(wAvg))
        .withColumn("m_std", stddev_pop(col("mret")).over(wAvg))
        .withColumn("m_cnt", count(col("mret")).over(wAvg))
        .groupBy("state")
        .agg(count(lit(1)).as("window_count"),
          max("mret").as("best_window"), min("mret").as("worst_window"),
          (max("mret") - min("mret")).as("drift_span"),
          (max(when(col("m_cnt") >= 4 && col("m_std") > 0
            && abs(col("mret") - col("m_avg")) > lit(2.0) * col("m_std"),
            1).otherwise(0)) === 1).as("likely_outlier"))
      val wflips = sws
        .filter(col("mret").isNotNull && col("mret") =!= 0)
        .select(col("state"), col("win"),
          when(col("mret") > 0, 1).otherwise(-1).as("sgn"))
        .withColumn("prev", lag("sgn", 1)
          .over(Window.partitionBy("state").orderBy("win")))
        .groupBy("state")
        .agg(Cols.countIf(col("prev").isNotNull
          && col("sgn") =!= col("prev")).as("sign_flip_count"))
      val gW = Window.partitionBy("ticker").orderBy("bar_ts", "bar_id")
      val ttr = gram
        .select(lag("flow_state_code", 1).over(gW).as("sp"),
          col("flow_state_code").as("sc"))
        .filter(col("sp").isNotNull && col("sp") =!= col("sc"))
      val tcnt = ttr.select(col("sp").as("state"))
        .unionByName(ttr.select(col("sc").as("state")))
        .groupBy("state")
        .agg(count(lit(1)).as("transition_event_count"))
      val hmax = confd.agg(max("n_rows").as("max_n"),
        max("state_share_mean").as("max_share"),
        percentile(col("ci_width"), lit(H.ciWidthHardQuantile))
          .as("ci_hard"))
      val qa = confd
        .join(wstats, Seq("state"), "left")
        .join(wflips, Seq("state"), "left")
        .join(tcnt, Seq("state"), "left")
        .crossJoin(broadcast(hmax))
        .withColumn("window_count",
          coalesce(col("window_count"), lit(0L)))
        .withColumn("sign_flip_count",
          coalesce(col("sign_flip_count"), lit(0L)))
        .withColumn("transition_event_count",
          coalesce(col("transition_event_count"), lit(0L)))
        .withColumn("qa_low_n", col("n_rows") < H.minNRowsHard)
        .withColumn("qa_low_occ",
          col("state_share_mean") < H.minStateShareHard)
        .withColumn("qa_drift", col("ret_mean_cv") > H.retCvHard)
        .withColumn("qa_near_zero",
          col("ret_mean_cv") > H.retCvHard
            && abs(col("mean_obs")) <= H.nearZeroAbsMean)
        .withColumn("qa_wide_ci", col("ci_width") >= col("ci_hard"))
        .withColumn("qa_sign_flip",
          col("sign_stability") < H.signConsistencyHard)
        .withColumn("qa_sparse",
          col("transition_event_count") < H.minTransitionEvents)
        .withColumn("qa_outlier",
          coalesce(col("likely_outlier"), lit(false)))
      def pen(c: String, v: Double) =
        when(col(c), v).otherwise(0.0)
      val scored = qa
        .withColumn("base_score", lit(100) * (
          lit(H.wSampleSize) * least(lit(1.0),
            log(lit(1) + col("n_rows")) / log(lit(1) + col("max_n")))
            + lit(H.wOccupancy) * least(lit(1.0),
                col("state_share_mean") / col("max_share"))
            + lit(H.wSignConfidence)
                * when(col("sign_confidence_flag"), 1.0).otherwise(0.0)
            + lit(H.wCiWidth) * greatest(lit(0.0),
                lit(1) - col("ci_width")
                  / greatest(col("ci_hard"), lit(1e-12)))
            + lit(H.wSignConsistency) * clip01(col("sign_stability"))
            + lit(H.wRetCv) * greatest(lit(0.0),
                lit(1) - col("ret_mean_cv") / H.retCvHard)
            + lit(H.wConfidenceScore)
                * clip01(col("confidence_score") / 100.0)))
        .withColumn("risk_penalty",
          pen("qa_low_n", H.penLowN) + pen("qa_low_occ", H.penLowOccupancy)
            + pen("qa_near_zero", H.penNearZero)
            + pen("qa_wide_ci", H.penWideCi)
            + pen("qa_sign_flip", H.penSignFlip)
            + pen("qa_drift", H.penDrift)
            + pen("qa_outlier", H.penOutlier)
            + pen("qa_sparse", H.penSparse))
        .withColumn("score",
          greatest(least(col("base_score") - col("risk_penalty"),
            lit(100.0)), lit(0.0)))
        .withColumn("hard_fail",
          col("qa_low_n") || col("qa_low_occ")
            || col("ret_mean_cv") > H.retCvHard
            || col("sign_stability") < H.signConsistencyHard
            || (col("ci_width") > col("ci_hard")
                && !col("sign_confidence_flag"))
            || (col("qa_sign_flip") && col("qa_wide_ci")
                && col("qa_outlier")))
        .withColumn("class_label",
          when(col("hard_fail") || col("score") < H.scoreMinWatch, "BLOCK")
            .when(col("score") >= H.scoreMinAllow
              && col("sign_confidence_flag")
              && !col("qa_wide_ci") && !col("qa_sign_flip"), "ALLOW")
            .otherwise("WATCH"))
        .withColumn("directional_edge_sign",
          when(col("mean_ci_lo") > 0 && col("mean_ci_hi") > 0, 1)
            .when(col("mean_ci_lo") < 0 && col("mean_ci_hi") < 0, -1)
            .otherwise(0))
      scored.select(col("state"), col("n_rows"),
          col("mean_obs").as("fwd_ret_10_mean"),
          col("mean_ci_lo").as("fwd_ret_10_ci_lo"),
          col("mean_ci_hi").as("fwd_ret_10_ci_hi"),
          round(col("ci_width"), 9).as("ci_width"), col("hit_rate"),
          col("sign_confidence_flag"),
          round(col("sign_stability"), 9)
            .as("stability_sign_consistency"),
          round(col("ret_mean_cv"), 9).as("ret_mean_cv"),
          round(col("state_share_mean"), 9).as("state_share_mean"),
          col("confidence_score"), col("window_count"),
          col("sign_flip_count"),
          round(col("worst_window"), 9).as("worst_window_fwd_ret_10"),
          round(col("best_window"), 9).as("best_window_fwd_ret_10"),
          round(col("drift_span"), 9).as("drift_span"),
          col("transition_event_count"), col("directional_edge_sign"),
          when(col("directional_edge_sign") > 0, "LONG_BIAS")
            .when(col("directional_edge_sign") < 0, "SHORT_BIAS")
            .otherwise("UNCONFIRMED").as("allow_direction_hint"),
          col("risk_penalty"),
          round(col("score"), 3).as("tradability_score"),
          col("class_label"),
          concat_ws(",",
            when(col("qa_outlier"), "LIKELY_OUTLIER_WINDOW"),
            when(col("qa_low_n"), "LOW_N"),
            when(col("qa_low_occ"), "LOW_OCCUPANCY"),
            when(col("qa_near_zero"), "MEAN_NEAR_ZERO_CV_INFLATION"),
            when(col("qa_sign_flip"), "SIGN_FLIP_ACROSS_WINDOWS"),
            when(col("qa_sparse"), "TRANSITIONS_TOO_SPARSE"),
            when(col("qa_wide_ci"), "WIDE_CI"),
            when(col("qa_drift"), "WINDOW_DRIFT_HIGH")).as("qa_labels"),
          concat_ws(",",
            when(col("qa_low_n"), "HARD_LOW_N"),
            when(col("qa_low_occ"), "HARD_LOW_OCCUPANCY"),
            when(col("ret_mean_cv") > H.retCvHard, "HARD_HIGH_RET_CV"),
            when(col("sign_stability") < H.signConsistencyHard,
              "HARD_LOW_SIGN_CONSISTENCY"),
            when(col("ci_width") > col("ci_hard")
              && !col("sign_confidence_flag"),
              "HARD_WIDE_CI_WITHOUT_SIGN_CONF"),
            when(col("qa_sign_flip") && col("qa_wide_ci")
              && col("qa_outlier"), "HARD_SEVERE_QA_COMBINATION"),
            when(!col("hard_fail") && col("score") < H.scoreMinWatch,
              "BLOCK_LOW_SCORE"),
            when(col("class_label") === "ALLOW",
              "ALLOW_SCORE_AND_STABILITY_OK"),
            when(col("class_label") === "WATCH",
              "WATCH_MIXED_SIGNALS")).as("reasons"),
          // unpartitioned windows are intentional: post-aggregation
          // report table (≤k cluster rows) — SURVEY A14's own shape
          dense_rank().over(Window.orderBy("ci_width"))
            .as("ci_relative_rank"),
          dense_rank().over(Window.orderBy(col("state_share_mean").desc))
            .as("occupancy_rank"),
          dense_rank().over(Window.orderBy(col("sign_stability").desc))
            .as("stability_rank"))
        .orderBy(col("class_label"), col("tradability_score").desc,
          col("state"))
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
