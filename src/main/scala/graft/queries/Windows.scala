package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.Wins
import graft.functions.WilderEma

/** Window-function family — SURVEY.md §2.5 (W1-W17), the reference's
  * dominant operator class — exercised over the `events` table with
  * `user_id` as the series key (≡ ticker) and (`ts`,`event_id`) as the
  * ordering (≡ trade_date).
  *
  * Scale: every query here is a single hash-exchange on `user_id` followed
  * by one in-partition sort — the same shape the real silver/gold feature
  * builders use, so one shuffle serves an arbitrarily long column program.
  */
object Windows extends QueryModule {

  /** Shared SQL prelude: per-user ordered events with row index. */
  private val base = """
    base AS (
      SELECT user_id, event_id, event_type, value,
             epoch_us(ts) AS eus, CAST(ts AS DATE) AS d,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events)"""

  /** `ts` is encoding-adaptive (nanos LONG or TIMESTAMP[_NTZ]) —
    * graft.etl.EventTime dispatches on the actual schema, matching
    * DuckDB's `epoch_us(ts)` on both. */
  private def sparkBase(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val ev = t(s, dir, "events")
    val eus = graft.etl.EventTime.micros(ev)
    ev.select(
      col("user_id"), col("event_id"), col("event_type"), col("value"),
      eus.as("eus"),
      to_date(timestamp_micros(eus)).as("d"),
      row_number().over(w).as("rn"))
  }

  private val wOrd = Window.partitionBy("user_id").orderBy("eus", "event_id")

  def all: Seq[Q] = Seq(

    // W1/W2/W12/W13: lag, lead, returns, transition codes, day gaps
    Q("q_w_lag_lead", Some(s"""
      WITH $base,
      coded AS (
        SELECT *, CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
          WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4 ELSE 5 END AS tc
        FROM base)
      SELECT user_id, event_id, rn,
             lag(value, 1)  OVER w AS prev_value,
             lead(value, 1) OVER w AS next_value,
             round(CASE WHEN abs(lag(value, 1) OVER w) > 0.000000000001
               THEN value / (lag(value, 1) OVER w) - 1 END, 9) AS ret_1,
             (lag(tc, 1) OVER w) * 10 + tc AS transition_code,
             CAST(date_diff('day', lag(d, 1) OVER w, d) AS INT) AS day_gap,
             (eus - lag(eus, 1) OVER w) / 1000000.0 AS sec_gap
      FROM coded
      WINDOW w AS (PARTITION BY user_id ORDER BY eus, event_id)
      ORDER BY user_id, rn""")) { (s, dir) =>
      import graft.ops.Cols.safeDiv
      val b = sparkBase(s, dir).withColumn("tc",
        when(col("event_type") === "click", 1)
          .when(col("event_type") === "error", 2)
          .when(col("event_type") === "purchase", 3)
          .when(col("event_type") === "signup", 4).otherwise(5))
      b.select(col("user_id"), col("event_id"), col("rn"),
          lag("value", 1).over(wOrd).as("prev_value"),
          lead("value", 1).over(wOrd).as("next_value"),
          round(safeDiv(col("value"), lag(col("value"), 1).over(wOrd)) - 1, 9)
            .as("ret_1"),
          Wins.transitionCode(col("tc"), wOrd).as("transition_code"),
          datediff(col("d"), lag(col("d"), 1).over(wOrd)).as("day_gap"),
          ((col("eus") - lag(col("eus"), 1).over(wOrd)) / 1000000.0)
            .as("sec_gap"))
        .orderBy("user_id", "rn")
    },

    // W3-W6: rolling mean/std/min/max/sum with Polars min_samples semantics
    Q("q_w_rolling", Some(s"""
      WITH $base
      SELECT user_id, event_id, rn,
             round(CASE WHEN count(value) OVER w20 >= 20
               THEN avg(value) OVER w20 END, 6) AS sma_20,
             round(CASE WHEN count(value) OVER w20 >= 20
               THEN stddev_pop(value) OVER w20 END, 6) AS std_20,
             CASE WHEN count(value) OVER w14 >= 14
               THEN min(value) OVER w14 END AS min_14,
             CASE WHEN count(value) OVER w14 >= 14
               THEN max(value) OVER w14 END AS max_14,
             round(sum(value) OVER w5, 6) AS sum_5,
             round(CASE WHEN count(value) OVER w20 >= 20 THEN
               (value - avg(value) OVER w20)
                 / nullif(stddev_pop(value) OVER w20, 0) END, 6) AS z_20
      FROM base
      WINDOW
        w20 AS (PARTITION BY user_id ORDER BY eus, event_id
                ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
        w14 AS (PARTITION BY user_id ORDER BY eus, event_id
                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
        w5 AS (PARTITION BY user_id ORDER BY eus, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, rn""")) { (s, dir) =>
      val b = sparkBase(s, dir)
      val v = col("value")
      val sma = Wins.rollingMean(v, wOrd, 20, 20)
      val sd = Wins.rollingStd(v, wOrd, 20, 20)
      b.select(col("user_id"), col("event_id"), col("rn"),
          round(sma, 6).as("sma_20"),
          round(sd, 6).as("std_20"),
          Wins.rollingMin(v, wOrd, 14, 14).as("min_14"),
          Wins.rollingMax(v, wOrd, 14, 14).as("max_14"),
          round(Wins.rollingSum(v, wOrd, 5, 1), 6).as("sum_5"),
          round((v - sma) / nullif(sd, lit(0)), 6).as("z_20"))
        .orderBy("user_id", "rn")
    },

    // W7: exact rolling median (ref: dollar-vol liquidity floor)
    Q("q_w_rolling_median", Some(s"""
      WITH $base
      SELECT user_id, event_id, rn,
             round(CASE WHEN count(value) OVER w21 >= 21
               THEN median(value) OVER w21 END, 6) AS med_21
      FROM base
      WINDOW w21 AS (PARTITION BY user_id ORDER BY eus, event_id
                     ROWS BETWEEN 20 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, rn""")) { (s, dir) =>
      sparkBase(s, dir)
        .select(col("user_id"), col("event_id"), col("rn"),
          round(Wins.rollingMedian(col("value"), wOrd, 21, 21), 6)
            .as("med_21"))
        .orderBy("user_id", "rn")
    },

    // W8/W10: cumulative sum/count, running max, drawdown from peak
    Q("q_w_cumulative", Some(s"""
      WITH $base
      SELECT user_id, event_id, rn,
             round(sum(value) OVER wc, 6) AS cum_value,
             count(value) OVER wc AS n_seen,
             max(value) OVER wc AS peak,
             round(value / max(value) OVER wc - 1, 9) AS drawdown
      FROM base
      WINDOW wc AS (PARTITION BY user_id ORDER BY eus, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY user_id, rn""")) { (s, dir) =>
      val cumF = Wins.cum(wOrd)
      sparkBase(s, dir)
        .select(col("user_id"), col("event_id"), col("rn"),
          round(sum("value").over(cumF), 6).as("cum_value"),
          count("value").over(cumF).as("n_seen"),
          max("value").over(cumF).as("peak"),
          round(col("value") / max("value").over(cumF) - 1, 9).as("drawdown"))
        .orderBy("user_id", "rn")
    },

    // W9: bars-since-event via conditional index + forward fill
    Q("q_w_bars_since", Some(s"""
      WITH $base
      SELECT user_id, event_id, rn,
             rn - last_value(CASE WHEN event_type = 'purchase' THEN rn END
                             IGNORE NULLS) OVER wc AS bars_since_purchase,
             last_value(CASE WHEN event_type = 'error' THEN value END
                        IGNORE NULLS) OVER wc AS last_error_value
      FROM base
      WINDOW wc AS (PARTITION BY user_id ORDER BY eus, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY user_id, rn""")) { (s, dir) =>
      sparkBase(s, dir)
        .select(col("user_id"), col("event_id"), col("rn"),
          Wins.barsSince(col("event_type") === "purchase", wOrd)
            .as("bars_since_purchase"),
          Wins.forwardFill(when(col("event_type") === "error", col("value")),
            wOrd).as("last_error_value"))
        .orderBy("user_id", "rn")
    },

    // W11: run-length encoding (gaps-and-islands) over event_type runs
    Q("q_w_run_length", Some(s"""
      WITH $base,
      flagged AS (
        SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
                    OR event_type <> lag(event_type) OVER w
                  THEN 1 ELSE 0 END AS chg
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY eus, event_id)),
      islands AS (
        -- CAST: DuckDB sum(INTEGER) yields HUGEINT, which the Arrow driver
        -- path renders as double and breaks the value hash vs Spark's bigint
        SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id
          ORDER BY eus, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS island_id
        FROM flagged)
      SELECT user_id, event_id, rn, event_type, island_id,
             row_number() OVER (PARTITION BY user_id, island_id
                                ORDER BY eus, event_id) AS run_pos
      FROM islands ORDER BY user_id, rn""")) { (s, dir) =>
      val b = sparkBase(s, dir)
        .withColumn("island_id", Wins.runId(col("event_type"), wOrd))
      b.withColumn("run_pos", row_number().over(
          Window.partitionBy("user_id", "island_id").orderBy("eus", "event_id")))
        .select("user_id", "event_id", "rn", "event_type", "island_id",
          "run_pos")
        .orderBy("user_id", "rn")
    },

    // W13/W14: zero-cross + 3-bar pivot detection, per-user event counts
    Q("q_w_crossings", Some(s"""
      WITH $base,
      sig AS (
        SELECT *, value - 250.0 AS x FROM base),
      ev AS (
        SELECT user_id, rn,
          CASE WHEN x > 0 AND lag(x) OVER w <= 0 THEN 1 ELSE 0 END AS up,
          CASE WHEN x < 0 AND lag(x) OVER w >= 0 THEN 1 ELSE 0 END AS dn,
          CASE WHEN lag(x, 2) OVER w > lag(x, 1) OVER w
                AND lag(x, 1) OVER w < x THEN 1 ELSE 0 END AS pl,
          CASE WHEN lag(x, 2) OVER w < lag(x, 1) OVER w
                AND lag(x, 1) OVER w > x THEN 1 ELSE 0 END AS ph
        FROM sig
        WINDOW w AS (PARTITION BY user_id ORDER BY eus, event_id))
      SELECT user_id,
             CAST(sum(up) AS BIGINT) AS n_cross_up,
             CAST(sum(dn) AS BIGINT) AS n_cross_down,
             CAST(sum(pl) AS BIGINT) AS n_pivot_low,
             CAST(sum(ph) AS BIGINT) AS n_pivot_high
      FROM ev GROUP BY user_id ORDER BY user_id""")) { (s, dir) =>
      val x = col("value") - 250.0
      val b = sparkBase(s, dir).withColumn("x", x)
      def z(c: org.apache.spark.sql.Column) =
        when(c, 1).otherwise(0)
      b.select(col("user_id"),
          z(Wins.zeroCrossUp(col("x"), wOrd)).as("up"),
          z(Wins.zeroCrossDown(col("x"), wOrd)).as("dn"),
          z(Wins.pivotLow(col("x"), wOrd)).as("pl"),
          z(Wins.pivotHigh(col("x"), wOrd)).as("ph"))
        .groupBy("user_id")
        .agg(sum("up").as("n_cross_up"), sum("dn").as("n_cross_down"),
          sum("pl").as("n_pivot_low"), sum("ph").as("n_pivot_high"))
        .orderBy("user_id")
    },

    // W17/P18-style: duplicate-key flag + calendar-gap flag battery
    Q("q_w_flags", Some(s"""
      WITH $base
      SELECT user_id, event_id, rn,
             count(*) OVER (PARTITION BY user_id, d) > 1 AS dup_day,
             coalesce(CAST(date_diff('day', lag(d) OVER w, d) AS INT) > 2,
               false) AS gap_flag,
             value <= 0 AS nonpositive
      FROM base
      WINDOW w AS (PARTITION BY user_id ORDER BY eus, event_id)
      ORDER BY user_id, rn""")) { (s, dir) =>
      sparkBase(s, dir)
        .select(col("user_id"), col("event_id"), col("rn"),
          (count(lit(1)).over(Window.partitionBy("user_id", "d")) > 1)
            .as("dup_day"),
          coalesce(datediff(col("d"), lag(col("d"), 1).over(wOrd)) > 2,
            lit(false)).as("gap_flag"),
          (col("value") <= 0).as("nonpositive"))
        .orderBy("user_id", "rn")
    },

    // W16: dense rank of users by activity (descending)
    Q("q_w_dense_rank", Some("""
      WITH m AS (SELECT user_id, count(*) AS n,
                        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS tv
                 FROM events GROUP BY 1)
      SELECT user_id, n, tv,
             dense_rank() OVER (ORDER BY n DESC) AS activity_rank
      FROM m ORDER BY user_id""")) { (s, dir) =>
      import graft.ops.Cols.moneySum
      t(s, dir, "events")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("tv"))
        // unpartitioned window is intentional: post-aggregation report
        // table (one row per user) — SURVEY A14's own shape
        .withColumn("activity_rank",
          dense_rank().over(Window.orderBy(col("n").desc)))
        .orderBy("user_id")
    },

    // W18: rolling mode with most-recent tiebreak (state display smoothing)
    Q("q_w_rolling_mode", Some(s"""
      WITH $base,
      coded AS (
        SELECT *, CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
          WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4 ELSE 5 END AS tc
        FROM base),
      rolled AS (
        SELECT user_id, event_id, rn,
               list(tc) OVER (PARTITION BY user_id ORDER BY eus, event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS vals
        FROM coded)
      SELECT user_id, event_id, rn,
             list_aggregate(list_transform(list_distinct(vals), v ->
               {'cnt': len(list_filter(vals, x -> x = v)),
                'npos': -list_position(list_reverse(vals), v),
                'v': v}), 'max').v AS mode_7
      FROM rolled ORDER BY user_id, rn""")) { (s, dir) =>
      import graft.ops.Wins
      val b = sparkBase(s, dir).withColumn("tc",
        when(col("event_type") === "click", 1)
          .when(col("event_type") === "error", 2)
          .when(col("event_type") === "purchase", 3)
          .when(col("event_type") === "signup", 4).otherwise(5))
      b.select(col("user_id"), col("event_id"), col("rn"),
          Wins.rollingModeRecent(col("tc"), wOrd, 7).as("mode_7"))
        .orderBy("user_id", "rn")
    },

    // W15: Wilder EMA (alpha=1/21, warmup 21) as a native Catalyst running
    // window function; oracle = recursive CTE reproducing the identical
    // recursion y_t = y_{t-1} + a*(x_t - y_{t-1}) — bit-identical arithmetic
    Q("q_w_wilder_ema", Some(s"""
      WITH RECURSIVE $base,
      rec AS (
        SELECT user_id, event_id, rn, value, value AS ema
        FROM base WHERE rn = 1
        UNION ALL
        SELECT b.user_id, b.event_id, b.rn, b.value,
               r.ema + (1.0/21.0) * (b.value - r.ema)
        FROM base b JOIN rec r
          ON b.user_id = r.user_id AND b.rn = r.rn + 1)
      SELECT user_id, event_id, rn,
             round(CASE WHEN rn >= 21 THEN ema END, 6) AS tmf_ema_21
      FROM rec ORDER BY user_id, rn""")) { (s, dir) =>
      sparkBase(s, dir)
        .select(col("user_id"), col("event_id"), col("rn"),
          round(WilderEma.wilderOver(col("value"), 21, Seq(col("user_id")),
            Seq(col("eus"), col("event_id"))), 6).as("tmf_ema_21"))
        .orderBy("user_id", "rn")
    }
  )
}
