package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.Cols

/** Event-stream analytics over the `events` table — the operators a
  * clickstream/telemetry warehouse runs at trillion-event scale:
  * gap-based sessionization, semi-structured JSON property extraction,
  * staged conversion funnels, and cohort retention.
  *
  * Scale shapes: sessionization is ONE hash exchange on `user_id` — the
  * gap flag, session index (running sum), and the per-session aggregate
  * all ride that single partitioning (Spark accepts a subset
  * partitioning for the (user_id, sess_idx) aggregate). The funnel is
  * the same single exchange: three stacked unbounded per-user window
  * minima, a per-user rollup, then a one-row global aggregate crossed
  * with a 4-row literal stage frame. Retention shuffles twice more, but
  * only AFTER per-user reduction (the (cohort, offset) table is bounded
  * by days², not events). JSON extraction is a pure column program that
  * streams with the scan into a 5-row aggregate.
  */
object EventQueries extends QueryModule {

  /** Session gap: a new session starts after 6 h of inactivity (chosen
    * against the fixture's inter-event gap distribution — median ≈ 7 h —
    * so both single- and multi-event sessions occur; production tunes
    * this per product, the shape is identical). */
  private val GapUs = 6L * 3600 * 1000000

  private def evBase(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val ev = t(s, dir, "events")
    ev.select(
      col("user_id"), col("event_id"), col("event_type"), col("value"),
      graft.etl.EventTime.micros(ev).as("eus"))
  }

  def all: Seq[Q] = Seq(

    // Gap-based sessionization: flag gap > threshold, running-sum the
    // flags into a per-user session index, aggregate per session.
    // (user_id, eus) is unique in the fixture at every SF (verified), so
    // min_by/arg_max on eus are deterministic.
    Q("q_ev_sessions", Some(s"""
      WITH base AS (
        SELECT user_id, event_id, event_type, value, epoch_us(ts) AS eus
        FROM events),
      g AS (
        SELECT *, CASE WHEN lag(eus) OVER w IS NULL
                         OR eus - lag(eus) OVER w > $GapUs
                       THEN 1 ELSE 0 END AS new_sess
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY eus, event_id)),
      sx AS (
        SELECT *, sum(new_sess) OVER (PARTITION BY user_id
          ORDER BY eus, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_idx
        FROM g)
      SELECT user_id, CAST(sess_idx AS BIGINT) AS sess_idx,
             count(*) AS n_events,
             min(eus) AS start_us, max(eus) AS end_us,
             (max(eus) - min(eus)) / 1000000.0 AS duration_sec,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             count(DISTINCT event_type) AS n_types,
             arg_min(event_type, eus) AS first_et,
             arg_max(event_type, eus) AS last_et
      FROM sx GROUP BY user_id, sess_idx
      ORDER BY user_id, sess_idx""")) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("eus", "event_id")
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      evBase(s, dir)
        .withColumn("new_sess",
          when(lag("eus", 1).over(w).isNull ||
            col("eus") - lag("eus", 1).over(w) > GapUs, 1).otherwise(0))
        .withColumn("sess_idx", sum("new_sess").over(cum))
        .groupBy("user_id", "sess_idx")
        .agg(
          count(lit(1)).as("n_events"),
          min("eus").as("start_us"), max("eus").as("end_us"),
          ((max("eus") - min("eus")) / 1000000.0).as("duration_sec"),
          Cols.moneySum(col("value")).as("sum_value"),
          countDistinct("event_type").as("n_types"),
          min_by(col("event_type"), col("eus")).as("first_et"),
          max_by(col("event_type"), col("eus")).as("last_et"))
        .orderBy("user_id", "sess_idx")
    },

    // Native session_window sessionization — the same program runs in
    // Structured Streaming with a watermark (streaming.EventSessions;
    // cross-batch merging locked in StreamingSpec). Session end = last
    // event + gap; split at gap >= threshold (merge is strict-<), which
    // the oracle mirrors with a >= lag split.
    Q("q_ev_session_window", Some(s"""
      WITH base AS (
        SELECT user_id, value, epoch_us(ts) AS eus FROM events),
      g AS (
        SELECT *, CASE WHEN lag(eus) OVER w IS NULL
                         OR eus - lag(eus) OVER w >= $GapUs
                       THEN 1 ELSE 0 END AS new_sess
        FROM base WINDOW w AS (PARTITION BY user_id ORDER BY eus)),
      sx AS (
        SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY eus
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_idx
        FROM g)
      SELECT user_id,
             min(eus) AS win_start_us,
             max(eus) + $GapUs AS win_end_us,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM sx GROUP BY user_id, sess_idx
      ORDER BY user_id, win_start_us""")) { (s, dir) =>
      val ev = t(s, dir, "events")
      graft.streaming.EventSessions.sessionize(
          ev.withColumn("ts_t", graft.etl.EventTime.typedTs(ev)),
          "ts_t", "6 hours")
        .select(col("user_id"),
          unix_micros(col("win_start")).as("win_start_us"),
          unix_micros(col("win_end")).as("win_end_us"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "win_start_us")
    },

    // Semi-structured property extraction: parse `props` JSON per row
    // (codegen'd JsonPath — no UDF), roll up the extracted metric per
    // event type. avg is an exact-int ratio, so bit-stable.
    Q("q_ev_json", Some("""
      WITH x AS (
        SELECT event_type,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        FROM events)
      SELECT event_type, count(*) AS n, count(k) AS n_k,
             CAST(min(k) AS BIGINT) AS min_k,
             CAST(max(k) AS BIGINT) AS max_k,
             CAST(sum(k) AS BIGINT) AS sum_k,
             round(CAST(sum(k) AS DOUBLE) / count(k), 9) AS avg_k
      FROM x GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), count("k").as("n_k"),
          min("k").cast("long").as("min_k"),
          max("k").cast("long").as("max_k"),
          sum("k").cast("long").as("sum_k"),
          round(sum("k").cast("double") / count("k"), 9).as("avg_k"))
        .orderBy("event_type")
    },

    // Staged conversion funnel view → click → purchase: each step's
    // first qualifying time must follow the previous step's (stacked
    // unbounded per-user window minima — one exchange, no sort frames),
    // then reached-counts and step conversions from a one-row global
    // aggregate crossed with the literal stage frame (no windows over
    // the tiny result — array pick instead).
    Q("q_ev_funnel", Some("""
      WITH base AS (
        SELECT user_id, event_type, epoch_us(ts) AS eus FROM events),
      s1 AS (
        SELECT *, min(CASE WHEN event_type = 'view' THEN eus END)
          OVER (PARTITION BY user_id) AS t_view FROM base),
      s2 AS (
        SELECT *, min(CASE WHEN event_type = 'click' AND eus >= t_view
          THEN eus END) OVER (PARTITION BY user_id) AS t_click FROM s1),
      s3 AS (
        SELECT *, min(CASE WHEN event_type = 'purchase' AND eus >= t_click
          THEN eus END) OVER (PARTITION BY user_id) AS t_buy FROM s2),
      u AS (
        SELECT user_id, max(t_view) AS t_view, max(t_click) AS t_click,
               max(t_buy) AS t_buy
        FROM s3 GROUP BY 1),
      st AS (
        SELECT user_id,
               CASE WHEN t_buy IS NOT NULL THEN 3
                    WHEN t_click IS NOT NULL THEN 2
                    WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS stage
        FROM u),
      agg AS (
        SELECT count(*) AS r0,
               count(CASE WHEN stage >= 1 THEN 1 END) AS r1,
               count(CASE WHEN stage >= 2 THEN 1 END) AS r2,
               count(CASE WHEN stage >= 3 THEN 1 END) AS r3
        FROM st)
      SELECT v.stage, v.stage_name,
             CASE v.stage WHEN 0 THEN r0 WHEN 1 THEN r1 WHEN 2 THEN r2
               ELSE r3 END AS n_reached,
             CASE v.stage WHEN 0 THEN NULL
               WHEN 1 THEN CASE WHEN r0 > 0
                 THEN round(CAST(r1 AS DOUBLE) / r0, 9) END
               WHEN 2 THEN CASE WHEN r1 > 0
                 THEN round(CAST(r2 AS DOUBLE) / r1, 9) END
               ELSE CASE WHEN r2 > 0
                 THEN round(CAST(r3 AS DOUBLE) / r2, 9) END
               END AS conv_from_prev,
             CASE WHEN r0 > 0
               THEN round(CAST(CASE v.stage WHEN 0 THEN r0 WHEN 1 THEN r1
                 WHEN 2 THEN r2 ELSE r3 END AS DOUBLE) / r0, 9)
               END AS conv_overall
      FROM (VALUES (0, 'all'), (1, 'view'), (2, 'click'), (3, 'purchase'))
        AS v(stage, stage_name) CROSS JOIN agg
      ORDER BY v.stage""")) { (s, dir) =>
      import s.implicits._
      val wU = Window.partitionBy("user_id")
      val staged = evBase(s, dir)
        .withColumn("t_view",
          min(when(col("event_type") === "view", col("eus"))).over(wU))
        .withColumn("t_click",
          min(when(col("event_type") === "click" &&
            col("eus") >= col("t_view"), col("eus"))).over(wU))
        .withColumn("t_buy",
          min(when(col("event_type") === "purchase" &&
            col("eus") >= col("t_click"), col("eus"))).over(wU))
        .groupBy("user_id")
        .agg(max("t_view").as("t_view"), max("t_click").as("t_click"),
          max("t_buy").as("t_buy"))
        .select(
          when(col("t_buy").isNotNull, 3)
            .when(col("t_click").isNotNull, 2)
            .when(col("t_view").isNotNull, 1).otherwise(0).as("stage"))
      val agg = staged.agg(
        count(lit(1)).as("r0"),
        count(when(col("stage") >= 1, 1)).as("r1"),
        count(when(col("stage") >= 2, 1)).as("r2"),
        count(when(col("stage") >= 3, 1)).as("r3"))
      val stages = Seq((0, "all"), (1, "view"), (2, "click"), (3, "purchase"))
        .toDF("stage", "stage_name")
      val reached = element_at(
        array(col("r0"), col("r1"), col("r2"), col("r3")), col("stage") + 1)
      // greatest(stage, 1): stage=0 rows never use `prev` (the CaseWhen
      // short-circuits first), but the index must stay valid for every
      // row — element_at(…, 0) would be an error under expression
      // reorder/reuse
      val prev = element_at(
        array(col("r0"), col("r1"), col("r2"), col("r3")),
        greatest(col("stage"), lit(1)))
      stages.crossJoin(broadcast(agg))
        .select(col("stage"), col("stage_name"),
          reached.as("n_reached"),
          when(col("stage") === 0, lit(null).cast("double"))
            .when(prev > 0, round(reached.cast("double") / prev, 9))
            .as("conv_from_prev"),
          when(col("r0") > 0,
            round(reached.cast("double") / col("r0"), 9))
            .as("conv_overall"))
        .orderBy("stage")
    },

    // As-of join (graft.ops.TimeJoins.asofJoin): every event picks up
    // the user's most recent purchase at-or-before it. Spark has no
    // ASOF operator — the scalable union+window shape runs it as ONE
    // hash exchange with NO join node (plan-audited); DuckDB's native
    // ASOF LEFT JOIN is the oracle.
    Q("q_ev_asof", Some("""
      WITH base AS (
        SELECT user_id, event_id, epoch_us(ts) AS eus, event_type, value
        FROM events),
      pur AS (
        SELECT user_id, eus AS p_eus, value AS p_value
        FROM base WHERE event_type = 'purchase')
      SELECT b.user_id, b.event_id, b.eus, b.event_type,
             p.p_eus, p.p_value,
             (b.eus - p.p_eus) / 1000000.0 AS staleness_sec
      FROM base b ASOF LEFT JOIN pur p
        ON b.user_id = p.user_id AND b.eus >= p.p_eus
      ORDER BY b.user_id, b.event_id""")) { (s, dir) =>
      val base = evBase(s, dir)
      val pur = base.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("eus").as("p_eus"),
          col("value").as("p_value"))
      graft.ops.TimeJoins.asofJoin(
          base.select("user_id", "event_id", "eus", "event_type"),
          pur, Seq("user_id"), "eus", "p_eus", Seq("p_value"))
        .select(col("user_id"), col("event_id"), col("eus"),
          col("event_type"), col("p_eus"), col("p_value"),
          ((col("eus") - col("p_eus")) / 1000000.0).as("staleness_sec"))
        .orderBy("user_id", "event_id")
    },

    // Range join (graft.ops.TimeJoins.rangeJoin): purchases landing
    // inside the 12 h window after a signup by the same user. The
    // BETWEEN predicate would plan as a nested loop; binning (1 h bins)
    // restores a (user, bin) equi-join that finds each pair exactly
    // once — points map to one bin (plan-audited: no BNLJ/cartesian).
    Q("q_ev_range_join", Some("""
      WITH base AS (
        SELECT user_id, event_id, epoch_us(ts) AS eus, event_type, value
        FROM events),
      sgn AS (
        SELECT user_id, event_id AS signup_id, eus AS lo,
               eus + 43200000000 AS hi
        FROM base WHERE event_type = 'signup'),
      pur AS (
        SELECT user_id, event_id AS purchase_id, eus AS p_eus, value
        FROM base WHERE event_type = 'purchase')
      SELECT p.user_id, s.signup_id, p.purchase_id,
             (p.p_eus - s.lo) / 1000000.0 AS lag_sec,
             CAST(round(CAST(p.value AS DECIMAL(18,2)), 2)
               AS DOUBLE) AS value
      FROM pur p JOIN sgn s
        ON p.user_id = s.user_id AND p.p_eus BETWEEN s.lo AND s.hi
      ORDER BY p.user_id, s.signup_id, p.purchase_id""")) { (s, dir) =>
      val base = evBase(s, dir)
      val sgn = base.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("signup_id"),
          col("eus").as("lo"), (col("eus") + 43200000000L).as("hi"))
      val pur = base.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("eus").as("p_eus"), col("value"))
      graft.ops.TimeJoins.rangeJoin(pur, sgn, Seq("user_id"),
          "p_eus", "lo", "hi", binWidth = 3600000000L)
        .select(col("user_id"), col("signup_id"), col("purchase_id"),
          ((col("p_eus") - col("lo")) / 1000000.0).as("lag_sec"),
          // Decimal math inside, primitive out (repo hash-stability
          // rule): a 2-dp value of this magnitude is exact in double,
          // and the driver's hash is decimal-representation-sensitive.
          round(col("value").cast("decimal(18,2)"), 2)
            .cast("double").as("value"))
        .orderBy("user_id", "signup_id", "purchase_id")
    },

    // Cohort retention: cohort = day of the user's first event; count
    // distinct active users per (cohort, day offset) and normalize by
    // the cohort's size. Per-user window + distinct ride one exchange;
    // the (cohort, offset) rollup shuffles a table bounded by days².
    Q("q_ev_retention", Some("""
      WITH base AS (
        SELECT user_id, CAST(ts AS DATE) AS d FROM events),
      c AS (
        SELECT *, min(d) OVER (PARTITION BY user_id) AS cohort_d FROM base),
      ua AS (
        SELECT DISTINCT user_id, cohort_d,
               date_diff('day', cohort_d, d) AS day_offset
        FROM c),
      agg AS (
        SELECT cohort_d, day_offset, count(*) AS n_active
        FROM ua GROUP BY 1, 2),
      sz AS (
        SELECT *, max(CASE WHEN day_offset = 0 THEN n_active END)
          OVER (PARTITION BY cohort_d) AS cohort_size
        FROM agg)
      SELECT cohort_d, CAST(day_offset AS INT) AS day_offset, n_active,
             cohort_size,
             round(CAST(n_active AS DOUBLE) / cohort_size, 9) AS retention
      FROM sz ORDER BY cohort_d, day_offset""")) { (s, dir) =>
      val wU = Window.partitionBy("user_id")
      val ev = t(s, dir, "events")
      ev.select(col("user_id"),
          to_date(graft.etl.EventTime.typedTs(ev)).as("d"))
        .withColumn("cohort_d", min("d").over(wU))
        .select(col("user_id"), col("cohort_d"),
          datediff(col("d"), col("cohort_d")).as("day_offset"))
        .distinct()
        .groupBy("cohort_d", "day_offset")
        .agg(count(lit(1)).as("n_active"))
        .withColumn("cohort_size",
          max(when(col("day_offset") === 0, col("n_active")))
            .over(Window.partitionBy("cohort_d")))
        .select(col("cohort_d"), col("day_offset"), col("n_active"),
          col("cohort_size"),
          round(col("n_active").cast("double") / col("cohort_size"), 9)
            .as("retention"))
        .orderBy("cohort_d", "day_offset")
    }
  )
}
