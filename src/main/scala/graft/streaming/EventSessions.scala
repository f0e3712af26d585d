package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Cols

/** Gap-based sessionization via Spark's NATIVE `session_window` — the
  * built-in merging session operator (no custom state function needed):
  * events whose timestamps are closer than `gap` merge into one session;
  * the window end is the last event time + `gap`.
  *
  * The same program runs batch or streaming: in streaming, call
  * `withWatermark` on the timestamp column first and the aggregation
  * emits a session exactly once, when the watermark passes its end —
  * Spark's session-window state store handles cross-micro-batch merging
  * (two halves of one session arriving in different batches come out as
  * ONE row). State is bounded by open sessions per user, expired by the
  * watermark — no unbounded claimant index.
  *
  * Split semantics vs the analytic sessionizer (EventQueries
  * `q_ev_sessions`): `session_window` starts a new session when the gap
  * is >= `gap` (merge condition is next.ts < last.ts + gap, strictly);
  * the lag-flag formulation splits on gap > threshold. They coincide on
  * any data without a gap exactly equal to the threshold.
  */
object EventSessions {

  /** groupBy(user_id, session_window(ts, gap)) with the standard session
    * aggregates. Money-convention sum (exact DECIMAL accumulation) keeps
    * the result independent of partition/combine order. */
  def sessionize(events: DataFrame, tsCol: String, gap: String,
      keyCol: String = "user_id", valueCol: String = "value"): DataFrame =
    events
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"),
        Cols.moneySum(col(valueCol)).as("sum_value"))
      .select(col(keyCol),
        col("session_window.start").as("win_start"),
        col("session_window.end").as("win_end"),
        col("n_events"), col("sum_value"))
}
