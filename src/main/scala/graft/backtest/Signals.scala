package graft.backtest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.Wins

/** Signal generation over state-labeled bars
  * (ref: src/mf_etl/backtest/signals.py:20-242): three entry modes that
  * differ only in the entry predicate, evaluated per (ticker, bar):
  *
  *  - `state_entry`: in an eligible state with a confirm streak ≥ N
  *  - `state_transition_entry`: same, but only on the bar where the streak
  *    first reaches N (fresh transition)
  *
  * Everything is window-expressible (streak = run length of the current
  * state), so signals stay in whole-stage codegen — the sequential trade
  * simulator is the only typed kernel (Engine).
  *
  * Direction mapping (ref: backtest/state_mapping.py): state 1/2 (early/
  * persistent demand) → long (+1); 3/4 → short (-1); persistent states
  * only are signal-eligible.
  */
object Signals {

  private val W = Window.partitionBy("ticker").orderBy("bar_ts", "bar_id")

  /** Adds side / streak / signal columns to state-labeled bars
    * (`flow_state_code` required). */
  def generate(bars: DataFrame, mode: String, confirmBars: Int): DataFrame = {
    val side = when(col("flow_state_code").isin(1, 2), 1)
      .when(col("flow_state_code").isin(3, 4), -1).otherwise(0)
    val eligible = col("flow_state_code").isin(2, 4)
    val df = bars
      .withColumn("side", side)
      .withColumn("signal_eligible", eligible)
      .withColumn("state_island", Wins.runId(col("flow_state_code"), W))
      .withColumn("state_streak", row_number().over(
        Window.partitionBy("ticker", "state_island")
          .orderBy("bar_ts", "bar_id")))
    val entry = mode match {
      case "state_entry" =>
        col("signal_eligible") && col("state_streak") >= confirmBars
      case "state_transition_entry" =>
        col("signal_eligible") && col("state_streak") === confirmBars
      case other =>
        throw new IllegalArgumentException(s"unknown signal mode: $other")
    }
    df.withColumn("entry_signal", entry)
      .withColumn("signal_side", when(col("entry_signal"), col("side")))
  }

  /** Oracle SQL: same program over the `grammar` CTE (needs
    * flow_state_code) joined back to `bars` for prices. Emits CTE
    * `signals`. */
  def sql(mode: String, confirmBars: Int): String = {
    val w = "PARTITION BY ticker ORDER BY bar_ts, bar_id"
    val cum = s"$w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    val entry = mode match {
      case "state_entry" => s"signal_eligible AND state_streak >= $confirmBars"
      case "state_transition_entry" =>
        s"signal_eligible AND state_streak = $confirmBars"
    }
    s"""
      sg0 AS (
        SELECT g.ticker, g.bar_ts, g.bar_id, g.flow_state_code,
               b.open, b.high, b.low, b.close,
               CASE WHEN g.flow_state_code IN (1, 2) THEN 1
                    WHEN g.flow_state_code IN (3, 4) THEN -1
                    ELSE 0 END AS side,
               g.flow_state_code IN (2, 4) AS signal_eligible,
               CASE WHEN lag(g.flow_state_code) OVER (PARTITION BY g.ticker
                      ORDER BY g.bar_ts, g.bar_id) IS NULL
                    OR g.flow_state_code <> lag(g.flow_state_code)
                      OVER (PARTITION BY g.ticker
                            ORDER BY g.bar_ts, g.bar_id)
                    THEN 1 ELSE 0 END AS chg
        FROM grammar g JOIN bars b USING (ticker, bar_ts, bar_id)),
      sg1 AS (
        SELECT *, sum(chg) OVER ($cum) AS state_island FROM sg0),
      sg2 AS (
        SELECT *, CAST(row_number() OVER (PARTITION BY ticker, state_island
          ORDER BY bar_ts, bar_id) AS INT) AS state_streak FROM sg1),
      signals AS (
        SELECT ticker, bar_ts, bar_id, flow_state_code, side,
               signal_eligible, state_streak,
               open, high, low, close,
               ($entry) AS entry_signal,
               CASE WHEN ($entry) THEN side END AS signal_side
        FROM sg2)"""
  }
}
