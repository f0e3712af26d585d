package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Stateful streaming form of the signal machine (`backtest.Signals`
  * semantics, ref backtest/signals.py:20-242): per-ticker confirm-streak
  * tracking via `flatMapGroupsWithState`, so entry signals emit
  * incrementally as bars arrive and the streak survives micro-batch
  * boundaries. The batch engine keeps the window-expressible form (stays
  * in whole-stage codegen); this operator exists for the streaming
  * deployment where per-key state must persist between triggers.
  *
  * Contract (mirrors Signals.generate):
  *  - side: states 1/2 → +1, 3/4 → -1, else 0;
  *  - eligible: persistent states 2/4;
  *  - state_streak: consecutive bars in the current state (resets on
  *    change, continues across micro-batches via GroupState);
  *  - state_entry: eligible && streak >= confirm;
  *    state_transition_entry: eligible && streak == confirm.
  */
object StreamingSignals {

  case class SigIn(ticker: String, bar_ts: Long, bar_id: Long,
    flow_state_code: Int)

  case class SigOut(ticker: String, bar_ts: Long, bar_id: Long,
    flow_state_code: Int, side: Int, state_streak: Int,
    entry_signal: Boolean, signal_side: Int)

  case class StreakState(lastCode: Int, streak: Int)

  def signals(in: Dataset[SigIn], mode: String,
      confirmBars: Int): Dataset[SigOut] = {
    val spark = in.sparkSession
    import spark.implicits._
    in.groupByKey(_.ticker)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (tk: String, rows: Iterator[SigIn],
            state: GroupState[StreakState]) =>
          // bars within a micro-batch are sorted per key; the carry-over
          // streak comes from the persisted state
          val sorted = rows.toArray.sortBy(r => (r.bar_ts, r.bar_id))
          var st = state.getOption.getOrElse(StreakState(Int.MinValue, 0))
          val out = sorted.map { r =>
            val streak =
              if (r.flow_state_code == st.lastCode) st.streak + 1 else 1
            st = StreakState(r.flow_state_code, streak)
            val side = r.flow_state_code match {
              case 1 | 2 => 1
              case 3 | 4 => -1
              case _ => 0
            }
            val eligible =
              r.flow_state_code == 2 || r.flow_state_code == 4
            val entry = mode match {
              case "state_entry" => eligible && streak >= confirmBars
              case "state_transition_entry" =>
                eligible && streak == confirmBars
              case other => throw new IllegalArgumentException(
                s"unknown signal mode: $other")
            }
            SigOut(tk, r.bar_ts, r.bar_id, r.flow_state_code, side,
              streak, entry, if (entry) side else 0)
          }
          state.update(st)
          out.iterator
      }
  }

  /** Typed adapter from a state-labeled bar frame. */
  def fromFrame(df: DataFrame): Dataset[SigIn] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("ticker").cast("string"), col("bar_ts").cast("long"),
        col("bar_id").cast("long"), col("flow_state_code").cast("int"))
      .as[SigIn]
  }
}
