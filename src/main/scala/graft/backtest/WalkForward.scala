package graft.backtest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Walk-forward evaluation (ref: the walk-forward runner layered on the
  * grid, src/mf_etl/backtest/ — driver loop over rolling train/test
  * windows): indicators/states are causal, so they are computed once over
  * the full history; each split then simulates trades on its own test
  * window and reports the summary. Splits are independent Spark jobs.
  */
object WalkForward {

  case class Split(idx: Int, testStartTs: Long, testEndTs: Long)

  /** Rolling, non-overlapping test windows covering (minTs, maxTs]. */
  def splits(minTs: Long, maxTs: Long, nSplits: Int): Seq[Split] = {
    require(nSplits > 0 && maxTs > minTs)
    val step = (maxTs - minTs) / nSplits
    (0 until nSplits).map { i =>
      val start = minTs + i * step
      val end = if (i == nSplits - 1) maxTs else minTs + (i + 1) * step
      Split(i, start, end)
    }
  }

  /** Per-split trade summaries: signals computed on the full (causal)
    * state frame, simulation restricted to the split's test window. */
  def run(signals: DataFrame, ss: Seq[Split],
      cfg: Engine.Config): DataFrame = {
    val results = ss.map { sp =>
      val windowed = signals.filter(
        col("bar_ts") > sp.testStartTs && col("bar_ts") <= sp.testEndTs)
      val trades = Engine.simulate(windowed, cfg).toDF()
      Metrics.summary(trades, Seq.empty)
        .withColumn("split_idx", lit(sp.idx))
        .withColumn("test_start_ts", lit(sp.testStartTs))
        .withColumn("test_end_ts", lit(sp.testEndTs))
    }
    results.reduce(_.unionByName(_))
  }
}
