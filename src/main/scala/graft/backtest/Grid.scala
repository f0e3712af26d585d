package graft.backtest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sensitivity grid runner
  * (ref: src/mf_etl/backtest/sensitivity_runner.py:494-…,
  * configs/settings.yaml backtest_sensitivity.max_combos=500):
  * a driver loop over parameter combos, each an independent Spark job —
  * embarrassingly parallel; on a cluster combos run as concurrent jobs
  * from a driver thread pool against the shared cached signal frame.
  */
object Grid {

  case class Combo(mode: String, confirmBars: Int, holdBars: Int,
    feeBps: Double)

  /** `backtest_sensitivity.max_combos` via Settings (yaml default 500). */
  def MaxCombos: Int = graft.Settings.sensitivity.maxCombos

  /** Cartesian combo expansion, capped like the reference. */
  def combos(modes: Seq[String], confirms: Seq[Int], holds: Seq[Int],
      fees: Seq[Double]): Seq[Combo] = {
    val all = for {
      m <- modes; c <- confirms; h <- holds; f <- fees
    } yield Combo(m, c, h, f)
    all.take(MaxCombos)
  }

  /** Run every combo: signals → trades → headline summary, one row per
    * combo. `gram` is the state-labeled bar frame (cache it upstream). */
  def run(gram: DataFrame, cs: Seq[Combo]): DataFrame = {
    val results = cs.map { c =>
      val sig = Signals.generate(gram, c.mode, c.confirmBars)
      val trades = Engine.simulate(sig,
        Engine.Config(c.holdBars, c.feeBps)).toDF()
      Metrics.summary(trades, Seq.empty)
        .withColumn("mode", lit(c.mode))
        .withColumn("confirm_bars", lit(c.confirmBars))
        .withColumn("hold_bars", lit(c.holdBars))
        .withColumn("fee_bps", lit(c.feeBps))
    }
    results.reduce(_.unionByName(_))
  }
}
