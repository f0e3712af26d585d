package graft.queries

import org.apache.spark.sql.SparkSession

/** Concurrent materialization of the shared Stage caches.
  *
  * The registered queries share ~15 cached stages (slim grammar/labels,
  * the 8 per-combo trade sims, bootstrap draws, the scored combo frame).
  * A sequential query loop builds them one at a time, leaving the
  * cluster idle between jobs and charging each cache's build cost to
  * whichever consumer happens to run first. Prewarming submits the
  * builds as concurrent Spark jobs in dependency phases — on a real
  * cluster this is exactly how the reference's staged artifacts are
  * produced (each layer persisted once, consumed many times), and on
  * local[32] it turns the serial cache-population tail into one
  * all-cores phase. */
object Warmup {

  /** Materialize shared stages in dependency order (phases run their
    * members concurrently). Safe to call more than once — Stage.cached
    * memoizes. */
  def prewarm(spark: SparkSession, dir: String): Unit = {
    graft.SparkEntry.tune(spark)
    def phase(builds: Seq[() => Any]): Unit =
      graft.ops.Pools.awaitAll(builds)

    // phase 1: chain roots (one hash exchange each, disjoint inputs)
    phase(Seq(
      () => Stage.slimGrammar(spark, dir).count(),
      () => Stage.slimFwd(spark, dir).count(),
      () => BacktestQueries2.gramSlim(spark, dir).count()))

    // phase 2: consumers of the roots — per-combo sims, bootstrap draw
    // tables, day windows, the slim signal frame
    phase(
      BacktestQueries2.GridCombos.map(c =>
        () => BacktestQueries2.comboTrades(spark, dir, c).count())
        ++ Seq(
          () => Stage.slimSignals(spark, dir).count(),
          () => ResearchQueries.bootStats(spark, dir).count(),
          () => ResearchQueries.bootPair(spark, dir).count(),
          () => ResearchQueries.dayWindows(spark, dir).count(),
          () => CalibrationQueries.calBase(spark, dir).count()))

    // phase 3: the scored combo frame (needs all 8 sims) + the
    // calibration sweep grid (needs the calibration base) + the hybrid
    // runs' scored grids (each materializes its own gated sims
    // concurrently)
    phase(Seq(
      () => BacktestQueries2.comboScored(spark, dir).count(),
      () => CalibrationQueries.calGrid(spark, dir).count(),
      () => HybridQueries.wfMetrics(spark, dir).count())
      ++ HybridQueries.Runs.map(r =>
        () => HybridQueries.runScored(spark, dir, r).count()))
  }
}
