package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Per-session memo of shared pipeline stages (grammar frame, trade
  * frame): several registered queries consume the same upstream chain;
  * without this each query re-runs indicators + grammar + the simulator.
  * Mirrors the reference's staged-artifact reuse (each layer persisted
  * once, consumed many times) — here as cached in-memory stages.
  *
  * Only SLIM projections are cached: the wide grammar frame stays
  * uncached so per-query column pruning still reaches the scan; the
  * cached frames are a handful of narrow columns (keys + state + close),
  * which is what every downstream consumer actually reads. `clear()` is
  * the per-run eviction hook (called by the Verify/Bench mains) so a
  * long-lived session doesn't accumulate persisted frames.
  */
object Stage {

  private val cache =
    scala.collection.concurrent.TrieMap.empty[(Int, String, String),
      DataFrame]

  /** Memoized, lineage-truncated stage. localCheckpoint (eager,
    * MEMORY_AND_DISK blocks) instead of persist(): a persisted frame
    * keeps its FULL logical plan, so every downstream transformation
    * re-analyzes the whole upstream chain and wide consumers (hardening,
    * candidate rerun) were spending 10s+ of pure driver-side analysis
    * per query build. Checkpointing collapses the stage to a LogicalRDD
    * leaf — consumers plan against an O(1) tree, and CacheManager
    * plan-matching cost disappears with it.
    *
    * When the sf dir is a recognized dataset root (basename `sf*` —
    * test tmp-fixtures skip disk), the stage additionally routes
    * through [[persisted]]: fitted artifacts are stored once on disk
    * and reloaded content-addressed on later runs instead of re-fit
    * (see [[Artifacts]]). */
  def cached(spark: SparkSession, dir: String, name: String)(
      build: => DataFrame): DataFrame =
    if (Artifacts.enabledFor(dir)) persisted(spark, dir, name)(build)
    else cache.getOrElseUpdate(
      (System.identityHashCode(spark), dir, name),
      build.localCheckpoint())

  /** Disk-persisted fitted-artifact layer under the session memo — the
    * production pattern for expensive TRAINED artifacts (Lloyd
    * codebooks, tokenizer vocabs, kNN/HNSW graphs): fit once, store,
    * serve many runs. Keyed by (sf dir, stage name, fingerprint) where
    * the fingerprint hashes the input parquet BYTES, every value-
    * affecting GRAFT_* knob, and a code epoch — any of those changing
    * recomputes; identical inputs reload in parquet-scan time instead
    * of re-running the iterative fit chain (the r14 warmup was 712 s,
    * ~all of it re-fitting unchanged artifacts). The build path also
    * serves the READ-BACK frame, so hit and miss rounds consume
    * byte-identical artifacts. GRAFT_ARTIFACT_CACHE=0 disables. */
  /** Per-artifact-path write locks: TrieMap.getOrElseUpdate may run a
    * contended default twice (atomic insert, non-exclusive compute) —
    * harmless when both results were in-memory frames, corrupting when
    * both are Spark writers on ONE directory. Stage dependencies form
    * a DAG, so nested builds acquire locks in topological order —
    * no deadlock. */
  private val diskLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def persisted(spark: SparkSession, dir: String, name: String)(
      build: => DataFrame): DataFrame =
    cache.getOrElseUpdate(
      (System.identityHashCode(spark), dir, "disk:" + name), {
        if (!Artifacts.enabled) build.localCheckpoint()
        else {
          val path = Artifacts.path(dir, name)
          val lock = diskLocks.computeIfAbsent(path, _ => new Object)
          lock.synchronized {
            if (new java.io.File(path, "_SUCCESS").isFile)
              Artifacts.noteHit(name)
            else {
              Artifacts.evictSiblings(dir, name)
              Artifacts.noteBuild(name)
              build.write.mode("overwrite")
                .option("compression", "zstd").parquet(path)
            }
            spark.read.parquet(path).localCheckpoint()
          }
        }
      })

  /** Drop every memoized stage (end-of-run eviction). Checkpointed
    * block storage is released by the ContextCleaner once the dropped
    * DataFrame references are GC'd; unpersist() additionally clears any
    * CacheManager entries (e.g. the CC edge cache). */
  def clear(): Unit = {
    cache.values.foreach(_.unpersist(blocking = false))
    cache.clear()
    graft.ops.CacheReg.clear()
  }

  /** Slim grammar projection shared by the validation/research/ML
    * harness (~12 queries): one hash exchange on ticker builds the
    * indicators→grammar chain ONCE; consumers prune from seven narrow
    * columns instead of re-running the chain per query. */
  def slimGrammar(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "slim_grammar") {
      graft.etl.EventGrammar.build(graft.etl.Indicators.twiggs(
        graft.etl.MarketData.barsFromEvents(
          spark.read.parquet(s"$dir/events.parquet"))))
        .select("ticker", "bar_ts", "bar_id", "flow_state_code",
          "flow_state_label", "tmf_event_activity_20", "close")
    }

  /** Slim forward-label projection (keys + fwd_ret_10), shared by the
    * profile/bootstrap/hardening queries. */
  def slimFwd(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "slim_fwd") {
      val bars = graft.etl.MarketData.barsFromEvents(
        spark.read.parquet(s"$dir/events.parquet"))
      graft.etl.ForwardLabels.oracleProjection(
          graft.etl.ForwardLabels.build(bars))
        .select("ticker", "bar_ts", "bar_id", "fwd_ret_10")
    }

  /** Slim signal frame for the default combo (state_entry, confirm 2),
    * built over the cached slim grammar stage — shared by walk-forward
    * and the run-compare family. */
  def slimSignals(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "signals_slim") {
      graft.backtest.Signals.generate(
          BacktestQueries2.gramSlim(spark, dir), "state_entry", 2)
        .select("ticker", "bar_ts", "bar_id", "open", "high", "low",
          "close", "flow_state_code", "entry_signal", "signal_side")
    }
}
