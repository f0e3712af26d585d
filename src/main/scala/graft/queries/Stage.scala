package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Per-session memo of shared pipeline stages (grammar frame, trade
  * frame): several registered queries consume the same upstream chain;
  * without this each query re-runs indicators + grammar + the simulator.
  * Mirrors the reference's staged-artifact reuse (each layer persisted
  * once, consumed many times) — here as cached in-memory stages. */
object Stage {

  private val cache =
    scala.collection.concurrent.TrieMap.empty[(Int, String, String),
      DataFrame]

  def cached(spark: SparkSession, dir: String, name: String)(
      build: => DataFrame): DataFrame =
    cache.getOrElseUpdate(
      (System.identityHashCode(spark), dir, name),
      build.persist(StorageLevel.MEMORY_AND_DISK))
}
