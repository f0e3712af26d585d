package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}
import graft.text.TextOps

/** Streaming MinHash near-dup detection: flag documents whose LSH band
  * keys were already claimed by an earlier document — across micro-batch
  * boundaries — without ever joining against the full historical corpus.
  *
  * The batch operators aggregate shingle hashes per doc; in streaming
  * that groupBy would itself become a stateful aggregation, so here the
  * whole signature is computed PER ROW with array expressions
  * (`shingles` is an array column; each minhash component is an
  * `array_min(transform(...))`). The only state is one first-claimant
  * doc id per band key, held by `flatMapGroupsWithState` — exactly the
  * state a 100-TB incremental dedup keeps in its key-value store.
  *
  * Emits one row per (band, new_doc) collision: the new doc, the band
  * index, and the doc that first claimed the key. Downstream policy
  * (drop, cluster, review) aggregates per doc; same-batch ties break by
  * doc id so replays are deterministic.
  *
  * State sizing at corpus scale: the claimant index IS the dedup state,
  * so it never expires (NoTimeout is by design) and grows one LONG per
  * distinct (band, key) — far beyond executor heap at 100 TB. Run it on
  * the disk-backed RocksDB state store
  * (`spark.sql.streaming.stateStore.providerClass =
  * ...state.RocksDBStateStoreProvider`), which keeps working-set memory
  * bounded and checkpoints incrementally; StreamingSpec locks the
  * operator green on that provider.
  */
object StreamingDedup {

  case class BandRow(doc_id: Long, band_idx: Int, band_key: String)

  case class Match(doc_id: Long, band_idx: Int, first_doc: Long)

  /** Per-row minhash signature bands (no aggregation — streaming-safe).
    * Band b's key concatenates `rowsPerBand` adjacent minhash
    * components, mirroring Dedup.minhashLshPairs' banding. */
  def bandKeys(text: org.apache.spark.sql.Column, n: Int,
      rowsPerBand: Int = 2): org.apache.spark.sql.Column = {
    val sh = TextOps.shingles(text, n)
    val comps = TextOps.MinHashParams.map { case (a, b) =>
      array_min(transform(sh,
        s => (TextOps.hashMod(s) * a + b) % TextOps.HashPrime))
    }
    val nBands = TextOps.MinHashParams.size / rowsPerBand
    array((0 until nBands).map { band =>
      struct(lit(band).as("band_idx"),
        concat_ws("_",
          (band * rowsPerBand until (band + 1) * rowsPerBand)
            .map(comps): _*).as("band_key"))
    }: _*)
  }

  /** Watermark-bounded exact dedup — the bounded-state alternative to
    * the ever-growing claimant index: when re-ingestion duplicates only
    * arrive within a known lateness horizon (retries, at-least-once
    * upstreams), `dropDuplicatesWithinWatermark` keeps a fingerprint's
    * state only until the event-time watermark passes it + `delay`.
    * State is O(distinct docs per horizon), not O(corpus) — no RocksDB
    * requirement; the tradeoff is that a duplicate arriving beyond the
    * horizon is re-admitted (StreamingSpec locks both behaviors). */
  def exactDedupWithinWatermark(docs: DataFrame, tsCol: String,
      delay: String): DataFrame =
    docs.withColumn("fp", md5(col("text").cast("binary")))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fp")

  /** docs(doc_id, text) stream → (doc_id, band_idx, first_doc) match
    * stream. State: first claimant per (band_idx, band_key) — the SAME
    * composite the batch minhashLshPairs joins on; keying by the key
    * string alone would let equal keys in different bands collide. Docs
    * shorter than the shingle width have no signature (every component
    * would be null and the keys would all collapse to ""), so they are
    * excluded up front, matching the batch operator. */
  def nearDupMatches(docs: DataFrame, n: Int): Dataset[Match] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bands = docs
      .filter(size(TextOps.shingles(col("text"), n)) > 0)
      .select(col("doc_id"),
        explode(bandKeys(col("text"), n)).as("bk"))
      .select(col("doc_id"), col("bk.band_idx"), col("bk.band_key"))
      .as[BandRow]
    bands.groupByKey(r => (r.band_idx, r.band_key))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (_: (Int, String), rows: Iterator[BandRow],
            state: GroupState[Long]) =>
          val sorted = rows.toArray.sortBy(_.doc_id)
          val out = scala.collection.mutable.ArrayBuffer.empty[Match]
          var first = state.getOption.getOrElse(-1L)
          sorted.foreach { r =>
            if (first < 0) first = r.doc_id
            else if (r.doc_id != first)
              out += Match(r.doc_id, r.band_idx, first)
          }
          state.update(first)
          out.iterator
      }
  }
}
