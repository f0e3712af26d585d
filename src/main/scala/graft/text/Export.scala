package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data export sharding: the step between a curated corpus and
  * the tokenizer/loader — split the corpus into a fixed number of
  * shards, give every document a deterministic position inside its
  * shard, and emit per-shard manifests with content checksums so a
  * consumer can verify what it read (ref export shape:
  * src/mf_etl/gold/export.py:16-63, which writes one stacked dataset +
  * a JSON manifest; at corpus scale that single file becomes N shards
  * + N manifest rows).
  *
  * All assignment/order keys are *portable* md5 arithmetic
  * ([[TextOps.md5Hash64]]): reproducible across runs, clusters, and
  * engines — never RNG, never partition order, so re-exports are
  * byte-stable and the DuckDB oracle reproduces every row.
  *
  * Scale shape: assignment is map-only; the in-shard position window
  * partitions by shard_id — exactly the exchange + in-partition sort a
  * `repartition(shard_id).sortWithinPartitions(shuffle key)` writer
  * performs, so the plan IS the write plan. Size `nShards` so a shard
  * ≈ the target output file size; no stage ever holds more than one
  * shard. Manifests are one map-side-combined aggregate over the
  * assignment; checksums sum 31-bit hash residues (order-insensitive,
  * overflow-safe: 2^31 · corpus rows stays far inside int64).
  */
object Export {

  /** Per-doc shard assignment: `shard_id` hashes the doc id (uniform,
    * content-independent — a re-crawled doc keeps its shard), `pos` is
    * the doc's 1-based write position inside the shard in portable
    * shuffled order (`shuf_key`), the order a loader streams the shard
    * in. Requires (doc_id, text); keeps n_tokens for the manifest. */
  def shardAssign(docs: DataFrame, nShards: Int,
      salt: String = "shard"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val byShard = Window.partitionBy("shard_id")
      .orderBy(col("shuf_key"), col("doc_id"))
    docs.select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"),
        (TextOps.hashMod(concat(lit(s"${salt}_"),
          col("doc_id").cast("string"))) % nShards).as("shard_id"),
        md5(concat(lit("shuf_"), col("doc_id").cast("string"))
          .cast("binary")).as("shuf_key"),
        (TextOps.hashMod(concat(lit("fp_"), col("text")))).as("fp_h"))
      .withColumn("pos", row_number().over(byShard).cast("long"))
  }

  /** Rendezvous (highest-random-weight) shard of a doc-id column
    * (Thaler & Ravishankar 1998, "Using name-based mappings to
    * increase hit rates" — the consistent-assignment scheme behind
    * cache/object-store sharding): shard = argmax_s H(salt:doc:s).
    * Where mod-N remaps ~N/(N+1) of the corpus when a shard is added,
    * HRW remaps EXACTLY the docs whose winner becomes the new shard —
    * ~1/(N+1) — the property that matters when resharding means
    * MOVING a 100 TB corpus. Map-only: N portable mod-prime hashes
    * per row (the sharding family's hashMod convention — the oracle
    * twin is the shared hsql), argmax over the (weight, shard) pair
    * (totally ordered; a weight tie breaks to the larger shard id,
    * mirrored by the oracle's ORDER BY w DESC, s DESC). */
  def hrwShard(docId: org.apache.spark.sql.Column, nShards: Int,
      salt: String = "shard"): org.apache.spark.sql.Column =
    array_max(transform(sequence(lit(0), lit(nShards - 1)), s =>
      struct(TextOps.hashMod(
        concat_ws(":", lit(salt), docId, s)).as("w"),
        s.as("shard")))).getField("shard")

  /** Per-doc HRW assignment frame `(doc_id, shard_id)`. */
  def shardAssignHrw(docs: DataFrame, nShards: Int,
      salt: String = "shard"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    docs.select(col("doc_id"),
      hrwShard(col("doc_id"), nShards, salt).cast("long")
        .as("shard_id"))
  }

  /** Reshard-movement A/B at N → N+1, one row per strategy: the
    * fraction of documents whose shard changes when one shard is
    * added — mod-N's ~N/(N+1) vs HRW's ~1/(N+1). The row that prices
    * a reshard before anyone moves bytes. */
  def reshardMovement(docs: DataFrame, nShards: Int,
      salt: String = "shard"): DataFrame = {
    val ids = docs.select(col("doc_id"))
    // ONE hash per row for both modulos, and ONE (N+1)-entry weight
    // array for both HRW argmaxes (the N-shard winner is the argmax
    // over the array's first N entries — the N-shard weights are a
    // strict subset of the N+1 set, so hashing them twice would
    // double the map-side md5 work on the row billed as the 100 TB
    // question)
    val modRow = ids
      .select(TextOps.hashMod(concat(lit(s"${salt}_"),
        col("doc_id").cast("string"))).as("h"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("h") % nShards =!= col("h") % (nShards + 1))
          .cast("long")).as("n_moved"))
      .select(lit("mod").as("strategy"), col("n_docs"),
        col("n_moved"),
        round(col("n_moved").cast("double") / col("n_docs"), 9)
          .as("frac_moved"))
    val ws = transform(sequence(lit(0), lit(nShards)), s =>
      struct(TextOps.hashMod(
        concat_ws(":", lit(salt), col("doc_id"), s)).as("w"),
        s.as("shard")))
    val hrwRow = ids.select(ws.as("ws"))
      .agg(count(lit(1)).as("n_docs"),
        sum((array_max(slice(col("ws"), 1, nShards))
            .getField("shard")
          =!= array_max(col("ws")).getField("shard"))
          .cast("long")).as("n_moved"))
      .select(lit("hrw").as("strategy"), col("n_docs"),
        col("n_moved"),
        round(col("n_moved").cast("double") / col("n_docs"), 9)
          .as("frac_moved"))
    modRow.unionByName(hrwRow)
  }

  /** Per-shard manifest over a [[shardAssign]] frame: doc/token counts
    * and an order-insensitive content checksum (sum of per-doc 31-bit
    * text-hash residues mod the same prime) — equal corpora produce
    * equal manifests no matter how rows were partitioned. */
  def shardManifest(assigned: DataFrame): DataFrame =
    assigned.groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").cast("long").as("n_tokens"),
        min("doc_id").cast("long").as("min_doc"),
        max("doc_id").cast("long").as("max_doc"),
        (sum(col("fp_h")) % TextOps.HashPrime).cast("long")
          .as("content_checksum"))

  /** One-row shard balance report over a [[shardManifest]]: the
    * operational question hash-sharding answers — how even did the
    * split come out (the loader's stragglers are the max shard). */
  def shardBalance(manifest: DataFrame): DataFrame =
    manifest.agg(
      count(lit(1)).as("n_shards"),
      sum("n_docs").cast("long").as("total_docs"),
      sum("n_tokens").cast("long").as("total_tokens"),
      min("n_docs").cast("long").as("min_shard_docs"),
      max("n_docs").cast("long").as("max_shard_docs"),
      // max/even-share, phrased as exact-int ratio ×: double division
      // happens once (bit-parity with the SQL oracle's formulation)
      round(max("n_tokens").cast("double") * count(lit(1))
        / sum("n_tokens"), 9).as("max_token_skew"))
}
