package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.RollingHashOps

/** Content-defined chunking (CDC) dedup — the storage-dedup family
  * member (Muthitacharoen et al. 2001, LBFS; simplified FastCDC): cut
  * each document at the positions where a Rabin-Karp k-gram hash of
  * the LOCAL bytes satisfies `h mod divisor == 0`, so chunk boundaries
  * are functions of CONTENT, not offsets. An insertion or deletion
  * re-aligns only the chunks it touches — unlike fixed-width blocks,
  * where one shifted byte invalidates every downstream block. Shared
  * chunks across documents are then exact-hash matches: dedup becomes
  * a fingerprint groupBy, no pair join anywhere (the same linear-cost
  * shape as the exact-substring family, but per content-aligned block
  * instead of per k-token gram).
  *
  * The boundary hash is the codegen'd O(len) `rolling_hash` expression
  * the winnowing family introduced; chunking itself is pure per-doc
  * array programming (map-only — it streams through the scan at any
  * corpus size). Expected chunk length ≈ `divisor` bytes.
  *
  * Hashes are over UTF-8 bytes and cuts index CHARACTERS; on the ASCII
  * fixtures byte == code point — the winnow/phash contract — which is
  * what makes the DuckDB twin (per-char `unicode()` with the same
  * coefficient table) exact.
  */
object Cdc {

  /** Per-doc chunk rows `(doc_id, chunk_idx, start_pos, chunk_len,
    * chunk_fp)` — chunk_idx 1-based in document order, start_pos
    * 0-based, chunk_fp the salted portable hash of the chunk text. */
  def chunks(docs: DataFrame, k: Int, divisor: Int): DataFrame = {
    val h = RollingHashOps.rollingHash(col("text"), k)
    val d = docs.select(col("doc_id"), col("text"), h.as("h"),
      length(col("text")).as("n"))
    // gram i (0-based byte start) ends a chunk when h(i) % divisor == 0:
    // the cut falls AFTER byte i+k-1, i.e. at 1-based prefix length i+k
    val idx = when(size(col("h")) > 0,
      sequence(lit(0), size(col("h")) - 1))
      .otherwise(array().cast("array<int>"))
    // clamp: the hash is byte-indexed but spans index CHARACTERS, so
    // on non-ASCII input a cut at byte i+k can exceed the char length
    // n — without the clamp that manufactures phantom chunks (empty
    // text, positive chunk_len, colliding empty fingerprints). With
    // it, non-ASCII degrades to oracle-divergence only (documented
    // ASCII contract), never internally inconsistent output.
    val cuts = filter(transform(
      filter(idx, i => element_at(col("h"), i + 1) % divisor === 0),
      i => i + k), c => c <= col("n"))
    // bounds: 0, every content cut, n — distinct + sorted (a cut at n
    // coincides with the tail bound)
    val bounds = array_sort(array_distinct(
      concat(array(lit(0)), cuts, array(col("n")))))
    val spans = when(size(bounds) >= 2,
      transform(sequence(lit(1), size(bounds) - 1),
        j => struct(element_at(bounds, j).as("s"),
          element_at(bounds, j + 1).as("e"))))
      .otherwise(array().cast("array<struct<s:int,e:int>>"))
    d.select(col("doc_id"), col("text"),
        posexplode(spans).as(Seq("ci", "sp")))
      .select(col("doc_id"), (col("ci") + 1).as("chunk_idx"),
        col("sp.s").as("start_pos"),
        (col("sp.e") - col("sp.s")).as("chunk_len"),
        TextOps.hashMod(concat(lit("cdc_"),
          col("text").substr(col("sp.s") + 1, col("sp.e") - col("sp.s"))))
          .as("chunk_fp"))
  }

  /** Per-doc dedup accounting over [[chunks]]: a chunk occurrence is a
    * DUPLICATE iff it is not the first occurrence of its fingerprint
    * in (doc_id, chunk_idx) order — the substring family's
    * first-occurrence-keeper convention, computed as a
    * map-side-combinable `min(struct)` per fingerprint (hot chunks
    * never concentrate on one task). */
  def dedupStats(chunkDf: DataFrame): DataFrame = {
    val first = chunkDf.groupBy("chunk_fp")
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("keeper"))
    chunkDf.join(first, "chunk_fp")
      .withColumn("is_dup",
        struct(col("doc_id"), col("chunk_idx")) =!= col("keeper"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum("chunk_len").as("n_bytes"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("dup_chunks"),
        sum(when(col("is_dup"), col("chunk_len").cast("long"))
          .otherwise(0L)).as("dup_bytes"))
      .withColumn("dup_ratio",
        round(col("dup_bytes").cast("double") / col("n_bytes"), 9))
  }
}
