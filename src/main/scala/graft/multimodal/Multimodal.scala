package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Multimodal column plumbing: media payloads are opaque `binary` columns
  * with typed metadata travelling alongside. The Spark-side machinery —
  * schema, batched partition-wise processing, frame-index explosion — is
  * real; the codec itself is a STUB (`fakeDecode`): image/audio libraries
  * are not available in this environment, so "decoding" derives
  * deterministic dimensions from a content hash. A production deployment
  * swaps `fakeDecode` for a JNI/FFI codec inside the same `mapPartitions`
  * batch loop without touching any plan shape.
  */
object Multimodal {

  /** Attach a binary payload column (here: utf-8 bytes of `text`, standing
    * in for image/audio bytes). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8"))

  /** STUB decode — deterministic fake metadata from a content hash.
    * Real implementation would parse the media header here. */
  def fakeWidth(payload: Column): Column =
    (TextOps.md5Hash64(payload) % 576 + 64).cast("int")

  /** Height from the reversed source string (payload bytes reversed would
    * be codec territory; the stub stays in portable string space). */
  def fakeHeight(text: Column): Column =
    (TextOps.md5Hash64(reverse(text)) % 416 + 64).cast("int")

  /** Frame count proxy: 1 frame per 256 payload bytes. */
  def nFrames(payload: Column): Column =
    floor(length(payload) / lit(256.0)).cast("int") + 1

  /** Decode metadata for each media row (expression path — codegen'd). */
  def decodeMeta(media: DataFrame): DataFrame =
    media.select(col("doc_id"),
      length(col("payload")).as("byte_len"),
      fakeWidth(col("payload")).as("width"),
      fakeHeight(col("text")).as("height"),
      nFrames(col("payload")).as("n_frames"),
      (col("doc_id") % 32).as("batch_id"))

  /** Frame sampling: one row per sampled frame index (every `step`-th). */
  def frameSample(meta: DataFrame, step: Int): DataFrame =
    meta.select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step)))
          .as("frame_idx"))

  /** Batched partition-wise feature extraction — the Scala analogue of
    * mapInPandas: rows are processed in fixed-size batches per partition so
    * a vectorized/FFI codec can amortize per-call overhead. The extractor
    * here is the stub hash; the batching shape is the real contract. */
  def extractFeaturesBatched(media: DataFrame, batchSize: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val in = media.select(col("doc_id").cast("long"),
      col("payload").cast("binary")).as[(Long, Array[Byte])]
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // STUB: a real codec would decode `batch` in one vectorized call.
        batch.map { case (id, bytes) =>
          val checksum = bytes.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff))
            % 1000000007L)
          (id, bytes.length, checksum)
        }
      }
    }.toDF("doc_id", "byte_len", "checksum")
  }
}
