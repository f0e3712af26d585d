package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Multimodal column plumbing: media payloads are opaque `binary` columns
  * with typed metadata travelling alongside. The Spark-side machinery —
  * schema, batched partition-wise processing, frame-index explosion — is
  * real, and the codec is a PLUGGABLE seam ([[Multimodal.MediaDecoder]]):
  * the default [[Multimodal.StubDecoder]] derives deterministic
  * dimensions from content hashes (image/audio libraries are not
  * available in this environment), while
  * [[Multimodal.PngHeaderDecoder]] parses real PNG IHDR headers from
  * payload bytes — proving a production deployment swaps in a JNI/FFI
  * codec inside the same `mapPartitions` batch loop without touching
  * any plan shape (MultimodalSpec exercises both).
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

  /** One decoded payload: byte length, content checksum, and the
    * parsed (or derived) pixel dimensions. */
  final case class Decoded(byteLen: Int, checksum: Long, width: Int,
    height: Int)

  /** The pluggable codec seam for the batched extraction path: a
    * decoder receives a WHOLE batch in one call (so a vectorized/JNI
    * codec amortizes its per-call overhead) and returns one feature
    * row per payload, in order. Implementations must be Serializable —
    * the decoder object ships to executors and is resolved once per
    * partition, not per row. */
  trait MediaDecoder extends Serializable {
    def decodeBatch(batch: Array[Array[Byte]]): Array[Decoded]
  }

  /** 60-bit md5 of raw bytes — the JVM-side twin of
    * `TextOps.md5Hash64` (first 15 hex digits as an int). */
  private def md5Bits60(bytes: Array[Byte]): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** STUB decoder — media libraries are not available in this
    * environment, so dimensions derive from content hashes with
    * EXACTLY the [[fakeWidth]]/[[fakeHeight]] arithmetic (payloads are
    * utf-8 text bytes, so the reversed-string height is computable
    * here too). MultimodalSpec locks this batch path against the
    * codegen expression path, proving the two formulations agree. */
  object StubDecoder extends MediaDecoder {
    def decodeBatch(batch: Array[Array[Byte]]): Array[Decoded] =
      batch.map { bytes =>
        val checksum = bytes.foldLeft(0L)((a, b) =>
          (a * 31 + (b & 0xff)) % 1000000007L)
        val w = (md5Bits60(bytes) % 576 + 64).toInt
        val rev = new String(bytes, "UTF-8").reverse.getBytes("UTF-8")
        val h = (md5Bits60(rev) % 416 + 64).toInt
        Decoded(bytes.length, checksum, w, h)
      }
  }

  /** A REAL header-parsing decoder — proof the seam carries an actual
    * codec, not only the stub: parses the PNG signature + IHDR chunk
    * (big-endian width/height at offsets 16/20) straight from payload
    * bytes, no imaging library involved. Non-PNG payloads decode to
    * (-1, -1) dimensions instead of throwing — a production batch
    * pipeline quarantines bad media rows, it doesn't die on them. */
  object PngHeaderDecoder extends MediaDecoder {
    private val Sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a,
      0x0a).map(_.toByte)
    private def be32(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    def decodeBatch(batch: Array[Array[Byte]]): Array[Decoded] =
      batch.map { bytes =>
        val checksum = bytes.foldLeft(0L)((a, b) =>
          (a * 31 + (b & 0xff)) % 1000000007L)
        val isPng = bytes.length >= 24 &&
          bytes.take(8).sameElements(Sig) &&
          new String(bytes.slice(12, 16), "US-ASCII") == "IHDR"
        if (isPng)
          Decoded(bytes.length, checksum, be32(bytes, 16),
            be32(bytes, 20))
        else Decoded(bytes.length, checksum, -1, -1)
      }
  }

  /** Batched partition-wise decode — the Scala analogue of mapInPandas:
    * rows are processed in fixed-size batches per partition through the
    * [[MediaDecoder]] seam, so swapping the stub for a JNI/FFI codec
    * touches zero plan shape. Returns
    * (doc_id, byte_len, checksum, width, height). */
  def decodeFeaturesBatched(media: DataFrame, batchSize: Int,
      decoder: MediaDecoder): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val in = media.select(col("doc_id").cast("long"),
      col("payload").cast("binary")).as[(Long, Array[Byte])]
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val ids = batch.map(_._1)
        val decoded = decoder.decodeBatch(batch.map(_._2).toArray)
        ids.lazyZip(decoded).map { case (id, d) =>
          (id, d.byteLen, d.checksum, d.width, d.height)
        }
      }
    }.toDF("doc_id", "byte_len", "checksum", "width", "height")
  }

  /** The original driver-checked extraction contract (doc_id, byte_len,
    * checksum) — now a projection of the decoder-seam path under the
    * stub, so the oracle rows are untouched while the seam underneath
    * is the swappable one. */
  def extractFeaturesBatched(media: DataFrame, batchSize: Int): DataFrame =
    decodeFeaturesBatched(media, batchSize, StubDecoder)
      .select("doc_id", "byte_len", "checksum")
}
