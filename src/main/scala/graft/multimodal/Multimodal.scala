package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
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

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a,
    0x0a).map(_.toByte)
  private val JpegSig = Array(0xff, 0xd8).map(_.toByte)
  private val RiffSig = "RIFF".getBytes("US-ASCII")
  private val WaveSig = "WAVE".getBytes("US-ASCII")

  /** Container-format dispatch from magic bytes — the routing column a
    * mixed-media lake partitions its decode fan-out by (png / jpeg /
    * wav / other). Pure codegen'd byte-prefix compares; the SQL oracle
    * is the same prefix test over the encoded payload blob. */
  def mediaFormat(payload: Column): Column =
    when(substring(payload, 1, 8) === lit(PngSig), "png")
      .when(substring(payload, 1, 2) === lit(JpegSig), "jpeg")
      .when(substring(payload, 1, 4) === lit(RiffSig) &&
        substring(payload, 9, 4) === lit(WaveSig), "wav")
      .otherwise("other")

  /** Decode metadata for each media row (expression path — codegen'd). */
  def decodeMeta(media: DataFrame): DataFrame =
    media.select(col("doc_id"),
      length(col("payload")).as("byte_len"),
      mediaFormat(col("payload")).as("media_format"),
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
    private[multimodal] def decodeOne(bytes: Array[Byte]): Decoded = {
      val w = (md5Bits60(bytes) % 576 + 64).toInt
      val rev = new String(bytes, "UTF-8").reverse.getBytes("UTF-8")
      val h = (md5Bits60(rev) % 416 + 64).toInt
      Decoded(bytes.length, byteChecksum(bytes), w, h)
    }
    def decodeBatch(batch: Array[Array[Byte]]): Array[Decoded] =
      batch.map(decodeOne)
  }

  /** A REAL header-parsing decoder — proof the seam carries an actual
    * codec, not only the stub: parses the PNG signature + IHDR chunk
    * (big-endian width/height at offsets 16/20) straight from payload
    * bytes, no imaging library involved. Non-PNG payloads decode to
    * (-1, -1) dimensions instead of throwing — a production batch
    * pipeline quarantines bad media rows, it doesn't die on them. */
  private def byteChecksum(bytes: Array[Byte]): Long =
    bytes.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)

  object PngHeaderDecoder extends MediaDecoder {
    private def be32(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    private[multimodal] def decodeOne(bytes: Array[Byte]): Decoded = {
      val isPng = bytes.length >= 24 &&
        bytes.take(8).sameElements(PngSig) &&
        new String(bytes.slice(12, 16), "US-ASCII") == "IHDR"
      if (isPng)
        Decoded(bytes.length, byteChecksum(bytes), be32(bytes, 16),
          be32(bytes, 20))
      else Decoded(bytes.length, byteChecksum(bytes), -1, -1)
    }
    def decodeBatch(batch: Array[Array[Byte]]): Array[Decoded] =
      batch.map(decodeOne)
  }

  /** JPEG SOF0-family dimension parser — the second REAL codec behind
    * the seam, proving the FFI carry generalizes past one format: walks
    * the JFIF marker stream (each non-standalone segment carries a
    * 2-byte big-endian length including itself) to the first
    * start-of-frame marker (0xC0–0xCF minus the non-SOF 0xC4/0xC8/0xCC)
    * and reads height/width from the frame header (offsets +3/+5 past
    * the marker: length(2) + sample precision(1) precede them).
    * Malformed or non-JPEG payloads quarantine to (-1, -1) — same
    * policy as the PNG decoder. */
  object JpegSof0Decoder extends MediaDecoder {
    private def be16(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
    private[multimodal] def decodeOne(bytes: Array[Byte]): Decoded = {
      val cs = byteChecksum(bytes)
      if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff
          || (bytes(1) & 0xff) != 0xd8)
        return Decoded(bytes.length, cs, -1, -1)
      var i = 2
      while (i + 3 < bytes.length) {
        if ((bytes(i) & 0xff) != 0xff)
          return Decoded(bytes.length, cs, -1, -1) // lost marker sync
        val marker = bytes(i + 1) & 0xff
        if (marker == 0xff) { i += 1 } // fill byte
        else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) {
          i += 2 // standalone markers carry no length
        } else if (marker == 0xd9 || marker == 0xda) {
          // EOI / start-of-scan before any SOF: no dimensions
          return Decoded(bytes.length, cs, -1, -1)
        } else {
          val segLen = be16(bytes, i + 2)
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            if (i + 8 >= bytes.length || segLen < 7)
              return Decoded(bytes.length, cs, -1, -1)
            return Decoded(bytes.length, cs, be16(bytes, i + 7),
              be16(bytes, i + 5))
          }
          if (segLen < 2) return Decoded(bytes.length, cs, -1, -1)
          i += 2 + segLen
        }
      }
      Decoded(bytes.length, cs, -1, -1)
    }
    def decodeBatch(batch: Array[Array[Byte]]): Array[Decoded] =
      batch.map(decodeOne)
  }

  /** WAV/RIFF header parser — the THIRD real codec behind the seam,
    * and the first non-image one: proof the Decoded carry covers audio
    * (width/height slots hold sample_rate/channels — the per-modality
    * meaning of the two dimension ints is the consumer's contract, the
    * seam just carries them). Walks the RIFF chunk list (4-byte ASCII
    * id + 4-byte LITTLE-endian size, chunks word-aligned) to the
    * `fmt ` chunk and reads channels (LE16 at +2) and sample rate
    * (LE32 at +4). Malformed streams — truncated header, missing
    * `fmt `, chunk running past the payload — quarantine to (-1, -1),
    * the PNG/JPEG policy. */
  object WavRiffDecoder extends MediaDecoder {
    private def le16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    private[multimodal] def decodeOne(bytes: Array[Byte]): Decoded = {
      val cs = byteChecksum(bytes)
      val isWav = bytes.length >= 12 &&
        bytes.slice(0, 4).sameElements(RiffSig) &&
        bytes.slice(8, 12).sameElements(WaveSig)
      if (!isWav) return Decoded(bytes.length, cs, -1, -1)
      var i = 12
      while (i + 8 <= bytes.length) {
        val id = new String(bytes.slice(i, i + 4), "US-ASCII")
        val size = le32(bytes, i + 4)
        if (id == "fmt ") {
          if (size < 16 || i + 8 + 8 > bytes.length)
            return Decoded(bytes.length, cs, -1, -1)
          val channels = le16(bytes, i + 10)
          val sampleRate = le32(bytes, i + 12)
          if (channels < 1 || sampleRate < 1 ||
              sampleRate > Int.MaxValue)
            return Decoded(bytes.length, cs, -1, -1)
          return Decoded(bytes.length, cs, sampleRate.toInt, channels)
        }
        // corrupt size (past the payload): bail before advancing —
        // a huge declared size must not wrap the cursor
        if (size > bytes.length)
          return Decoded(bytes.length, cs, -1, -1)
        // chunks are word-aligned: odd sizes carry a pad byte
        i += 8 + size.toInt + (size.toInt & 1)
      }
      Decoded(bytes.length, cs, -1, -1) // no fmt chunk
    }
    def decodeBatch(batch: Array[Array[Byte]]): Array[Decoded] =
      batch.map(decodeOne)
  }

  /** Magic-byte decoder DISPATCH — one seam, many codecs: each payload
    * routes to the codec its container signature names (PNG IHDR, JPEG
    * SOF0, WAV/RIFF fmt, stub fallback for everything else), inside
    * the same batched partition loop. This is the shape a mixed-media
    * lake actually runs — per-format decode without per-format
    * pipelines. */
  object DispatchDecoder extends MediaDecoder {
    def decodeBatch(batch: Array[Array[Byte]]): Array[Decoded] =
      batch.map { bytes =>
        if (bytes.length >= 8 && bytes.take(8).sameElements(PngSig))
          PngHeaderDecoder.decodeOne(bytes)
        else if (bytes.length >= 2 &&
            (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
          JpegSof0Decoder.decodeOne(bytes)
        else if (bytes.length >= 12 &&
            bytes.slice(0, 4).sameElements(RiffSig) &&
            bytes.slice(8, 12).sameElements(WaveSig))
          WavRiffDecoder.decodeOne(bytes)
        else StubDecoder.decodeOne(bytes)
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

  /** Perceptual average-hash (aHash) bands over the stub-decoded gray
    * sequence — the image-dedup analogue of the SimHash text pipeline:
    * the payload's decoded intensity stream (here: the code points of
    * the utf-8 payload — a real deployment feeds pixel grays through
    * the [[MediaDecoder]] seam) is downsampled into 64 blocks (block
    * value = mean intensity, the aHash "8×8 resize"), each block
    * thresholds against the global mean intensity (bit = block >
    * mean), and the 64 bits split into four 16-bit bands for LSH
    * blocking — identical banding/recall math to `TextOps.simhash64`
    * (pigeonhole: any pair within hamming ≤ 3 shares a band).
    *
    * Exact-parity conventions: block means are exact integer sums /
    * count (one IEEE division), the global mean sums the block means
    * through DECIMAL(38,18) (order-free), and the threshold is a
    * strict `>` — all reproduced verbatim by the DuckDB oracle.
    * Returns (doc_id, b0, b1, b2, b3). */
  /** Fixed-grid RESIZE of the decoded intensity stream: block-mean
    * downsample to `nCells` cells (cell = floor(i·nCells/len), value =
    * exact integer sum / count — one IEEE division) — the media-resize
    * kernel of the pipeline, consumed by the aHash (its "8×8 resize"
    * step) and exposed as its own operator (q_m_resize_grid). One
    * split pass per doc, grouped per (doc, cell): map-side combined,
    * never a per-doc window. */
  /** The decoded intensity/sample stream (doc_id, n, i, cv) — ONE
    * split pass per doc (then O(1) per element; a per-position
    * substr() would re-scan the string per character — O(len²)/doc);
    * split can emit a trailing "" (limit -1), filtered to keep i at
    * 0..n-1. Shared by the image resize/aHash path and the audio
    * fingerprint (a real deployment feeds pixel grays / PCM samples
    * through the [[MediaDecoder]] seam instead). */
  private def intensities(media: DataFrame): DataFrame =
    media.select(col("doc_id"),
        length(col("text")).as("n"),
        posexplode(split(col("text"), "")).as(Seq("i", "ch")))
      .filter(col("ch") =!= "")
      .select(col("doc_id"), col("n"), col("i"),
        ascii(col("ch")).as("cv"))

  def resizeGrid(media: DataFrame, nCells: Int): DataFrame =
    intensities(media)
      .select(col("doc_id"),
        floor(col("i").cast("double") * nCells / col("n")).cast("int")
          .as("cell"), col("cv"))
      .groupBy("doc_id", "cell")
      .agg((sum(col("cv")).cast("double") / count(lit(1))).as("gv"))

  def aHashBands(media: DataFrame): DataFrame = {
    val cells = resizeGrid(media, 64)
    val thr = cells.groupBy("doc_id")
      .agg((sum(col("gv").cast("decimal(38,18)")).cast("double")
        / count(lit(1))).as("thr"))
    val bits = cells.join(thr, Seq("doc_id"))
      .select(col("doc_id"), col("cell"), (col("gv") > col("thr")).as("bit"))
    val bitVal = expr("shiftleft(1L, cast(cell % 16 as int))")
    val bandAggs = (0 until 4).map { c =>
      coalesce(sum(when(col("bit")
          && (col("cell") / 16).cast("int") === c, bitVal)
        .otherwise(0L)), lit(0L)).as(s"b$c")
    }
    bits.groupBy("doc_id").agg(bandAggs.head, bandAggs.tail: _*)
  }

  /** Perceptual near-duplicate pairs: band blocking over [[aHashBands]]
    * (equi-join on any shared 16-bit band — never a cross product),
    * exact hamming verify over the full 64 bits, pairs within
    * `maxHamming` survive. Same scale shape as the SimHash dedup:
    * candidate fanout is bounded by band-bucket sizes, the exact
    * metric is paid on candidates only. */
  def phashPairs(media: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming < 4,
      "banded blocking only guarantees recall for hamming < 4 bands")
    phashCandidates(media, maxHamming)
      .filter(col("is_dup"))
      .drop("is_dup")
  }

  /** Banded candidate pairs with their exact hamming distance and the
    * `is_dup = hamming <= maxHamming` verdict as DATA — the
    * observability form (same rationale as the ANN bucket stats): a
    * production run tunes the radius from this distribution instead of
    * discovering an empty result after the fact. */
  def phashCandidates(media: DataFrame, maxHamming: Int): DataFrame =
    bandPairs(aHashBands(media), maxHamming)

  /** Chromaprint-style AUDIO fingerprint over the decode seam's
    * sample stream — the audio member of the perceptual-dup family
    * (the payload's code points stand in for PCM samples exactly as
    * they stand in for pixel grays in [[aHashBands]]; a real
    * deployment feeds decoded samples through the [[MediaDecoder]]
    * seam):
    *
    *  - the stream splits into 17 time FRAMES (the resize-grid rule:
    *    frame = ⌊i·17/n⌋);
    *  - per frame, 4 BAND energies via a lag filterbank — band b's
    *    energy is the mean |x[i] − x[i + 2^b]| over in-frame sample
    *    pairs (a Haar-style time-frequency decomposition in place of
    *    chromaprint's FFT: libm-free, exact integer sums, ONE IEEE
    *    division — the engine-parity disciplines);
    *  - bit(f, b) = energy(f, b) > energy(f+1, b) — chromaprint's
    *    SPECTRAL-FLUX rule between consecutive frames, threshold-free
    *    (empty frames read energy 0);
    *  - 16 flux steps × 4 bands = 64 bits, packed so each 16-bit LSH
    *    band is one spectral band's flux sequence (cell = b·16 + f),
    *    feeding the same [[bandPairs]] blocking as the image hash.
    *
    * Returns (doc_id, b0, b1, b2, b3). */
  def audioBands(media: DataFrame): DataFrame = {
    val F = 17
    // ONE window pass computes all four lags (lead(cv, 2^b) over the
    // dense per-doc position — `i` is 0..n−1 from posexplode, so
    // lead(k) IS the sample at i+k and a null lead is an absent
    // pair): one shuffle on doc_id instead of four sample-stream
    // self-joins (measured 4.8 s → the self-join formulation was the
    // bench's second-heaviest steady row; the DuckDB oracle keeps
    // the join formulation — two independent formulations of the
    // same pair set, the StreamingEncode cross-check discipline)
    val w = Window.partitionBy("doc_id").orderBy("i")
    val samples = intensities(media)
    val leads = samples.select(
      Seq(col("doc_id"), col("n"), col("i"), col("cv")) ++
        (0 until 4).map(b =>
          lead(col("cv"), 1 << b).over(w).as(s"l$b")): _*)
    val lagged = leads.select(col("doc_id"),
        floor(col("i").cast("double") * F / col("n"))
          .cast("int").as("f"),
        col("cv"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("b"), col(s"l$b").as("y"))): _*)).as("p"))
      .filter(col("p.y").isNotNull)
      .select(col("doc_id"), col("f"), col("p.b").as("b"),
        abs(col("cv") - col("p.y")).as("d"))
    val energy = lagged.groupBy("doc_id", "f", "b")
      .agg((sum(col("d")).cast("double") / count(lit(1))).as("e"))
    val grid = media.select(col("doc_id"),
        explode(sequence(lit(0), lit(F - 1))).as("f"))
      .select(col("doc_id"), col("f"),
        explode(sequence(lit(0), lit(3))).as("b"))
    val g = grid.join(energy, Seq("doc_id", "f", "b"), "left")
      .select(col("doc_id"), col("f"), col("b"),
        coalesce(col("e"), lit(0.0)).as("e"))
    val flux = g.as("p").join(g.as("q"),
        col("p.doc_id") === col("q.doc_id")
          && col("p.b") === col("q.b")
          && col("q.f") === col("p.f") + 1)
      .select(col("p.doc_id").as("doc_id"),
        (col("p.b") * 16 + col("p.f")).as("cell"),
        (col("p.e") > col("q.e")).as("bit"))
    val bitVal = expr("shiftleft(1L, cast(cell % 16 as int))")
    val bandAggs = (0 until 4).map { c =>
      coalesce(sum(when(col("bit")
          && (col("cell") / 16).cast("int") === c, bitVal)
        .otherwise(0L)), lit(0L)).as(s"b$c")
    }
    flux.groupBy("doc_id").agg(bandAggs.head, bandAggs.tail: _*)
  }

  /** Per-KEYFRAME aHash signatures for the video member of the
    * perceptual-dup family: a video's payload splits into 256-byte
    * FRAMES (the [[nFrames]] stub rule — a real deployment feeds
    * decoded frames through the [[MediaDecoder]] seam), every
    * `step`-th frame is sampled (the keyframe convention —
    * [[frameSample]]), and each sampled frame gets its own 64-cell
    * aHash over the frame's code points exactly as [[aHashBands]]
    * hashes a whole image: per-frame 64-cell mean grid, per-frame
    * mean threshold, 64 bits packed into 4 LSH bands.
    *
    * Returns (doc_id, frame_idx, b0..b3) — one signature row per
    * sampled keyframe. Scale shape: one shuffle on (doc, frame);
    * row count = Σ sampled frames, never frames². */
  def videoFrameBands(media: DataFrame, step: Int): DataFrame = {
    val FrameBytes = 256
    // keyframe membership is a pure function of the char position:
    // frameSample emits exactly the indices 0, step, 2·step, … ≤
    // n_frames−1, and every char's frame_idx = floor(i/256) ≤
    // floor((len(text)−1)/256) ≤ n_frames−1 (UTF-8 bytes ≥ chars), so
    // the former (doc_id, frame_idx) equi-join of the corpus-sized
    // exploded char stream against the sampled-frame list reduces to
    // this FILTER — one full exchange of the char stream removed
    // (guide §2.4), row-identical by construction
    val cells = intensities(media)
      .withColumn("frame_idx",
        floor(col("i").cast("double") / FrameBytes).cast("int"))
      .filter(pmod(col("frame_idx"), lit(step)) === 0)
      .select(col("doc_id"), col("frame_idx"),
        // grid position within the frame: the LAST frame may be
        // short, so the 64-cell grid stretches over its actual length
        floor((col("i") % FrameBytes).cast("double") * 64 /
          least(lit(FrameBytes),
            col("n") - col("frame_idx") * FrameBytes))
          .cast("int").as("cell"),
        col("cv"))
    val grid = cells.groupBy("doc_id", "frame_idx", "cell")
      .agg((sum(col("cv")).cast("double") / count(lit(1))).as("gv"))
    val thr = grid.groupBy("doc_id", "frame_idx")
      .agg((sum(col("gv").cast("decimal(38,18)")).cast("double")
        / count(lit(1))).as("thr"))
    val bits = grid.join(thr, Seq("doc_id", "frame_idx"))
      .select(col("doc_id"), col("frame_idx"), col("cell"),
        (col("gv") > col("thr")).as("bit"))
    val bitVal = expr("shiftleft(1L, cast(cell % 16 as int))")
    val bandAggs = (0 until 4).map { c =>
      coalesce(sum(when(col("bit")
          && (col("cell") / 16).cast("int") === c, bitVal)
        .otherwise(0L)), lit(0L)).as(s"b$c")
    }
    bits.groupBy("doc_id", "frame_idx")
      .agg(bandAggs.head, bandAggs.tail: _*)
  }

  /** VIDEO near-dup candidates: keyframe-level banded blocking + exact
    * hamming verify (the [[bandPairs]] rule at frame grain, same
    * hot-bucket cap), aggregated to video pairs — the standard
    * keyframe-matching form: a frame MATCH is a cross-video keyframe
    * pair within `maxHamming`; a video pair's evidence is how many of
    * each side's sampled keyframes found a match. Observability form:
    * (d1, d2, n_pair_matches, n_f1_matched, n_f2_matched, n_frames_1,
    * n_frames_2, match_share, is_dup) with match_share =
    * matched/min(sampled) and is_dup = share ≥ `minShare`. */
  def videoDupCandidates(media: DataFrame, step: Int, maxHamming: Int,
      minShare: Double): DataFrame = {
    val maxBucket = graft.Settings.multimodal.maxBandBucket
    // the signature frame feeds BOTH the banding side and the
    // per-video sampled-frame denominators; materialize it once per
    // invocation instead of re-running the char-explode chain twice
    // (Catalyst does not collapse the duplicated subtree)
    val sig = videoFrameBands(media, step).localCheckpoint()
    val keyed0 = sig.select(col("doc_id"), col("frame_idx"),
      col("b0"), col("b1"), col("b2"), col("b3"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("band_idx"), col(s"b$c").as("band"))): _*))
        .as("bk"))
      .select(col("doc_id"), col("frame_idx"),
        col("b0"), col("b1"), col("b2"), col("b3"),
        col("bk.band_idx").as("band_idx"), col("bk.band").as("band"))
    val keyed = keyed0
      .withColumn("bn", count(lit(1))
        .over(Window.partitionBy("band_idx", "band")))
      .filter(col("bn") <= maxBucket).drop("bn")
    val a = keyed.select(col("doc_id").as("d1"),
      col("frame_idx").as("f1"),
      col("b0").as("a_b0"), col("b1").as("a_b1"),
      col("b2").as("a_b2"), col("b3").as("a_b3"),
      col("band_idx"), col("band"))
    val b = keyed.select(col("doc_id").as("d2"),
      col("frame_idx").as("f2"),
      col("b0").as("b_b0"), col("b1").as("b_b1"),
      col("b2").as("b_b2"), col("b3").as("b_b3"),
      col("band_idx"), col("band"))
    val hamming = (0 until 4).map(c =>
      bit_count(col(s"a_b$c").bitwiseXOR(col(s"b_b$c"))))
      .reduce(_ + _)
    val framePairs = a.join(b, Seq("band_idx", "band"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("f1"), col("d2"), col("f2"),
        hamming.cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
    val nSampled = sig.groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"))
    framePairs.groupBy("d1", "d2")
      .agg(count(lit(1)).as("n_pair_matches"),
        countDistinct(col("f1")).as("n_f1_matched"),
        countDistinct(col("f2")).as("n_f2_matched"))
      .join(nSampled.select(col("doc_id").as("d1"),
        col("n_frames").as("n_frames_1")), Seq("d1"))
      .join(nSampled.select(col("doc_id").as("d2"),
        col("n_frames").as("n_frames_2")), Seq("d2"))
      .select(col("d1"), col("d2"), col("n_pair_matches"),
        col("n_f1_matched"), col("n_f2_matched"),
        col("n_frames_1"), col("n_frames_2"),
        round(least(col("n_f1_matched"), col("n_f2_matched"))
          .cast("double")
          / least(col("n_frames_1"), col("n_frames_2")), 6)
          .as("match_share"))
      .withColumn("is_dup", col("match_share") >= minShare)
  }

  /** Audio near-dup candidate pairs — [[audioBands]] through the same
    * banded blocking + exact-hamming verify as the image hash
    * (observability form: banded pairs + hamming + is_dup). */
  def audioDupCandidates(media: DataFrame, maxHamming: Int): DataFrame =
    bandPairs(audioBands(media), maxHamming)

  /** Banded LSH blocking + exact hamming verify over ANY 4×16-bit
    * signature frame (doc_id, b0..b3) — ONE definition shared by the
    * image aHash and audio flux-hash dup paths (equi-join on any
    * shared band, never a cross product; pigeonhole: any pair within
    * hamming ≤ 3 shares a band). Band buckets larger than
    * `multimodal.max_band_bucket` are DROPPED before pairing — the
    * annSelfJoinPairs hot-bucket guard: a viral media asset with k
    * copies is a k-clique whose pair set grows k² (the measured
    * SCALE_r14 blow-up: every replica doc is a planted near-dup, so
    * the OUTPUT is the quadratic object), and at 100 TB one
    * million-copy asset must not produce 10¹² rows. The cap trades
    * recall on exactly those mega-cliques, loudly documented; the
    * fixture's buckets sit far below the default 64. */
  private def bandPairs(sig: DataFrame, maxHamming: Int): DataFrame = {
    val maxBucket = graft.Settings.multimodal.maxBandBucket
    val bandCols = (0 until 4).map(c => col(s"b$c"))
    val keyed0 = sig.select(col("doc_id") +: bandCols :+
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("band_idx"), col(s"b$c").as("band"))): _*))
        .as("bk"): _*)
      .select(col("doc_id") +: bandCols :+ col("bk.band_idx") :+
        col("bk.band"): _*)
    // both sides of the banded self-join read `keyed`: materialize it
    // once per invocation, or the whole signature chain (the audio
    // filterbank window pass / the image hash grid) runs twice —
    // Catalyst does not collapse the duplicated subtree
    val keyed = keyed0
      .withColumn("bn", count(lit(1))
        .over(Window.partitionBy("band_idx", "band")))
      .filter(col("bn") <= maxBucket).drop("bn")
      .localCheckpoint()
    val a = keyed.select(col("doc_id").as("d1") +:
      (0 until 4).map(c => col(s"b$c").as(s"a_b$c")) :+
      col("band_idx") :+ col("band"): _*)
    val b = keyed.select(col("doc_id").as("d2") +:
      (0 until 4).map(c => col(s"b$c").as(s"b_b$c")) :+
      col("band_idx") :+ col("band"): _*)
    val hamming = (0 until 4).map(c =>
      bit_count(col(s"a_b$c").bitwiseXOR(col(s"b_b$c"))))
      .reduce(_ + _)
    a.join(b, Seq("band_idx", "band"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), hamming.cast("int").as("hamming"))
      .distinct()
      .withColumn("is_dup", col("hamming") <= maxHamming)
  }
}
