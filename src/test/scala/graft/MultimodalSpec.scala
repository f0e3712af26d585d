package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** The pluggable media-decoder seam: the batched mapPartitions path
  * must (a) agree with the codegen expression path under the stub,
  * (b) be batch-size invariant (the batching is an amortization
  * detail, never a semantic one), and (c) carry a REAL header-parsing
  * decoder — PNG IHDR dimensions parsed straight from payload bytes —
  * through the identical plan shape. */
class MultimodalSpec extends SparkSpec {

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text")

  test("stub batch decode agrees with the expression decode path") {
    val media = Multimodal.withPayload(docs)
    val exprPath = Multimodal.decodeMeta(media)
      .select("doc_id", "byte_len", "width", "height")
    val batchPath = Multimodal.decodeFeaturesBatched(media, 32,
        Multimodal.StubDecoder)
      .select("doc_id", "byte_len", "width", "height")
    assert(batchPath.exceptAll(exprPath).isEmpty &&
      exprPath.exceptAll(batchPath).isEmpty,
      "batched stub decode must equal the codegen expression decode")
  }

  test("batch size never changes the decoded result") {
    val media = Multimodal.withPayload(docs)
    val one = Multimodal.decodeFeaturesBatched(media, 1,
      Multimodal.StubDecoder)
    val big = Multimodal.decodeFeaturesBatched(media, 256,
      Multimodal.StubDecoder)
    assert(one.exceptAll(big).isEmpty && big.exceptAll(one).isEmpty)
  }

  test("PNG header decoder parses real IHDR dimensions through the seam") {
    val s = spark
    import s.implicits._
    // handcrafted minimal PNG prefixes: signature + IHDR length/type +
    // big-endian width/height + the rest of the 13-byte IHDR body
    def png(w: Int, h: Int): Array[Byte] = {
      val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      val ihdrLen = Array(0, 0, 0, 13)
      val ihdr = "IHDR".getBytes("US-ASCII").map(_.toInt)
      def be(v: Int) =
        Array(v >>> 24, (v >>> 16) & 0xff, (v >>> 8) & 0xff, v & 0xff)
      val body = Array(8, 6, 0, 0, 0) // bit depth, color, the rest
      (sig ++ ihdrLen ++ ihdr ++ be(w) ++ be(h) ++ body).map(_.toByte)
    }
    val rows = Seq(
      (1L, png(640, 480)),
      (2L, png(1, 1)),
      (3L, png(65535, 3)),
      (4L, "not a png at all, just text bytes".getBytes("UTF-8")))
    val media = rows.toDF("doc_id", "payload")
    val out = Multimodal.decodeFeaturesBatched(media, 2,
        Multimodal.PngHeaderDecoder)
      .select("doc_id", "width", "height")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2))))
      .toMap
    assert(out(1L) == ((640, 480)))
    assert(out(2L) == ((1, 1)))
    assert(out(3L) == ((65535, 3)))
    assert(out(4L) == ((-1, -1)),
      "non-PNG payloads must quarantine to (-1, -1), not throw")
  }

  // handcrafted minimal JPEG: SOI, an APP0 segment to prove the marker
  // walk skips non-SOF segments, a COM segment, then SOF0 with
  // big-endian height/width, then EOI
  private def jpeg(w: Int, h: Int): Array[Byte] = {
    def be16(v: Int) = Array((v >>> 8) & 0xff, v & 0xff)
    val soi = Array(0xff, 0xd8)
    val app0 = Array(0xff, 0xe0, 0x00, 0x10) ++
      "JFIF".getBytes("US-ASCII").map(_.toInt) ++ Array.fill(10)(0)
    val com = Array(0xff, 0xfe, 0x00, 0x04, 0x68, 0x69)
    val sof0 = Array(0xff, 0xc0, 0x00, 0x11, 0x08) ++ be16(h) ++
      be16(w) ++ Array(0x03) ++ Array.fill(9)(0)
    val eoi = Array(0xff, 0xd9)
    (soi ++ app0 ++ com ++ sof0 ++ eoi).map(_.toByte)
  }

  private def png(w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    val ihdrLen = Array(0, 0, 0, 13)
    val ihdr = "IHDR".getBytes("US-ASCII").map(_.toInt)
    def be(v: Int) =
      Array(v >>> 24, (v >>> 16) & 0xff, (v >>> 8) & 0xff, v & 0xff)
    val body = Array(8, 6, 0, 0, 0)
    (sig ++ ihdrLen ++ ihdr ++ be(w) ++ be(h) ++ body).map(_.toByte)
  }

  test("JPEG SOF0 decoder parses real frame dimensions; progressive " +
      "SOF2 and truncated streams behave") {
    val s = spark
    import s.implicits._
    // SOF2 (progressive) variant: same frame-header layout, marker c2
    val prog = {
      val j = jpeg(123, 45)
      val idx = j.indexOfSlice(Array(0xff.toByte, 0xc0.toByte))
      j.updated(idx + 1, 0xc2.toByte)
    }
    val rows = Seq(
      (1L, jpeg(640, 480)),
      (2L, jpeg(1, 1)),
      (3L, prog),
      (4L, Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)), // SOI+EOI only
      (5L, "plain text, not a jpeg".getBytes("UTF-8")))
    val out = Multimodal.decodeFeaturesBatched(
        rows.toDF("doc_id", "payload"), 2, Multimodal.JpegSof0Decoder)
      .select("doc_id", "width", "height")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2))))
      .toMap
    assert(out(1L) == ((640, 480)))
    assert(out(2L) == ((1, 1)))
    assert(out(3L) == ((123, 45)), "SOF2 progressive frame not parsed")
    assert(out(4L) == ((-1, -1)), "no-SOF stream must quarantine")
    assert(out(5L) == ((-1, -1)), "non-JPEG must quarantine, not throw")
  }

  // handcrafted minimal WAV: RIFF/WAVE header, a JUNK chunk to prove
  // the chunk walk skips non-fmt chunks (odd-sized, so word alignment
  // is exercised), then fmt (PCM, LE channels/sample-rate), then data
  private def wav(sampleRate: Int, channels: Int): Array[Byte] = {
    def le16(v: Int) = Array(v & 0xff, (v >>> 8) & 0xff)
    def le32(v: Int) = Array(v & 0xff, (v >>> 8) & 0xff,
      (v >>> 16) & 0xff, (v >>> 24) & 0xff)
    val junk = "JUNK".getBytes("US-ASCII").map(_.toInt) ++ le32(3) ++
      Array(1, 2, 3, 0) // 3 payload bytes + 1 pad (word alignment)
    val fmt = "fmt ".getBytes("US-ASCII").map(_.toInt) ++ le32(16) ++
      le16(1) ++ le16(channels) ++ le32(sampleRate) ++
      le32(sampleRate * channels * 2) ++ le16(channels * 2) ++ le16(16)
    val data = "data".getBytes("US-ASCII").map(_.toInt) ++ le32(4) ++
      Array(0, 0, 0, 0)
    val body = junk ++ fmt ++ data
    ("RIFF".getBytes("US-ASCII").map(_.toInt) ++ le32(4 + body.length) ++
      "WAVE".getBytes("US-ASCII").map(_.toInt) ++ body).map(_.toByte)
  }

  test("WAV/RIFF decoder parses sample rate and channels through the " +
      "seam; malformed streams quarantine") {
    val s = spark
    import s.implicits._
    // malformed variants: fmt chunk missing entirely; declared chunk
    // size past the payload (corrupt size must not wrap the walk)
    val noFmt = {
      val w = wav(44100, 2)
      val idx = w.indexOfSlice("fmt ".getBytes("US-ASCII"))
      w.updated(idx, 'x'.toByte)
    }
    val badSize = {
      val w = wav(44100, 2)
      val idx = w.indexOfSlice("JUNK".getBytes("US-ASCII"))
      w.updated(idx + 4, 0xff.toByte).updated(idx + 5, 0xff.toByte)
        .updated(idx + 6, 0xff.toByte).updated(idx + 7, 0x7f.toByte)
    }
    val rows = Seq(
      (1L, wav(44100, 2)),
      (2L, wav(16000, 1)),
      (3L, noFmt),
      (4L, badSize),
      (5L, "RIFF but not a wave".getBytes("UTF-8")),
      (6L, "plain text".getBytes("UTF-8")))
    val out = Multimodal.decodeFeaturesBatched(
        rows.toDF("doc_id", "payload"), 2, Multimodal.WavRiffDecoder)
      .select("doc_id", "width", "height")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2))))
      .toMap
    assert(out(1L) == ((44100, 2)), "stereo 44.1k")
    assert(out(2L) == ((16000, 1)), "mono 16k")
    assert(out(3L) == ((-1, -1)), "missing fmt must quarantine")
    assert(out(4L) == ((-1, -1)), "corrupt chunk size must quarantine")
    assert(out(5L) == ((-1, -1)), "RIFF-but-not-WAVE must quarantine")
    assert(out(6L) == ((-1, -1)), "non-RIFF must quarantine, not throw")
  }

  test("magic-byte dispatch routes each payload to its codec; the " +
      "format column agrees") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, png(320, 200)),
      (2L, jpeg(640, 480)),
      (3L, "just text".getBytes("UTF-8")),
      (4L, wav(22050, 2)))
    val media = rows.toDF("doc_id", "payload")
    val out = Multimodal.decodeFeaturesBatched(media, 2,
        Multimodal.DispatchDecoder)
      .select("doc_id", "width", "height")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2))))
      .toMap
    assert(out(1L) == ((320, 200)), "png route")
    assert(out(2L) == ((640, 480)), "jpeg route")
    assert(out(3L)._1 >= 64 && out(3L)._2 >= 64,
      "other route falls back to the stub decoder")
    assert(out(4L) == ((22050, 2)), "wav route")
    val fmts = media
      .select(col("doc_id"),
        Multimodal.mediaFormat(col("payload")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fmts == Map(1L -> "png", 2L -> "jpeg", 3L -> "other",
      4L -> "wav"))
  }

  test("phash: planted near-identical payload pairs within the radius; " +
      "unrelated content does not") {
    import spark.implicits._
    // deterministic pseudo-random "intensity" text (LCG over a-z) so
    // block means vary; a single-character edit perturbs exactly one
    // of the 64 blocks' means
    def synth(seed: Long, n: Int): String = {
      var h = seed
      val sb = new StringBuilder
      for (_ <- 0 until n) {
        h = h * 6364136223846793005L + 1442695040888963407L
        sb.append(('a' + ((h >>> 33) % 26)).toChar)
      }
      sb.toString
    }
    val base = synth(7L, 512)
    val edited = base.updated(100, if (base(100) == 'a') 'b' else 'a')
    val other = synth(99L, 512)
    val docs = Seq((1L, base), (2L, edited), (3L, other))
      .toDF("doc_id", "text")
    val pairs = Multimodal.phashPairs(docs, maxHamming = 3).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "planted near-duplicate not recovered")
    assert(!pairs.exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L),
      "unrelated payload spuriously paired")
    // full-64-bit signature sanity: identical input => hamming 0
    val same = Multimodal.phashPairs(
      Seq((1L, base), (2L, base)).toDF("doc_id", "text"),
      maxHamming = 0).collect()
    assert(same.length == 1 && same.head.getInt(2) == 0)
  }

  test("audio flux-hash: identical sample streams fingerprint to " +
      "hamming 0; a planted local edit stays within the radius; " +
      "unrelated audio does not pair as dup") {
    import spark.implicits._
    def synth(seed: Long, n: Int): String = {
      var h = seed
      val sb = new StringBuilder
      for (_ <- 0 until n) {
        h = h * 6364136223846793005L + 1442695040888963407L
        sb.append(('a' + ((h >>> 33) % 26)).toChar)
      }
      sb.toString
    }
    val base = synth(7L, 512)
    // a one-sample edit perturbs only the lag pairs crossing position
    // 100 — at most one frame's energies per band, so at most a few
    // of the 64 flux bits can flip
    val edited = base.updated(100, if (base(100) == 'a') 'b' else 'a')
    val other = synth(99L, 512)
    val docs = Seq((1L, base), (2L, edited), (3L, other))
      .toDF("doc_id", "text")
    val cands = Multimodal.audioDupCandidates(docs, maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getInt(2), r.getBoolean(3)))).toMap
    assert(cands.contains((1L, 2L)) && cands((1L, 2L))._2,
      s"planted audio near-duplicate not recovered: $cands")
    assert(!cands.filter(_._2._2).keySet
      .exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated audio spuriously marked dup: $cands")
    // identical streams: one pair at hamming 0
    val same = Multimodal.audioDupCandidates(
      Seq((1L, base), (2L, base)).toDF("doc_id", "text"),
      maxHamming = 0).collect()
    assert(same.length == 1 && same.head.getInt(2) == 0
      && same.head.getBoolean(3))
  }

  test("video keyframe dup: an identical clip pairs at full match " +
      "share; a clip sharing only its first half matches partially; " +
      "unrelated video does not pair as dup") {
    import spark.implicits._
    def synth(seed: Long, n: Int): String = {
      var h = seed
      val sb = new StringBuilder
      for (_ <- 0 until n) {
        h = h * 6364136223846793005L + 1442695040888963407L
        sb.append(('a' + ((h >>> 33) % 26)).toChar)
      }
      sb.toString
    }
    // 4 frames of 256 bytes; step 1 samples every frame
    val base = synth(11L, 1024)
    val halfShared = base.take(512) + synth(77L, 512)
    val other = synth(99L, 1024)
    val docs = Seq((1L, base), (2L, base), (3L, halfShared),
      (4L, other)).toDF("doc_id", "text")
    val rows = Multimodal.videoDupCandidates(docs, step = 1,
        maxHamming = 3, minShare = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(7), r.getBoolean(8)))).toMap
    // identical clip: every keyframe matches, share 1.0, dup
    assert(rows.contains((1L, 2L)) && rows((1L, 2L))._2 == 1.0
      && rows((1L, 2L))._3,
      s"identical clip not recovered as full-share dup: $rows")
    // half-shared clip: the two shared frames match (share >= 0.5 of
    // 4-5 sampled frames -> dup at the 0.5 threshold)
    assert(rows.contains((1L, 3L)) && rows((1L, 3L))._3,
      s"half-shared clip not recovered: $rows")
    assert(rows((1L, 3L))._2 < 1.0,
      s"half-shared clip should not read full share: $rows")
    // unrelated clip never marked dup
    assert(!rows.filter(_._2._3).keySet
      .exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated video spuriously marked dup: $rows")
  }
}
