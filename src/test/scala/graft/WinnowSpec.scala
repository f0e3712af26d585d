package graft

import org.apache.spark.sql.functions._
import graft.functions.{RollingHashOps, RollingHashes}
import graft.text.Winnow

/** Winnowing fingerprint semantics: the O(len) rolling hash must equal
  * the per-position Horner definition on arbitrary input, window
  * selection must implement robust winnowing (min hash, rightmost
  * tie), and the MOSS guarantee — any verbatim match ≥ w+k−1 bytes
  * shares a fingerprint — must hold on planted overlaps. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def naive(sv: String, k: Int): Seq[Long] = {
    val b = sv.getBytes("UTF-8").map(_ & 0xff)
    if (b.length < k) Seq.empty
    else (0 to b.length - k).map { i =>
      var h = 0L
      for (j <- 0 until k)
        h = (h * RollingHashes.Base + b(i + j)) % RollingHashes.Prime
      h
    }
  }

  test("rolling hash == per-position Horner on deterministic " +
      "pseudo-random strings, all window widths") {
    def synth(seed: Long, n: Int): String = {
      var h = seed
      val sb = new StringBuilder
      for (_ <- 0 until n) {
        h = h * 6364136223846793005L + 1442695040888963407L
        sb.append((' ' + ((h >>> 33) % 90)).toChar) // printable ASCII
      }
      sb.toString
    }
    val rows = (1 to 20).map(i => (i.toLong, synth(i, 5 + i * 13)))
    for (k <- Seq(1, 2, 16, 31)) {
      val got = rows.toDF("doc_id", "text")
        .select(col("doc_id"),
          RollingHashOps.rollingHash(col("text"), k).as("hs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      for ((id, s) <- rows)
        assert(got(id) == naive(s, k),
          s"rolling hash mismatch at k=$k doc=$id")
    }
  }

  test("robust winnowing: all-equal hashes select the RIGHTMOST " +
      "position of every window") {
    // constant text => every k-gram hash identical => each window's
    // tie-broken selection is its own end position
    val n = 30; val k = 4; val w = 5
    val d = Seq((1L, "a" * n)).toDF("doc_id", "text")
    val got = Winnow.fingerprints(d, k, w)
      .select("fp_pos").as[Int].collect().sorted.toSeq
    assert(got == (w - 1 to n - k).toSeq,
      "every full window must select its rightmost (end) position")
  }

  test("the winnowing guarantee: a planted >= w+k-1 byte overlap " +
      "always shares a fingerprint; short docs contribute nothing") {
    def synth(seed: Long, n: Int): String = {
      var h = seed
      val sb = new StringBuilder
      for (_ <- 0 until n) {
        h = h * 2862933555777941757L + 3037000493L
        sb.append(('a' + ((h >>> 33) % 26)).toChar)
      }
      sb.toString
    }
    val k = 16; val w = 8
    val common = synth(7L, k + w - 1) // exactly the guarantee length
    val a = synth(1L, 120) + common + synth(2L, 120)
    val b = synth(3L, 150) + common + synth(4L, 90)
    val c = synth(5L, 300) // unrelated
    val short = "tiny" // < k bytes: no grams at all
    val fps = Winnow.fingerprints(
      Seq((1L, a), (2L, b), (3L, c), (4L, short))
        .toDF("doc_id", "text"), k, w)
    val byDoc = fps.select("doc_id", "h").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) & byDoc(2L)).nonEmpty,
      "planted w+k-1 overlap must share a fingerprint")
    assert(!byDoc.contains(4L), "sub-k docs have no fingerprints")
    // pair generation surfaces the planted pair, not the unrelated doc
    val pairsDf = Winnow.fingerprintPairsFrom(fps, maxFreq = 10,
      minShared = 1)
    val pairs = pairsDf.collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    assert(!pairs.exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L))
    // the ALIGNMENT localizes the planted span: the common substring
    // starts at byte 120 in doc 1 and byte 150 in doc 2, so its
    // matches share offset 120 − 150 = −30, with pos1 extent inside
    // the planted region
    val align = Winnow.alignments(pairsDf, fps)
      .filter(col("d1") === 1L && col("d2") === 2L)
      .collect()
    val planted = align.filter(_.getAs[Int]("align_offset") == -30)
    assert(planted.nonEmpty, "planted span's offset not aligned")
    assert(planted.forall { r =>
      val lo = r.getAs[Int]("min_pos1"); val hi = r.getAs[Int]("max_pos1")
      lo >= 120 - (w - 1) && hi <= 120 + common.length
    }, "aligned extent must sit in the planted region")
  }

  test("stripSpans: the later doc loses the planted span, the keeper " +
      "and unrelated docs are untouched, and the char accounting is " +
      "internally consistent") {
    def synth(seed: Long, n: Int): String = {
      var h = seed
      val sb = new StringBuilder
      for (_ <- 0 until n) {
        h = h * 2862933555777941757L + 3037000493L
        sb.append(('a' + ((h >>> 33) % 26)).toChar)
      }
      sb.toString
    }
    val k = 16; val w = 8
    // a LONG planted block (many same-offset matches, well past the
    // strip floor) shared by docs 1 and 2; doc 3 unrelated
    val common = synth(7L, 120)
    val a = synth(1L, 100) + common + synth(2L, 100)
    val b = synth(3L, 60) + common + synth(4L, 80)
    val c = synth(5L, 250)
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val fps = Winnow.fingerprints(docs, k, w)
    val pairs = Winnow.fingerprintPairsFrom(fps, maxFreq = 10,
      minShared = 2)
    val out = Winnow.stripSpans(docs, pairs, fps, k, w, minMatches = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    // keeper (d1 = 1) and the unrelated doc keep their full text
    assert(out(1L).getAs[Long]("covered_chars") == 0L
      && out(1L).getAs[String]("clean_text") == a, "keeper untouched")
    assert(out(3L).getAs[Long]("covered_chars") == 0L
      && out(3L).getAs[String]("clean_text") == c, "unrelated untouched")
    // the later doc loses (at least the winnow-localizable core of)
    // the planted block: fingerprint evidence starts within the first
    // window of the span, so coverage is near-total
    val covered = out(2L).getAs[Long]("covered_chars")
    assert(covered >= common.length - (w + k) && covered <= common.length,
      s"doc 2 covered $covered of ${common.length} planted chars")
    // internal consistency on every row: n_chars − covered == kept
    out.values.foreach { r =>
      assert(r.getAs[String]("clean_text").length ==
        r.getAs[Long]("n_chars") - r.getAs[Long]("covered_chars"),
        s"doc ${r.getLong(0)} accounting")
    }
    // the stripped text is exactly the original minus the covered span
    // (prefix + suffix around one contiguous island)
    val clean2 = out(2L).getAs[String]("clean_text")
    assert(b.startsWith(clean2.take(10)) &&
      clean2.length == b.length - covered)
  }

  test("stripSpans segmentation: identical header AND footer around " +
      "equal-length unique middles strip as TWO islands — the unique " +
      "middle survives") {
    def synth(seed: Long, n: Int): String = {
      var h = seed
      val sb = new StringBuilder
      for (_ <- 0 until n) {
        h = h * 2862933555777941757L + 3037000493L
        sb.append(('a' + ((h >>> 33) % 26)).toChar)
      }
      sb.toString
    }
    val k = 16; val w = 8
    // the templated-doc case: both docs share a long header and a
    // long footer; the middles are unique but EQUAL LENGTH, so the
    // header matches and the footer matches land at the SAME
    // alignment offset (0). Pre-segmentation, min/max over the
    // offset group bridged them into one span that deleted doc 2's
    // unique middle.
    val header = synth(7L, 120)
    val footer = synth(8L, 120)
    val mid1 = synth(1L, 200)
    val mid2 = synth(2L, 200) // same length, different content
    val a = header + mid1 + footer
    val b = header + mid2 + footer
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val fps = Winnow.fingerprints(docs, k, w)
    val pairs = Winnow.fingerprintPairsFrom(fps, maxFreq = 10,
      minShared = 2)
    val out = Winnow.stripSpans(docs, pairs, fps, k, w, minMatches = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    val clean2 = out(2L).getAs[String]("clean_text")
    // the unique middle MUST survive the strip: a distinctive chunk
    // of mid2 (away from the k-gram bleed at its edges) is retained
    val core2 = mid2.substring(w + k, mid2.length - (w + k))
    assert(clean2.contains(core2),
      "unique middle must not be bridged away")
    // and the shared material IS stripped: two separate islands
    // (header, footer), never one doc-spanning span
    assert(out(2L).getAs[Long]("n_spans") >= 2L,
      "header and footer must strip as separate islands")
    assert(out(2L).getAs[Long]("covered_chars") <=
      (header.length + footer.length + 2 * (w + k)).toLong,
      "coverage must not extend far past the two shared blocks")
    // accounting still consistent
    assert(clean2.length == out(2L).getAs[Long]("n_chars") -
      out(2L).getAs[Long]("covered_chars"))
  }
}
