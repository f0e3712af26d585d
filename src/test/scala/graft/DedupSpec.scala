package graft

import org.apache.spark.sql.functions._
import graft.text.{Dedup, Similarity, TextOps}

/** Text/dedup/similarity operator semantics on hand-built fixtures. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("exactDups: identical texts share fingerprint, lowest id kept") {
    val d = docs(1L -> "a b c", 2L -> "a b c", 3L -> "x y z")
    val out = Dedup.exactDups(d).orderBy("doc_id").collect()
    assert(out.map(_.getAs[Boolean]("is_dup")).toSeq ==
      Seq(false, true, false))
    assert(out(0).getAs[String]("fp") == out(1).getAs[String]("fp"))
  }

  test("shingles: distinct word 3-grams in order") {
    val got = docs(1L -> "a b c d c d")
      .select(TextOps.shingles(col("text"), 3)).head.getSeq[String](0)
    assert(got.toSet == Set("a b c", "b c d", "c d c", "d c d"))
  }

  test("jaccardPairs finds near-identical docs, skips unrelated") {
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "the quick brown fox jumps over the lazy dog tomorrow",
      3L -> "completely different words appear in this text here now")
    val out = Dedup.jaccardPairs(d, n = 3, maxFreq = 10, minJaccard = 0.3)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("d1") == 1L
      && out.head.getAs[Long]("d2") == 2L)
    assert(out.head.getAs[Double]("jaccard") > 0.5)
  }

  test("minhash signatures identical for identical docs") {
    val d = docs(1L -> "w1 w2 w3 w4 w5", 2L -> "w1 w2 w3 w4 w5",
      3L -> "v1 v2 v3 v4 v5")
    val sig = Dedup.minhashSignatures(d, 3).orderBy("doc_id").collect()
    val s = (i: Int) => (0 until 8).map(k => sig(i).getAs[Long](s"m$k"))
    assert(s(0) == s(1) && s(0) != s(2))
    val pairs = Dedup.minhashLshPairs(d, 3).collect()
    assert(pairs.exists(r => r.getAs[Long]("d1") == 1L
      && r.getAs[Long]("d2") == 2L
      && r.getAs[Double]("est_sim") == 1.0))
  }

  test("simhash: identical docs at hamming 0, found by band blocking") {
    val d = docs(1L -> "alpha beta gamma delta", 2L -> "alpha beta gamma delta")
    val out = Dedup.simhashPairs(d, maxHamming = 3).collect()
    assert(out.length == 1 && out.head.getAs[Int]("hamming") == 0)
  }

  test("simhash: banded blocking has perfect recall at hamming <= 3") {
    // mutate a base doc token-by-token so signatures land at a spread of
    // hamming distances; banded candidates must equal brute force <= 3
    // 200-token base so single-token swaps flip only the small-margin
    // bits (hamming ~0-6); doc 1 is an exact dup of doc 0 (hamming 0)
    val base = (1 to 200).map(i => s"tok$i")
    val d = docs((0L until 12L).map { i =>
      val swaps = math.max(0, i.toInt - 1)
      val txt = (base.drop(swaps)
        ++ (0 until swaps).map(j => s"mut${i}_$j")).mkString(" ")
      i -> txt
    }: _*)
    val sigs = TextOps.simhash64(d, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (0 until TextOps.SimHashBands).map(c => r.getAs[Long](s"b$c")))
      .toMap
    val brute = for {
      a <- sigs.keys.toSeq; b <- sigs.keys.toSeq if a < b
      h = sigs(a).zip(sigs(b))
        .map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      if h <= 3
    } yield (a, b, h)
    val banded = Dedup.simhashPairs(d, maxHamming = 3).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"),
        r.getAs[Int]("hamming"))).toSet
    assert(banded == brute.toSet,
      s"banded=$banded brute=${brute.toSet}")
    assert(brute.nonEmpty, "fixture produced no close pairs — weak test")
  }

  test("deriveSimhashBanding: widest feasible layout per radius, " +
      "pigeonhole recall holds at the DERIVED layout for two radii") {
    // spec lock: r=0 → one exact 64-bit key; r=1 → 2×32 (widest with
    // nBands > 1); r=2 skips the infeasible 3-split → 4×16; r=3 → 4×16
    assert(Dedup.deriveSimhashBanding(0) == (1, 4))
    assert(Dedup.deriveSimhashBanding(1) == (2, 2))
    assert(Dedup.deriveSimhashBanding(2) == (4, 1))
    assert(Dedup.deriveSimhashBanding(3) == (4, 1))
    intercept[IllegalArgumentException](Dedup.deriveSimhashBanding(4))
    // recall guarantee at the derived layouts: banded == brute-force
    // at radius 1 (2 wide bands) and radius 3 (4 narrow bands)
    val base = (1 to 200).map(i => s"tok$i")
    val d = docs((0L until 12L).map { i =>
      val swaps = math.max(0, i.toInt - 1)
      val txt = (base.drop(swaps)
        ++ (0 until swaps).map(j => s"mut${i}_$j")).mkString(" ")
      i -> txt
    }: _*)
    val sigs = TextOps.simhash64(d, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (0 until TextOps.SimHashBands).map(c => r.getAs[Long](s"b$c")))
      .toMap
    for (r <- Seq(1, 3)) {
      val brute = (for {
        a <- sigs.keys.toSeq; b <- sigs.keys.toSeq if a < b
        h = sigs(a).zip(sigs(b))
          .map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
        if h <= r
      } yield (a, b, h)).toSet
      val banded = Dedup.simhashPairs(d, maxHamming = r).collect()
        .map(x => (x.getAs[Long]("d1"), x.getAs[Long]("d2"),
          x.getAs[Int]("hamming"))).toSet
      assert(banded == brute, s"radius $r: banded=$banded brute=$brute")
    }
  }

  test("connectedComponents: chains collapse to min label, singletons " +
      "stay canonical") {
    val d = docs((0L to 9L).map(i => i -> s"doc $i"): _*)
    // chain 0-1-2-3-4 (diameter 4 → needs several propagation rounds),
    // pair 6-7, singletons 5, 8, 9
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (6L, 7L))
      .toDF("d1", "d2")
    val out = Dedup.connectedComponents(d, pairs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("comp_id"), r.getAs[Long]("cluster_size"),
          r.getAs[Boolean]("is_canonical"))).toMap
    (0L to 4L).foreach(i => assert(out(i) == (0L, 5L, i == 0L)))
    assert(out(6L) == (6L, 2L, true) && out(7L) == (6L, 2L, false))
    Seq(5L, 8L, 9L).foreach(i => assert(out(i) == (i, 1L, true)))
  }

  test("incrementalClassify: exact beats near, argmax match, novel rest") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val index = docs(
      10L -> base,
      11L -> base, // same fp as 10 — exact match must pick min id 10
      12L -> (base + " with a small tail change here"),
      13L -> "completely unrelated text about distributed query engines")
    val batch = docs(
      1L -> base,                                   // exact dup of 10
      2L -> (base + " with a small tail change"),   // near dup
      3L -> "nothing in common with any index doc at all wholly new")
    val out = Dedup.incrementalClassify(index, batch, n = 3, minSim = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(2)).map(_.toString))).toMap
    assert(out(1L) == ("exact_dup", Some("10")))
    assert(out(2L)._1 == "near_dup"
      && Set("10", "11", "12").contains(out(2L)._2.get))
    assert(out(3L) == ("novel", None))
    // exact dups share every band too — precedence must still say exact
    val v1 = Dedup.incrementalClassify(index, batch, 3, 0.5)
      .filter(col("doc_id") === 1L).head()
    assert(v1.isNullAt(v1.fieldIndex("est_sim")))
  }

  test("editDistanceVerify refines candidates with the true metric") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumped over the lazy dog"), // 2 edits
      (3L, "a completely different sentence about databases"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("d1", "d2")
    val out = Dedup.editDistanceVerify(pairs, docs,
        prefixLen = 80, maxDist = 5)
      .collect().map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")) ->
        (r.getAs[Int]("lev"), r.getAs[Int]("verified"))).toMap
    assert(out((1L, 2L)) == ((2, 1)), "near pair must verify (lev=2)")
    assert(out((1L, 3L))._2 == 0, "unrelated pair must be rejected")
    // cost shape: only candidate pairs are scored, never the corpus
    assert(out.size == 2)
  }

  test("exact-substring dedup: first occurrence kept, spans merge, " +
      "strip removes covered tokens") {
    // doc 1 is the first corpus occurrence of "a b c d e" (kept whole);
    // doc 2 embeds that 5-gram twice (prefix + suffix) around novel
    // middle tokens; doc 3 shares nothing at k=3
    val d = docs(
      1L -> "a b c d e x y",
      2L -> "a b c d e m n o a b c d e",
      3L -> "p q r s t u v")
    val cov = Dedup.duplicateCovered(d, k = 3)
    val covSet = cov.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("tp"))).toSet
    // doc 1 fully kept (earliest occurrence of every duplicated gram)
    assert(!covSet.exists(_._1 == 1L) && !covSet.exists(_._1 == 3L))
    // doc 2: positions 0-4 (prefix copy) and 8-12 (suffix copy) covered,
    // middle "m n o" (5-7) kept
    assert(covSet == (0 to 4).map(i => 2L -> i).toSet
      ++ (8 to 12).map(i => 2L -> i).toSet)
    val spans = Dedup.duplicateSpans(cov).orderBy("span_start").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("span_start"),
        r.getAs[Int]("span_end"), r.getAs[Long]("span_len")))
    assert(spans.toSeq == Seq((2L, 0, 4, 5L), (2L, 8, 12, 5L)))
    val strip = Dedup.substringStrip(d, cov).orderBy("doc_id").collect()
    assert(strip.map(_.getAs[String]("clean_text")).toSeq ==
      Seq("a b c d e x y", "m n o", "p q r s t u v"))
    assert(strip.map(_.getAs[Long]("n_dup_tokens")).toSeq ==
      Seq(0L, 10L, 0L))
    // dup_frac is round(10/13, 9)
    assert(math.abs(strip(1).getAs[Double]("dup_frac") - 10.0 / 13) < 1e-9)
  }

  test("exact-substring dedup: within-doc repetition is caught and a " +
      "fully-duplicated doc strips to empty") {
    val d = docs(
      1L -> "w1 w2 w3 w1 w2 w3 w1 w2 w3", // one gram repeated in-doc
      2L -> "w1 w2 w3 tail tokens here now")
    val cov = Dedup.duplicateCovered(d, k = 3)
    val strip = Dedup.substringStrip(d, cov).orderBy("doc_id").collect()
    // doc 1: only the FIRST "w1 w2 w3" (positions 0-2) survives; the
    // overlapping later occurrences cover everything from position 1 on
    assert(strip(0).getAs[String]("clean_text") == "w1 w2 w3")
    // doc 2's copy of the gram is also a non-first occurrence
    assert(strip(1).getAs[String]("clean_text") == "tail tokens here now")
    // sub-k docs contribute nothing and never error
    val tiny = docs(9L -> "a b")
    assert(Dedup.duplicateCovered(tiny, k = 3).count() == 0)
    assert(Dedup.substringStrip(tiny,
      Dedup.duplicateCovered(tiny, k = 3)).head()
      .getAs[String]("clean_text") == "a b")
  }

  test("coveredByReference: benchmark overlap marks train positions, " +
      "no keeper exemption, zero-overlap docs untouched") {
    val train = docs(
      1L -> "a b c d e x y",   // embeds the benchmark 5-gram at 0-4
      2L -> "p q r s t u v")   // no overlap
    val ref = docs(100L -> "z z a b c d e")
    val cov = Dedup.coveredByReference(train, ref, k = 5)
    val covSet = cov.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("tp"))).toSet
    // doc 1 positions 0-4 contaminated — the FIRST occurrence too
    // (decontamination has no keeper); doc 2 clean
    assert(covSet == (0 to 4).map(i => 1L -> i).toSet)
  }

  test("duplicateCoveredIncremental == full-union recompute with batch " +
      "ingested after the index") {
    val index = docs(
      1L -> "a b c d e x y",
      2L -> "p q r s t")
    val batch = docs(
      10L -> "a b c m n a b c",      // index gram + batch-internal repeat
      11L -> "fresh tokens only here",
      12L -> "fresh tokens only here") // dup of 11 within the batch
    val incr = Dedup.duplicateCoveredIncremental(index, batch, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // oracle twin: relabel batch ids ABOVE the index and recompute from
    // scratch; restrict to batch docs
    val relabeled = index.unionByName(
      batch.withColumn("doc_id", col("doc_id") + 1000L))
    val full = Dedup.duplicateCovered(relabeled, k = 3)
      .filter(col("doc_id") >= 1000L)
      .collect().map(r => (r.getLong(0) - 1000L, r.getInt(1))).toSet
    assert(incr == full)
    // sanity on content: doc 10 pos 0-2 (index gram) and 5-7 (repeat of
    // its own earlier occurrence); doc 12 fully covered by doc 11
    assert(incr == Set(10L -> 0, 10L -> 1, 10L -> 2, 10L -> 5,
      10L -> 6, 10L -> 7, 12L -> 0, 12L -> 1, 12L -> 2, 12L -> 3))
  }

  test("tokens: tabs/newlines/space runs all separate — no fused tokens " +
      "escape the gram families") {
    val d = docs(1L -> "a\tb\nc  d \t e")
    val toks = d.select(TextOps.tokens(col("text"))).head.getSeq[String](0)
    assert(toks == Seq("a", "b", "c", "d", "e"))
    // gram coverage through the multi-whitespace row: the 2-gram "a b"
    // must exist (a single-space split would have produced "a\tb" as
    // ONE token and no gram)
    val grams = d.select(TextOps.shingles(col("text"), 2))
      .head.getSeq[String](0)
    assert(grams.contains("a b") && grams.contains("b c"))
  }

  test("deriveBanding: precision-greediest layout whose S-curve " +
      "threshold covers the target") {
    // k = 8 curve thresholds: r=1 → 0.125, r=2 → 0.5, r=4 → 0.84, r=8 → 1
    assert(Dedup.deriveBanding(8, 0.04) == ((8, 1)))   // below all → r=1
    assert(Dedup.deriveBanding(8, 0.2) == ((8, 1)))
    assert(Dedup.deriveBanding(8, 0.5) == ((4, 2)))
    assert(Dedup.deriveBanding(8, 0.6) == ((4, 2)))
    assert(Dedup.deriveBanding(8, 0.9) == ((2, 4)))
    assert(Dedup.deriveBanding(8, 1.0) == ((1, 8)))
    // k = 16: r=2's threshold is (1/8)^(1/2) ≈ 0.354
    assert(Dedup.deriveBanding(16, 0.3) == ((16, 1)))
    assert(Dedup.deriveBanding(16, 0.36) == ((8, 2)))
  }

  test("substringStrip: kept text preserves order, strips exactly the " +
      "covered positions, fully-duplicated docs empty out") {
    val d = docs(1L -> "a b c d e", 2L -> "a b c d e")
    val cov = Dedup.duplicateCovered(d, k = 5)
    val out = Dedup.substringStrip(d, cov).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("clean_text") == "a b c d e")
    assert(out(1).getAs[String]("clean_text") == "",
      "the exact re-occurrence strips to empty")
    assert(out(1).getAs[Long]("n_dup_tokens") == 5L)
    // partial coverage keeps the uncovered suffix in order
    val d2 = docs(1L -> "a b c d e x", 2L -> "a b c d e y z")
    val out2 = Dedup.substringStrip(d2,
        Dedup.duplicateCovered(d2, k = 5))
      .orderBy("doc_id").collect()
    assert(out2(0).getAs[String]("clean_text") == "a b c d e x")
    assert(out2(1).getAs[String]("clean_text") == "y z")
  }

  test("cosineTopK: nearest neighbor of a vector is its duplicate") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.01f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.cosineTopK(e, col("vec_id") === 0, 2)
      .orderBy("rnk").collect()
    assert(out(0).getAs[Long]("vid") == 1L)
    assert(out(0).getAs[Double]("cos_sim") > 0.99)
    assert(out(1).getAs[Long]("vid") == 2L)
  }
}
