package graft

import graft.text.StupidBackoff

/** Stupid-Backoff semantics: the three-tier ladder must serve each
  * trigram from the highest tier with a nonzero count (trigram hit →
  * no α; bigram backoff → α; unigram backoff → α²; unseen word → the
  * α²·unk floor), per-doc tier accounting must match, and docs
  * without trigrams must contribute no row. */
class StupidBackoffSpec extends SparkSpec {
  import spark.implicits._

  private val alpha = 0.4
  private val unk = 1e-9

  // index: N = 6; c1 a:2 b:2 c:1 d:1; c2 ab:2 bc:1 ca:1 bd:1;
  // c3 abc, bca, cab, abd (all 1)
  private lazy val index = Seq((1L, "en", "a b c a b d"))
    .toDF("doc_id", "lang", "text")

  private def score(batch: Seq[(Long, String, String)]) =
    StupidBackoff.scoreTrigrams(index,
        batch.toDF("doc_id", "lang", "text"), alpha, unk)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getDouble(7))).toMap

  test("tier ladder: trigram hit, bigram backoff, unigram backoff, " +
      "unk floor — each at its hand-computed score") {
    val got = score(Seq(
      (5L, "en", "a b c x"),   // (a,b,c) tri 1/2; (b,c,x) unk
      (10L, "en", "d a b"),    // (d,a,b) bi: α·(2/2) = α
      (15L, "en", "x y d")))   // (x,y,d) uni: α²·(1/6)
    // doc 5: 2 trigrams, 1 tri + 1 unk
    val (n5, tri5, bi5, uni5, unk5, avg5) = got(5L)
    assert((n5, tri5, bi5, uni5, unk5) == (2L, 1L, 0L, 0L, 1L))
    val exp5 = (math.log(0.5)
      + math.log(alpha * (alpha * unk))) / 2.0
    assert(math.abs(avg5 - exp5) < 1e-12, s"doc5 avg $avg5 != $exp5")
    // doc 10: one bigram-tier trigram at α · c2(a,b)/c1(a) = 0.4
    val (n10, tri10, bi10, _, _, avg10) = got(10L)
    assert((n10, tri10, bi10) == (1L, 0L, 1L))
    assert(math.abs(avg10 - math.log(alpha * (2.0 / 2.0))) < 1e-12)
    // doc 15: one unigram-tier trigram at α² · c1(d)/N = α²/6
    val (n15, _, _, uni15, _, avg15) = got(15L)
    assert((n15, uni15) == (1L, 1L))
    assert(math.abs(avg15
      - math.log(alpha * (alpha * (1.0 / 6.0)))) < 1e-12)
  }

  test("docs with fewer than three tokens contribute no row") {
    val got = score(Seq((20L, "en", "a b"), (21L, "en", "a"),
      (22L, "en", "a b c")))
    assert(got.keySet == Set(22L))
    assert(got(22L)._1 == 1L)
  }

  test("min_lp is the worst-served trigram, not the average") {
    val df = StupidBackoff.scoreTrigrams(index,
      Seq((5L, "en", "a b c x")).toDF("doc_id", "lang", "text"),
      alpha, unk).collect().head
    val minLp = df.getDouble(8)
    assert(math.abs(minLp - math.log(alpha * (alpha * unk))) < 1e-12)
  }
}
