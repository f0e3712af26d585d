package graft

import org.apache.spark.sql.functions._
import graft.text.KneserNey

/** Interpolated Kneser–Ney semantics: the distribution must normalize
  * exactly (Σ_w2 P_KN(w2|w1) = 1 for every context — the telescoping
  * the interpolation is built for), hand-computed probabilities must
  * match on a tiny corpus, and the continuation distribution must
  * de-weight the "Francisco" case (frequent word, single context). */
class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  private val D = 0.75

  private def pKn(c2: Map[(String, String), Long],
      ctx: Map[String, Long], n1f: Map[String, Long],
      n1b: Map[String, Long], types: Long)(w1: String, w2: String)
      : Double =
    (math.max(c2.getOrElse((w1, w2), 0L) - D, 0.0)
      + D * n1f(w1) * (n1b(w2).toDouble / types)) / ctx(w1)

  private def tables(text: String) = {
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val (c2df, ctxdf, backdf, types) = KneserNey.model(docs, D)
    val c2 = c2df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ctx = ctxdf.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val back = backdf.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (c2, ctx.view.mapValues(_._1).toMap,
      ctx.view.mapValues(_._2).toMap, back, types)
  }

  test("hand-computed probabilities on 'a b a b a c' (D = 0.75)") {
    val (c2, ctx, n1f, n1b, types) = tables("a b a b a c")
    // counts: (a,b):2 (b,a):2 (a,c):1; ctx a=3 b=2; N1+(a,.)=2
    // N1+(b,.)=1; N1+(.,a)=1 N1+(.,b)=1 N1+(.,c)=1; types=3
    assert(c2 == Map(("a", "b") -> 2L, ("b", "a") -> 2L,
      ("a", "c") -> 1L))
    assert(ctx == Map("a" -> 3L, "b" -> 2L) && types == 3L)
    val p = pKn(c2, ctx, n1f, n1b, types) _
    assert(math.abs(p("a", "b") - 1.75 / 3) < 1e-12)
    assert(math.abs(p("a", "c") - 0.75 / 3) < 1e-12)
    assert(math.abs(p("b", "a") - 1.5 / 2) < 1e-12)
    // unseen-in-context backoff mass: P(a|a) rides continuation only
    assert(math.abs(p("a", "a") - 0.5 / 3) < 1e-12)
  }

  test("Σ_w2 P_KN(w2|w1) = 1 exactly for every context (the " +
      "interpolation telescopes)") {
    val corpus = "the cat sat on the mat the dog sat on the cat " +
      "a cat on a mat the end of the story of the cat"
    val (c2, ctx, n1f, n1b, types) = tables(corpus)
    val p = pKn(c2, ctx, n1f, n1b, types) _
    val vocabW2 = n1b.keys.toSeq
    for (w1 <- ctx.keys) {
      val total = vocabW2.map(w2 => p(w1, w2)).sum
      assert(math.abs(total - 1.0) < 1e-9,
        s"context '$w1' sums to $total")
    }
  }

  test("continuation counts de-weight the single-context frequent " +
      "word (the Francisco property)") {
    // "san francisco" ×6: francisco is FREQUENT (6 occurrences) but
    // follows only "san"; "things" occurs 3× after 3 DISTINCT words.
    // As a backoff candidate (unseen context "the"), the diverse-
    // context word must outscore the frequent single-context word.
    val corpus = Seq.fill(6)("san francisco").mkString(" ") +
      " good things bad things new things the city"
    val (c2, ctx, n1f, n1b, types) = tables(corpus)
    assert(n1b("francisco") == 1L,
      "francisco must have ONE continuation context")
    assert(n1b("things") == 3L)
    val p = pKn(c2, ctx, n1f, n1b, types) _
    assert(p("the", "things") > p("the", "francisco"),
      "diverse-context word must get more backoff mass")
  }

  test("scoreBigrams per-doc aggregate matches a driver recomputation " +
      "and skips sub-2-token docs") {
    val docs = Seq((1L, "a b a b a c"), (2L, "solo"), (3L, "x y"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val out = KneserNey.scoreBigrams(docs, D).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(2L), "no bigrams → no row")
    assert(out(1L).getAs[Long]("n_bigrams") == 5L)
    assert(out(3L).getAs[Long]("n_bigrams") == 1L)
    // recompute doc 1's avg over the full two-doc corpus model
    val (c2df, ctxdf, backdf, types) = KneserNey.model(docs, D)
    val c2 = c2df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ctxRows = ctxdf.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val back = backdf.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val p = pKn(c2, ctxRows.view.mapValues(_._1).toMap,
      ctxRows.view.mapValues(_._2).toMap, back, types) _
    val bigrams1 = Seq("a" -> "b", "b" -> "a", "a" -> "b", "b" -> "a",
      "a" -> "c")
    val want = bigrams1.map { case (w1, w2) => math.log(p(w1, w2)) }
      .sum / bigrams1.size
    assert(math.abs(out(1L).getAs[Double]("avg_lp") - want) < 1e-9)
  }

  // ---- trigram rung (scoreTrigrams) ---------------------------------

  /** Independent driver recomputation of the interpolated KN trigram
    * model from raw tokens — the spec's own math, sharing no code
    * with the engine. */
  private def triModel(texts: String*) = {
    val toks = texts.map(_.split("\\s+").toSeq)
    val tg = toks.flatMap(t => t.sliding(3).filter(_.size == 3)
      .map(w => (w(0), w(1), w(2))))
    val bg = toks.flatMap(t => t.sliding(2).filter(_.size == 2)
      .map(w => (w(0), w(1))))
    val c3 = tg.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // .toSeq before mapping: keys is a SET, and mapping a set of
    // keys to counts would dedup equal counts before the sum
    val ctx3 = c3.keys.groupBy(k => (k._1, k._2)).view
      .mapValues(ks => (ks.toSeq.map(c3).sum, ks.size.toLong)).toMap
    val cc2 = c3.keys.groupBy(k => (k._2, k._3)).view
      .mapValues(_.size.toLong).toMap
    val g2 = cc2.keys.groupBy(_._1).view
      .mapValues(ks => (ks.toSeq.map(cc2).sum, ks.size.toLong)).toMap
    val cb = bg.distinct
    val n1b = cb.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val types = cb.size.toLong
    def p2(w2: String, w3: String): Double =
      (math.max(cc2.getOrElse((w2, w3), 0L) - D, 0.0)
        + D * g2(w2)._2 * (n1b.getOrElse(w3, 0L).toDouble / types)) /
        g2(w2)._1
    def p3(w1: String, w2: String, w3: String): Double =
      (math.max(c3.getOrElse((w1, w2, w3), 0L) - D, 0.0)
        + D * ctx3((w1, w2))._2 * p2(w2, w3)) / ctx3((w1, w2))._1
    (ctx3.keys.toSeq, g2.keys.toSeq, n1b.keys.toSeq, p3 _)
  }

  test("trigram: Σ_w3 P₃(w3|w1w2) = 1 exactly per context — both " +
      "interpolation levels telescope") {
    val corpus = "the cat sat on the mat the dog sat on the cat " +
      "a cat on a mat the end of the story of the cat sat on"
    val (ctxs, _, vocab, p3) = triModel(corpus)
    for ((w1, w2) <- ctxs) {
      val total = vocab.map(w3 => p3(w1, w2, w3)).sum
      assert(math.abs(total - 1.0) < 1e-9,
        s"context '$w1 $w2' sums to $total")
    }
  }

  test("scoreTrigrams matches the independent driver recomputation " +
      "and skips sub-3-token docs") {
    val t1 = "a b c a b c a b d"
    val t3 = "x y z"
    val docs = Seq((1L, t1), (2L, "two words"), (3L, t3))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val out = KneserNey.scoreTrigrams(docs, D).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(2L), "no trigrams → no row")
    assert(out(1L).getAs[Long]("n_trigrams") == 7L)
    assert(out(3L).getAs[Long]("n_trigrams") == 1L)
    // NOTE: the corpus model includes doc 2's bigram in the bottom-
    // order continuation tables (bigram types), exactly as the engine
    // builds them
    val (_, _, _, p3) = triModel(t1, "two words", t3)
    val tris1 = t1.split(" ").toSeq.sliding(3).toSeq
    val want = tris1.map(w => math.log(p3(w(0), w(1), w(2))))
      .sum / tris1.size
    assert(math.abs(out(1L).getAs[Double]("avg_lp") - want) < 1e-9,
      s"avg_lp ${out(1L).getAs[Double]("avg_lp")} vs $want")
  }

  // ---- pruned trigram table (scoreTrigramsPruned) --------------------

  /** Driver recomputation of the PRUNED model's P: kept types score
    * (c3 − D + λ·P₂)/ctx3, everything else λ·P₂/ctx3 with
    * λ = D·|kept types| + prunedMass — the spec's own math. */
  private def triModelPruned(theta: Long, texts: String*) = {
    val toks = texts.map(_.split("\\s+").toSeq)
    val tg = toks.flatMap(t => t.sliding(3).filter(_.size == 3)
      .map(w => (w(0), w(1), w(2))))
    val bg = toks.flatMap(t => t.sliding(2).filter(_.size == 2)
      .map(w => (w(0), w(1))))
    val c3 = tg.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ctxStats = c3.keys.groupBy(k => (k._1, k._2)).view
      .mapValues { ks =>
        val s = ks.toSeq
        (s.map(c3).sum,                          // ctx3 (full mass)
          s.count(k => c3(k) >= theta).toLong,   // kept types
          s.map(c3).filter(_ < theta).sum)       // pruned mass
      }.toMap
    val cc2 = c3.keys.groupBy(k => (k._2, k._3)).view
      .mapValues(_.size.toLong).toMap
    val g2 = cc2.keys.groupBy(_._1).view
      .mapValues(ks => (ks.toSeq.map(cc2).sum, ks.size.toLong)).toMap
    val cb = bg.distinct
    val n1b = cb.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val types = cb.size.toLong
    def p2(w2: String, w3: String): Double =
      (math.max(cc2.getOrElse((w2, w3), 0L) - D, 0.0)
        + D * g2(w2)._2 * (n1b.getOrElse(w3, 0L).toDouble / types)) /
        g2(w2)._1
    def p3(w1: String, w2: String, w3: String): Double = {
      val (ctx3, kept, pm) = ctxStats((w1, w2))
      val c = c3.getOrElse((w1, w2, w3), 0L)
      val top = if (c >= theta) math.max(c - D, 0.0) else 0.0
      (top + (D * kept + pm) * p2(w2, w3)) / ctx3
    }
    (ctxStats.keys.toSeq, n1b.keys.toSeq, p3 _)
  }

  test("pruned trigram model: Σ_w3 P = 1 exactly per context (the " +
      "pruned mass rides the backoff weight), and theta = 1 " +
      "degenerates to the unpruned scorer") {
    val corpus = "the cat sat on the mat the dog sat on the cat " +
      "a cat on a mat the end of the story of the cat sat on"
    val (ctxs, vocab, p3p) = triModelPruned(2L, corpus)
    for ((w1, w2) <- ctxs) {
      val total = vocab.map(w3 => p3p(w1, w2, w3)).sum
      assert(math.abs(total - 1.0) < 1e-9,
        s"pruned context '$w1 $w2' sums to $total")
    }
    // theta = 1: nothing prunes — engine output equals scoreTrigrams
    val docs = Seq((1L, corpus), (2L, "x y z x y w"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val un = KneserNey.scoreTrigrams(docs, D).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_trigrams"), r.getAs[Double]("avg_lp")))
      .toMap
    val pr1 = KneserNey.scoreTrigramsPruned(docs, D, 1L).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_trigrams"), r.getAs[Double]("avg_lp"),
          r.getAs[Long]("n_pruned_hits"))).toMap
    assert(pr1.keySet == un.keySet)
    for ((id, (n, lp)) <- un) {
      assert(pr1(id)._1 == n && pr1(id)._3 == 0L)
      assert(math.abs(pr1(id)._2 - lp) < 1e-12,
        s"doc $id: theta=1 avg_lp ${pr1(id)._2} != unpruned $lp")
    }
  }

  test("scoreTrigramsPruned matches the independent driver " +
      "recomputation; pruned hits are counted and score strictly " +
      "below their unpruned value") {
    val t1 = "a b c a b c a b d"
    val docs = Seq((1L, t1)).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
    // c3: (a,b,c)=2, (b,c,a)=2, (c,a,b)=2, (a,b,d)=1 — theta 2
    // prunes only (a,b,d): ONE corpus occurrence falls back to λ·P₂
    val out = KneserNey.scoreTrigramsPruned(docs, D, 2L).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_trigrams") == 7L)
    assert(r.getAs[Long]("n_pruned_hits") == 1L)
    val (_, _, p3p) = triModelPruned(2L, t1)
    val tris = t1.split(" ").toSeq.sliding(3).toSeq
    val want = tris.map(w => math.log(p3p(w(0), w(1), w(2))))
      .sum / tris.size
    assert(math.abs(r.getAs[Double]("avg_lp") - want) < 1e-9,
      s"avg_lp ${r.getAs[Double]("avg_lp")} vs $want")
    // pruning can only lose per-trigram probability mass on kept
    // corpus trigrams' contexts: the pruned avg_lp is <= unpruned
    val unLp = KneserNey.scoreTrigrams(docs, D).head()
      .getAs[Double]("avg_lp")
    assert(r.getAs[Double]("avg_lp") < unLp,
      s"pruned avg_lp must drop: ${r.getAs[Double]("avg_lp")} vs $unLp")
  }
}
