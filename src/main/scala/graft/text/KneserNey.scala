package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interpolated Kneser–Ney bigram language model (Kneser & Ney 1995;
  * the interpolated form of Chen & Goodman 1998) — the smoothing the
  * CCNet perplexity filter's KenLM actually uses (Wenzek et al. 2020),
  * replacing the add-one bigram as the production rung of the
  * perplexity-quality ladder (`q_t_bigram_lp` stays as the A/B
  * control):
  *
  *   P_KN(w2|w1) = (max(c(w1,w2) − D, 0) + D · N1+(w1,·) · P_cont(w2))
  *                 / c(w1,·)
  *   P_cont(w2)  = N1+(·,w2) / N1+(·,·)
  *
  * with absolute discount D ∈ (0, 1], context total c(w1,·) =
  * Σ_w2 c(w1,w2), forward continuation count N1+(w1,·) = |{w2 :
  * c(w1,w2) > 0}|, backward continuation count N1+(·,w2) = |{w1 :
  * c(w1,w2) > 0}|, and N1+(·,·) the number of distinct bigram TYPES.
  * The continuation distribution is KN's key idea: a word's unigram
  * backoff weight is how many distinct contexts it FOLLOWS, not how
  * often it occurs — "Francisco" is frequent but follows only "San",
  * so it gets almost no backoff mass. The interpolation telescopes to
  * Σ_w2 P_KN(w2|w1) = 1 exactly (KneserNeySpec locks this).
  *
  * Oracle parity: every count is an exact integer aggregation; the
  * probability is one fixed-parenthesization IEEE expression over
  * those counts (identical cross-engine); ln() is the single libm
  * seam and stays behind the family's emit-boundary round — exactly
  * the add-one stack's discipline, so the whole scorer is
  * hash-checkable.
  *
  * Scale shape (same as the add-one stage it upgrades): one
  * bigram-keyed count shuffle builds c2; ctx/N1+ forward roll up from
  * c2 keyed by w1 (map-side combinable), backward by w2; the type
  * total broadcasts; scoring is count-table equi-joins against the
  * corpus bigram stream. Nothing grows with corpus size except the
  * count tables themselves (vocabulary-bounded). */
object KneserNey {

  /** Per-doc KN scoring frame `(doc_id, lang, n_bigrams, avg_lp,
    * min_lp)` with RAW doubles — consumers round at the emit boundary
    * (the bigramLp contract). Docs with fewer than two tokens have no
    * bigrams and contribute no row. */
  def scoreBigrams(docs: DataFrame, discount: Double): DataFrame = {
    val b = docs.select(col("doc_id"), col("lang"),
      TextOps.tokens(col("text")).as("t"))
    val bgArr = when(size(col("t")) >= 2,
      transform(sequence(lit(0), size(col("t")) - 2),
        i => struct(element_at(col("t"), i + 1).as("w1"),
          element_at(col("t"), i + 2).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    val bg = b.select(col("doc_id"), col("lang"), explode(bgArr).as("x"))
      .select(col("doc_id"), col("lang"),
        col("x.w1").as("w1"), col("x.w2").as("w2"))
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val ctx = c2.groupBy("w1").agg(sum("c2").as("ctx"),
      count(lit(1)).as("n1f"))
    val back = c2.groupBy("w2").agg(count(lit(1)).as("n1b"))
    val types = c2.agg(count(lit(1)).cast("double").as("n_types"))
    // score at TYPE level first: the count-table joins run over the
    // vocabulary-bounded c2 frame, and the CORPUS-sized occurrence
    // stream is shuffled exactly once (against the scored type table)
    // instead of once per count table — same lp expression over the
    // same count columns, so every per-row double is bit-identical
    // (guide §2.3: aggregate/join small before rekeying the big side)
    val typeLp = c2.join(ctx, Seq("w1")).join(back, Seq("w2"))
      .crossJoin(broadcast(types))
      .select(col("w1"), col("w2"), lpCol(discount).as("lp"))
    bg.join(typeLp, Seq("w1", "w2"))
      .groupBy("doc_id", "lang").agg(
        count(lit(1)).as("n_bigrams"),
        avg(col("lp")).as("avg_lp"),
        min(col("lp")).as("min_lp"))
  }

  /** ln P_KN of one scored bigram row (c2, ctx, n1f, n1b, n_types
    * in scope) — the ONE formula both engines evaluate, identical
    * parenthesization (see [[oracleLpSql]]). */
  private[text] def lpCol(d: Double) =
    log((greatest(col("c2") - lit(d), lit(0.0))
      + lit(d) * col("n1f") * (col("n1b") / col("n_types")))
      / col("ctx"))

  /** The count TABLES of the fitted model, for consumers that need
    * the distribution itself rather than per-doc scores (the spec's
    * normalization lock): (c2(w1, w2, c2), ctx(w1, ctx, n1f),
    * back(w2, n1b), nTypes). */
  def model(docs: DataFrame, discount: Double)
      : (DataFrame, DataFrame, DataFrame, Long) = {
    val b = docs.select(TextOps.tokens(col("text")).as("t"))
    val bgArr = when(size(col("t")) >= 2,
      transform(sequence(lit(0), size(col("t")) - 2),
        i => struct(element_at(col("t"), i + 1).as("w1"),
          element_at(col("t"), i + 2).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    val bg = b.select(explode(bgArr).as("x"))
      .select(col("x.w1").as("w1"), col("x.w2").as("w2"))
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val ctx = c2.groupBy("w1").agg(sum("c2").as("ctx"),
      count(lit(1)).as("n1f"))
    val back = c2.groupBy("w2").agg(count(lit(1)).as("n1b"))
    (c2, ctx, back, c2.count())
  }

  /** The SQL twin of [[lpCol]] over aliases `c.c2, x.ctx, x.n1f,
    * b.n1b, t.n_types` — discount forced to DOUBLE so DuckDB never
    * slips into DECIMAL arithmetic on the literal. */
  def oracleLpSql(discount: Double): String =
    s"""ln((greatest(c.c2 - CAST($discount AS DOUBLE), 0.0)
           + CAST($discount AS DOUBLE) * x.n1f * (b.n1b / t.n_types))
           / x.ctx)"""

  /** Per-doc interpolated KN TRIGRAM scoring `(doc_id, lang,
    * n_trigrams, avg_lp, min_lp)` with RAW doubles — the actual KenLM
    * order family above the bigram rung (Chen & Goodman 1998's
    * modified-lower-order construction at one shared discount D):
    *
    *   P₃(w3|w1w2) = (max(c(w1w2w3) − D, 0)
    *                  + D · N1+(w1w2·) · P₂(w3|w2)) / c(w1w2·)
    *   P₂(w3|w2)   = (max(N1+(·w2w3) − D, 0)
    *                  + D · N1+(w2·) · P_cont(w3)) / N1+(·w2·)
    *   P_cont(w3)  = N1+(·w3) / N1+(··)      (bigram types, as in
    *                                          the bigram model)
    *
    * The MIDDLE order counts CONTINUATIONS, not occurrences —
    * N1+(·w2w3) = distinct left contexts of (w2,w3) — which is KN's
    * defining idea applied one order up; both interpolations
    * telescope to Σ_w3 P = 1 per context (KneserNeySpec locks the
    * trigram level against a driver recomputation). Every count is
    * an exact integer aggregation; the probability is ONE
    * fixed-parenthesization IEEE expression ([[oracleLp3Sql]]); ln
    * stays behind the emit round. Scale shape: one trigram-keyed
    * count shuffle + vocabulary-bounded roll-ups, scoring is count-
    * table equi-joins — the bigram stage's shape with one more count
    * table. Docs with fewer than three tokens contribute no row. */
  def scoreTrigrams(docs: DataFrame, discount: Double): DataFrame = {
    val (tg, c3, cc2, g2, back, types) = trigramFrames(docs)
    val ctx3 = c3.groupBy("w1", "w2").agg(sum("c3").as("ctx3"),
      count(lit(1)).as("n1f3"))
    // type-level scoring (the scoreBigrams restructure): five count
    // tables join over the vocabulary-bounded c3 type frame, the
    // corpus-sized trigram stream rekeys ONCE — bit-identical lp
    val typeLp = c3.join(ctx3, Seq("w1", "w2"))
      .join(cc2, Seq("w2", "w3")).join(g2, Seq("w2"))
      .join(back, Seq("w3")).crossJoin(broadcast(types))
      .select(col("w1"), col("w2"), col("w3"),
        lp3Col(discount).as("lp"))
    tg.join(typeLp, Seq("w1", "w2", "w3"))
      .groupBy("doc_id", "lang").agg(
        count(lit(1)).as("n_trigrams"),
        avg(col("lp")).as("avg_lp"),
        min(col("lp")).as("min_lp"))
  }

  /** The shared trigram-model frames — (tg, c3, cc2, g2, back,
    * types): the per-doc trigram stream, the top count table, the
    * middle-order continuation tables and the bigram-level bottom
    * tables. ONE construction for the unpruned and pruned scorers. */
  private def trigramFrames(docs: DataFrame): (DataFrame, DataFrame,
      DataFrame, DataFrame, DataFrame, DataFrame) = {
    val b = docs.select(col("doc_id"), col("lang"),
      TextOps.tokens(col("text")).as("t"))
    val tgArr = when(size(col("t")) >= 3,
      transform(sequence(lit(0), size(col("t")) - 3),
        i => struct(element_at(col("t"), i + 1).as("w1"),
          element_at(col("t"), i + 2).as("w2"),
          element_at(col("t"), i + 3).as("w3"))))
      .otherwise(array()
        .cast("array<struct<w1:string,w2:string,w3:string>>"))
    val tg = b.select(col("doc_id"), col("lang"),
        explode(tgArr).as("x"))
      .select(col("doc_id"), col("lang"), col("x.w1").as("w1"),
        col("x.w2").as("w2"), col("x.w3").as("w3"))
    val c3 = tg.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
    // middle order: continuation counts over TRIGRAM types
    val cc2 = c3.groupBy("w2", "w3").agg(count(lit(1)).as("cc2"))
    val g2 = cc2.groupBy("w2").agg(sum("cc2").as("cctx2"),
      count(lit(1)).as("n1f2"))
    // bottom order: the bigram model's continuation tables
    val bgArr = when(size(col("t")) >= 2,
      transform(sequence(lit(0), size(col("t")) - 2),
        i => struct(element_at(col("t"), i + 1).as("w1"),
          element_at(col("t"), i + 2).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    val bgc = b.select(explode(bgArr).as("x"))
      .select(col("x.w1").as("bw1"), col("x.w2").as("bw2"))
      .groupBy("bw1", "bw2").agg(count(lit(1)).as("cb"))
    val back = bgc.groupBy(col("bw2").as("w3"))
      .agg(count(lit(1)).as("n1b"))
    val types = bgc.agg(count(lit(1)).cast("double").as("n_types"))
    (tg, c3, cc2, g2, back, types)
  }

  /** The trigram TYPE table (w1, w2, w3, c3) — the frame whose size
    * the pruning frontier prices. */
  def trigramCounts(docs: DataFrame): DataFrame = trigramFrames(docs)._2

  /** Per-doc scoring under a COUNT-THRESHOLD-PRUNED trigram table —
    * the KenLM `filter`/`--prune` convention that keeps the LM
    * bounded on a 100 TB corpus (the top table is the one that grows
    * with the data; middle/bottom orders are vocabulary-bounded and
    * stay unpruned — one-order pruning, stated): trigram types with
    * c3 < `minCount` are DROPPED from the stored table and their
    * occurrence mass rides the context's backoff weight instead,
    *
    *   λ(w1w2) = D·N1+kept(w1w2·) + prunedMass(w1w2)
    *   P(w3|w1w2) = (1{c3 ≥ θ}·max(c3 − D, 0) + λ·P₂(w3|w2)) / c(w1w2·)
    *
    * so Σ_w3 P = 1 still telescopes EXACTLY (Σkept(c3 − D) + λ =
    * ctx3 − pm − D·n1f3p + D·n1f3p + pm — KneserNeySpec locks it),
    * and at minCount = 1 nothing prunes and the scorer degenerates to
    * [[scoreTrigrams]] (also spec-locked). Returns (doc_id, lang,
    * n_trigrams, n_pruned_hits, avg_lp, min_lp) — n_pruned_hits is
    * the count of corpus trigrams that fell back to λ·P₂. */
  def scoreTrigramsPruned(docs: DataFrame, discount: Double,
      minCount: Long): DataFrame = {
    val (tg, c3, cc2, g2, back, types) = trigramFrames(docs)
    val ctx3p = c3.groupBy("w1", "w2").agg(
      sum("c3").as("ctx3"),
      count(when(col("c3") >= minCount, lit(1))).as("n1f3p"),
      sum(when(col("c3") < minCount, col("c3")).otherwise(lit(0L)))
        .as("pm"))
    // type-level scoring (the scoreBigrams restructure) — c3 rides
    // along so the pruned-hit flag stays a type-level property
    val typeLp = c3.join(ctx3p, Seq("w1", "w2"))
      .join(cc2, Seq("w2", "w3")).join(g2, Seq("w2"))
      .join(back, Seq("w3")).crossJoin(broadcast(types))
      .select(col("w1"), col("w2"), col("w3"), col("c3"),
        lp3pCol(discount, minCount).as("lp"))
    tg.join(typeLp, Seq("w1", "w2", "w3"))
      .groupBy("doc_id", "lang").agg(
        count(lit(1)).as("n_trigrams"),
        sum(when(col("c3") < minCount, 1L).otherwise(0L))
          .as("n_pruned_hits"),
        avg(col("lp")).as("avg_lp"),
        min(col("lp")).as("min_lp"))
  }

  /** ln P of one PRUNED-model trigram row (c3, ctx3, n1f3p, pm, cc2,
    * cctx2, n1f2, n1b, n_types in scope) — ONE formula, identical
    * parenthesization to [[oracleLp3PrunedSql]]. */
  private def lp3pCol(d: Double, theta: Long) =
    log(((when(col("c3") >= theta,
      greatest(col("c3") - lit(d), lit(0.0))).otherwise(lit(0.0)))
      + (lit(d) * col("n1f3p") + col("pm"))
        * ((greatest(col("cc2") - lit(d), lit(0.0))
          + lit(d) * col("n1f2") * (col("n1b") / col("n_types")))
          / col("cctx2")))
      / col("ctx3"))

  /** SQL twin of [[lp3pCol]] over aliases `c.c3, x.ctx3, x.n1f3p,
    * x.pm, m.cc2, gg.cctx2, gg.n1f2, b.n1b, t.n_types`. */
  def oracleLp3PrunedSql(d: Double, theta: Long): String =
    s"""ln(((CASE WHEN c.c3 >= $theta
             THEN greatest(c.c3 - CAST($d AS DOUBLE), 0.0)
             ELSE 0.0 END)
           + (CAST($d AS DOUBLE) * x.n1f3p + x.pm)
             * ((greatest(m.cc2 - CAST($d AS DOUBLE), 0.0)
               + CAST($d AS DOUBLE) * gg.n1f2 * (b.n1b / t.n_types))
               / gg.cctx2))
           / x.ctx3)"""

  /** Pruned-model per-doc chain under prefix `pfx` — REQUIRES
    * [[oracleCtes3]] in the same WITH (it reuses the shared `k3g`/
    * `k3c3`/`k3m`/`k3g2`/`k3bt`/`k3ty` frames, so the two models can
    * never drift): the pruned context stats `${pfx}cx` (full
    * occurrence totals, KEPT type counts, pruned mass) and the scored
    * per-doc roll-up `${pfx}d(doc_id, lang, n_trigrams,
    * n_pruned_hits, avg_lp, min_lp)`. */
  def oracleCtes3Pruned(discount: Double, theta: Long,
      pfx: String): String = s"""
      ${pfx}cx AS (
        SELECT w1, w2, CAST(sum(c3) AS BIGINT) AS ctx3,
               count(CASE WHEN c3 >= $theta THEN 1 END) AS n1f3p,
               CAST(sum(CASE WHEN c3 < $theta THEN c3 ELSE 0 END)
                 AS BIGINT) AS pm
        FROM k3c3 GROUP BY 1, 2),
      ${pfx}sc AS (
        SELECT g.doc_id, g.lang, c.c3,
               ${oracleLp3PrunedSql(discount, theta).trim} AS lp
        FROM k3g g
        JOIN k3c3 c ON g.w1 = c.w1 AND g.w2 = c.w2 AND g.w3 = c.w3
        JOIN ${pfx}cx x ON g.w1 = x.w1 AND g.w2 = x.w2
        JOIN k3m m ON g.w2 = m.w2 AND g.w3 = m.w3
        JOIN k3g2 gg ON g.w2 = gg.w2
        JOIN k3bt b ON g.w3 = b.w3
        CROSS JOIN k3ty t),
      ${pfx}d AS (
        SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_trigrams,
               CAST(sum(CASE WHEN c3 < $theta THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_pruned_hits,
               avg(lp) AS avg_lp, min(lp) AS min_lp
        FROM ${pfx}sc GROUP BY 1, 2)"""

  /** ln P₃ of one scored trigram row (c3, ctx3, n1f3, cc2, cctx2,
    * n1f2, n1b, n_types in scope) — the ONE formula both engines
    * evaluate, identical parenthesization ([[oracleLp3Sql]]). */
  private def lp3Col(d: Double) =
    log((greatest(col("c3") - lit(d), lit(0.0))
      + lit(d) * col("n1f3")
        * ((greatest(col("cc2") - lit(d), lit(0.0))
          + lit(d) * col("n1f2") * (col("n1b") / col("n_types")))
          / col("cctx2")))
      / col("ctx3"))

  /** The SQL twin of [[lp3Col]] over aliases `c.c3, x.ctx3, x.n1f3,
    * m.cc2, gg.cctx2, gg.n1f2, b.n1b, t.n_types` (`g` is the trigram
    * stream). */
  def oracleLp3Sql(discount: Double): String =
    s"""ln((greatest(c.c3 - CAST($discount AS DOUBLE), 0.0)
           + CAST($discount AS DOUBLE) * x.n1f3
             * ((greatest(m.cc2 - CAST($discount AS DOUBLE), 0.0)
               + CAST($discount AS DOUBLE) * gg.n1f2
                 * (b.n1b / t.n_types))
               / gg.cctx2))
           / x.ctx3)"""

  /** DuckDB CTE chain mirroring [[scoreTrigrams]] over `documents` —
    * ends at `kn3d(doc_id, lang, n_trigrams, avg_lp, min_lp)`, RAW
    * averages (the knd convention). Self-contained `k3*` names so the
    * chain coexists with the bigram chain in one WITH (the agreement
    * row). */
  def oracleCtes3(discount: Double): String = s"""
      k3b0 AS (
        SELECT doc_id, lang,
               regexp_split_to_array(text, '[[:space:]]+') AS t
        FROM documents),
      k3g AS (
        SELECT doc_id, lang,
               unnest(list_transform(range(len(t) - 2), i -> t[i+1]))
                 AS w1,
               unnest(list_transform(range(len(t) - 2), i -> t[i+2]))
                 AS w2,
               unnest(list_transform(range(len(t) - 2), i -> t[i+3]))
                 AS w3
        FROM k3b0),
      k3c3 AS (
        SELECT w1, w2, w3, count(*) AS c3 FROM k3g GROUP BY 1, 2, 3),
      k3cx AS (
        SELECT w1, w2, CAST(sum(c3) AS BIGINT) AS ctx3,
               count(*) AS n1f3
        FROM k3c3 GROUP BY 1, 2),
      k3m AS (SELECT w2, w3, count(*) AS cc2 FROM k3c3 GROUP BY 1, 2),
      k3g2 AS (
        SELECT w2, CAST(sum(cc2) AS BIGINT) AS cctx2,
               count(*) AS n1f2
        FROM k3m GROUP BY 1),
      k3bb AS (
        SELECT w1, w2, count(*) AS cb FROM (
          SELECT unnest(list_transform(range(len(t) - 1),
                   i -> t[i+1])) AS w1,
                 unnest(list_transform(range(len(t) - 1),
                   i -> t[i+2])) AS w2
          FROM k3b0)
        GROUP BY 1, 2),
      k3bt AS (SELECT w2 AS w3, count(*) AS n1b FROM k3bb GROUP BY 1),
      k3ty AS (SELECT CAST(count(*) AS DOUBLE) AS n_types FROM k3bb),
      k3sc AS (
        SELECT g.doc_id, g.lang, ${oracleLp3Sql(discount).trim} AS lp
        FROM k3g g
        JOIN k3c3 c ON g.w1 = c.w1 AND g.w2 = c.w2 AND g.w3 = c.w3
        JOIN k3cx x ON g.w1 = x.w1 AND g.w2 = x.w2
        JOIN k3m m ON g.w2 = m.w2 AND g.w3 = m.w3
        JOIN k3g2 gg ON g.w2 = gg.w2
        JOIN k3bt b ON g.w3 = b.w3
        CROSS JOIN k3ty t),
      kn3d AS (
        SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_trigrams,
               avg(lp) AS avg_lp, min(lp) AS min_lp
        FROM k3sc GROUP BY 1, 2)"""

  /** DuckDB CTE chain mirroring [[scoreBigrams]] over `documents` —
    * ends at `knd(doc_id, lang, n_bigrams, avg_lp, min_lp)` with the
    * averages RAW (consumers round at the emit boundary, the pplCtes
    * convention). */
  def oracleCtes(discount: Double): String = s"""
      knb0 AS (
        SELECT doc_id, lang,
               regexp_split_to_array(text, '[[:space:]]+') AS t
        FROM documents),
      knb AS (
        SELECT doc_id, lang,
               unnest(list_transform(range(len(t) - 1), i -> t[i+1]))
                 AS w1,
               unnest(list_transform(range(len(t) - 1), i -> t[i+2]))
                 AS w2
        FROM knb0),
      knc2 AS (SELECT w1, w2, count(*) AS c2 FROM knb GROUP BY 1, 2),
      knctx AS (
        SELECT w1, CAST(sum(c2) AS BIGINT) AS ctx, count(*) AS n1f
        FROM knc2 GROUP BY 1),
      knbk AS (SELECT w2, count(*) AS n1b FROM knc2 GROUP BY 1),
      knty AS (SELECT CAST(count(*) AS DOUBLE) AS n_types FROM knc2),
      knsc AS (
        SELECT g.doc_id, g.lang, ${oracleLpSql(discount).trim} AS lp
        FROM knb g
        JOIN knc2 c ON g.w1 = c.w1 AND g.w2 = c.w2
        JOIN knctx x ON g.w1 = x.w1
        JOIN knbk b ON g.w2 = b.w2
        CROSS JOIN knty t),
      knd AS (
        SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_bigrams,
               avg(lp) AS avg_lp, min(lp) AS min_lp
        FROM knsc GROUP BY 1, 2)"""
}
