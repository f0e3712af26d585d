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
    bg.join(c2, Seq("w1", "w2")).join(ctx, Seq("w1"))
      .join(back, Seq("w2")).crossJoin(broadcast(types))
      .groupBy("doc_id", "lang").agg(
        count(lit(1)).as("n_bigrams"),
        avg(lpCol(discount)).as("avg_lp"),
        min(lpCol(discount)).as("min_lp"))
  }

  /** ln P_KN of one scored bigram row (c2, ctx, n1f, n1b, n_types
    * in scope) — the ONE formula both engines evaluate, identical
    * parenthesization (see [[oracleLpSql]]). */
  private def lpCol(d: Double) =
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
