package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stupid Backoff trigram scorer (Brants, Popat, Xu, Och & Dean 2007,
  * "Large Language Models in Machine Translation" — Google's
  * distributed-counts LM, built precisely for the this-engine regime:
  * trillions of tokens, counts sharded across a cluster, NO
  * normalization pass):
  *
  *   S(w3 | w1 w2) = c(w1 w2 w3) / c(w1 w2)          if c3 > 0
  *                 = α · S(w3 | w2)                   otherwise
  *   S(w3 | w2)    = c(w2 w3) / c(w2)                 if c2 > 0
  *                 = α · S(w3)                        otherwise
  *   S(w3)         = c(w3) / N                        if c1 > 0
  *                 = `unk` floor                      otherwise
  *
  * with the paper's α = 0.4. S is deliberately NOT a probability
  * ("stupid" is the authors' name for dropping normalization): there
  * are no per-context discount or continuation passes, so the whole
  * model is THREE count aggregations — the design that scales where
  * Kneser-Ney's normalization becomes the bottleneck. The engine keeps
  * interpolated KN (`text/KneserNey.scala`) as the quality-side rung
  * and Stupid Backoff as the scale-side rung of the same
  * perplexity-filter ladder.
  *
  * Train/score split: counts come from the standing INDEX slice and
  * scoring runs over a DIFFERENT batch slice (the CCNet shape — the
  * reference-domain LM scores incoming documents), which is also what
  * makes the backoff ladder real: an in-corpus self-score never misses
  * a trigram. Every backoff tier is accounted per document
  * (`n_tri_hits`/`n_bi_hits`/`n_uni_hits`/`n_unk`) — the observability
  * row a filter owner reads to see HOW a corpus is being scored.
  *
  * Oracle parity: all counts are exact integer aggregations; the score
  * is one fixed-parenthesization IEEE expression over them (α and the
  * unk floor CAST to DOUBLE literals so DuckDB never slips into
  * DECIMAL); ln() stays behind the family's emit-boundary round.
  *
  * Scale shape: three count shuffles (map-side combined, keyed by the
  * n-gram), then the batch trigram stream LEFT-joins the count tables
  * — count-table equi-joins, vocabulary-bounded state, no model
  * normalization pass anywhere. The token total N broadcasts as one
  * row. */
object StupidBackoff {

  private def toks(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      TextOps.tokens(col("text")).as("t"))

  private def ngramArr(n: Int): Column =
    when(size(col("t")) >= n,
      transform(sequence(lit(0), size(col("t")) - n), i =>
        struct((1 to n).map(k =>
          element_at(col("t"), i + k).as(s"w$k")): _*)))
      .otherwise(array().cast(
        s"array<struct<${(1 to n).map(k => s"w$k:string").mkString(",")}>>"))

  /** The fitted model over `index`: (c1(w1, c1), c2(w1, w2, c2),
    * c3(w1, w2, w3, c3), nTokens). */
  def model(index: DataFrame): (DataFrame, DataFrame, DataFrame,
      DataFrame) = {
    val tk = toks(index)
    def grams(n: Int): DataFrame = tk
      .select(explode(ngramArr(n)).as("g"))
      .groupBy((1 to n).map(k => col(s"g.w$k").as(s"w$k")): _*)
      .agg(count(lit(1)).as(s"c$n"))
    val c1 = grams(1)
    val n = c1.agg(sum("c1").cast("double").as("n")) // one row
    (c1, grams(2), grams(3), n)
  }

  /** The ONE score expression both engines evaluate (columns `c3`,
    * `c2ctx`, `c2b`, `c1w2`, `c1w3`, `n` in scope, misses null). */
  private def scoreCol(alpha: Double, unk: Double): Column =
    when(col("c3").isNotNull,
      col("c3").cast("double") / col("c2ctx").cast("double"))
      .otherwise(lit(alpha) *
        when(col("c2b").isNotNull,
          col("c2b").cast("double") / col("c1w2").cast("double"))
          .otherwise(lit(alpha) *
            when(col("c1w3").isNotNull,
              col("c1w3").cast("double") / col("n"))
              .otherwise(lit(unk))))

  private def tierCol: Column =
    when(col("c3").isNotNull, lit("tri"))
      .otherwise(when(col("c2b").isNotNull, lit("bi"))
        .otherwise(when(col("c1w3").isNotNull, lit("uni"))
          .otherwise(lit("unk"))))

  /** Per-doc Stupid-Backoff scoring of `batch` under counts from
    * `index`: (doc_id, lang, n_trigrams, n_tri_hits, n_bi_hits,
    * n_uni_hits, n_unk, avg_lp, min_lp) with RAW doubles — consumers
    * round at the emit boundary. Docs with fewer than three tokens
    * have no trigrams and contribute no row. */
  def scoreTrigrams(index: DataFrame, batch: DataFrame, alpha: Double,
      unk: Double): DataFrame = {
    val (c1, c2, c3, n) = model(index)
    val tg = toks(batch).select(col("doc_id"), col("lang"),
        explode(ngramArr(3)).as("g"))
      .select(col("doc_id"), col("lang"), col("g.w1").as("w1"),
        col("g.w2").as("w2"), col("g.w3").as("w3"))
    // score at TYPE level: the five tier joins (each a fresh rekey)
    // run over the batch's DISTINCT trigram types — vocabulary-
    // bounded — and the corpus-sized occurrence stream rekeys ONCE
    // against the scored type table (the KneserNey.scoreBigrams
    // restructure; left-join misses survive because every batch type
    // is in the distinct frame by construction). Same score/tier
    // expressions over the same count columns → bit-identical rows.
    // A STREAMING batch keeps the per-occurrence stream-static join
    // shape (a distinct + stream-stream rejoin is not expressible);
    // both shapes evaluate the same expressions over the same count
    // columns, so batch ≡ stream stays bit-exact (StreamingSpec).
    val scored =
      if (batch.isStreaming)
        tg.join(c3, Seq("w1", "w2", "w3"), "left")
          .join(c2.select(col("w1"), col("w2"), col("c2").as("c2ctx")),
            Seq("w1", "w2"), "left")
          .join(c2.select(col("w1").as("w2"), col("w2").as("w3"),
            col("c2").as("c2b")), Seq("w2", "w3"), "left")
          .join(c1.select(col("w1").as("w2"), col("c1").as("c1w2")),
            Seq("w2"), "left")
          .join(c1.select(col("w1").as("w3"), col("c1").as("c1w3")),
            Seq("w3"), "left")
          .crossJoin(broadcast(n))
          .select(col("doc_id"), col("lang"),
            log(scoreCol(alpha, unk)).as("lp"), tierCol.as("tier"))
      else {
        val btypes = tg.select("w1", "w2", "w3").distinct()
        val typeScored = btypes
          .join(c3, Seq("w1", "w2", "w3"), "left")
          .join(c2.select(col("w1"), col("w2"), col("c2").as("c2ctx")),
            Seq("w1", "w2"), "left")
          .join(c2.select(col("w1").as("w2"), col("w2").as("w3"),
            col("c2").as("c2b")), Seq("w2", "w3"), "left")
          .join(c1.select(col("w1").as("w2"), col("c1").as("c1w2")),
            Seq("w2"), "left")
          .join(c1.select(col("w1").as("w3"), col("c1").as("c1w3")),
            Seq("w3"), "left")
          .crossJoin(broadcast(n))
          .select(col("w1"), col("w2"), col("w3"),
            log(scoreCol(alpha, unk)).as("lp"), tierCol.as("tier"))
        tg.join(typeScored, Seq("w1", "w2", "w3"))
          .select(col("doc_id"), col("lang"), col("lp"), col("tier"))
      }
    scored.groupBy("doc_id", "lang").agg(
      count(lit(1)).as("n_trigrams"),
      sum((col("tier") === "tri").cast("long")).as("n_tri_hits"),
      sum((col("tier") === "bi").cast("long")).as("n_bi_hits"),
      sum((col("tier") === "uni").cast("long")).as("n_uni_hits"),
      sum((col("tier") === "unk").cast("long")).as("n_unk"),
      avg(col("lp")).as("avg_lp"),
      min(col("lp")).as("min_lp"))
  }

  /** The SQL twin of the score + ln (aliases `c3`, `c2ctx`, `c2b`,
    * `c1w2`, `c1w3`, `n` in scope). */
  def oracleLpSql(alpha: Double, unk: Double): String = s"""
    ln(CASE WHEN c3 IS NOT NULL
            THEN CAST(c3 AS DOUBLE) / CAST(c2ctx AS DOUBLE)
            ELSE CAST($alpha AS DOUBLE) *
              (CASE WHEN c2b IS NOT NULL
                    THEN CAST(c2b AS DOUBLE) / CAST(c1w2 AS DOUBLE)
                    ELSE CAST($alpha AS DOUBLE) *
                      (CASE WHEN c1w3 IS NOT NULL
                            THEN CAST(c1w3 AS DOUBLE) / n
                            ELSE CAST($unk AS DOUBLE) END) END) END)"""

  /** DuckDB CTE chain mirroring [[scoreTrigrams]] — counts over
    * `documents WHERE $indexFilter`, scoring over `documents WHERE
    * $batchFilter` — ending at `sbd(doc_id, lang, n_trigrams,
    * n_tri_hits, n_bi_hits, n_uni_hits, n_unk, avg_lp, min_lp)` with
    * the averages RAW (the pplCtes convention). */
  def oracleCtes(alpha: Double, unk: Double, indexFilter: String,
      batchFilter: String): String = s"""
      sbix AS (
        SELECT regexp_split_to_array(text, '[[:space:]]+') AS t
        FROM documents WHERE $indexFilter),
      sbc1 AS (
        SELECT w1, count(*) AS c1 FROM (
          SELECT unnest(t) AS w1 FROM sbix) GROUP BY 1),
      sbn AS (SELECT CAST(sum(c1) AS DOUBLE) AS n FROM sbc1),
      sbc2 AS (
        SELECT w1, w2, count(*) AS c2 FROM (
          SELECT unnest(list_transform(range(len(t) - 1),
                   i -> t[i+1])) AS w1,
                 unnest(list_transform(range(len(t) - 1),
                   i -> t[i+2])) AS w2
          FROM sbix) GROUP BY 1, 2),
      sbc3 AS (
        SELECT w1, w2, w3, count(*) AS c3 FROM (
          SELECT unnest(list_transform(range(len(t) - 2),
                   i -> t[i+1])) AS w1,
                 unnest(list_transform(range(len(t) - 2),
                   i -> t[i+2])) AS w2,
                 unnest(list_transform(range(len(t) - 2),
                   i -> t[i+3])) AS w3
          FROM sbix) GROUP BY 1, 2, 3),
      sbtg AS (
        SELECT doc_id, lang,
               unnest(list_transform(range(len(t) - 2),
                 i -> t[i+1])) AS w1,
               unnest(list_transform(range(len(t) - 2),
                 i -> t[i+2])) AS w2,
               unnest(list_transform(range(len(t) - 2),
                 i -> t[i+3])) AS w3
        FROM (SELECT doc_id, lang,
                     regexp_split_to_array(text, '[[:space:]]+') AS t
              FROM documents WHERE $batchFilter)),
      sbsc AS (
        SELECT g.doc_id, g.lang, t3.c3, x2.c2 AS c2ctx, b2.c2 AS c2b,
               u2.c1 AS c1w2, u3.c1 AS c1w3, nn.n,
               CASE WHEN t3.c3 IS NOT NULL THEN 'tri'
                    WHEN b2.c2 IS NOT NULL THEN 'bi'
                    WHEN u3.c1 IS NOT NULL THEN 'uni'
                    ELSE 'unk' END AS tier
        FROM sbtg g
        LEFT JOIN sbc3 t3 ON g.w1 = t3.w1 AND g.w2 = t3.w2
          AND g.w3 = t3.w3
        LEFT JOIN sbc2 x2 ON g.w1 = x2.w1 AND g.w2 = x2.w2
        LEFT JOIN sbc2 b2 ON g.w2 = b2.w1 AND g.w3 = b2.w2
        LEFT JOIN sbc1 u2 ON g.w2 = u2.w1
        LEFT JOIN sbc1 u3 ON g.w3 = u3.w1
        CROSS JOIN sbn nn),
      sbd AS (
        SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_trigrams,
               CAST(sum(CASE WHEN tier = 'tri' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_tri_hits,
               CAST(sum(CASE WHEN tier = 'bi' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_bi_hits,
               CAST(sum(CASE WHEN tier = 'uni' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_uni_hits,
               CAST(sum(CASE WHEN tier = 'unk' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_unk,
               avg(${oracleLpSql(alpha, unk).trim}) AS avg_lp,
               min(${oracleLpSql(alpha, unk).trim}) AS min_lp
        FROM sbsc GROUP BY 1, 2)"""
}
