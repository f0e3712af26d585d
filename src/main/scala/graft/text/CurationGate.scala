package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The unified curation gate's SIGNAL stages (stages 2–4 of
  * q_t_curation_gate — trained classifier at the calibration-chosen
  * threshold, Kneser-Ney perplexity bucket, DSIR importance weight)
  * as ONE program that runs identically on a batch frame and a
  * Structured Streaming micro-batch — the stream ≡ batch half of the
  * gate (StreamingSpec locks equality).
  *
  * Streaming-legal shape: every model rides the plan as a bounded
  * literal (classifier weights, DSIR bucket log-ratios, per-language
  * KN tercile cuts) or as a vocabulary-bounded STATIC frame (the KN
  * count tables — stream-static left joins, the StupidBackoff
  * serving shape), followed by exactly ONE doc-keyed aggregation and
  * a post-aggregation filter. Exact dedup (stage 1) stays with the
  * state-backed `StreamingCuration` dropDuplicates — it is the only
  * stateful stage and its batch/stream keeper rules are documented
  * there.
  *
  * Scoring rules match the batch query verbatim: classifier gate at
  * round-9 prob ≥ threshold (the rowwise float fold agrees with the
  * batch decimal path within 1e-12 — the established scoreRowwise
  * seam); KN bigrams UNSEEN by the frozen count tables drop from the
  * average (inner-join semantics — on the fit corpus every bigram
  * hits, so this equals the full KN scorer there); docs with no
  * scored bigrams or a language absent from the cuts PASS the ppl
  * gate (can't-score ≠ low-quality, the pipeline's rule); DSIR gate
  * at round-6 log-weight > 0. */
object CurationGate {

  /** Apply the three signal gates to a `(doc_id, lang, text)` frame.
    * Returns survivors with their signals: `(doc_id, lang, clf_prob,
    * kn_ppl, kn_bucket, dsir_logw)`. `knC2(w1, w2, c2)`,
    * `knCtx(w1, ctx, n1f)`, `knBack(w2, n1b)` are the FROZEN count
    * tables (KneserNey.model), `knTypes` the bigram type count,
    * `knCuts` the per-language (cut1, cut2) terciles. */
  def gate(docs: DataFrame, nBuckets: Int,
      clfWeights: Map[Long, Double], probThreshold: Double,
      knC2: DataFrame, knCtx: DataFrame, knBack: DataFrame,
      knTypes: Double, knDiscount: Double,
      knCuts: Map[String, (Double, Double)],
      dsirB: Int, dsirModel: Map[Long, Double], dsirDefault: Double)
      : DataFrame = {
    // map-only signal annotations: classifier prob + DSIR log-weight
    val annotated = Dsir.scoreRowwise(
        QualityClf.scoreRowwise(docs, nBuckets, clfWeights),
        dsirB, dsirModel, dsirDefault)
      .select(col("doc_id"), col("lang"), col("text"),
        col("prob").as("clf_prob"), col("logw").as("dsir_logw"))
    // KN scoring: explode bigrams (explode_outer keeps bigram-less
    // docs alive), stream-static LEFT joins against the frozen count
    // tables, one doc-keyed aggregation
    val toks = TextOps.tokens(col("text"))
    val bgArr = when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => struct(element_at(toks, i + 1).as("w1"),
          element_at(toks, i + 2).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    val ex = annotated.select(col("doc_id"), col("lang"),
        col("clf_prob"), col("dsir_logw"),
        explode_outer(bgArr).as("x"))
      .select(col("doc_id"), col("lang"), col("clf_prob"),
        col("dsir_logw"), col("x.w1").as("w1"), col("x.w2").as("w2"))
    val scored = ex
      .join(knC2, Seq("w1", "w2"), "left")
      .join(knCtx, Seq("w1"), "left")
      .join(knBack, Seq("w2"), "left")
      .withColumn("n_types", lit(knTypes))
    val lp = KneserNey.lpCol(knDiscount)
    val agg = scored
      .groupBy("doc_id", "lang", "clf_prob", "dsir_logw")
      .agg(count(col("c2")).as("n_sc"),
        avg(when(col("c2").isNotNull, lp)).as("avg_lp"))
    val cutsLit: Column =
      if (knCuts.isEmpty) lit(null).cast("map<string,array<double>>")
      else map(knCuts.toSeq.sortBy(_._1).flatMap { case (l, (a, b)) =>
        Seq(lit(l), array(lit(a), lit(b)))
      }: _*)
    val qs = element_at(cutsLit, col("lang"))
    val out = agg
      .withColumn("kn_ppl",
        when(col("n_sc") > 0, round(exp(-col("avg_lp")), 6)))
      .withColumn("kn_bucket",
        when(col("kn_ppl").isNull || qs.isNull,
          lit(null).cast("string"))
          .when(col("kn_ppl") <= element_at(qs, 1), "head")
          .when(col("kn_ppl") <= element_at(qs, 2), "middle")
          .otherwise("tail"))
    out
      .filter(round(col("clf_prob"), 9) >= probThreshold)
      .filter(col("kn_bucket").isNull || col("kn_bucket") =!= "tail")
      .filter(round(col("dsir_logw"), 6) > 0)
      .select("doc_id", "lang", "clf_prob", "kn_ppl", "kn_bucket",
        "dsir_logw")
  }
}
