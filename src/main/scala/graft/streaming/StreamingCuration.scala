package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Streaming corpus curation — the full per-document gate (quality
  * scoring, language ID, blocklist, PII redaction, exact-dup keying) as
  * ONE map-only column program that runs identically on a batch frame
  * and a Structured Streaming micro-batch, followed by state-backed
  * exact dedup on the content fingerprint.
  *
  * Design (ref the batch curation pipeline `q_corpus_curate` +
  * `q_t_pii` / `q_t_blocklist` / `q_t_quality`; streaming analogue of
  * C4/CCNet-style ingest scrubbing): everything up to dedup is
  * stateless — no shuffle, no watermark needed, arbitrarily wide
  * streams. Dedup is the only stateful stage: `dropDuplicates` on the
  * md5 fingerprint keeps one state row per distinct document ever seen
  * (run on the RocksDB state store at scale, like StreamingDedup), or
  * `dropDuplicatesWithinWatermark` bounds state to the lateness horizon
  * when an event-time column exists.
  */
object StreamingCuration {

  /** Blocklist shared with the batch gate (q_t_blocklist fixture). */
  val Blocklist: Seq[String] = Seq("slow", "big")

  private def blockedCount(toks: Column): Column =
    graft.functions.TokenOps.markerCount(toks, Blocklist)

  /** Map-only curation annotations over a `doc_id`/`text` frame:
    * quality features, predicted language, PII counts + redacted text,
    * blocklist hits, and the exact-dup fingerprint of the ORIGINAL
    * text (dedup identity must not depend on redaction). */
  def annotate(docs: DataFrame): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val Seq(nEmails, nPhones, nIps) = TextOps.piiCounts(col("text"))
    docs
      .select((Seq(col("*")) ++ TextOps.qualityFeatures(col("text"))
        ++ TextOps.langScores(col("text"))): _*)
      .withColumn("lang_pred", TextOps.predictedLang)
      .select((Seq(col("*")) ++ Seq(
        (nEmails + nPhones + nIps).cast("long").as("n_pii"),
        TextOps.piiRedact(col("text")).as("text_redacted"),
        blockedCount(toks).as("n_blocked"),
        md5(col("text").cast("binary")).as("fingerprint"))): _*)
      .drop(TextOps.LangMarkers.map { case (l, _) => s"score_$l" }: _*)
  }

  /** The curation gate over annotated rows: quality floor + blocklist.
    * (PII does not drop a doc — it is redacted in place.) */
  def gate(minQuality: Double): Column =
    col("quality_score") >= minQuality && col("n_blocked") === 0

  /** Full curation program: annotate → gate → exact dedup. On a
    * streaming frame the dedup is state-backed and first-occurrence-
    * across-micro-batches wins; on a batch frame dropDuplicates keeps
    * one row per distinct content but the surviving doc_id is not
    * ordered — use Dedup.exactDuplicates for a canonical batch keeper. */
  def curate(docs: DataFrame, minQuality: Double = 0.5): DataFrame =
    annotate(docs)
      .filter(gate(minQuality))
      .dropDuplicates("fingerprint")

  /** [[curate]] with the TRAINED quality classifier composed after
    * the heuristic gate — the serving shape of the dedup pipeline's
    * stage 6: the frozen weights ride the plan as a map literal
    * (QualityClf.scoreRowwise), so the extra gate is map-only and the
    * program stays stateless up to the dedup. Rows whose round-9
    * probability falls below `probThreshold` drop — pass the
    * calibration-driven operating point chosen by
    * `QualityClf.chooseThreshold` (pipeline stage 6's gate) so batch
    * and stream cut at the SAME point; the default 0.5 is the raw
    * margin>0 decision boundary. Rounding before the compare keeps
    * the rowwise float fold's < 1e-12 drift from flipping a boundary
    * doc vs the batch decimal path. Adds `clf_margin` / `clf_prob`
    * columns. */
  def curateWithClassifier(docs: DataFrame, minQuality: Double,
      nBuckets: Int, weights: Map[Long, Double],
      probThreshold: Double = 0.5): DataFrame = {
    val annotated = annotate(docs).filter(gate(minQuality))
    graft.text.QualityClf.scoreRowwise(annotated, nBuckets, weights)
      .filter(round(col("prob"), 9) >= probThreshold)
      .withColumnRenamed("margin", "clf_margin")
      .withColumnRenamed("prob", "clf_prob")
      .drop("pred")
      .dropDuplicates("fingerprint")
  }
}
