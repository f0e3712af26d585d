package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023): pick raw-corpus documents whose hashed-n-gram
  * feature distribution looks like a target domain.
  *
  * The pipeline is the paper's, re-expressed as three declarative
  * stages:
  *  1. featurize — every unigram and adjacent bigram hashes into one
  *     of `nBuckets` buckets (map-only; the hashing is what makes the
  *     model size CONSTANT in corpus size — the paper's design point);
  *  2. fit — two hashed bag-of-n-grams unigram models, target p̂ (the
  *     target slice) and raw q̂ (the whole pool), each one bucket-keyed
  *     aggregate that map-side-combines down to ≤ nBuckets rows per
  *     partition, add-1-smoothed; their per-bucket log-ratio is a
  *     broadcast table;
  *  3. score — per-doc log importance weight
  *     log ŵ(x) = Σ_grams [log p̂(bucket) − log q̂(bucket)], computed as
  *     a (doc, bucket)-count aggregate joined against the broadcast
  *     ratio table (≤ nBuckets float terms per doc, never a model-side
  *     shuffle).
  *
  * Resampling is Gumbel-top-k (sampling without replacement with
  * probability ∝ ŵ): rank on log ŵ + g where g = −ln(−ln(u)) and u is
  * a DETERMINISTIC md5-derived uniform in (0,1) — portable across
  * engines, so even the stochastic step is oracle-checkable.
  *
  * All hashes are the portable md5-mod-prime scheme (TextOps.hashMod),
  * salted `dsir_` so DSIR buckets are independent of the dedup
  * families' gram hashes.
  */
object Dsir {

  /** Hashed n-gram feature stream: `(doc_id, lang, bk)` with one row
    * per unigram and per adjacent bigram occurrence (counts, not
    * distinct — the paper's bag-of-n-grams). Map-only: tokenize,
    * explode, hash, mod. */
  def features(docs: DataFrame, nBuckets: Int): DataFrame = {
    val b = docs.select(col("doc_id"), col("lang"),
      TextOps.tokens(col("text")).as("t"))
    val uni = b.select(col("doc_id"), col("lang"),
      explode(col("t")).as("g"))
    // sub-2-token docs have no bigrams (sequence would count DOWN) —
    // same guard as the bigram-LM family
    val bgArr = when(size(col("t")) >= 2,
      transform(sequence(lit(0), size(col("t")) - 2),
        i => concat_ws(" ", element_at(col("t"), i + 1),
          element_at(col("t"), i + 2))))
      .otherwise(array().cast("array<string>"))
    val bg = b.select(col("doc_id"), col("lang"), explode(bgArr).as("g"))
    uni.unionAll(bg).select(col("doc_id"), col("lang"),
      (TextOps.hashMod(concat(lit("dsir_"), col("g"))) % nBuckets)
        .as("bk"))
  }

  /** Per-bucket add-1-smoothed log importance ratio
    * `(bk, diff = log p̂_target − log q̂_raw)` — ≤ nBuckets rows, the
    * whole "model". Raw = every doc in the pool (the target slice
    * included: DSIR selects FROM the pool, so the denominator is the
    * pool's own distribution). Buckets the target never hits get the
    * add-1 floor via the left join's null. */
  def bucketLogRatio(feat: DataFrame, nBuckets: Int,
      targetLang: String): DataFrame = {
    val rc = feat.groupBy("bk").agg(count(lit(1)).as("rc"))
    val tc = feat.filter(col("lang") === targetLang)
      .groupBy("bk").agg(count(lit(1)).as("tc"))
    val rn = rc.agg(sum("rc").cast("double").as("rn"))
    val tn = tc.agg(sum("tc").cast("double").as("tn"))
    rc.join(broadcast(tc), Seq("bk"), "left")
      .crossJoin(broadcast(rn)).crossJoin(broadcast(tn))
      .select(col("bk"),
        (log((coalesce(col("tc"), lit(0L)) + 1.0)
            / (col("tn") + nBuckets))
          - log((col("rc") + 1.0) / (col("rn") + nBuckets))).as("diff"))
  }

  /** Per-doc `(doc_id, lang, n_grams, logw)` — raw double `logw`
    * (callers round at the emit boundary). The gram stream collapses
    * to (doc, bucket) counts first so the float sum has ≤ nBuckets
    * terms per doc regardless of document length. */
  def logWeights(docs: DataFrame, nBuckets: Int,
      targetLang: String): DataFrame = {
    val feat = features(docs, nBuckets)
    val ratio = bucketLogRatio(feat, nBuckets, targetLang)
    feat.groupBy("doc_id", "lang", "bk")
      .agg(count(lit(1)).as("nb"))
      .join(broadcast(ratio), "bk")
      .groupBy("doc_id", "lang")
      .agg(sum("nb").as("n_grams"),
        sum(col("nb") * col("diff")).as("logw"))
  }

  /** Deterministic Gumbel noise for an id column: g = −ln(−ln(u)),
    * u = (hash + 0.5) / P ∈ (0, 1) — the md5 hash IS the random draw,
    * so resampling is reproducible and cross-engine identical. */
  def gumbel(docId: Column): Column = {
    val u = (TextOps.hashMod(concat(lit("dsirg_"),
      docId.cast("string"))) + 0.5) / TextOps.HashPrime
    -log(-log(u))
  }

  /** The fitted model as driver state: per-bucket log-ratio map plus
    * the default for buckets NO training gram hashed into (both
    * smoothed counts are the add-1 floor there:
    * diff = ln((rn+B)/(tn+B)) ) — the batch inner join never meets
    * such a bucket when scoring the fit corpus, but a serving scorer
    * must not drop unseen buckets. Bounded: ≤ nBuckets entries. */
  def fitModel(docs: DataFrame, nBuckets: Int, targetLang: String)
      : (Map[Long, Double], Double) = {
    val feat = features(docs, nBuckets)
    val m = bucketLogRatio(feat, nBuckets, targetLang)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val (rn, tn) = {
      val t = feat.agg(
        count(lit(1)).cast("double"),
        sum(when(col("lang") === targetLang, 1L).otherwise(0L))
          .cast("double")).head()
      (t.getDouble(0), t.getDouble(1))
    }
    // with tc = rc = 0: ln(1/(tn+B)) − ln(1/(rn+B)) = ln((rn+B)/(tn+B))
    (m, math.log((rn + nBuckets) / (tn + nBuckets)))
  }

  /** STATELESS per-row scorer against a frozen model — the serving
    * shape: the model rides the plan as an O(nBuckets) map literal, so
    * scoring new documents (a crawl stream, a fresh shard) is map-only
    * — no shuffle, no state store, identical on a batch frame and a
    * Structured Streaming micro-batch. Emits `n_grams` and `logw`
    * (float-fold in document order; agrees with the batch aggregate to
    * fp round-off, which the emit-boundary rounding absorbs). */
  def scoreRowwise(docs: DataFrame, nBuckets: Int,
      model: Map[Long, Double], defaultDiff: Double): DataFrame = {
    val mapCol =
      map(model.toSeq.sortBy(_._1)
        .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val toks = TextOps.tokens(col("text"))
    val bgArr = when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i + 1),
          element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))
    val grams = concat(toks, bgArr)
    val bucket = (g: Column) =>
      TextOps.hashMod(concat(lit("dsir_"), g)) % nBuckets
    docs.withColumn("n_grams", size(grams).cast("long"))
      .withColumn("logw", aggregate(grams, lit(0.0d),
        (acc, g) => acc + coalesce(element_at(mapCol, bucket(g)),
          lit(defaultDiff))))
  }
}
