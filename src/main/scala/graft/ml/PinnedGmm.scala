package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pinned 4-component diagonal-covariance GMM scoring — the
  * stored-model-artifact contract for mixture models, mirroring
  * [[PinnedHmm]] for the HMM decode (ref:
  * src/mf_etl/research/clustering.py:147-182 fits with a pinned
  * `random_state` and then SCORES with the saved model; scoring a given
  * model is pure arithmetic even though the EM fit is engine-private).
  *
  * The pinned model is fully static so the DuckDB oracle can reproduce
  * it without running a fit:
  *  - component means = the first [[K]] embedding vectors (seed-slice
  *    convention shared with PQ/IVF/Lloyd init — data the oracle reads
  *    from the same table);
  *  - diagonal precisions 1/v_{s,j} = 5 + (7s + 3j) mod 11 — INTEGER
  *    arithmetic then one cast, so both engines construct bit-identical
  *    doubles with no float literal parsing involved;
  *  - log-weights log(0.4/0.3/0.2/0.1) and the per-component Gaussian
  *    normalizers -0.5·Σ_j log(2π·v_{s,j}) are folded into ONE constant
  *    [[kConst]] per component, computed here (the only libm calls) and
  *    interpolated into the oracle SQL as shortest-round-trip decimals.
  *
  * Per-row scoring is then libm-free on both sides:
  *   logp_s(x) = kConst_s − 0.5 · Σ_j (x_j − μ_{s,j})² · inv_{s,j}
  * with the weighted squared distance accumulated through exact
  * DECIMAL(38,18) per-term sums (aggregation-order-free) and the final
  * two flops (0.5·wsum, kc − t) identical IEEE ops in both engines.
  * The soft responsibilities need exp() (engine-specific libm), so the
  * observable contract is the argmax component plus the log-density and
  * the top-2 log-density MARGIN — the libm-free confidence measure.
  * The EM fit itself stays covered by q_gmm_clusters + DiagGmmSpec.
  */
object PinnedGmm {

  val K = 4

  /** Mixture weights (sum to 1). */
  val W: Array[Double] = Array(0.4, 0.3, 0.2, 0.1)

  /** Precision (1/variance) for component s, dimension j — integer
    * formula shared verbatim with the oracle SQL. */
  def inv(s: Int, j: Int): Double = (5 + (7 * s + 3 * j) % 11).toDouble

  /** kConst_s = log w_s − 0.5·Σ_j log(2π·v_{s,j}) for dimension count
    * `d` — all libm work, hoisted to the driver once. */
  def kConst(d: Int): Array[Double] =
    Array.tabulate(K)(s => math.log(W(s)) -
      0.5 * (0 until d).map(j => math.log(2 * math.Pi / inv(s, j))).sum)

  /** Distributed pinned-model scoring over `embeddings(vec_id,
    * embedding)`: per row the argmax component, its log-density, and
    * the margin over the runner-up. Shape: one broadcast of the K×d
    * component table into a map-side-combinable (vec_id, s) partial
    * aggregation — the standard one-pass scoring scan at corpus
    * scale. */
  def score(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    val ex = emb.select(col("vec_id"),
      posexplode(col("embedding").cast("array<double>"))
        .as(Seq("i", "x")))
    val comp = ex.filter(col("vec_id") < K)
      .select(col("vec_id").cast("int").as("s"), col("i").as("j"),
        col("x").as("mu"))
      .withColumn("cinv",
        (lit(5) + (lit(7) * col("s") + lit(3) * col("j")) % 11)
          .cast("double"))
    val dim = emb.selectExpr("size(embedding) AS d").head().getInt(0)
    val kc = spark.createDataFrame(
      (0 until K).map(s => (s, kConst(dim)(s)))).toDF("s", "kc")
    val wsum = ex.join(broadcast(comp), col("i") === col("j"))
      .groupBy(col("vec_id"), col("s"))
      .agg(sum(((col("x") - col("mu")) * (col("x") - col("mu"))
        * col("cinv")).cast("decimal(38,18)")).cast("double").as("wsum"))
    val lp = wsum.join(broadcast(kc), Seq("s"))
      .select(col("vec_id"), col("s"),
        (col("kc") - lit(0.5) * col("wsum")).as("lp"))
    val ranked = lp.withColumn("rn", row_number().over(
      Window.partitionBy("vec_id")
        .orderBy(round(col("lp"), 6).desc, col("s"))))
    ranked.filter(col("rn") === 1)
      .select(col("vec_id"), col("s").as("cluster"), col("lp"))
      .join(ranked.filter(col("rn") === 2)
        .select(col("vec_id"), col("lp").as("lp2")), Seq("vec_id"))
      .select(col("vec_id"), col("cluster"),
        round(col("lp"), 6).as("log_density"),
        round(col("lp") - col("lp2"), 6).as("margin"))
  }

  /** DuckDB oracle for [[score]] over the `embeddings` table — the
    * same component construction, exact decimal accumulation, and
    * rounded-argmax ranking; `kConst` interpolated as literals. */
  def oracleSql(d: Int): String = {
    val kcRows = kConst(d).zipWithIndex
      .map { case (v, s) => s"($s, $v)" }.mkString(", ")
    s"""
      WITH gex AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings),
      gcomp AS (
        SELECT vec_id AS s, i AS j, x AS mu,
               CAST(5 + (7 * vec_id + 3 * i) % 11 AS DOUBLE) AS cinv
        FROM gex WHERE vec_id < $K),
      gk (s, kc) AS (VALUES $kcRows),
      gws AS (
        SELECT e.vec_id, c.s,
               CAST(sum(CAST((e.x - c.mu) * (e.x - c.mu) * c.cinv
                 AS DECIMAL(38,18))) AS DOUBLE) AS wsum
        FROM gex e JOIN gcomp c ON e.i = c.j GROUP BY 1, 2),
      glp AS (
        SELECT vec_id, s, kc - 0.5 * wsum AS lp
        FROM gws JOIN gk USING (s)),
      granked AS (
        SELECT vec_id, s, lp, row_number() OVER (PARTITION BY vec_id
          ORDER BY round(lp, 6) DESC, s) AS rn
        FROM glp)
      SELECT a.vec_id, a.s AS cluster, round(a.lp, 6) AS log_density,
             round(a.lp - b.lp, 6) AS margin
      FROM granked a JOIN granked b
        ON a.vec_id = b.vec_id AND b.rn = 2
      WHERE a.rn = 1 ORDER BY a.vec_id"""
  }
}
