package graft.ml

import org.apache.spark.ml.clustering.{GaussianMixture, KMeans}
import org.apache.spark.ml.evaluation.ClusteringEvaluator
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clustering state discovery via MLlib
  * (ref: src/mf_etl/research/clustering.py:74-203):
  * KMeans with an n_init-style best-of-seeds loop (MLlib has no n_init),
  * GaussianMixture with labels/maxProb/entropy, silhouette evaluation
  * (sampled), and Davies-Bouldin as a custom aggregation.
  *
  * Documented divergences from the reference (SURVEY §7.4): MLlib GMM is
  * full-covariance (reference: diagonal); sampling is Bernoulli.
  */
object Clustering {

  /** Attach `features` vector column from an array<float/double> column. */
  def withFeatures(df: DataFrame, arrayCol: String): DataFrame =
    df.withColumn("features",
      array_to_vector(col(arrayCol).cast("array<double>")))

  /** KMeans best-of-nInit seeds by training cost
    * (clustering.py: n_init=20 emulation). Returns (labeled df, cost).
    *
    * The seeded fits are independent, so they are submitted as
    * concurrent Spark jobs from a driver thread pool — on a cluster the
    * scheduler interleaves their stages instead of idling between
    * sequential fits. Result order is preserved, so the best-cost
    * tiebreak (first seed wins) is unchanged. */
  def kmeansBest(df: DataFrame, k: Int, nInit: Int, maxIter: Int,
      baseSeed: Long): (DataFrame, Double) = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec = graft.ops.Pools.jobs
    // CacheReg, not a bare .cache(): the returned frame is
    // best.transform(feat), so the cache backs a LAZY result the
    // caller still references — only Stage.clear()'s CacheReg sweep
    // can release it (the Dedup library-internal-cache contract)
    val feat = graft.ops.CacheReg.cached(df)
    feat.count() // materialize once so concurrent fits share the cache
    val fits = Await.result(
      Future.traverse((0 until nInit).toList) { i =>
        Future {
          val km = new KMeans().setK(k).setMaxIter(maxIter)
            .setSeed(baseSeed + i).setFeaturesCol("features")
          val model = km.fit(feat)
          (model, model.summary.trainingCost)
        }
      }, Duration.Inf)
    val (best, cost) = fits.minBy(_._2)
    (best.transform(feat).withColumnRenamed("prediction", "cluster"), cost)
  }

  /** GMM labels + per-row max probability and entropy
    * (clustering.py:147-182). */
  def gmm(df: DataFrame, k: Int, maxIter: Int, seed: Long): DataFrame = {
    val model = new GaussianMixture().setK(k).setMaxIter(maxIter)
      .setSeed(seed).setFeaturesCol("features").fit(df)
    val out = model.transform(df)
      .withColumnRenamed("prediction", "cluster")
    val probArr = vector_to_array(col("probability"))
    out
      .withColumn("prob_max", array_max(probArr))
      .withColumn("entropy",
        -aggregate(probArr, lit(0.0),
          (acc, p) => acc + when(p > 1e-12, p * log(p)).otherwise(0.0)))
      .drop("probability")
  }

  private def vector_to_array(c: org.apache.spark.sql.Column) =
    org.apache.spark.ml.functions.vector_to_array(c)

  /** Silhouette (squared euclidean) on a deterministic sample cap
    * (clustering.py:31-64, silhouette_sample_max). */
  def silhouette(labeled: DataFrame, sampleMax: Int): Double = {
    val n = labeled.count()
    val df = if (n > sampleMax)
      labeled.sample(withReplacement = false, sampleMax.toDouble / n, 42L)
    else labeled
    new ClusteringEvaluator().setFeaturesCol("features")
      .setPredictionCol("cluster").evaluate(df)
  }

  /** Adjusted Rand Index between two labelings (ref: pairwise ARI across
    * seeds, src/mf_etl/research/pipeline.py:831-853). The contingency
    * table is a distributed groupBy; the closed form runs on its (k×k)
    * collect. */
  def adjustedRandIndex(df: DataFrame, colA: String, colB: String): Double = {
    def c2(x: Long): Double = x.toDouble * (x - 1) / 2
    val cont = df.groupBy(colA, colB).count().collect()
      .map(r => (r.get(0), r.get(1), r.getLong(2)))
    val n = cont.map(_._3).sum
    val sumIj = cont.map(c => c2(c._3)).sum
    val sumA = cont.groupBy(_._1).values.map(g => c2(g.map(_._3).sum)).sum
    val sumB = cont.groupBy(_._2).values.map(g => c2(g.map(_._3).sum)).sum
    val expected = sumA * sumB / c2(n)
    val maxIdx = (sumA + sumB) / 2
    if (math.abs(maxIdx - expected) < 1e-12) 1.0
    else (sumIj - expected) / (maxIdx - expected)
  }

  /** Davies-Bouldin index as small aggregations over (cluster, features)
    * (clustering.py: DB score; no MLlib equivalent). */
  def daviesBouldin(labeled: DataFrame): Double = {
    val arr = vector_to_array(col("features"))
    val perDim = labeled.select(col("cluster"),
      posexplode(arr).as(Seq("dim", "x")))
    val cent = perDim.groupBy("cluster", "dim").agg(avg("x").as("m"))
    // scatter² = mean over points of squared distance to centroid
    //          = Σ(x-m)² · n_dims / n_rows(dim-level)
    val joined = perDim.join(cent, Seq("cluster", "dim"))
      .groupBy("cluster")
      .agg((sum(pow(col("x") - col("m"), 2))
        * countDistinct(col("dim")) / count(lit(1))).as("var_in"))
    val centroids = cent.groupBy("cluster")
      .agg(collect_list(struct(col("dim"), col("m"))).as("c"))
      .collect().map { r =>
        val xs = r.getSeq[org.apache.spark.sql.Row](1)
          .sortBy(_.getInt(0)).map(_.getDouble(1)).toArray
        r.getInt(0) -> xs
      }.toMap
    val scatter = joined.collect()
      .map(r => r.getInt(0) -> math.sqrt(r.getDouble(1))).toMap
    val ks = centroids.keys.toSeq.sorted
    if (ks.size < 2) return 0.0
    val ratios = for (i <- ks) yield {
      (for (j <- ks if j != i) yield {
        val d = math.sqrt(centroids(i).zip(centroids(j))
          .map { case (a, b) => (a - b) * (a - b) }.sum)
        (scatter(i) + scatter(j)) / math.max(d, 1e-12)
      }).max
    }
    ratios.sum / ks.size
  }
}
