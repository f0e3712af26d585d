package graft.queries

import org.apache.spark.sql.functions._
import graft.ml.{Clustering, Hmm}

/** ML state-discovery surface (SURVEY §2.9 M2/M3/M5/M6): MLlib KMeans
  * (best-of-seeds), GaussianMixture with prob/entropy, clustering metrics
  * (silhouette + Davies-Bouldin), and the custom Gaussian HMM
  * (driver fit, distributed Viterbi decode). Iterative, seeded model fits
  * have no SQL equivalent → rows-only driver checks; semantics are locked
  * by ScalaTest specs instead.
  */
object MlQueries extends QueryModule {

  /** Deterministic cap on rows collected for the driver-side GMM fit
    * (the reference caps its silhouette input at 200k; same idea). */
  val GmmFitCap = 200000

  /** Shared HMM input projection: per-user value series from `events`. */
  private[queries] def hmmInput(s: org.apache.spark.sql.SparkSession,
      dir: String) =
    t(s, dir, "events").select(
      col("user_id").cast("string").as("key"),
      expr("ts div 1000").as("ts"),
      array(col("value")).as("features"))

  /** KMeans fit shared between the labeling and metrics queries (the fit
    * is the expensive part; the labeled frame is narrow). */
  private def kmeansLabeled(s: org.apache.spark.sql.SparkSession,
      dir: String) =
    Stage.cached(s, dir, "kmeans_labeled") {
      val emb = Clustering.withFeatures(t(s, dir, "embeddings"),
        "embedding")
      Clustering.kmeansBest(emb, k = 8, nInit = 3, maxIter = 20,
        baseSeed = 42L)._1
    }

  def all: Seq[Q] = Seq(

    Q("q_kmeans_clusters", None) { (s, dir) =>
      MlQueries.kmeansLabeled(s, dir)
        .select(col("vec_id"), col("label"), col("cluster"))
        .orderBy("vec_id")
    },

    // Diagonal-covariance GMM — the reference's covariance_type=diag
    // semantics (custom EM; MLlib is full-covariance only and goes
    // numerically asymmetric at 64 dims)
    Q("q_gmm_clusters", None) { (s, dir) =>
      val spark = s
      import spark.implicits._
      val in = t(s, dir, "embeddings").select(
        col("vec_id").cast("long").as("id"),
        col("embedding").cast("array<double>").as("features"))
      // fit input is a bounded, deterministic sample (first FitCap ids via
      // distributed top-k) — mirrors the reference capping silhouette at
      // 200k rows; TRANSFORM below still labels every row
      val data = in.orderBy("id").limit(MlQueries.GmmFitCap)
        .as[(Long, Array[Double])].collect().sortBy(_._1)
        .map(_._2)
      val (model, ll) = graft.ml.DiagGmm.fit(data, k = 5, nIter = 60)
      graft.ml.DiagGmm.transform(in, model)
        .select(col("id").as("vec_id"), col("cluster"),
          round(col("prob_max"), 6).as("prob_max"),
          round(col("entropy"), 6).as("entropy"))
        .withColumn("bic", round(lit(
          graft.ml.DiagGmm.bic(ll, 5, model.d, data.length)), 3))
        .orderBy("vec_id")
    },

    Q("q_cluster_metrics", None) { (s, dir) =>
      val spark = s
      import spark.implicits._
      val labeled = MlQueries.kmeansLabeled(s, dir)
      val sil = Clustering.silhouette(labeled, sampleMax = 200000)
      val db = Clustering.daviesBouldin(labeled)
      Seq((sil, db)).toDF("silhouette", "davies_bouldin")
    },

    Q("q_hmm_decode", None) { (s, dir) =>
      val ev = MlQueries.hmmInput(s, dir)
      // fit over a distributedly-capped sample (per-key cap + global
      // points budget enforced BEFORE collect); decode stays distributed
      // over the full input
      val seqs = Hmm.collectSequences(ev, minLen = 10, maxPerKey = 5000,
        maxTotalPoints = 50000L)
      val model = Hmm.fit(seqs, k = 3, nIter = 30)
      Hmm.decode(ev, model)
        .groupBy("key", "hmm_state").count()
        .orderBy("key", "hmm_state")
    }
  )
}
