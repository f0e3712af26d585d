package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ml.{Clustering, Hmm}
import graft.etl.{EventGrammar, Indicators, MarketData}
import graft.ops.Wins

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

  /** HDBSCAN fit cap — smaller than GmmFitCap because the MST build is
    * O(n²) distance evaluations (≈4×10^8 at 20k, seconds; 200k would
    * be hours). The reference's library call has the same single-node
    * O(n log n)-to-O(n²) reality; a user needing more points samples
    * first, exactly as with the silhouette cap. */
  val HdbscanFitCap = 20000

  /** Shared HMM input projection: per-user value series from `events`. */
  private[queries] def hmmInput(s: org.apache.spark.sql.SparkSession,
      dir: String) = {
    val ev = t(s, dir, "events")
    ev.select(
      col("user_id").cast("string").as("key"),
      graft.etl.EventTime.micros(ev).as("ts"),
      array(col("value")).as("features"))
  }

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

  /** Nearest-centroid assignment against the deterministic first-k-ids
    * seed centroids: ONE bounded collect for the k×d literal matrix,
    * then a broadcast-constant argmin pass — shared by q_kmeans_assign
    * and q_cluster_assign_metrics. Argmin ranks the 6-decimal-rounded
    * squared distance with centroid-id tiebreak (cross-engine
    * determinism for near-equidistant points). */
  private[queries] def seedAssigned(s: org.apache.spark.sql.SparkSession,
      dir: String, k: Int = 8) = {
    val emb = t(s, dir, "embeddings")
    val cents = emb.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cid"),
        col("embedding").cast("array<double>").as("cv"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    val v = col("embedding").cast("array<double>")
    val dists = cents.map { case (cid, cv) =>
      val cvLit = array(cv.map(lit): _*)
      struct(
        round(graft.functions.VecOps.sqDist(v, cvLit), 6).as("d2"),
        lit(cid).as("cid"))
    }
    val best = array_min(array(dists.toSeq: _*))
    emb.select(col("vec_id"), col("embedding"),
      best.getField("cid").as("cluster"), best.getField("d2").as("dist2"))
  }

  def all: Seq[Q] = Seq(

    Q("q_kmeans_clusters", None) { (s, dir) =>
      MlQueries.kmeansLabeled(s, dir)
        .select(col("vec_id"), col("label"), col("cluster"))
        .orderBy("vec_id")
    },

    // The deterministic HALF of the KMeans pipeline, oracled: iterative
    // fits are seeded and engine-specific (rows-only above), but GIVEN
    // fixed centroids the assignment step is pure math. Centroids =
    // the first k embeddings (deterministic seeding), collected once as
    // a literal matrix and broadcast — at corpus scale this is the
    // standard one-pass nearest-centroid labeling. Ranking uses the
    // ROUNDED distance with centroid-id tiebreak so near-equidistant
    // points label identically across engines.
    Q("q_kmeans_assign", Some("""
      WITH ex AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings),
      c AS (SELECT vec_id AS cid, i, x AS y FROM ex WHERE vec_id < 8),
      d AS (
        SELECT e.vec_id, c.cid,
               round(sum((e.x - c.y) * (e.x - c.y)), 6) AS d2
        FROM ex e JOIN c ON e.i = c.i GROUP BY 1, 2),
      a AS (SELECT *, row_number() OVER (PARTITION BY vec_id
              ORDER BY d2, cid) AS rn FROM d)
      SELECT vec_id, CAST(cid AS INT) AS cluster, d2 AS dist2
      FROM a WHERE rn = 1 ORDER BY vec_id""")) { (s, dir) =>
      MlQueries.seedAssigned(s, dir)
        .select("vec_id", "cluster", "dist2").orderBy("vec_id")
    },

    // Fixed-label clustering metrics, oracled: per-cluster sizes,
    // intra-cluster mean (Euclidean) distance to the assigned-cluster
    // mean, worst Davies-Bouldin ratio per cluster, and the DB index —
    // deterministic SQL once the labels are fixed, unlike the sampled
    // silhouette in q_cluster_metrics.
    Q("q_cluster_assign_metrics", Some("""
      WITH ex AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings),
      c AS (SELECT vec_id AS cid, i, x AS y FROM ex WHERE vec_id < 8),
      d AS (
        SELECT e.vec_id, c.cid,
               round(sum((e.x - c.y) * (e.x - c.y)), 6) AS d2
        FROM ex e JOIN c ON e.i = c.i GROUP BY 1, 2),
      a AS (SELECT vec_id, cid AS cluster FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id
                ORDER BY d2, cid) AS rn FROM d) WHERE rn = 1),
      m AS (
        SELECT a.cluster, e.i, avg(e.x) AS mu
        FROM a JOIN ex e USING (vec_id) GROUP BY 1, 2),
      pd AS (
        SELECT a.vec_id, a.cluster,
               sqrt(sum((e.x - m.mu) * (e.x - m.mu))) AS dist
        FROM a JOIN ex e USING (vec_id)
        JOIN m ON m.cluster = a.cluster AND m.i = e.i
        GROUP BY 1, 2),
      sstat AS (
        SELECT cluster, count(*) AS n_points, avg(dist) AS intra
        FROM pd GROUP BY 1),
      cd AS (
        SELECT mi.cluster AS ci, mj.cluster AS cj,
               sqrt(sum((mi.mu - mj.mu) * (mi.mu - mj.mu))) AS mdist
        FROM m mi JOIN m mj ON mi.i = mj.i AND mi.cluster <> mj.cluster
        GROUP BY 1, 2),
      ratio AS (
        SELECT cd.ci AS cluster,
               max((si.intra + sj.intra) / cd.mdist) AS db_ratio
        FROM cd JOIN sstat si ON si.cluster = cd.ci
        JOIN sstat sj ON sj.cluster = cd.cj
        GROUP BY 1)
      SELECT s.cluster, s.n_points, round(s.intra, 6) AS intra_mean_dist,
             round(r.db_ratio, 6) AS db_ratio,
             round(avg(r.db_ratio) OVER (), 6) AS db_index
      FROM sstat s JOIN ratio r USING (cluster)
      ORDER BY s.cluster""")) { (s, dir) =>
      val assigned = MlQueries.seedAssigned(s, dir)
        .select(col("vec_id"), col("cluster"),
          col("embedding").cast("array<double>").as("v"))
      val dims = assigned.select(col("cluster"), posexplode(col("v")))
        .withColumnRenamed("pos", "i").withColumnRenamed("col", "x")
      val m = dims.groupBy("cluster", "i").agg(avg("x").as("mu"))
      val pd = assigned
        .select(col("vec_id"), col("cluster"),
          posexplode(col("v")).as(Seq("i", "x")))
        .join(m, Seq("cluster", "i"))
        .groupBy("vec_id", "cluster")
        .agg(sqrt(sum((col("x") - col("mu")) * (col("x") - col("mu"))))
          .as("dist"))
      val sstat = pd.groupBy("cluster")
        .agg(count(lit(1)).as("n_points"), avg("dist").as("intra"))
      val mi = m.select(col("cluster").as("ci"), col("i"),
        col("mu").as("mu_i"))
      val mj = m.select(col("cluster").as("cj"), col("i"),
        col("mu").as("mu_j"))
      val cd = mi.join(mj, Seq("i")).filter(col("ci") =!= col("cj"))
        .groupBy("ci", "cj")
        .agg(sqrt(sum((col("mu_i") - col("mu_j"))
          * (col("mu_i") - col("mu_j")))).as("mdist"))
      val si = sstat.select(col("cluster").as("ci"),
        col("intra").as("intra_i"))
      val sj = sstat.select(col("cluster").as("cj"),
        col("intra").as("intra_j"))
      val ratio = cd.join(si, Seq("ci")).join(sj, Seq("cj"))
        .groupBy(col("ci").as("cluster"))
        .agg(max((col("intra_i") + col("intra_j")) / col("mdist"))
          .as("db_ratio"))
      sstat.join(ratio, Seq("cluster"))
        .select(col("cluster"), col("n_points"),
          round(col("intra"), 6).as("intra_mean_dist"),
          round(col("db_ratio"), 6).as("db_ratio"),
          round(avg(col("db_ratio")).over(Window.partitionBy()), 6)
            .as("db_index"))
        .orderBy("cluster")
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

    // HDBSCAN (M4, ref clustering.py:184-203): min_cluster_size =
    // max(5, n_clusters-hint 8), min_samples = None → min_cluster_size;
    // like the reference's library call, prediction only on the
    // (deterministically capped) fit matrix — density clustering of a
    // structureless uniform corpus legitimately labels most points -1
    Q("q_hdbscan_clusters", None) { (s, dir) =>
      val spark = s
      import spark.implicits._
      val in = t(s, dir, "embeddings").select(
        col("vec_id").cast("long").as("id"),
        col("embedding").cast("array<double>").as("features"))
      val data = in.orderBy("id").limit(MlQueries.HdbscanFitCap)
        .as[(Long, Array[Double])].collect().sortBy(_._1)
      val labels = graft.ml.Hdbscan.fitPredict(
        data.map(_._2), minClusterSize = 8)
      data.map(_._1).zip(labels).toSeq.toDF("vec_id", "cluster")
        .orderBy("vec_id")
    },

    // The deterministic half of the HDBSCAN fit, distributed and
    // oracle-checked: core distance = distance to the min_samples-th
    // nearest neighbor, SELF INCLUDED (Hdbscan.scala step 1, min_samples
    // = min_cluster_size = 8). Quadratic by nature — bounded by the same
    // fit cap (contiguous ids make the orderBy+limit cap ≡ vec_id <
    // cap), with the self-join broadcast because the capped side is
    // small. round(6) like the cosine oracles (absorbs sum-association
    // order across engines).
    Q("q_hdbscan_core", Some(s"""
      WITH ex AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings WHERE vec_id < ${MlQueries.HdbscanFitCap}),
      d AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib,
               sqrt(sum((a.x - b.x) * (a.x - b.x))) AS dist
        FROM ex a JOIN ex b ON a.i = b.i GROUP BY 1, 2),
      r AS (
        SELECT ia, dist, row_number() OVER (PARTITION BY ia
          ORDER BY dist, ib) AS rn
        FROM d)
      SELECT ia AS vec_id, round(dist, 6) AS core_dist
      FROM r WHERE rn = 8 ORDER BY vec_id""")) { (s, dir) =>
      import graft.functions.VecOps
      import org.apache.spark.sql.expressions.Window
      val e = t(s, dir, "embeddings")
        .filter(col("vec_id") < MlQueries.HdbscanFitCap)
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"))
      // pre-partition the point side on ia BEFORE the broadcast cross
      // join: the join preserves the left's hash(ia) distribution, so
      // the top-k window below needs NO exchange of the n² pair rows —
      // only the n-row input shuffles (plan-audited)
      val pairs = e.select(col("vec_id").as("ia"), col("v").as("va"))
        .repartition(col("ia"))
        .join(broadcast(
          e.select(col("vec_id").as("ib"), col("v").as("vb"))))
        .select(col("ia"), col("ib"),
          sqrt(graft.functions.VecOps.sqDist(col("va"), col("vb"))).as("dist"))
      val w = Window.partitionBy("ia").orderBy("dist", "ib")
      pairs.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 8)
        .select(col("ia").as("vec_id"), round(col("dist"), 6)
          .as("core_dist"))
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

    // M6 diagnostics, transition table: counts + row-normalized
    // probabilities over the per-ticker state sequence (ref
    // research_hmm/diagnostics.py:29-53). Runs on the SQL-expressible
    // grammar state code so the whole table is oracle-checkable (the
    // same operator applies verbatim to decoded hmm_state rows).
    Q("q_hmm_transitions", Some(s"""
      WITH RECURSIVE ${MarketData.barsSql},
      ${Indicators.twiggsSql},
      ${EventGrammar.grammarSql},
      tr AS (
        SELECT * FROM (
          SELECT lag(flow_state_code) OVER (PARTITION BY ticker
                   ORDER BY bar_ts, bar_id) AS state_prev,
                 flow_state_code AS state
          FROM grammar)
        WHERE state_prev IS NOT NULL),
      tc AS (
        SELECT state_prev, state, count(*) AS transition_count
        FROM tr GROUP BY 1, 2)
      SELECT state_prev, state, transition_count,
             round(CAST(transition_count AS DOUBLE)
               / sum(transition_count) OVER (PARTITION BY state_prev), 9)
               AS transition_probability
      FROM tc ORDER BY state_prev, state""")) { (s, dir) =>
      val gram = Stage.slimGrammar(s, dir)
      val w = Window.partitionBy("ticker").orderBy("bar_ts", "bar_id")
      val tc = gram
        .select(lag("flow_state_code", 1).over(w).as("state_prev"),
          col("flow_state_code").as("state"))
        .filter(col("state_prev").isNotNull)
        .groupBy("state_prev", "state")
        .agg(count(lit(1)).as("transition_count"))
      tc.withColumn("transition_probability",
          round(col("transition_count").cast("double")
            / sum("transition_count").over(Window.partitionBy("state_prev")),
            9))
        .orderBy("state_prev", "state")
    },

    // M6 diagnostics, dwell-time stats: per-state run-length distribution
    // (ref research_hmm/diagnostics.py:66-88)
    Q("q_hmm_dwell", Some(s"""
      WITH RECURSIVE ${MarketData.barsSql},
      ${Indicators.twiggsSql},
      ${EventGrammar.grammarSql},
      flagged AS (
        SELECT ticker, bar_ts, bar_id, flow_state_code,
               CASE WHEN lag(flow_state_code) OVER wd IS NULL
                 OR flow_state_code <> lag(flow_state_code) OVER wd
                 THEN 1 ELSE 0 END AS chg
        FROM grammar
        WINDOW wd AS (PARTITION BY ticker ORDER BY bar_ts, bar_id)),
      islands AS (
        SELECT *, CAST(sum(chg) OVER (PARTITION BY ticker
          ORDER BY bar_ts, bar_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS island_id
        FROM flagged),
      runs AS (
        SELECT ticker, island_id, any_value(flow_state_code) AS state,
               count(*) AS dwell_length
        FROM islands GROUP BY 1, 2)
      SELECT state, count(*) AS dwell_count,
             round(avg(dwell_length), 9) AS dwell_mean,
             round(median(dwell_length), 9) AS dwell_median,
             round(quantile_cont(dwell_length, 0.1), 9) AS dwell_p10,
             round(quantile_cont(dwell_length, 0.9), 9) AS dwell_p90,
             max(dwell_length) AS max_dwell
      FROM runs GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val gram = Stage.slimGrammar(s, dir)
      val w = Window.partitionBy("ticker").orderBy("bar_ts", "bar_id")
      val runs = gram
        .withColumn("island_id", Wins.runId(col("flow_state_code"), w))
        .groupBy("ticker", "island_id")
        .agg(first("flow_state_code").as("state"),
          count(lit(1)).as("dwell_length"))
      runs.groupBy("state")
        .agg(count(lit(1)).as("dwell_count"),
          round(avg("dwell_length"), 9).as("dwell_mean"),
          round(median(col("dwell_length")), 9).as("dwell_median"),
          round(percentile(col("dwell_length"), lit(0.1)), 9)
            .as("dwell_p10"),
          round(percentile(col("dwell_length"), lit(0.9)), 9)
            .as("dwell_p90"),
          max("dwell_length").as("max_dwell"))
        .orderBy("state")
    },

    // M6 model selection: fit sweep across component counts with
    // log-likelihood, BIC, and state-concentration diagnostics (ref
    // research_hmm/pipeline.py:791-858 hmm-sweep; BIC is the standard
    // criterion over the same per-k loglik). Iterative seeded fit →
    // rows-only; semantics locked by HmmSpec.
    Q("q_hmm_sweep", None) { (s, dir) =>
      val spark = s
      import spark.implicits._
      val ev = MlQueries.hmmInput(s, dir)
      val seqs = Hmm.collectSequences(ev, minLen = 10, maxPerKey = 5000,
        maxTotalPoints = 20000L)
      // the per-k fits are independent driver-local EMs (plus one small
      // decode job each) — run them on a thread pool; traverse keeps
      // result order so the output is unchanged
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      implicit val ec = graft.ops.Pools.jobs
      val rows = Await.result(Future.traverse((4 to 8).toList) { k =>
        Future {
          val fr = Hmm.fitResult(seqs, k, nIter = 30)
          // decode stays distributed; only the k-row share table collects
          val st = Hmm.decode(ev, fr.model)
            .groupBy("hmm_state").count().collect()
            .map(r => r.getAs[Long]("count"))
          val total = st.sum.toDouble
          val shares = st.map(_ / total)
          (k, fr.nObs, fr.nSeqs, fr.logLik, fr.logLik / fr.nObs,
            Hmm.bic(fr.logLik, k, fr.model.d, fr.nObs), fr.nIterUsed,
            fr.converged, shares.max, 1.0 / shares.map(x => x * x).sum)
        }
      }, Duration.Inf)
      rows.toDF("n_components", "rows_fit", "sequences_fit",
        "train_loglik", "loglik_per_obs", "bic", "n_iter_used",
        "converged", "largest_state_share", "effective_state_count")
        .orderBy("n_components")
    },

    // M6 posterior confidence: distributed posterior decode → per-state
    // prob_max / entropy stats (ref diagnostics.py:96-110
    // state_confidence_stats; decode.py predict_proba path)
    Q("q_hmm_posterior", None) { (s, dir) =>
      val ev = MlQueries.hmmInput(s, dir)
      val seqs = Hmm.collectSequences(ev, minLen = 10, maxPerKey = 5000,
        maxTotalPoints = 50000L)
      val model = Hmm.fit(seqs, k = 3, nIter = 30)
      Hmm.decodePosterior(ev, model)
        .groupBy("hmm_state")
        .agg(count(lit(1)).as("n"),
          round(avg("prob_max"), 9).as("prob_max_mean"),
          round(max("prob_max"), 9).as("prob_max_max"),
          round(avg("entropy"), 9).as("entropy_mean"),
          round(median(col("entropy")), 9).as("entropy_median"))
        .orderBy("hmm_state")
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
