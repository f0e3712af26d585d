package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Diagonal-covariance Gaussian mixture — the reference's GMM semantics
  * (ref: src/mf_etl/research/clustering.py:147-182: covariance_type=diag,
  * reg_covar 1e-6), which MLlib lacks (full covariance only). EM fit on
  * the driver (like the reference's sklearn call — the model is tiny),
  * assignment distributed via broadcast.
  *
  * Deterministic quantile-anchor init (no RNG) — reproducible across
  * runs and cluster layouts.
  */
object DiagGmm {

  case class Model(k: Int, d: Int, logW: Array[Double],
    means: Array[Array[Double]], vars: Array[Array[Double]])
    extends Serializable {

    def logComp(s: Int, x: Array[Double]): Double = {
      var acc = logW(s)
      var j = 0
      while (j < d) {
        val v = vars(s)(j)
        val diff = x(j) - means(s)(j)
        acc += -0.5 * (math.log(2 * math.Pi * v) + diff * diff / v)
        j += 1
      }
      acc
    }

    /** (cluster, maxProb, entropy, logDensity) for one observation. */
    def assign(x: Array[Double]): (Int, Double, Double, Double) = {
      val lp = Array.tabulate(k)(s => logComp(s, x))
      val m = lp.max
      val exps = lp.map(v => math.exp(v - m))
      val z = exps.sum
      val probs = exps.map(_ / z)
      var best = 0
      var ent = 0.0
      for (s <- 0 until k) {
        if (probs(s) > probs(best)) best = s
        if (probs(s) > 1e-12) ent -= probs(s) * math.log(probs(s))
      }
      (best, probs(best), ent, m + math.log(z))
    }
  }

  val RegCovar = 1e-6

  def init(data: Array[Array[Double]], k: Int): Model = {
    val n = data.length
    val d = data.head.length
    val byDim = Array.tabulate(d)(j => data.map(_(j)).sorted)
    val means = Array.tabulate(k)(s =>
      Array.tabulate(d)(j => byDim(j)(((s + 1) * n) / (k + 1) min (n - 1))))
    val gVar = Array.tabulate(d) { j =>
      val m = byDim(j).sum / n
      math.max(byDim(j).map(x => (x - m) * (x - m)).sum / n, RegCovar)
    }
    Model(k, d, Array.fill(k)(math.log(1.0 / k)), means,
      Array.fill(k)(gVar.clone()))
  }

  /** EM fit (driver-side). Returns (model, logLikelihood). */
  def fit(data: Array[Array[Double]], k: Int, nIter: Int = 100,
      tol: Double = 1e-3): (Model, Double) = {
    var m = init(data, k)
    val n = data.length
    var prevLl = Double.NegativeInfinity
    var ll = 0.0
    var it = 0
    var done = false
    while (it < nIter && !done) {
      val wAcc = Array.fill(m.k)(0.0)
      val muAcc = Array.fill(m.k, m.d)(0.0)
      val vAcc = Array.fill(m.k, m.d)(0.0)
      ll = 0.0
      for (x <- data) {
        val lp = Array.tabulate(m.k)(s => m.logComp(s, x))
        val mx = lp.max
        val exps = lp.map(v => math.exp(v - mx))
        val z = exps.sum
        ll += mx + math.log(z)
        for (s <- 0 until m.k) {
          val r = exps(s) / z
          wAcc(s) += r
          for (j <- 0 until m.d) {
            muAcc(s)(j) += r * x(j)
            vAcc(s)(j) += r * x(j) * x(j)
          }
        }
      }
      val newMu = Array.tabulate(m.k, m.d)((s, j) =>
        if (wAcc(s) > 0) muAcc(s)(j) / wAcc(s) else m.means(s)(j))
      val newVar = Array.tabulate(m.k, m.d)((s, j) =>
        if (wAcc(s) > 0)
          math.max(vAcc(s)(j) / wAcc(s) - newMu(s)(j) * newMu(s)(j),
            RegCovar)
        else m.vars(s)(j))
      val newW = wAcc.map(w => math.log(math.max(w / n, 1e-12)))
      m = Model(m.k, m.d, newW, newMu, newVar)
      if (math.abs(ll - prevLl) < tol) done = true
      prevLl = ll
      it += 1
    }
    (m, ll)
  }

  /** Number of free parameters (diag): k-1 weights + 2kd. */
  def nParams(k: Int, d: Int): Int = (k - 1) + 2 * k * d

  def bic(ll: Double, k: Int, d: Int, n: Long): Double =
    -2 * ll + nParams(k, d) * math.log(n.toDouble)

  def aic(ll: Double, k: Int, d: Int): Double =
    -2 * ll + 2.0 * nParams(k, d)

  /** Distributed assignment: broadcast model; adds cluster / prob_max /
    * entropy. Input needs `id` (long) and `features` (array<double>). */
  def transform(df: DataFrame, m: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(m)
    df.select(col("id").cast("long"), col("features")
        .cast("array<double>"))
      .as[(Long, Array[Double])]
      .map { case (id, x) =>
        val (c, p, e, _) = bc.value.assign(x)
        (id, c, p, e)
      }
      .toDF("id", "cluster", "prob_max", "entropy")
  }
}
