package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Gaussian HMM with diagonal covariance — custom implementation (MLlib
  * has no HMM): Baum-Welch EM fit + Viterbi decode
  * (ref: src/mf_etl/research_hmm/hmm_model.py:31-104,
  * src/mf_etl/research_hmm/decode.py:146-156,
  * src/mf_etl/research_hmm/sequence_builder.py:33-110).
  *
  * Scale design: the model is tiny (k states × d features); sequences are
  * per-ticker and bounded, so FIT collects capped per-ticker sequences to
  * the driver (exactly like the reference's in-memory hmmlearn fit), while
  * DECODE runs distributed — the fitted model broadcasts and each ticker's
  * Viterbi pass is an independent `flatMapGroups` task.
  */
object Hmm {

  case class Model(k: Int, d: Int, logPi: Array[Double],
    logA: Array[Array[Double]], means: Array[Array[Double]],
    vars: Array[Array[Double]]) extends Serializable

  private val MinVar = 1e-6

  private def logSumExp(xs: Array[Double]): Double = {
    val m = xs.max
    if (m.isNegInfinity) Double.NegativeInfinity
    else m + math.log(xs.map(x => math.exp(x - m)).sum)
  }

  /** Diagonal-Gaussian log density of observation x under state s. */
  private def logB(m: Model, s: Int, x: Array[Double]): Double = {
    var acc = 0.0
    var j = 0
    while (j < m.d) {
      val v = m.vars(s)(j)
      val diff = x(j) - m.means(s)(j)
      acc += -0.5 * (math.log(2 * math.Pi * v) + diff * diff / v)
      j += 1
    }
    acc
  }

  /** Deterministic init: states seeded from evenly-spaced quantile anchors
    * of the pooled data (no RNG — reproducible across runs/clusters). */
  def init(k: Int, seqs: Seq[Array[Array[Double]]]): Model = {
    val all = seqs.flatten.toArray
    val d = all.head.length
    val n = all.length
    val byDim = Array.tabulate(d) { j => all.map(_(j)).sorted }
    val means = Array.tabulate(k) { s =>
      Array.tabulate(d) { j => byDim(j)(((s + 1) * n) / (k + 1) min (n - 1)) }
    }
    val gVar = Array.tabulate(d) { j =>
      val m = byDim(j).sum / n
      math.max(byDim(j).map(x => (x - m) * (x - m)).sum / n, MinVar)
    }
    Model(k, d,
      Array.fill(k)(math.log(1.0 / k)),
      Array.fill(k)(Array.fill(k)(math.log(1.0 / k))),
      means, Array.fill(k)(gVar.clone()))
  }

  /** Baum-Welch fit over per-key sequences (driver-side, like the
    * reference's hmmlearn call; sequences are pre-capped). */
  def fit(seqs: Seq[Array[Array[Double]]], k: Int, nIter: Int = 50,
      tol: Double = 1e-3): Model = {
    var m = init(k, seqs)
    var prevLl = Double.NegativeInfinity
    var it = 0
    var done = false
    while (it < nIter && !done) {
      // accumulators
      val piAcc = Array.fill(k)(0.0)
      val aAcc = Array.fill(k, k)(0.0)
      val muAcc = Array.fill(k, m.d)(0.0)
      val vAcc = Array.fill(k, m.d)(0.0)
      val gSum = Array.fill(k)(0.0)
      var ll = 0.0
      for (seq <- seqs if seq.nonEmpty) {
        val t = seq.length
        val lb = Array.tabulate(t, k)((i, s) => logB(m, s, seq(i)))
        // forward
        val alpha = Array.ofDim[Double](t, k)
        for (s <- 0 until k) alpha(0)(s) = m.logPi(s) + lb(0)(s)
        for (i <- 1 until t; s <- 0 until k)
          alpha(i)(s) = logSumExp(Array.tabulate(k)(p =>
            alpha(i - 1)(p) + m.logA(p)(s))) + lb(i)(s)
        // backward
        val beta = Array.ofDim[Double](t, k)
        for (i <- t - 2 to 0 by -1; s <- 0 until k)
          beta(i)(s) = logSumExp(Array.tabulate(k)(q =>
            m.logA(s)(q) + lb(i + 1)(q) + beta(i + 1)(q)))
        val seqLl = logSumExp(alpha(t - 1))
        ll += seqLl
        // gamma / xi accumulation
        for (i <- 0 until t) {
          val g = Array.tabulate(k)(s => alpha(i)(s) + beta(i)(s) - seqLl)
          for (s <- 0 until k) {
            val w = math.exp(g(s))
            if (i == 0) piAcc(s) += w
            gSum(s) += w
            for (j <- 0 until m.d) {
              muAcc(s)(j) += w * seq(i)(j)
              vAcc(s)(j) += w * seq(i)(j) * seq(i)(j)
            }
          }
          if (i < t - 1) {
            for (s <- 0 until k; q <- 0 until k)
              aAcc(s)(q) += math.exp(alpha(i)(s) + m.logA(s)(q)
                + lb(i + 1)(q) + beta(i + 1)(q) - seqLl)
          }
        }
      }
      // M-step
      val piSum = piAcc.sum
      val newPi = piAcc.map(p => math.log(math.max(p / piSum, 1e-12)))
      val newA = Array.tabulate(k) { s =>
        val rs = aAcc(s).sum
        if (rs <= 0) m.logA(s)
        else aAcc(s).map(x => math.log(math.max(x / rs, 1e-12)))
      }
      val newMu = Array.tabulate(k, m.d)((s, j) =>
        if (gSum(s) > 0) muAcc(s)(j) / gSum(s) else m.means(s)(j))
      val newVar = Array.tabulate(k, m.d)((s, j) =>
        if (gSum(s) > 0)
          math.max(vAcc(s)(j) / gSum(s) - newMu(s)(j) * newMu(s)(j), MinVar)
        else m.vars(s)(j))
      m = Model(k, m.d, newPi, newA, newMu, newVar)
      if (math.abs(ll - prevLl) < tol) done = true
      prevLl = ll
      it += 1
    }
    m
  }

  /** Viterbi decode of one sequence → most likely state path. */
  def viterbi(m: Model, seq: Array[Array[Double]]): Array[Int] = {
    val t = seq.length
    if (t == 0) return Array.empty
    val delta = Array.ofDim[Double](t, m.k)
    val psi = Array.ofDim[Int](t, m.k)
    for (s <- 0 until m.k) delta(0)(s) = m.logPi(s) + logB(m, s, seq(0))
    for (i <- 1 until t; s <- 0 until m.k) {
      var best = Double.NegativeInfinity; var arg = 0
      for (p <- 0 until m.k) {
        val v = delta(i - 1)(p) + m.logA(p)(s)
        if (v > best) { best = v; arg = p }
      }
      delta(i)(s) = best + logB(m, s, seq(i))
      psi(i)(s) = arg
    }
    val path = Array.ofDim[Int](t)
    path(t - 1) = (0 until m.k).maxBy(delta(t - 1))
    for (i <- t - 2 to 0 by -1) path(i) = psi(i + 1)(path(i + 1))
    path
  }

  /** Distributed decode: broadcast model, per-key ordered Viterbi.
    * Input: (key, ts, features array). Output adds `hmm_state`. */
  def decode(df: DataFrame, m: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(m)
    val in = df.select(col("key").cast("string"), col("ts").cast("long"),
      col("features").cast("array<double>"))
      .as[(String, Long, Array[Double])]
    in.groupByKey(_._1).flatMapGroups { (k, it) =>
      val rows = it.toArray.sortBy(_._2)
      val path = viterbi(bc.value, rows.map(_._3))
      rows.iterator.zip(path.iterator).map { case ((_, ts, _), s) =>
        (k, ts, s)
      }
    }.toDF("key", "ts", "hmm_state")
  }

  /** Collect per-key ordered sequences for driver-side fit (capped rows
    * per key and minimum sequence length, like the reference). */
  def collectSequences(df: DataFrame, minLen: Int,
      maxPerKey: Int): Seq[Array[Array[Double]]] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("key").cast("string"), col("ts").cast("long"),
        col("features").cast("array<double>"))
      .as[(String, Long, Array[Double])]
      .collect()
      .groupBy(_._1).values
      .map(g => g.sortBy(_._2).take(maxPerKey).map(_._3))
      .toSeq
      .filter(_.length >= minLen)
  }
}
