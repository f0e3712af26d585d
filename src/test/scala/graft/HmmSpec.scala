package graft

import org.apache.spark.sql.functions._
import graft.ml.Hmm

/** Custom Gaussian HMM: recovery of well-separated synthetic states and
  * distributed decode consistency. */
class HmmSpec extends SparkSpec {

  /** Two clearly-separated states with sticky transitions (deterministic
    * pseudo-random observations via a hash mix). */
  private def synthSeq(n: Int, seed: Int): (Array[Array[Double]], Array[Int]) = {
    var state = 0
    val obs = Array.ofDim[Array[Double]](n)
    val truth = Array.ofDim[Int](n)
    var h = seed.toLong
    def nextU(): Double = {
      h = (h * 6364136223846793005L + 1442695040888963407L)
      ((h >>> 11).toDouble / (1L << 53).toDouble)
    }
    for (i <- 0 until n) {
      if (nextU() < 0.05) state = 1 - state
      truth(i) = state
      val mean = if (state == 0) -5.0 else 5.0
      obs(i) = Array(mean + (nextU() - 0.5) * 2)
    }
    (obs, truth)
  }

  test("fit + viterbi recover well-separated states (up to label swap)") {
    val data = (0 until 10).map(s => synthSeq(200, s + 1))
    val model = Hmm.fit(data.map(_._1), k = 2, nIter = 40)
    val (obs, truth) = data.head
    val path = Hmm.viterbi(model, obs)
    val agree = path.zip(truth).count { case (a, b) => a == b }.toDouble / 200
    val acc = math.max(agree, 1 - agree) // label permutation
    assert(acc > 0.95, s"accuracy $acc")
  }

  test("means land near the true cluster centers") {
    val data = (0 until 10).map(s => synthSeq(200, s + 1))
    val model = Hmm.fit(data.map(_._1), k = 2, nIter = 40)
    val ms = model.means.map(_(0)).sorted
    assert(math.abs(ms(0) - -5.0) < 1.0 && math.abs(ms(1) - 5.0) < 1.0,
      s"means ${ms.toSeq}")
  }

  test("distributed decode matches local viterbi per key") {
    val s = spark
    import s.implicits._
    val (obs, _) = synthSeq(100, 7)
    val rows = obs.zipWithIndex.map { case (x, i) => ("k1", i.toLong, x) }
    val df = rows.toSeq.toDF("key", "ts", "features")
    val model = Hmm.fit(Seq(obs), k = 2, nIter = 20)
    val dist = Hmm.decode(df, model).orderBy("ts")
      .collect().map(_.getInt(2))
    assert(dist.toSeq == Hmm.viterbi(model, obs).toSeq)
  }
}
