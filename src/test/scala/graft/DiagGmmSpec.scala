package graft

import graft.ml.DiagGmm

/** Diagonal-covariance GMM: recovery of separated clusters, distributed
  * transform consistency, BIC monotonicity in parameter count. */
class DiagGmmSpec extends SparkSpec {

  private def synth(n: Int): Array[Array[Double]] = {
    var h = 7L
    def u(): Double = {
      h = h * 6364136223846793005L + 1442695040888963407L
      (h >>> 11).toDouble / (1L << 53).toDouble
    }
    Array.tabulate(n) { i =>
      val c = i % 2
      val base = if (c == 0) Array(-4.0, 0.0) else Array(4.0, 2.0)
      Array(base(0) + (u() - 0.5), base(1) + (u() - 0.5))
    }
  }

  test("recovers two separated clusters with high confidence") {
    val data = synth(400)
    val (m, ll) = DiagGmm.fit(data, k = 2, nIter = 80)
    assert(ll > Double.NegativeInfinity)
    val assigns = data.map(m.assign(_))
    // points from the two generators land in different components
    val c0 = assigns.zipWithIndex.filter(_._2 % 2 == 0).map(_._1._1)
    val c1 = assigns.zipWithIndex.filter(_._2 % 2 == 1).map(_._1._1)
    assert(c0.distinct.length == 1 && c1.distinct.length == 1)
    assert(c0.head != c1.head)
    assert(assigns.forall(_._2 > 0.99)) // prob_max near 1
    assert(assigns.forall(_._3 < 0.1))  // low entropy
    val ms = m.means.map(_(0)).sorted
    assert(math.abs(ms(0) - -4.0) < 0.5 && math.abs(ms(1) - 4.0) < 0.5)
  }

  test("distributed transform matches local assignment") {
    val s = spark
    import s.implicits._
    val data = synth(100)
    val (m, _) = DiagGmm.fit(data, k = 2, nIter = 40)
    val df = data.zipWithIndex
      .map { case (x, i) => (i.toLong, x) }.toSeq
      .toDF("id", "features")
    val dist = DiagGmm.transform(df, m).orderBy("id").collect()
      .map(r => (r.getInt(1), r.getDouble(2)))
    val local = data.map(m.assign(_)).map(a => (a._1, a._2))
    assert(dist.toSeq == local.toSeq)
  }

  test("BIC penalizes parameters, AIC less so") {
    val ll = -1000.0
    assert(DiagGmm.bic(ll, 4, 8, 10000) > DiagGmm.bic(ll, 2, 8, 10000))
    assert(DiagGmm.aic(ll, 4, 8) > DiagGmm.aic(ll, 2, 8))
  }

  test("pinned scoring agrees with DiagGmm.Model semantics") {
    // the q_gmm_pinned_score contract: PinnedGmm's decimal-exact
    // column program computes the SAME mixture math as the model
    // object's per-row scorer — build the pinned model as a
    // DiagGmm.Model (means = seed embeddings, vars = 1/inv, weights W)
    // and check argmax labels and log-densities against the engine
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val seed = emb.filter(org.apache.spark.sql.functions.col("vec_id")
        < graft.ml.PinnedGmm.K)
      .orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val d = seed.head.length
    val model = DiagGmm.Model(graft.ml.PinnedGmm.K, d,
      graft.ml.PinnedGmm.W.map(math.log),
      seed,
      Array.tabulate(graft.ml.PinnedGmm.K)(s =>
        Array.tabulate(d)(j => 1.0 / graft.ml.PinnedGmm.inv(s, j))))
    val got = graft.ml.PinnedGmm.score(emb).orderBy("vec_id").collect()
    val all = emb.orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    assert(got.length == all.length)
    got.zip(all).foreach { case (r, x) =>
      val lp = Array.tabulate(model.k)(s => model.logComp(s, x))
      val best = lp.indices.maxBy(s => (lp(s), -s))
      assert(r.getInt(1) == best, s"label mismatch at ${r.getLong(0)}")
      assert(math.abs(r.getDouble(2) - lp(best)) < 1e-6,
        s"log-density mismatch at ${r.getLong(0)}")
    }
  }
}
