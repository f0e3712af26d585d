package graft

import graft.ml.Hdbscan

/** Borůvka round-1 contract (q_hdbscan_mst_edges): every emitted edge
  * must belong to THE minimum spanning tree of the mutual-reachability
  * graph under the lexicographic edge order (w, lo, hi) — which is
  * unique because that order is total. Mreach weights tie constantly
  * (they collapse to the dominating endpoint's core distance, and the
  * round-6 weight convention adds more), so both the engine's
  * per-vertex argmin and this independent Prim must use the identical
  * (round6(w), lo, hi) order for the cut property to hold. */
class HdbscanMstSpec extends SparkSpec {

  test("round-1 edges are a subset of a Prim MST over mreach weights") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pts = emb.orderBy("vec_id").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
    val n = pts.length
    val idOf = pts.map(_._1)
    def dist(i: Int, j: Int): Double = {
      val a = pts(i)._2; val b = pts(j)._2
      var s = 0.0; var k = 0
      while (k < a.length) { val d = a(k) - b(k); s += d * d; k += 1 }
      math.sqrt(s)
    }
    // core distance: 8th NN, self included (distance 0 counts)
    val core = Array.tabulate(n)(i =>
      Array.tabulate(n)(j => dist(i, j)).sorted.apply(7))
    def mreach(i: Int, j: Int): Double =
      math.max(dist(i, j), math.max(core(i), core(j)))
    // Prim over the implicit complete graph comparing FULL (w, lo, hi)
    // keys everywhere — including the cheapest-edge-per-vertex updates,
    // not just the next-vertex pick — so it computes the unique MST of
    // the lexicographically perturbed weights
    // the engine orders by the ROUNDED weight (q_hdbscan_core's
    // round-6 convention) — the Prim keys must match exactly
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def key(i: Int, j: Int): (Double, Long, Long) = {
      val a = idOf(i); val b = idOf(j)
      (r6(mreach(i, j)), math.min(a, b), math.max(a, b))
    }
    val ord = implicitly[Ordering[(Double, Long, Long)]]
    val inTree = Array.fill(n)(false)
    val bestKey = Array.fill[(Double, Long, Long)](n)(
      (Double.PositiveInfinity, Long.MaxValue, Long.MaxValue))
    val bestFrom = Array.fill(n)(-1)
    inTree(0) = true
    for (j <- 1 until n) { bestKey(j) = key(0, j); bestFrom(j) = 0 }
    val mst = scala.collection.mutable.Set.empty[(Long, Long)]
    for (_ <- 1 until n) {
      val nxt = (0 until n).filter(!inTree(_)).minBy(bestKey)(ord)
      inTree(nxt) = true
      val a = idOf(nxt); val b = idOf(bestFrom(nxt))
      mst += ((math.min(a, b), math.max(a, b)))
      for (j <- 0 until n if !inTree(j)) {
        val k = key(nxt, j)
        if (ord.lt(k, bestKey(j))) { bestKey(j) = k; bestFrom(j) = nxt }
      }
    }
    val got = Hdbscan.mstRound1Edges(emb, cap = n + 1, minSamples = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length >= n / 2, s"round 1 must cover every vertex")
    val missing = got.filterNot(mst.contains)
    assert(missing.isEmpty,
      s"${missing.length} round-1 edges not in the Prim MST: " +
        missing.take(5).mkString(", "))
  }
}
