package graft.ml

/** HDBSCAN (Campello, Moulavi, Sander) — labels-only `fit_predict`
  * matching the reference's optional hdbscan method
  * (ref: src/mf_etl/research/clustering.py:184-203:
  * `HDBSCAN(min_cluster_size=max(5, n_clusters), min_samples=None)`,
  * prediction only on the fit matrix). Like the reference's
  * single-process library call — and like the DiagGmm/HMM fits here —
  * the fit runs on the driver over a deterministically capped point set;
  * assignment beyond the fit set is undefined by the reference, so none
  * is offered.
  *
  * Implementation follows the canonical pipeline:
  *   1. core distance = distance to the min_samples-th nearest neighbor
  *      (self included, as the library's KDTree query does);
  *   2. minimum spanning tree of the implicit mutual-reachability graph
  *      (max(core_a, core_b, d(a,b))) via Prim in O(n²) time and O(n)
  *      memory — no n×n matrix is ever materialized;
  *   3. single-linkage merge tree from the ascending MST edges;
  *   4. condensed tree under `min_cluster_size`: a split is real only if
  *      both sides are big enough, otherwise the small side's points
  *      fall out of the current cluster at λ = 1/distance;
  *   5. cluster stability Σ (λ_leave − λ_birth)·size and excess-of-mass
  *      selection (a parent beats its children only if its own stability
  *      exceeds their sum); the root is never selectable
  *      (allow_single_cluster=False, the library default);
  *   6. labels: a point adopts its nearest selected ancestor in the
  *      condensed tree; otherwise −1 (noise). Cluster ids are assigned
  *      0..k−1 in condensed-tree order — deterministic.
  */
object Hdbscan {

  def fitPredict(data: Array[Array[Double]], minClusterSize: Int,
      minSamplesOpt: Option[Int] = None): Array[Int] = {
    val n = data.length
    if (n == 0) return Array.empty
    val mcs = math.max(2, minClusterSize)
    val minSamples = math.max(1, math.min(minSamplesOpt.getOrElse(mcs), n))
    if (n < 2 * mcs) return Array.fill(n)(-1) // no real split can exist

    val d = data(0).length
    def dist(i: Int, j: Int): Double = {
      val a = data(i); val b = data(j)
      var s = 0.0; var k = 0
      while (k < d) { val df = a(k) - b(k); s += df * df; k += 1 }
      math.sqrt(s)
    }

    // 1. core distances (min_samples-th NN, self included at distance 0)
    val core = Array.tabulate(n) { i =>
      val ds = new Array[Double](n)
      var j = 0
      while (j < n) { ds(j) = dist(i, j); j += 1 }
      java.util.Arrays.sort(ds)
      ds(minSamples - 1)
    }
    def mreach(i: Int, j: Int): Double =
      math.max(dist(i, j), math.max(core(i), core(j)))

    // 2. Prim MST over the implicit mutual-reachability graph
    val inTree = new Array[Boolean](n)
    val bestW = Array.fill(n)(Double.PositiveInfinity)
    val bestSrc = new Array[Int](n)
    val eA = new Array[Int](n - 1)
    val eB = new Array[Int](n - 1)
    val eW = new Array[Double](n - 1)
    inTree(0) = true
    var cur = 0
    var step = 0
    while (step < n - 1) {
      var j = 0
      while (j < n) {
        if (!inTree(j)) {
          val w = mreach(cur, j)
          if (w < bestW(j)) { bestW(j) = w; bestSrc(j) = cur }
        }
        j += 1
      }
      var pick = -1
      var pw = Double.PositiveInfinity
      j = 0
      while (j < n) {
        if (!inTree(j) && bestW(j) < pw) { pw = bestW(j); pick = j }
        j += 1
      }
      eA(step) = bestSrc(pick); eB(step) = pick; eW(step) = pw
      inTree(pick) = true
      cur = pick
      step += 1
    }

    // 3. single-linkage tree: leaves 0..n-1, internal nodes n..2n-2
    val order = (0 until n - 1).sortBy(eW)
    val uf = Array.tabulate(2 * n - 1)(identity)
    def find(x: Int): Int = {
      var r = x
      while (uf(r) != r) r = uf(r)
      var c = x
      while (uf(c) != r) { val nx = uf(c); uf(c) = r; c = nx }
      r
    }
    val repNode = Array.tabulate(2 * n - 1)(identity)
    val childL = new Array[Int](n - 1)
    val childR = new Array[Int](n - 1)
    val mergeDist = new Array[Double](n - 1)
    val sizeOf = Array.fill(2 * n - 1)(1)
    var idx = 0
    order.foreach { e =>
      val ra = find(eA(e)); val rb = find(eB(e))
      val na = repNode(ra); val nb = repNode(rb)
      val node = n + idx
      childL(idx) = na; childR(idx) = nb; mergeDist(idx) = eW(e)
      uf(ra) = rb
      repNode(find(rb)) = node
      sizeOf(node) = sizeOf(na) + sizeOf(nb)
      idx += 1
    }

    def leavesUnder(node: Int): Iterator[Int] = new Iterator[Int] {
      private val stack = scala.collection.mutable.Stack(node)
      def hasNext: Boolean = stack.nonEmpty
      def next(): Int = {
        var t = stack.pop()
        while (t >= n) { stack.push(childR(t - n)); t = childL(t - n) }
        t
      }
    }

    // 4. condensed tree. Rows: (parentCluster, λ, size, point | childCluster)
    val rowParent = scala.collection.mutable.ArrayBuffer.empty[Int]
    val rowLambda = scala.collection.mutable.ArrayBuffer.empty[Double]
    val rowSize = scala.collection.mutable.ArrayBuffer.empty[Int]
    val rowPoint = scala.collection.mutable.ArrayBuffer.empty[Int] // -1 ⇒ cluster child
    val rowChildCl = scala.collection.mutable.ArrayBuffer.empty[Int]
    val clusterParent = scala.collection.mutable.ArrayBuffer(-1) // id 0 = root
    val clusterBirth = scala.collection.mutable.ArrayBuffer(0.0)
    // walk (hierarchy node, condensed cluster) pairs from the root
    val work = scala.collection.mutable.Stack((2 * n - 2, 0))
    while (work.nonEmpty) {
      val (node, cl) = work.pop()
      if (node < n) {
        // a bare leaf reached inside cluster `cl`: it leaves at λ = ∞
        // only via parent splits, which were already recorded
      } else {
        val i = node - n
        val lam = if (mergeDist(i) > 0) 1.0 / mergeDist(i)
          else Double.PositiveInfinity
        val l = childL(i); val r = childR(i)
        val sl = sizeOf(l); val sr = sizeOf(r)
        if (sl >= mcs && sr >= mcs) {
          // true split: two new condensed clusters born at λ
          val cl1 = clusterParent.length
          clusterParent += cl; clusterBirth += lam
          val cl2 = clusterParent.length
          clusterParent += cl; clusterBirth += lam
          rowParent += cl; rowLambda += lam; rowSize += sl
          rowPoint += -1; rowChildCl += cl1
          rowParent += cl; rowLambda += lam; rowSize += sr
          rowPoint += -1; rowChildCl += cl2
          work.push((l, cl1)); work.push((r, cl2))
        } else if (sl < mcs && sr < mcs) {
          // both sides too small: every point falls out of `cl` at λ
          leavesUnder(node).foreach { p =>
            rowParent += cl; rowLambda += lam; rowSize += 1
            rowPoint += p; rowChildCl += -1
          }
        } else {
          // the small side's points fall out; `cl` continues down the
          // large side
          val (big, small) = if (sl >= mcs) (l, r) else (r, l)
          leavesUnder(small).foreach { p =>
            rowParent += cl; rowLambda += lam; rowSize += 1
            rowPoint += p; rowChildCl += -1
          }
          work.push((big, cl))
        }
      }
    }

    // 5. stability + excess-of-mass selection (root never selectable)
    val nCl = clusterParent.length
    val stability = new Array[Double](nCl)
    var r = 0
    while (r < rowParent.length) {
      val c = rowParent(r)
      val birth = clusterBirth(c)
      val lam = rowLambda(r)
      val contrib =
        (if (lam.isInfinity) 0.0 else (lam - birth)) * rowSize(r)
      stability(c) += (if (contrib.isNaN) 0.0 else contrib)
      r += 1
    }
    val childClusters = Array.fill(nCl)(List.empty[Int])
    for (c <- nCl - 1 to 1 by -1)
      childClusters(clusterParent(c)) ::= c
    val selected = new Array[Boolean](nCl)
    def deselectSubtree(c: Int): Unit = {
      selected(c) = false
      childClusters(c).foreach(deselectSubtree)
    }
    for (c <- nCl - 1 to 1 by -1) {
      val childSum = childClusters(c).map(stability).sum
      if (childClusters(c).nonEmpty && childSum > stability(c)) {
        stability(c) = childSum // children win; c stays unselected
      } else {
        selected(c) = true
        childClusters(c).foreach(deselectSubtree)
      }
    }
    selected(0) = false // allow_single_cluster=False

    // 6. labels: nearest selected ancestor of the cluster a point fell
    // out of; noise otherwise. Ids 0..k-1 in condensed-cluster order.
    val labelOf = new Array[Int](nCl)
    var nextLabel = 0
    for (c <- 0 until nCl) {
      labelOf(c) = if (selected(c)) { val v = nextLabel; nextLabel += 1; v }
        else -1
    }
    val labels = Array.fill(n)(-1)
    r = 0
    while (r < rowParent.length) {
      if (rowPoint(r) >= 0) {
        var c = rowParent(r)
        while (c != -1 && !selected(c)) c = clusterParent(c)
        if (c != -1) labels(rowPoint(r)) = labelOf(c)
      }
      r += 1
    }
    labels
  }

  /** Distributed Borůvka round 1 over the mutual-reachability graph —
    * the deterministic, oracle-checkable slice of the MST build (step 2
    * of the fit): with distinct edge weights, EVERY vertex's
    * minimum-weight incident edge is an MST edge (the cut property), so
    * this emits a guaranteed subset of the single-linkage tree the
    * driver-side fit condenses.
    *
    * Weights follow q_hdbscan_core's convention — plain double distance
    * sums, cross-engine agreement at 6 decimals (the exact-decimal
    * fold was measured 75× slower over the n² pair frame for no
    * contract gain; the selection below orders by the ROUNDED weight,
    * so engines agree whenever the raw sums agree to 1e-6 — the same
    * boundary class as every round-6 selection in the repo).
    *
    * Mutual-reachability weights tie CONSTANTLY (mreach collapses to
    * the larger endpoint's core distance for every pair that endpoint
    * dominates, and rounding adds more), so "distinct weights" must be
    * manufactured: edges are compared by the global total order
    * (round6(mreach), lo, hi) — the lexicographic perturbation
    * Kruskal/Borůvka use to make the MST unique — and the per-vertex
    * argmin uses that SAME order, which keeps the cut property valid
    * (HdbscanMstSpec locks the subset claim against an independent
    * Prim under the identical order).
    *
    * Shape: `pairs` (ia, ib, dist) and `core` (cv, cd) enter as
    * ALREADY-MATERIALIZED stages (MlQueries.hdbscanPairs /
    * hdbscanCoreDf — in production the capped fit set's kNN working
    * frame is a stored artifact shared with the core-distance query),
    * so the n² distance scan runs ONCE per run; the cap-bounded core
    * table re-enters as a broadcast on both endpoints and the pair
    * frame is never reshuffled. At full scale this round is exactly
    * how a distributed Borůvka MST starts (each subsequent round
    * contracts components and repeats — the iterated contraction lives
    * in the driver fit; see `text.Dedup.connectedComponents` for the
    * same contract pattern).
    *
    * Output: one row per distinct selected undirected edge
    * `(e_lo, e_hi, mreach_dist)`. */
  def mstRound1Edges(pairs: org.apache.spark.sql.DataFrame,
      core: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val mre = pairs.filter(col("ia") =!= col("ib"))
      .join(broadcast(core).withColumnRenamed("cv", "ia")
        .withColumnRenamed("cd", "ca"), Seq("ia"))
      .join(broadcast(core).withColumnRenamed("cv", "ib")
        .withColumnRenamed("cd", "cb"), Seq("ib"))
      .select(col("ia"), col("ib"),
        greatest(col("dist"), col("ca"), col("cb")).as("mreach"))
    // Per-vertex argmin under the SAME total order, as a hash
    // aggregate: min(struct(w, lo, hi)) compares fields
    // lexicographically — exactly the (round6(mreach), lo, hi) window
    // order — but runs with map-side partial aggregation over the n²
    // frame instead of a full within-partition sort (the sort was the
    // query's dominant cost at the 25M-row sf0.1 pair scale).
    val sel = mre.groupBy("ia").agg(min(struct(
        round(col("mreach"), 6).as("w"),
        least(col("ia"), col("ib")).as("lo"),
        greatest(col("ia"), col("ib")).as("hi"))).as("m"))
    sel.select(col("m.lo").as("e_lo"), col("m.hi").as("e_hi"),
        col("m.w").as("mreach_dist"))
      .distinct()
  }

  /** Self-contained convenience form (spec use): builds the pair and
    * core frames inline with the same conventions as the shared
    * stages. */
  def mstRound1Edges(emb: org.apache.spark.sql.DataFrame, cap: Int,
      minSamples: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val e = emb.filter(col("vec_id") < cap)
      .select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>").as("v"))
    val pairs = e.select(col("vec_id").as("ia"), col("v").as("va"))
      .repartition(col("ia"))
      .join(broadcast(
        e.select(col("vec_id").as("ib"), col("v").as("vb"))))
      .select(col("ia"), col("ib"),
        sqrt(graft.functions.VecOps.sqDist(col("va"), col("vb")))
          .as("dist"))
    val core = pairs.withColumn("rn", row_number().over(
        Window.partitionBy("ia").orderBy("dist", "ib")))
      .filter(col("rn") === minSamples)
      .select(col("ia").as("cv"), col("dist").as("cd"))
    mstRound1Edges(pairs, core)
  }
}
