package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed Lloyd KMeans — the hash-checkable
  * counterpart to the MLlib best-of-seeds fit (`Clustering.kmeansBest`,
  * whose k-means|| init and float summation order make its exact labels
  * engine-private; the reference has the same caveat with sklearn's RNG,
  * ref src/mf_etl/research/clustering.py:74-120).
  *
  * Every arithmetic step is fixed so an unrolled SQL oracle reproduces
  * the fit bit-for-bit (the same pinned-model discipline as the HMM
  * decode oracle and the PQ encode path):
  *  - init: centroids = the first `k` vectors by id (seed-slice
  *    convention shared with PQ/IVF);
  *  - assignment: exact per-term DECIMAL(38,18) squared-L2 sums
  *    (aggregation-order-free), round-6 + lowest-cluster-id tiebreak;
  *  - update: per-dimension mean = CAST(exact decimal sum AS DOUBLE) /
  *    count — one IEEE division on identical inputs in both engines;
  *  - empty clusters keep their previous centroid.
  *
  * Scale shape: the textbook distributed Lloyd — centroids are a
  * k×dim driver literal broadcast into a map-only assignment pass, and
  * the update is ONE partial-aggregated groupBy((cluster, dim)) shuffle
  * per iteration. Nothing driver-side ever holds more than k×dim
  * doubles. At 100 TB with k=4..1024 this is exactly MLlib's plan per
  * iteration, minus the nondeterminism.
  */
object LloydKmeans {

  /** Exact squared L2 distance of an array column to a literal centroid
    * (per-term scale-18 decimal accumulation, unrounded double out) —
    * the native codegen'd fold, bit-identical to the interpreted HOF
    * formulation (graft.functions.VecDecimal contract). */
  private def sqDistExact(vec: Column, centroid: Array[Double]): Column =
    graft.functions.VecOps.sqDist18(vec, typedlit(centroid.toSeq))

  /** Nearest-centroid `(d, cluster)` struct for a vector column:
    * (round-6 distance, lowest id) tiebreak — the shared cross-engine
    * convention. */
  private def assignStruct(vec: Column, cents: IndexedSeq[Array[Double]])
      : Column = {
    val structs = cents.indices.map { c =>
      struct(round(sqDistExact(vec, cents(c)), 6).as("d"),
        lit(c).as("cluster"))
    }
    element_at(array_sort(array(structs: _*)), 1)
  }

  private def assignCol(vec: Column, cents: IndexedSeq[Array[Double]])
      : Column = assignStruct(vec, cents).getField("cluster")

  /** Run `iters` Lloyd iterations over `(id, vec)` rows (`vecCol` an
    * array column). Returns (assignments df `(id, cluster, d2)` for the
    * FINAL centroids, final centroids). */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): (DataFrame, IndexedSeq[Array[Double]]) = {
    val (a, cents) = fitWithDist(df, idCol, vecCol, k, iters)
    (a.select(col("pid"), col("cluster")), cents)
  }

  /** [[fit]] plus the assigned cluster's ROUND-6 squared distance:
    * `(pid, cluster, d2)` — the per-point prototypicality signal the
    * pruning family ranks on (d2 is the same rounded value the argmin
    * tiebreak ordered by, so it is oracle-exact by construction). */
  def fitWithDist(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): (DataFrame, IndexedSeq[Array[Double]]) = {
    val v = col(vecCol).cast("array<double>")
    // cache the (pid, v) rows ONCE as a plain RDD for the iteration
    // loop: every Lloyd round re-reads them (assignment + update), and
    // the previous DataFrame formulation paid a Catalyst plan + a
    // groupBy((cluster, dim)) exchange PER ROUND — pure fixed cost for
    // a loop whose input never changes (the Hmm.fitSweepDistributed
    // lesson; measured ~0.4 s/round at the fixture scale, ×m subspaces
    // ×arms in the PQ codebook builds). The RDD round is the same
    // distributed shape (map-side partial k×dim sums, one tiny merge)
    // with zero per-round planning. Bounded: one id + one vector/row.
    val ptsRdd = df
      .select(col(idCol).cast("long").as("pid"), v.as("v"))
      .rdd.map { r =>
        val s = r.getSeq[Any](1)
        val arr = new Array[java.lang.Double](if (s == null) 0 else s.size)
        if (s != null) {
          var i = 0
          s.foreach { x =>
            arr(i) = x.asInstanceOf[java.lang.Double]; i += 1 }
        }
        (r.getLong(0), arr)
      }.cache()
    try {
      // init: seed slice (first k ids)
      var cents: IndexedSeq[Array[Double]] = ptsRdd
        .filter(_._1 < k).collect().sortBy(_._1)
        .map(_._2.map(_.doubleValue)).toIndexedSeq
      require(cents.length == k, s"need $k seed vectors with pid < $k")
      val dim = cents.head.length
      for (_ <- 1 to iters)
        cents = lloydRound(ptsRdd, cents)
      require(cents.head.length == dim)
      // the returned assignment frame re-derives from the UNCACHED
      // input (df), so it stays valid after the loop cache unpersists;
      // consumers keep planning against the same column program as
      // before (the RDD loop only replaced the per-round actions)
      val finalAssign = df
        .select(col(idCol).cast("long").as("pid"), v.as("v"))
        .withColumn("best", assignStruct(col("v"), cents))
        .select(col("pid"), col("best.cluster").as("cluster"),
          col("best.d").as("d2"))
      (finalAssign, cents)
    } finally { ptsRdd.unpersist(blocking = false); () }
  }

  /** One Lloyd round over the cached point RDD — the JVM twin of the
    * retired per-round column program, bit-identical by construction
    * (LloydKmeansSpec locks the full fit against the unrolled oracle
    * and the legacy DataFrame round):
    *  - assignment: argmin over clusters of round-6
    *    [[graft.functions.VecDecimal.sqDist18]] with the
    *    array_sort struct convention — a NULL distance (overflow /
    *    null element / length mismatch) sorts FIRST (InterpretedOrdering
    *    nulls-first within struct fields), ties break on lowest
    *    cluster id;
    *  - update: per (cluster, dim) mean = CAST(Σ CAST(x AS
    *    DECIMAL(38,18)) AS DOUBLE) / count — decimal sums are exact and
    *    order-free, so map-side partials merge without drift; a group's
    *    count includes null elements (they just add nothing), and an
    *    all-null or precision-overflowed sum leaves the previous
    *    centroid coordinate in place;
    *  - empty clusters keep their previous centroid. */
  private[graft] def lloydRound(
      pts: org.apache.spark.rdd.RDD[(Long, Array[java.lang.Double])],
      cents: IndexedSeq[Array[Double]]): IndexedSeq[Array[Double]] = {
    val k = cents.length
    val dim = cents.head.length
    val cArr = cents.map(_.clone).toArray
    val (sums, counts) = pts.mapPartitions { it =>
      val s = Array.fill[java.math.BigDecimal](k, dim)(null)
      val n = Array.ofDim[Long](k, dim)
      it.foreach { case (_, v) =>
        val c = assignJvm(v, cArr)
        var j = 0
        val len = math.min(v.length, dim)
        while (j < len) {
          n(c)(j) += 1
          if (v(j) != null) {
            val b = graft.functions.VecDecimal.dec18(v(j).doubleValue)
            if (b != null)
              s(c)(j) = if (s(c)(j) == null) b else s(c)(j).add(b)
          }
          j += 1
        }
      }
      Iterator.single((s, n))
    }.reduce { case ((s1, n1), (s2, n2)) =>
      var c = 0
      while (c < k) {
        var j = 0
        while (j < dim) {
          n1(c)(j) += n2(c)(j)
          if (s2(c)(j) != null)
            s1(c)(j) =
              if (s1(c)(j) == null) s2(c)(j) else s1(c)(j).add(s2(c)(j))
          j += 1
        }
        c += 1
      }
      (s1, n1)
    }
    IndexedSeq.tabulate(k) { c =>
      val next = cents(c).clone() // empty clusters keep prev coordinate
      var j = 0
      while (j < dim) {
        // the column program's sum(decimal(38,18)) nulls on precision
        // overflow (non-ANSI); mirror it before the double cast
        if (counts(c)(j) > 0 && sums(c)(j) != null
            && sums(c)(j).precision <= 38)
          next(j) = sums(c)(j).doubleValue / counts(c)(j).toDouble
        j += 1
      }
      next
    }
  }

  /** Nearest-centroid index under the column program's exact tiebreak
    * (see [[lloydRound]]). */
  private[ml] def assignJvm(v: Array[java.lang.Double],
      cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestD: java.lang.Double = distJvm(v, cents(0))
    var c = 1
    while (c < cents.length) {
      val d = distJvm(v, cents(c))
      val better =
        if (d == null) bestD != null // null distance sorts first
        else bestD != null && d.doubleValue < bestD.doubleValue
      if (better) { best = c; bestD = d }
      c += 1
    }
    best
  }

  /** round-6 exact-decimal squared distance (the struct's `d` field):
    * null propagates. */
  private[ml] def distJvm(v: Array[java.lang.Double],
      cent: Array[Double]): java.lang.Double = {
    val sq = graft.functions.VecDecimal.sqDist18(v, cent)
    if (sq == null) null
    else java.lang.Double.valueOf(
      graft.functions.VecDecimal.roundD(sq.doubleValue, 6))
  }

  /** The retired per-round COLUMN program (assignment expression +
    * groupBy((cluster, dim)) exchange) — kept as the parity reference:
    * LloydKmeansSpec asserts [[lloydRound]] reproduces it bit-for-bit
    * on fixture data, which is what licenses the RDD loop to replace
    * it in [[fitWithDist]]. */
  private[graft] def lloydRoundDf(pts: DataFrame,
      cents: IndexedSeq[Array[Double]]): IndexedSeq[Array[Double]] = {
    val k = cents.length
    val assigned = pts.withColumn("cluster", assignCol(col("v"), cents))
    val sums = assigned
      .select(col("cluster"), posexplode(col("v")).as(Seq("j", "x")))
      .groupBy("cluster", "j")
      .agg((sum(col("x").cast("decimal(38,18)")).cast("double")
        / count(lit(1))).as("y"))
      .collect()
    val next = Array.tabulate(k)(c => cents(c).clone())
    sums.foreach { r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2) }
    next.toIndexedSeq.map(identity)
  }

  /** Unrolled DuckDB oracle for [[fit]] over the `embeddings` table:
    * `iters` chained CTE pairs (assign_i, cent_i), ending in CTE
    * `kassign(pid, cluster)` for the final centroids. Bit-parity holds
    * because both sides use exact decimal sums, the same round-6 + id
    * tiebreak, and the same double division. */
  def oracleSql(k: Int, iters: Int): String = {
    val init = s"""
      kpts AS (
        SELECT vec_id AS pid, generate_subscripts(embedding, 1) - 1 AS j,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings)"""
    init + "," + oracleSqlFrom("kpts", k, iters, "") + finalAssignSql(
      "kpts", iters, "")
  }

  /** The same unrolled Lloyd CTE chain over an ARBITRARY source CTE
    * `src(pid, j, x)` with every generated CTE name prefixed by `pfx`,
    * so several independent fits (e.g. one per PQ subspace) compose in
    * one oracle query. Ends at `${pfx}cent_$iters(c, j, y)` — the
    * fitted centroids. Same math as [[oracleSql]] verbatim. */
  def oracleSqlFrom(src: String, k: Int, iters: Int,
      pfx: String): String = {
    val init = s"""
      ${pfx}cent_0 AS MATERIALIZED (
        SELECT pid AS c, j, x AS y FROM $src WHERE pid < $k)"""
    val steps = (1 to iters).map { i =>
      val p = i - 1
      s"""
      ${pfx}kd_$i AS (
        SELECT p.pid, c.c,
               CAST(sum(CAST((p.x - c.y) * (p.x - c.y)
                 AS DECIMAL(38,18))) AS DOUBLE) AS d2
        FROM $src p JOIN ${pfx}cent_$p c ON p.j = c.j GROUP BY 1, 2),
      ${pfx}ka_$i AS MATERIALIZED (
        SELECT pid, c AS cluster FROM (
          SELECT *, row_number() OVER (PARTITION BY pid
            ORDER BY round(d2, 6), c) AS rn FROM ${pfx}kd_$i)
        WHERE rn = 1),
      ${pfx}km_$i AS (
        SELECT a.cluster AS c, p.j,
               CAST(sum(CAST(p.x AS DECIMAL(38,18))) AS DOUBLE)
                 / count(*) AS y
        FROM $src p JOIN ${pfx}ka_$i a USING (pid) GROUP BY 1, 2),
      ${pfx}cent_$i AS MATERIALIZED (
        SELECT prev.c, prev.j, coalesce(m.y, prev.y) AS y
        FROM ${pfx}cent_$p prev LEFT JOIN ${pfx}km_$i m
          ON m.c = prev.c AND m.j = prev.j)"""
    }.mkString(",")
    init + "," + steps
  }

  /** Final-centroid assignment CTEs (`${pfx}kd_fin`, `${pfx}kassign`)
    * against `${pfx}cent_$iters`. */
  def finalAssignSql(src: String, iters: Int, pfx: String): String = s""",
      ${pfx}kd_fin AS MATERIALIZED (
        SELECT p.pid, c.c,
               CAST(sum(CAST((p.x - c.y) * (p.x - c.y)
                 AS DECIMAL(38,18))) AS DOUBLE) AS d2
        FROM $src p JOIN ${pfx}cent_$iters c ON p.j = c.j GROUP BY 1, 2),
      ${pfx}kassign AS MATERIALIZED (
        SELECT pid, c AS cluster FROM (
          SELECT *, row_number() OVER (PARTITION BY pid
            ORDER BY round(d2, 6), c) AS rn FROM ${pfx}kd_fin)
        WHERE rn = 1)"""
}
