package graft

import org.apache.spark.sql.functions._
import graft.ml.LloydKmeans

/** Deterministic distributed Lloyd (ml.LloydKmeans) — the
  * hash-checkable KMeans fit. The DuckDB bit-parity is driver-checked
  * (q_kmeans_lloyd); here the ALGORITHM invariants are locked:
  * monotone inertia (the Lloyd guarantee), assignment consistency with
  * the returned centroids, and run-to-run determinism. */
class LloydKmeansSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  /** Exact inertia of a fit: sum over points of squared L2 to the
    * assigned (= nearest, by construction) centroid. */
  private def inertia(iters: Int): Double = {
    val (assign, cents) = LloydKmeans.fit(emb, "vec_id", "embedding",
      k = 4, iters = iters)
    val byId = cents.zipWithIndex.map(_.swap).toMap
    assign.join(emb.select(col("vec_id").as("pid"),
        col("embedding").cast("array<double>").as("v")), "pid")
      .as[(Long, Int, Seq[Double])].collect()
      .map { case (_, c, v) =>
        v.zip(byId(c)).map { case (x, y) => (x - y) * (x - y) }.sum
      }.sum
  }

  test("Lloyd inertia is non-increasing across iterations") {
    val js = Seq(1, 2, 4, 6).map(inertia)
    js.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"inertia increased: $js")
    }
  }

  test("assignments are the argmin of the returned centroids and " +
      "every point is labeled exactly once") {
    val (assign, cents) = LloydKmeans.fit(emb, "vec_id", "embedding",
      k = 4, iters = 3)
    val rows = assign.join(emb.select(col("vec_id").as("pid"),
        col("embedding").cast("array<double>").as("v")), "pid")
      .as[(Long, Int, Seq[Double])].collect()
    assert(rows.length == emb.count())
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.foreach { case (pid, c, v) =>
      val d = cents.map(ct =>
        v.zip(ct).map { case (x, y) => (x - y) * (x - y) }.sum)
      // round-6 tiebreak: the assigned cluster's rounded distance is
      // minimal (lowest id among rounded ties)
      val rd = d.map(x => BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      val best = rd.zipWithIndex.min
      assert(rd(c) == best._1 && c <= best._2,
        s"pid=$pid assigned $c but nearest is $best")
    }
  }

  test("the fit is deterministic run-to-run") {
    val a = LloydKmeans.fit(emb, "vec_id", "embedding", 4, 5)
    val b = LloydKmeans.fit(emb, "vec_id", "embedding", 4, 5)
    assert(a._2.map(_.toSeq) == b._2.map(_.toSeq))
    assert(a._1.orderBy("pid").collect().toSeq
      == b._1.orderBy("pid").collect().toSeq)
  }
}
