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

  test("the RDD round is bit-identical to the retired column-program " +
      "round across chained iterations (incl. the decimal cast, the " +
      "round-6 tiebreak and empty-cluster carry)") {
    val pts = emb.select(col("vec_id").cast("long").as("pid"),
      col("embedding").cast("array<double>").as("v"))
    val ptsRdd = pts.rdd.map { r =>
      val s = r.getSeq[Any](1)
      val arr = new Array[java.lang.Double](s.size)
      var i = 0
      s.foreach { x => arr(i) = x.asInstanceOf[java.lang.Double]; i += 1 }
      (r.getLong(0), arr)
    }.cache()
    var cents: IndexedSeq[Array[Double]] = ptsRdd.filter(_._1 < 4)
      .collect().sortBy(_._1).map(_._2.map(_.doubleValue)).toIndexedSeq
    // k > points in some cluster on later rounds exercises the
    // empty-cluster carry; chain 4 rounds so drift would compound
    for (round <- 1 to 4) {
      val viaDf = LloydKmeans.lloydRoundDf(pts, cents)
      val viaRdd = LloydKmeans.lloydRound(ptsRdd, cents)
      assert(viaRdd.map(_.toSeq) == viaDf.map(_.toSeq),
        s"round $round diverged")
      cents = viaRdd
    }
    ptsRdd.unpersist()
  }

  test("JVM round/cast twins match the Spark expressions bit-for-bit") {
    // adversarial doubles: halfway cases, subnormals, many digits
    val vals = Seq(0.5e-6, 1.5e-6, 2.5e-6, 0.1234565, 0.1234575,
      1.0 / 3.0, math.Pi, 1e-300, 4.9e-324, 123456.1234565,
      -0.1234565, -2.5e-6, 0.49999999999999994, 1e19, -1e19)
    val df = vals.toDF("x")
      .select(col("x"), round(col("x"), 6).as("r6"),
        round(col("x"), 9).as("r9"),
        col("x").cast("decimal(38,18)").cast("string").as("d18"))
    df.collect().foreach { r =>
      val x = r.getDouble(0)
      assert(graft.functions.VecDecimal.roundD(x, 6) == r.getDouble(1),
        s"round6($x)")
      assert(graft.functions.VecDecimal.roundD(x, 9) == r.getDouble(2),
        s"round9($x)")
      val jvm = graft.functions.VecDecimal.dec18(x)
      val sparkD =
        if (r.isNullAt(3)) null
        else new java.math.BigDecimal(r.getString(3))
      assert((jvm == null) == (sparkD == null)
        && (jvm == null || jvm.compareTo(sparkD) == 0
          && jvm.scale == sparkD.scale), s"dec18($x)")
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
