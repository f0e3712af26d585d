package graft

import org.apache.spark.sql.functions._
import graft.functions.VecOps

/** Native vector-fold expressions: HOF-identical semantics (the oracle
  * contract), codegen execution, and SQL registration. */
class VecOpsSpec extends SparkSpec {

  private def hofDot = (a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def hofSq = (a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0),
      (acc, x) => acc + x)

  test("vec_dot / vec_sqdist are bit-identical to the interpreted HOF " +
      "fold, including null and length-mismatch semantics") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      val n = 1 + rnd.nextInt(8)
      def vec = Seq.fill(n)(rnd.nextDouble() * 10 - 5)
      (i.toLong, vec, vec)
    }
    val base = rows.toDF("id", "a", "b")
      // add length-mismatch and null-element rows
      .union(Seq(
        (900L, Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)),
        (901L, Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("id", "a", "b"))
      .union(Seq((902L, Seq[java.lang.Double](1.0, null, 3.0)
          .map(Option(_).map(Double.unbox)),
        Seq(Some(1.0), Some(2.0), Some(3.0))))
        .toDF("id", "a", "b"))
    val cmp = base.select(col("id"),
      VecOps.dot(col("a"), col("b")).as("nd"),
      hofDot(col("a"), col("b")).as("hd"),
      VecOps.sqDist(col("a"), col("b")).as("ns"),
      hofSq(col("a"), col("b")).as("hs"))
    val bad = cmp.filter(
      !(col("nd") <=> col("hd")) || !(col("ns") <=> col("hs")))
    assert(bad.count() == 0, s"diverged: ${bad.collect().mkString(", ")}")
    // mismatch/null rows must be null in BOTH implementations
    val nulls = cmp.filter(col("id") >= 900L).collect()
    assert(nulls.forall(r => r.isNullAt(1) && r.isNullAt(2)
      && r.isNullAt(3) && r.isNullAt(4)))
  }

  test("vec_dot executes inside whole-stage codegen") {
    // non-constant inputs (literals would be constant-folded into a
    // LocalTableScan before any codegen happens)
    val df = spark.range(1, 4)
      .select(VecOps.dot(
        array(col("id").cast("double"), (col("id") * 2).cast("double")),
        array(lit(10.0), lit(100.0))).as("d"))
    // id=1 → [1,2]·[10,100] = 210; id=2 → [2,4]·[10,100] = 420
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(210.0, 420.0,
      630.0))
    // the `*(n)` prefix marks operators fused into WholeStageCodegen;
    // a non-codegen expression would leave a bare `Project`
    val plan = df.queryExecution.executedPlan.toString
    assert(raw"\*\(\d+\) Project \[vec_dot".r.findFirstIn(plan).isDefined,
      s"vec_dot fell out of whole-stage codegen:\n$plan")
  }

  /** The interpreted decimal HOF chain vec_sqdist18 replaced — kept
    * here verbatim as the parity reference. */
  private def hofSq18 = (a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(java.math.BigDecimal.ZERO).cast("decimal(32,18)"),
      (acc, t) => (acc + t.cast("decimal(24,18)"))
        .cast("decimal(32,18)")).cast("double")

  test("vec_sqdist18 is bit-identical to the exact-decimal HOF chain, " +
      "including overflow / non-finite / mismatch semantics") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { i =>
      val n = 1 + rnd.nextInt(8)
      // mix magnitudes: tiny (rounding-boundary-ish), unit, and values
      // whose squared diff sits just under / at the (24,18) overflow
      def v = Seq.fill(n)(rnd.nextInt(4) match {
        case 0 => rnd.nextDouble() * 1e-9
        case 1 => rnd.nextDouble() * 10 - 5
        case 2 => rnd.nextDouble() * 999.0
        case _ => 999.9999 + rnd.nextDouble() * 0.001
      })
      (i.toLong, v, v.map(x => if (rnd.nextBoolean()) -x else x))
    }
    val edge = Seq(
      (900L, Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)), // length mismatch
      (901L, Seq(1e9), Seq(0.0)),                // hard overflow
      (902L, Seq(1000.0), Seq(0.0)),             // exactly 1e6 → null
      (903L, Seq(Double.NaN), Seq(0.0)),
      (904L, Seq(Double.PositiveInfinity), Seq(0.0)),
      (905L, Seq.empty[Double], Seq.empty[Double])) // 0.0, not null
    val base = rows.toDF("id", "a", "b")
      .union(edge.toDF("id", "a", "b"))
    val cmp = base.select(col("id"),
      VecOps.sqDist18(col("a"), col("b")).as("nv"),
      hofSq18(col("a"), col("b")).as("hv"))
    val bad = cmp.filter(!(col("nv") <=> col("hv")))
    assert(bad.count() == 0,
      s"diverged: ${bad.collect().take(5).mkString(", ")}")
    val byId = cmp.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert((900L to 904L).forall(byId(_).isEmpty))
    assert(byId(905L).contains(0.0))
  }

  test("vec_sqdist18 executes inside whole-stage codegen") {
    val df = spark.range(1, 4)
      .select(VecOps.sqDist18(
        array(col("id").cast("double"), (col("id") * 2).cast("double")),
        array(lit(0.0), lit(0.0))).as("d"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(5.0, 20.0, 45.0))
    val plan = df.queryExecution.executedPlan.toString
    assert(raw"\*\(\d+\) Project \[vec_sqdist18".r.findFirstIn(plan)
      .isDefined,
      s"vec_sqdist18 fell out of whole-stage codegen:\n$plan")
  }

  test("vec_dot / vec_sqdist are SQL-registered via GraftExtensions") {
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
                vec_sqdist(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS s,
                vec_sqdist18(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS e""")
      .head
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 8.0
      && r.getDouble(2) == 8.0)
  }
}
