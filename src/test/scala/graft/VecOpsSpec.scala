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

  test("vec_dot / vec_sqdist are SQL-registered via GraftExtensions") {
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
                vec_sqdist(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS s""")
      .head
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 8.0)
  }
}
