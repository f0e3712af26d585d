package graft

import org.apache.spark.sql.functions._
import graft.functions.TokenOps

/** Native marker_count expression: HOF-identical semantics (the oracle
  * contract) and codegen execution. */
class TokenOpsSpec extends SparkSpec {

  private val markers = Seq("the", "a", "of", "and", "to", "in")

  private def hof(toks: org.apache.spark.sql.Column) =
    size(filter(toks, t => t.isin(markers: _*)))

  test("marker_count matches the interpreted HOF count, including " +
      "duplicates, empties and null elements; null array → null " +
      "(oracle semantics, not legacy size(null) = -1)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = markers ++ Seq("fox", "dog", "run", "", "THE")
    val rows = (1 to 300).map { i =>
      (i.toLong, Option(Seq.fill(rnd.nextInt(12))(
        vocab(rnd.nextInt(vocab.size)))))
    }
    val base = rows.toDF("id", "toks")
    val cmp = base.select(col("id"),
      TokenOps.markerCount(col("toks"), markers).as("native"),
      hof(col("toks")).as("hofc"))
    val bad = cmp.filter(!(col("native") <=> col("hofc")))
    assert(bad.count() == 0, s"diverged: ${bad.collect().mkString(", ")}")
    // null array → null, matching the DuckDB oracle's
    // len(list_filter(NULL, …)) = NULL — the legacy HOF form returned
    // -1 there (spark.sql.legacy.sizeOfNull), which no oracle mirrors
    val nr = Seq((900L, Option.empty[Seq[String]])).toDF("id", "toks")
      .select(TokenOps.markerCount(col("toks"), markers).as("native"))
      .head
    assert(nr.isNullAt(0))
  }

  test("marker_count is SQL-registered via GraftExtensions") {
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT marker_count(array('the', 'fox', 'the'), 'the', 'a') AS c")
      .head
    assert(r.getInt(0) == 2)
  }

  test("marker_count executes inside whole-stage codegen") {
    val df = spark.range(1, 4)
      .select(TokenOps.markerCount(
        array(lit("the"), concat(lit("w"), col("id")), lit("of")),
        markers).as("c"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(2, 2, 2))
    val plan = df.queryExecution.executedPlan.toString
    assert(raw"\*\(\d+\) Project \[marker_count".r.findFirstIn(plan)
      .isDefined, s"marker_count fell out of whole-stage codegen:\n$plan")
  }
}
