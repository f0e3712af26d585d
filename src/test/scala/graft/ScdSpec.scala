package graft

import org.apache.spark.sql.functions._
import graft.ops.Scd

/** SCD2 contract (q_scd2_dim): runs tile each key's timeline (no gaps,
  * no overlaps, one open run), consecutive runs really differ —
  * including null→value flips (null-safe change detection) — and every
  * log observation is reconstructed by an as-of probe into its
  * covering interval. */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private val log = Seq(
    ("c1", 1, Option.empty[String]),
    ("c1", 2, Some("A")),
    ("c1", 3, Some("A")), // no change — must collapse into ts=2's run
    ("c1", 4, Some("B")),
    ("c1", 5, Option.empty[String]), // value→null IS a change
    ("c2", 1, Some("X"))
  ).toDF("k", "ts", "attr")

  private def dim = Scd.scd2(log, Seq("k"), "ts", Seq("attr"))

  test("runs tile the timeline: closed by the successor, one current") {
    val d = dim.cache()
    assert(d.count() == 5) // c1: null/A/B/null runs (4) + c2: X (1)
    // effective_to == next run's effective_from; exactly one open run
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k").orderBy("effective_from")
    val bad = d.withColumn("nxt", lead("effective_from", 1).over(w))
      .filter(!(col("effective_to") <=> col("nxt")))
    assert(bad.isEmpty, "a run is not closed by its successor")
    assert(d.filter(col("is_current") === 1).groupBy("k").count()
      .filter(col("count") =!= 1).isEmpty)
  }

  test("consecutive runs differ (null-safely) and probes reconstruct") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k").orderBy("effective_from")
    val sameAsPrev = dim
      .withColumn("prev", lag("attr", 1).over(w))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1)
      .filter(col("attr") <=> col("prev"))
    assert(sameAsPrev.isEmpty, "adjacent runs share the attribute")
    // as-of probe: every original observation lands in exactly one
    // interval and reads back its own attribute
    val probes = log.select(col("k"), col("ts"),
      col("attr").as("expect"))
    val hits = probes.join(dim,
      probes("k") === dim("k") &&
        col("ts") >= col("effective_from") &&
        (col("effective_to").isNull || col("ts") < col("effective_to")))
    assert(hits.count() == log.count(), "probe not covered exactly once")
    assert(hits.filter(!(col("expect") <=> col("attr"))).isEmpty,
      "as-of probe read back the wrong attribute version")
  }
}
