package graft

import org.apache.spark.sql.functions._
import graft.ops.TimeJoins

/** Edge semantics of the as-of and range joins (graft.ops.TimeJoins). */
class TimeJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin: inclusive ties, pre-history nulls, tolerance horizon") {
    val left = Seq((1L, 10L), (1L, 20L), (1L, 5L), (2L, 50L))
      .toDF("k", "ts")
    val right = Seq((1L, 10L, 1.0), (1L, 18L, 2.0), (2L, 8L, 9.0))
      .toDF("k", "rts", "v")
    val out = TimeJoins.asofJoin(left, right, Seq("k"), "ts", "rts",
        Seq("v"))
      .select("k", "ts", "rts", "v").as[(Long, Long, Option[Long],
        Option[Double])].collect().toSet
    assert(out == Set(
      (1L, 10L, Some(10L), Some(1.0)),  // tie at ts=10 matches (>=)
      (1L, 20L, Some(18L), Some(2.0)),  // latest, not first
      (1L, 5L, None, None),             // before any right row
      (2L, 50L, Some(8L), Some(9.0))))  // per-key isolation
    // a 10-tick tolerance nulls the stale k=2 match but keeps fresh ones
    val tol = TimeJoins.asofJoin(left, right, Seq("k"), "ts", "rts",
        Seq("v"), tolerance = Some(10L))
      .select("k", "ts", "v").as[(Long, Long, Option[Double])]
      .collect().toSet
    assert(tol == Set((1L, 10L, Some(1.0)), (1L, 20L, Some(2.0)),
      (1L, 5L, None), (2L, 50L, None)))
  }

  test("asofJoin: a null payload FIELD must not skip to an older row") {
    val left = Seq((1L, 30L)).toDF("k", "ts")
    val right = Seq((1L, 10L, Option(7.0)), (1L, 20L, Option.empty[Double]))
      .toDF("k", "rts", "v")
    val out = TimeJoins.asofJoin(left, right, Seq("k"), "ts", "rts",
        Seq("v")).select("rts", "v")
      .as[(Option[Long], Option[Double])].head()
    // the ts=20 row IS the as-of match even though its payload is null —
    // carrying bare payload columns (instead of the row struct) would
    // resurrect the stale 7.0
    assert(out == (Some(20L), None))
  }

  test("rangeJoin: multi-bin intervals match exactly once, ends inclusive") {
    val pts = Seq((1L, 0L), (1L, 10L), (1L, 25L), (1L, 26L), (2L, 10L))
      .toDF("k", "p")
    val ivs = Seq((1L, 0L, 25L), (1L, 9L, 11L)).toDF("k", "lo", "hi")
    // binWidth 4 → the [0,25] interval spans 7 bins; every containment
    // pair must appear exactly once, endpoints inclusive, no k=2 rows
    val out = TimeJoins.rangeJoin(pts, ivs, Seq("k"), "p", "lo", "hi", 4L)
      .select("k", "p", "lo", "hi")
      .as[(Long, Long, Long, Long)].collect().toList
    val expected = List((1L, 0L, 0L, 25L), (1L, 10L, 0L, 25L),
      (1L, 25L, 0L, 25L), (1L, 10L, 9L, 11L))
    assert(out.sorted == expected.sorted)
    assert(out.size == out.distinct.size, "duplicate pair emitted")
  }
}
