package graft

import org.apache.spark.sql.functions._
import graft.functions.WilderEma

/** The custom Catalyst window function vs a plain Scala reference
  * recursion: exact equality, null-carry behavior, warmup gating.
  * (semantics: Polars ewm_mean(alpha, adjust=False, min_samples=m), ref
  * src/mf_etl/silver/indicators_twiggs.py:41-44) */
class WilderEmaSpec extends SparkSpec {
  import spark.implicits._

  private def reference(xs: Seq[Option[Double]], alpha: Double,
      minSamples: Int): Seq[Option[Double]] = {
    var ema: Option[Double] = None
    var seen = 0
    xs.map {
      case Some(x) =>
        ema = Some(ema.fold(x)(e => e + alpha * (x - e)))
        seen += 1
        if (seen >= minSamples) ema else None
      case None => if (seen >= minSamples) ema else None
    }
  }

  private def run(xs: Seq[Option[Double]], alpha: Double,
      minSamples: Int): Seq[Option[Double]] = {
    val df = xs.zipWithIndex.map { case (v, i) => ("t", i.toLong, v) }
      .toDF("k", "ts", "v")
    df.select(WilderEma.over(WilderEma.ewm(col("v"), alpha, minSamples),
        Seq(col("k")), Seq(col("ts"))))
      .collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
  }

  test("matches reference recursion exactly (no nulls)") {
    val xs = Seq(1.0, 4.0, 2.0, 8.0, 5.0, 3.0).map(Some(_))
    assert(run(xs, 1.0 / 3, 3) == reference(xs, 1.0 / 3, 3))
  }

  test("null inputs carry the smoothed value and don't count as samples") {
    val xs = Seq(Some(2.0), None, Some(4.0), None, Some(6.0))
    val got = run(xs, 0.5, 2)
    assert(got == reference(xs, 0.5, 2))
    assert(got(0).isEmpty && got(1).isEmpty) // warmup: only 1 sample yet
    assert(got(2).contains(3.0))             // 2 + .5*(4-2)
    assert(got(3).contains(3.0))             // null carries
    assert(got(4).contains(4.5))
  }

  test("wilder(n) warmup: null until n non-null inputs") {
    val xs = (1 to 30).map(i => Some(i.toDouble))
    val got = run(xs, 1.0 / 21, 21)
    assert(got.take(20).forall(_.isEmpty))
    assert(got.drop(20).forall(_.isDefined))
    assert(got == reference(xs, 1.0 / 21, 21))
  }

  test("multiple keys stay independent") {
    val df = Seq(("a", 1L, 10.0), ("b", 1L, 100.0), ("a", 2L, 20.0),
      ("b", 2L, 200.0)).toDF("k", "ts", "v")
    val out = df.select(col("k"),
        WilderEma.over(WilderEma.ewm(col("v"), 0.5, 1),
          Seq(col("k")), Seq(col("ts"))).as("e"))
      .orderBy("k", "ts").collect()
    assert(out.map(_.getDouble(1)).toSeq == Seq(10.0, 15.0, 100.0, 150.0))
  }
}
