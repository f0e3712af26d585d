package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{Cols, Wins}

/** Core combinator semantics: NaN→null normalization, safe division,
  * Polars-style min_samples rolling guards, bars-since, run ids. */
class OpsSpec extends SparkSpec {

  test("execution realism auto-detects percent-point volatility units") {
    import graft.backtest.Overlay
    val s = spark
    import s.implicits._
    // ranges ~5% of close expressed as price units → (high-low)/close is
    // DECIMAL (~0.05): divisor 1. Scaling the range 100× (synthetic
    // percent-point series: median > 1) must flip the divisor to 100.
    def bars(scale: Double) = (1 to 60).map { i =>
      val close = 100.0 + i
      ("T1", i.toLong, i.toLong, close, close + 0.05 * close * scale,
        close - 0.0, close, 1000.0)
    }.toDF("ticker", "bar_ts", "bar_id", "open", "high", "low", "close",
      "volume")
    val dec = Overlay.executionRealism(bars(1.0), minDollarVol = 1,
      minPrice = 1, warmupBars = 1, maxVolPct = Some(8.0))
    val pct = Overlay.executionRealism(bars(100.0), minDollarVol = 1,
      minPrice = 1, warmupBars = 1, maxVolPct = Some(8.0))
    assert(dec.select("vol_divisor").head.getDouble(0) == 1.0)
    assert(pct.select("vol_divisor").head.getDouble(0) == 100.0)
    // after normalization both series sit below the 0.08 threshold on
    // every bar → no vol_cap blocks in either
    assert(dec.filter(col("exec_reason") === "vol_cap").count() == 0)
    assert(pct.filter(col("exec_reason") === "vol_cap").count() == 0)
    // identical normalized vol series ⇒ identical eligibility
    val a = dec.select("bar_id", "exec_allowed")
    val b = pct.select("bar_id", "exec_allowed")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  import spark.implicits._

  test("safeDiv: null on ~zero denominator, value otherwise") {
    val df = Seq((10.0, 2.0), (1.0, 0.0), (1.0, 1e-15)).toDF("n", "d")
    val out = df.select(Cols.safeDiv(col("n"), col("d"))).collect()
    assert(out(0).getDouble(0) == 5.0)
    assert(out(1).isNullAt(0) && out(2).isNullAt(0))
  }

  test("finiteOrNull: NaN and ±Inf → null; finite passes") {
    val df = Seq(1.5, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity).toDF("x")
    val out = df.select(Cols.finiteOrNull(col("x"))).collect()
    assert(out(0).getDouble(0) == 1.5)
    assert((1 to 3).forall(out(_).isNullAt(0)))
  }

  test("NaN would otherwise poison avg — the reference-critical case") {
    val df = Seq(1.0, Double.NaN, 3.0).toDF("x")
    val bad = df.agg(avg($"x")).head.getDouble(0)
    assert(bad.isNaN) // Spark default includes NaN
    val good = df.agg(avg(Cols.finiteOrNull($"x"))).head.getDouble(0)
    assert(good == 2.0) // normalized matches Polars finite-only mean
  }

  test("rolling mean with min_samples=n yields null for first n-1 rows") {
    val df = (1 to 6).map(i => ("t", i.toLong, i.toDouble))
      .toDF("k", "ts", "v")
    val w = Window.partitionBy("k").orderBy("ts")
    val out = df.select(Wins.rollingMean(col("v"), w, 3, 3)).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out(0).isEmpty && out(1).isEmpty)
    assert(out(2).contains(2.0) && out(5).contains(5.0))
  }

  test("rolling count skips nulls (min_samples counts samples)") {
    val df = Seq(("t", 1L, Some(1.0)), ("t", 2L, None), ("t", 3L, Some(3.0)))
      .toDF("k", "ts", "v")
    val w = Window.partitionBy("k").orderBy("ts")
    val out = df.select(Wins.rollingMean(col("v"), w, 3, 3)).collect()
    assert(out.forall(_.isNullAt(0))) // never 3 non-null samples
  }

  test("barsSince: 0 at event, counts up, null before first event") {
    val df = Seq(("t", 1L, false), ("t", 2L, true), ("t", 3L, false),
      ("t", 4L, false), ("t", 5L, true)).toDF("k", "ts", "ev")
    val w = Window.partitionBy("k").orderBy("ts")
    val out = df.select(Wins.barsSince(col("ev"), w)).collect()
      .map(r => if (r.isNullAt(0)) -1 else r.getInt(0))
    assert(out.toSeq == Seq(-1, 0, 1, 2, 0))
  }

  test("runId + run length reproduce gaps-and-islands") {
    val df = Seq(("t", 1L, "a"), ("t", 2L, "a"), ("t", 3L, "b"),
      ("t", 4L, "a")).toDF("k", "ts", "s")
    val w = Window.partitionBy("k").orderBy("ts")
    val out = df.select(Wins.runId(col("s"), w)).collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1, 1, 2, 3))
  }

  test("globalCumSum (long) matches the single-window reference + rank") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val df = (1 to 400).map(i => (i.toLong, rnd.nextInt(50).toLong))
      .toDF("k", "v")
    val got = Wins
      .globalCumSum(df, Seq(col("k")), col("v"), "cum", Some("rn"))
      .select("k", "cum", "rn").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    val ref = df
      .withColumn("cum", sum("v").over(w))
      .withColumn("rn", row_number().over(
        Window.orderBy("k")).cast("long"))
      .select("k", "cum", "rn").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 400)
    assert(got.toSeq == ref.toSeq)
  }

  test("globalCumSumMax matches the single-window reference bit-exactly") {
    val s = spark
    import s.implicits._
    // signed values force the running peak to move non-monotonically;
    // 500 rows across 4 range partitions exercise every offset path
    val rnd = new scala.util.Random(7)
    val df = (1 to 500).map(i => (i.toLong, rnd.nextDouble() * 2 - 1))
      .toDF("k", "v")
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    val got = Wins
      .globalCumSumMax(df, Seq(col("k")), col("v"), "cum", "peak")
      .select(col("k"), col("cum"), col("peak"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDecimal(1), r.getDecimal(2)))
    val w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    val ref = df
      .withColumn("cum", sum(col("v").cast(dec)).over(w).cast(dec))
      .withColumn("peak", max(col("cum")).over(w))
      .select(col("k"), col("cum"), col("peak"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDecimal(1), r.getDecimal(2)))
    assert(got.length == 500)
    assert(got.toSeq == ref.toSeq)
  }

  test("groupedCumSumMax matches per-group globalCumSumMax bit-exactly") {
    val s = spark
    import s.implicits._
    // uneven group sizes (1, ~40, ~460) so one group spans several
    // range partitions while another occupies a fraction of one —
    // both offset paths (null peak seed, cross-partition peak carry)
    // must agree with the one-group scan
    val rnd = new scala.util.Random(13)
    val rows = (1 to 500).map { i =>
      val g = if (i == 1) "solo" else if (i % 12 == 0) "mid" else "big"
      (g, i.toLong, rnd.nextDouble() * 2 - 1)
    }
    val df = rows.toDF("g", "k", "v")
    val got = Wins
      .groupedCumSumMax(df, "g", Seq(col("k")), col("v"), "cum", "peak")
      .select(col("g"), col("k"), col("cum"), col("peak"))
      .orderBy("g", "k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2),
        r.getDecimal(3)))
    val ref = rows.map(_._1).distinct.sorted.flatMap { g =>
      Wins.globalCumSumMax(df.filter(col("g") === g), Seq(col("k")),
          col("v"), "cum", "peak")
        .select(col("g"), col("k"), col("cum"), col("peak"))
        .orderBy("k").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2),
          r.getDecimal(3)))
    }
    assert(got.length == 500)
    assert(got.toSeq == ref.toSeq)
  }
}
