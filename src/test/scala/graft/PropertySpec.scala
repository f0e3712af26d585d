package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{Cols, Wins}
import graft.functions.WilderEma

/** Property tests for the correctness-critical semantics (SURVEY §5):
  * min_samples rolling guards and Wilder EMA vs naive reference
  * implementations on randomized inputs (nulls included). */
class PropertySpec extends SparkSpec {

  /** Drive a ScalaCheck generator deterministically (the scalatestplus
    * bridge isn't in the offline cache): n samples from fixed seeds. */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i =>
      g(Gen.Parameters.default, Seed(42L + i)))
  import spark.implicits._

  private val series: Gen[List[Option[Double]]] =
    Gen.listOfN(40, Gen.frequency(
      4 -> Gen.choose(-100.0, 100.0).map(Some(_)),
      1 -> Gen.const(None)))

  private def naiveRollingMean(xs: Seq[Option[Double]], n: Int,
      minSamples: Int): Seq[Option[Double]] =
    xs.indices.map { i =>
      val frame = xs.slice(math.max(0, i - n + 1), i + 1).flatten
      if (frame.size >= minSamples) Some(frame.sum / frame.size) else None
    }

  private def naiveWilder(xs: Seq[Option[Double]], alpha: Double,
      m: Int): Seq[Option[Double]] = {
    var ema: Option[Double] = None; var seen = 0
    xs.map {
      case Some(x) =>
        ema = Some(ema.fold(x)(e => e + alpha * (x - e))); seen += 1
        if (seen >= m) ema else None
      case None => if (seen >= m) ema else None
    }
  }

  private val w = Window.partitionBy("k").orderBy("ts")

  test("rollingMean(min_samples) == naive sliding implementation") {
    for (((xs, n), _) <- samples(Gen.zip(series, Gen.choose(1, 10)), 20)
        .zipWithIndex) {
        val minS = math.max(1, n - 2)
        val df = xs.zipWithIndex.map { case (v, i) => ("t", i, v) }
          .toDF("k", "ts", "v")
        val got = df.select(Wins.rollingMean(col("v"), w, n, minS))
          .collect()
          .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
        val want = naiveRollingMean(xs, n, minS)
        got.toSeq.zip(want).foreach { case (g, e) =>
          assert(g.isDefined == e.isDefined)
          for (gv <- g; ev <- e) assert(math.abs(gv - ev) < 1e-9)
        }
    }
  }

  test("WilderEma window function == naive recursion on random series") {
    for (((xs, m), _) <- samples(Gen.zip(series, Gen.choose(1, 10)), 20)
        .zipWithIndex) {
        val alpha = 1.0 / (m + 1)
        val df = xs.zipWithIndex.map { case (v, i) => ("t", i, v) }
          .toDF("k", "ts", "v")
        val got = df.select(WilderEma.over(
            WilderEma.ewm(col("v"), alpha, m), Seq(col("k")),
            Seq(col("ts"))))
          .collect()
          .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
        assert(got.toSeq == naiveWilder(xs, alpha, m))
    }
  }

  test("finiteOrNull strips every non-finite before aggregation") {
    val gen = Gen.listOfN(30, Gen.oneOf(
      Gen.choose(-1e6, 1e6), Gen.const(Double.NaN),
      Gen.const(Double.PositiveInfinity),
      Gen.const(Double.NegativeInfinity)))
    for (xs <- samples(gen, 10)) {
      val df = xs.toDF("x")
      val m = df.agg(avg(Cols.finiteOrNull(col("x")))).head
      val finite = xs.filter(x => !x.isNaN && !x.isInfinite)
      if (finite.isEmpty) assert(m.isNullAt(0))
      else assert(math.abs(m.getDouble(0) - finite.sum / finite.size) < 1e-6)
    }
  }

  test("approx_count_distinct stays inside its rsd bound vs exact " +
      "counts at two corpus sizes") {
    // HLL++ is the 100-TB cardinality path (constant memory, mergeable
    // across partitions — countDistinct is a full shuffle of the
    // distinct values). The estimate must honor its accuracy contract
    // on real corpus columns: allow 3x the requested rsd.
    import org.apache.spark.sql.functions._
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val tok = docs.select(explode(split(col("text"), " ")).as("t"))
      val exactDocs = docs.agg(countDistinct("n_chars")).head.getLong(0)
      val exactTok = tok.agg(countDistinct("t")).head.getLong(0)
      val rsd = 0.05
      val approxDocs = docs.agg(
        approx_count_distinct(col("n_chars"), rsd)).head.getLong(0)
      val approxTok = tok.agg(
        approx_count_distinct(col("t"), rsd)).head.getLong(0)
      def relErr(a: Long, e: Long) = math.abs(a - e).toDouble / e
      assert(relErr(approxDocs, exactDocs) <= 3 * rsd,
        s"$sf n_chars: approx $approxDocs vs exact $exactDocs")
      assert(relErr(approxTok, exactTok) <= 3 * rsd,
        s"$sf tokens: approx $approxTok vs exact $exactTok")
    }
  }

  test("SQL wilder_ema registered via GraftExtensions matches Column API") {
    val s = spark
    graft.functions.GraftExtensions.register(s)
    import s.implicits._
    val df = Seq(("t", 1, 2.0), ("t", 2, 4.0), ("t", 3, 8.0))
      .toDF("k", "ts", "v")
    df.createOrReplaceTempView("ema_in")
    val viaSql = s.sql("""
      SELECT wilder_ema(v, 0.5D, 1) OVER (PARTITION BY k ORDER BY ts) AS e
      FROM ema_in ORDER BY ts""").collect().map(_.getDouble(0))
    assert(viaSql.toSeq == Seq(2.0, 3.0, 5.5))
  }
}
