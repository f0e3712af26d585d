package graft

import org.apache.spark.sql.functions._
import graft.ops.Sketches

/** Sketch contracts (q_hll_distinct / q_cms_heavy): mergeability — the
  * property that makes a sketch a stored artifact at 100 TB (registers
  * max-merge, counters sum-merge across partitions/days/sources) — and
  * the CMS overestimate guarantee for EVERY key, not just the top-10
  * the driver query samples. */
class SketchesSpec extends SparkSpec {

  private def li = spark.read
    .parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("HLL registers max-merge: split builds equal the full build") {
    val full = Sketches.hllRegisters(li, col("l_orderkey"), p = 9)
    val a = Sketches.hllRegisters(
      li.filter(col("l_linenumber") <= 2), col("l_orderkey"), p = 9)
    val b = Sketches.hllRegisters(
      li.filter(col("l_linenumber") > 2), col("l_orderkey"), p = 9)
    val merged = a.unionByName(b)
      .groupBy("bucket").agg(max("r").as("r"))
    assert(merged.exceptAll(full).isEmpty &&
      full.exceptAll(merged).isEmpty)
  }

  test("HLL raw estimate lands within the expected error band") {
    val row = Sketches.hllSummary(li, col("l_orderkey"), p = 9).head()
    val exact = row.getAs[Long]("exact_distinct").toDouble
    val est = row.getAs[Double]("est_raw")
    // 1.04/sqrt(512) ~= 4.6% standard error; allow 4 sigma
    assert(math.abs(est - exact) / exact < 0.184,
      s"est $est vs exact $exact")
  }

  test("HLL linear-counting correction shrinks small-range error") {
    // at sf0.001 (~1.5k distinct into 512 registers) the raw harmonic
    // estimate sits in HLL's known small-range bias zone; the applied
    // m·ln(m/V) linear-counting branch must land strictly closer to
    // the exact count than the raw estimate it corrects
    val row = Sketches.hllSummary(li, col("l_orderkey"), p = 9).head()
    assert(row.getAs[Long]("zero_registers") > 0,
      "test premise: small-range regime with empty registers")
    val exact = row.getAs[Long]("exact_distinct").toDouble
    val raw = row.getAs[Double]("est_raw")
    val corr = row.getAs[Double]("est_corrected")
    assert(math.abs(corr - exact) < math.abs(raw - exact),
      s"corrected $corr should beat raw $raw vs exact $exact")
    // and the reported relative errors agree with the estimates
    assert(math.abs(row.getAs[Double]("rel_err_corrected"))
      < math.abs(row.getAs[Double]("rel_err")))
  }

  test("CMS point-query returns absent keys with estimate >= 0") {
    // the general point-query contract: a key the sketch never saw
    // must still get a row (left-joined counters, absent cells = 0),
    // never silently vanish from the output
    val s = spark
    import s.implicits._
    val sketched = Seq("a", "b", "c").toDF("k")
    val counters = Sketches.cmsCounters(sketched, col("k"),
      d = 4, w = 1024)
    val est = Sketches.cmsEstimate(counters,
        Seq("a", "definitely_absent_key").toDF("k"), "k",
        d = 4, w = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == Set("a", "definitely_absent_key"))
    assert(est("a") >= 1L)
    // 3 keys × 4 rows over w=1024 slots: the absent key's 4 cells are
    // all empty for this fixed md5 layout, so the min is the true 0
    assert(est("definitely_absent_key") == 0L)
  }

  test("HLL rho via binary-string length equals the leading-zero rank") {
    // the core register formula: for the (60-p)-bit remainder, rho =
    // leading zeros within the field + 1, computed cross-engine-safely
    // as w + 1 - length(bin(rest)). Property-check the string form
    // against Long.numberOfLeadingZeros over random field values.
    val s = spark
    import s.implicits._
    val p = 9
    val w = 60 - p
    val rnd = new scala.util.Random(11)
    val vals = (Seq(0L, 1L, (1L << w) - 1) ++
      Seq.fill(500)(math.abs(rnd.nextLong()) % (1L << w))).distinct
    val got = vals.toDF("rest")
      .select(col("rest"),
        when(col("rest") === 0, lit(w + 1))
          .otherwise(lit(w) + 1 - length(bin(col("rest"))))
          .as("rho"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vals.foreach { rest =>
      val expect =
        if (rest == 0) w + 1
        else w + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      assert(got(rest) == expect, s"rest=$rest got=${got(rest)}")
    }
  }

  test("Bloom bits OR-merge and never produce a false negative") {
    val cust = spark.read
      .parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_custkey").as("k"))
    val full = Sketches.bloomBits(cust, col("k"), nBits = 2048, k = 3)
    assert(full.count() <= 2048)
    val a = Sketches.bloomBits(cust.filter(col("k") % 2 === 0),
      col("k"), nBits = 2048, k = 3)
    val b = Sketches.bloomBits(cust.filter(col("k") % 2 =!= 0),
      col("k"), nBits = 2048, k = 3)
    val merged = a.unionByName(b).distinct()
    assert(merged.exceptAll(full).isEmpty &&
      full.exceptAll(merged).isEmpty)
    // every true member must pass the membership test
    val pass = Sketches.bloomMightContain(full, cust, "k",
      nBits = 2048, k = 3)
    assert(cust.exceptAll(pass).isEmpty,
      "bloom filter produced a false negative")
  }

  test("CMS counters sum-merge and never underestimate any key") {
    val keys = li.select(col("l_partkey").cast("string").as("k"))
    val full = Sketches.cmsCounters(keys, col("k"), d = 4, w = 1024)
    val a = Sketches.cmsCounters(
      li.filter(col("l_linenumber") <= 2)
        .select(col("l_partkey").cast("string").as("k")),
      col("k"), d = 4, w = 1024)
    val b = Sketches.cmsCounters(
      li.filter(col("l_linenumber") > 2)
        .select(col("l_partkey").cast("string").as("k")),
      col("k"), d = 4, w = 1024)
    val merged = a.unionByName(b)
      .groupBy("i", "slot").agg(sum("cnt").as("cnt"))
    assert(merged.exceptAll(full).isEmpty &&
      full.exceptAll(merged).isEmpty)
    val truth = keys.groupBy("k").agg(count(lit(1)).as("true_cnt"))
    val under = Sketches.cmsEstimate(full, truth, "k", d = 4, w = 1024)
      .join(truth, Seq("k"))
      .filter(col("cms_est") < col("true_cnt"))
    assert(under.isEmpty, "CMS must never underestimate")
  }

  test("KMV sketches merge: bottom-k of split sketches == full sketch") {
    val full = Sketches.kmvSketch(li, col("l_orderkey"), k = 128)
    val a = Sketches.kmvSketch(
      li.filter(col("l_linenumber") <= 2), col("l_orderkey"), k = 128)
    val b = Sketches.kmvSketch(
      li.filter(col("l_linenumber") > 2), col("l_orderkey"), k = 128)
    val merged = Sketches.kmvMerge(a, b, k = 128)
    assert(merged.exceptAll(full).isEmpty &&
      full.exceptAll(merged).isEmpty)
  }

  test("KMV estimate is exact below k and error-banded above it") {
    // 25 nations < k=128 → every distinct hash retained → exact branch
    val nations = li
      .join(spark.read
          .parquet("/root/testdata/sf0.001/supplier.parquet"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey"))
    val exactRow = Sketches.kmvEstimate(
      Sketches.kmvSketch(nations, col("s_nationkey"), k = 128),
      k = 128).head()
    assert(exactRow.getAs[Double]("est") ==
      exactRow.getAs[Long]("sketch_size").toDouble)
    // ~1500 distinct orderkeys >> k=64 → estimator branch; the standard
    // deviation is ~1/sqrt(k−2) ≈ 13%, so 40% is a generous determinism
    // guard (the estimate itself is a fixed number — this bound only
    // documents the accuracy class)
    val est = Sketches.kmvEstimate(
      Sketches.kmvSketch(li, col("l_orderkey"), k = 64), k = 64).head()
      .getAs[Double]("est")
    val exact = li.select(col("l_orderkey")).distinct().count().toDouble
    assert(math.abs(est - exact) / exact < 0.4,
      s"KMV estimate $est vs exact $exact out of band")
  }

  test("Kmv wrapper carries k: mismatched merge is a construction error") {
    val a = Sketches.Kmv.of(li, col("l_orderkey"), k = 64)
    val b = Sketches.Kmv.of(li, col("l_partkey"), k = 64)
    val c = Sketches.Kmv.of(li, col("l_partkey"), k = 32)
    // same-k merge works and estimates at the carried k
    val est = a.merge(b).estimate.head().getAs[Double]("est")
    assert(est > 0.0)
    // the silent-underestimate hazard (merge k=32 into k=64) is refused
    intercept[IllegalArgumentException] { a.merge(c) }
  }
}
