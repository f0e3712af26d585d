package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bootstrap confidence intervals
  * (ref: src/mf_etl/validation/bootstrap.py:38-373): per-group percentile
  * CIs for the mean via iid resampling with a seeded generator.
  *
  * The resampler is a *portable* LCG (glibc constants) over the group's
  * values sorted deterministically, so the whole procedure — draws,
  * means, percentile CI — is reproducible across engines and cluster
  * runs, and oracle-checkable in SQL. Everything is array expressions:
  * no UDFs, no driver collect; each group's resampling is one codegen'd
  * projection (the reference caps group size at 50k points, which bounds
  * the collected array).
  */
object Bootstrap {

  val A = 1103515245L
  val C = 12345L
  val M = 2147483648L // 2^31

  /** Per-group bootstrap CI of the mean: nBoot draws of size n (the group
    * size), percentile CI [lo, hi] + point mean.
    * Draw b, position i uses LCG(b * n + i) % n as the sampled index. */
  def meanCi(df: DataFrame, key: String, valueCol: String, nBoot: Int,
      ciLo: Double = 0.025, ciHi: Double = 0.975): DataFrame = {
    val sorted = df
      .filter(col(valueCol).isNotNull)
      .groupBy(key)
      .agg(sort_array(collect_list(col(valueCol))).as("vals"),
        count(col(valueCol)).as("n"),
        avg(col(valueCol)).as("point_mean"))
    // means of nBoot resamples, each of size n, via index arithmetic
    val draws = transform(sequence(lit(0), lit(nBoot - 1)), b =>
      aggregate(
        sequence(lit(0L), col("n") - 1),
        lit(0.0),
        (acc, i) => acc + element_at(col("vals"),
          (((b.cast("long") * col("n") + i) * A + C) % M % col("n") + 1)
            .cast("int")),
        acc => acc / col("n")))
    sorted
      .withColumn("boot_means", sort_array(draws))
      .select(col(key), col("n"),
        round(col("point_mean"), 9).as("point_mean"),
        round(element_at(col("boot_means"),
          (floor(lit(ciLo) * nBoot) + 1).cast("int")), 9).as("ci_lo"),
        round(element_at(col("boot_means"),
          (floor(lit(ciHi) * nBoot) + 1).cast("int")), 9).as("ci_hi"))
  }

  /** SQL mirror over a (key, value) relation named `bv` → CTE `boot`. */
  def sql(key: String, nBoot: Int, ciLo: Double = 0.025,
      ciHi: Double = 0.975): String = s"""
      bsorted AS (
        SELECT $key, list(v ORDER BY v) AS vals, count(v) AS n,
               avg(v) AS point_mean
        FROM bv GROUP BY 1),
      bdraws AS (
        SELECT $key, n, point_mean,
               list_sort(list_transform(range($nBoot), b ->
                 list_aggregate(
                   list_transform(range(n), i ->
                     vals[CAST((((b * n + i) * $A + $C) % $M) % n AS INT)
                          + 1]),
                   'sum') / n)) AS boot_means
        FROM bsorted),
      boot AS (
        SELECT $key, n, round(point_mean, 9) AS point_mean,
               round(boot_means[CAST(floor($ciLo * $nBoot) AS INT) + 1], 9)
                 AS ci_lo,
               round(boot_means[CAST(floor($ciHi * $nBoot) AS INT) + 1], 9)
                 AS ci_hi
        FROM bdraws)"""
}
