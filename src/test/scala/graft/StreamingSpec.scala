package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamingIngest

/** Streaming ≡ batch parity: the windowed aggregation over a parquet file
  * stream (AvailableNow) must equal the same program run in batch. */
class StreamingSpec extends SparkSpec {

  test("windowed counts over file stream match batch computation") {
    val dir = "/root/testdata/sf0.001"
    // nanos ts → batch-read the schema, convert to a typed ts column
    val batchRaw = spark.read.parquet(s"$dir/events.parquet")
    val schema = batchRaw.schema
    val toTyped = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
    // the file-stream source requires a directory
    val streamDir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val streamed = StreamingIngest.runAvailableNow(
      StreamingIngest.windowedCounts(
        toTyped(StreamingIngest.eventsStream(spark, streamDir.toString,
          schema)), "ts_t"),
      "win_counts_test")
    val batch = toTyped(batchRaw)
      .groupBy(window(col("ts_t"), "1 hour", "15 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col("event_type"), col("n"),
        col("total_value"))
    assert(streamed.count() > 0)
    // append mode emits only watermark-finalized windows: streamed must be
    // a subset of batch, and complete for windows safely past the
    // watermark (max ts - 30m tolerance, minus one window of slack)
    assert(streamed.exceptAll(batch).isEmpty)
    val cutoff = toTyped(batchRaw)
      .agg(max(col("ts_t"))).head.getTimestamp(0).toInstant
      .minusSeconds(30 * 60 + 3600)
    val mustHave = batch.filter(col("win_end") <=
      lit(java.sql.Timestamp.from(cutoff)))
    assert(mustHave.exceptAll(streamed).isEmpty)
  }
}
