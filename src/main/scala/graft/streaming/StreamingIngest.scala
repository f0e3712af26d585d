package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** Structured Streaming surface. The reference is purely batch (SURVEY
  * §1.1: incrementality = file fingerprints), but the engine exposes the
  * streaming equivalents so the same column programs run incrementally:
  *
  *  - file-stream ingest with `Trigger.AvailableNow` ≈ the reference's
  *    NEW/CHANGED-only incremental batch semantics, exactly-once per file;
  *  - watermarked sliding-window aggregation over the events stream;
  *  - stateful per-key processing via flatMapGroupsWithState for the
  *    sequential kernels (signal machine shape).
  */
object StreamingIngest {

  /** Incremental parquet file stream over a directory (schema required by
    * streaming sources). */
  def eventsStream(spark: SparkSession, dir: String,
      schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Watermarked per-type sliding-window aggregate: 1h windows / 15m
    * slide, 30m late tolerance — the streaming form of A10-style rollups.
    * `tsCol` must be a TimestampType column. */
  def windowedCounts(events: DataFrame, tsCol: String): DataFrame =
    events
      .withWatermark(tsCol, "30 minutes")
      .groupBy(window(col(tsCol), "1 hour", "15 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col("event_type"), col("n"),
        col("total_value"))

  /** Stream-static enrichment: broadcast-join each micro-batch against a
    * slowly-changing dimension frame (the streaming J3). The static side
    * is re-planned per micro-batch, so at cluster scale a refreshed dim
    * snapshot is picked up without restarting the query; broadcasting
    * keeps the stream side shuffle-free. */
  def enrich(stream: DataFrame, dim: DataFrame,
      keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left")

  /** Run a streaming query to completion over the currently-available
    * input (AvailableNow) into an in-memory table; returns the result.
    * This is the batch-parity harness used by the spec. */
  def runAvailableNow(out: DataFrame, name: String): DataFrame = {
    val q = out.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    out.sparkSession.table(name)
  }
}
