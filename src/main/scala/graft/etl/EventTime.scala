package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Schema-adaptive accessor for the `events.ts` event-time column.
  *
  * The fixture has shipped `ts` under two parquet encodings:
  * TIMESTAMP(NANOS) — no Spark type, surfaces as a nanos LONG under
  * `spark.sql.legacy.parquet.nanosAsLong` — and TIMESTAMP(MICROS),
  * which surfaces as TimestampType or TimestampNTZType. The reference's
  * reader philosophy is non-strict/adaptive (ref
  * src/mf_etl/transform/normalize.py:123-132, null-on-failure parsing),
  * and the DuckDB oracle side is already encoding-agnostic
  * (`epoch_us(ts)` accepts both). This helper makes the Spark side
  * equally adaptive: whatever the column's actual type, it yields
  * µs-since-epoch as BIGINT, bit-identical to DuckDB's `epoch_us`.
  *
  * Dispatch happens on the analyzed schema, so the returned Column is a
  * plain codegen'd expression — no runtime branching in the hot path.
  */
object EventTime {

  /** `ts` as µs since epoch (BIGINT). */
  def micros(df: DataFrame): Column = typedMicros(df.schema("ts").dataType)

  /** Same, from a known DataType (for callers that only have a schema). */
  def typedMicros(dt: org.apache.spark.sql.types.DataType): Column =
    dt match {
      // nanos LONG → µs floor (matches DuckDB's ns→µs truncation)
      case LongType => expr("ts div 1000")
      case TimestampType => unix_micros(col("ts"))
      // session TZ is UTC (SparkEntry.tune), so the NTZ→TZ cast is a
      // no-op on the underlying micros and matches DuckDB's naive-UTC
      // epoch_us semantics
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
      case other => throw new IllegalArgumentException(
        s"events.ts: unsupported encoding $other " +
          "(expected nanos LONG, TIMESTAMP, or TIMESTAMP_NTZ)")
    }

  /** `ts` as a typed µs TimestampType column (for streaming / windowing
    * consumers that need a real timestamp, e.g. session_window). */
  def typedTs(df: DataFrame): Column = timestamp_micros(micros(df))
}
