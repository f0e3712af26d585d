package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}
import graft.etl.EventTime

/** Schema-adaptive event-time accessor: the fixture has shipped
  * `events.ts` as both a nanos LONG (TIMESTAMP(NANOS) under
  * nanosAsLong) and TIMESTAMP[_NTZ] (micros) — EventTime must yield
  * identical µs-since-epoch for the same instant under every encoding.
  * The fixture only ever exercises ONE branch at a time, so this spec
  * keeps the other branches from rotting. */
class EventTimeSpec extends SparkSpec {
  import spark.implicits._

  // 2024-03-01T12:34:56.789012 UTC, with sub-µs nanos that must floor
  private val micros = 1709296496789012L

  test("nanos LONG floors ns → µs like DuckDB's epoch_us") {
    val df = Seq(micros * 1000 + 999).toDF("ts")
    assert(df.schema("ts").dataType == LongType)
    val got = df.select(EventTime.micros(df).as("eus")).head.getLong(0)
    assert(got == micros)
  }

  test("TIMESTAMP and TIMESTAMP_NTZ yield the same µs (session UTC)") {
    SparkEntry.tune(spark)
    val tz = Seq(1).toDF("one")
      .select(timestamp_micros(lit(micros)).as("ts"))
    val gotTz = tz.select(EventTime.micros(tz).as("eus")).head.getLong(0)
    assert(gotTz == micros)
    val ntz = tz.select(col("ts").cast(TimestampNTZType).as("ts"))
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    val gotNtz = ntz.select(EventTime.micros(ntz).as("eus")).head
      .getLong(0)
    assert(gotNtz == micros)
  }

  test("typedTs returns a timestamp carrying the same instant") {
    val df = Seq(micros * 1000).toDF("ts")
    val t = df.select(EventTime.typedTs(df).as("t"))
    assert(t.select(unix_micros(col("t"))).head.getLong(0) == micros)
  }

  test("unsupported encodings fail loudly, not with a wrong answer") {
    val df = Seq("2024-01-01").toDF("ts")
    val e = intercept[IllegalArgumentException] {
      df.select(EventTime.micros(df))
    }
    assert(e.getMessage.contains("unsupported encoding"))
  }
}
