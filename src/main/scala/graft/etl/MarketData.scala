package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Adapter producing a deterministic OHLCV bar universe from the driver's
  * `events` table, so the reference's per-ticker daily-bar operators
  * (SURVEY §2.7) can be exercised — and oracle-checked — on harness data.
  *
  * Mapping: ticker = user_id, bar time axis = event µs timestamp
  * (`bar_ts`, with `bar_id` = event_id as tiebreak), close = value; open /
  * high / low / volume are deterministic column programs over close so both
  * engines can synthesize identical bars.
  */
object MarketData {

  /** One bar per event: (ticker, bar_ts, bar_id, open, high, low, close,
    * volume), ordered semantics identical to the reference's
    * (ticker, trade_date) series. `ts` may be a nanos LONG or a
    * TIMESTAMP[_NTZ] — EventTime dispatches on the actual schema. */
  def barsFromEvents(events: DataFrame): DataFrame = {
    events
      .select(col("user_id").cast("string").as("ticker"),
        EventTime.micros(events).as("bar_ts"), col("event_id").as("bar_id"),
        col("value").as("close"))
      .withColumn("open",
        coalesce(lag("close", 1).over(
          Window.partitionBy("ticker").orderBy("bar_ts", "bar_id")),
          col("close")))
      .withColumn("high", greatest(col("open"), col("close")) + 0.25)
      .withColumn("low", least(col("open"), col("close")) - 0.25)
      .withColumn("volume",
        (pmod(col("bar_id") * 37, lit(9000)) + 1000).cast("double"))
  }

  /** SQL mirror of barsFromEvents for the DuckDB oracle. */
  val barsSql: String = """
    bars AS (
      SELECT CAST(user_id AS VARCHAR) AS ticker,
             epoch_us(ts) AS bar_ts, event_id AS bar_id,
             value AS close,
             coalesce(lag(value) OVER (PARTITION BY user_id
               ORDER BY ts, event_id), value) AS open,
             greatest(coalesce(lag(value) OVER (PARTITION BY user_id
               ORDER BY ts, event_id), value), value) + 0.25 AS high,
             least(coalesce(lag(value) OVER (PARTITION BY user_id
               ORDER BY ts, event_id), value), value) - 0.25 AS low,
             CAST((event_id * 37) % 9000 + 1000 AS DOUBLE) AS volume
      FROM events)"""
}
