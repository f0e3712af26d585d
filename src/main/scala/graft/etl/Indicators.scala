package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Cols, Wins}
import graft.functions.WilderEma

/** Twiggs-style money-flow indicators — the reference's core custom
  * indicator layer (ref: src/mf_etl/silver/indicators_twiggs.py:93-266):
  * true-range high/low with null-prev fallback, signed position,
  * accumulation/distribution, TMF21 = wilder(AD)/wilder(volume), TTI-proxy
  * = wilder(pos·|tr|)/wilder(|tr|), readiness, zero-crossings, signs,
  * slopes, EMA5.
  *
  * The four Wilder smoothings run as native Catalyst running-frame window
  * functions (graft.functions.WilderEma) inside the same single per-ticker
  * window exchange as everything else — one shuffle for the whole layer.
  */
object Indicators {

  val Period = 21
  val Alpha: Double = 1.0 / Period
  val Ema5Alpha: Double = 2.0 / 6.0

  import Silver.W

  def twiggs(bars: DataFrame): DataFrame = {
    val prevClose = lag("close", 1).over(W)
    val part = Seq(col("ticker"))
    val ord = Seq(col("bar_ts"), col("bar_id"))
    def wild(c: org.apache.spark.sql.Column) =
      WilderEma.over(WilderEma.ewm(c, Alpha, Period), part, ord)
    val df = bars
      .withColumn("trh", greatest(col("high"), coalesce(prevClose, col("high"))))
      .withColumn("trl", least(col("low"), coalesce(prevClose, col("low"))))
      .withColumn("tr_range", col("trh") - col("trl"))
      .withColumn("pos",
        (lit(2) * col("close") - col("trh") - col("trl"))
          / greatest(col("tr_range"), lit(Cols.Eps)))
      .withColumn("ad", col("pos") * col("volume"))
      .withColumn("tti_num", col("pos") * abs(col("tr_range")))
      .withColumn("tti_den", abs(col("tr_range")))
      .withColumn("ad_ema", wild(col("ad")))
      .withColumn("vol_ema", wild(col("volume")))
      .withColumn("tti_num_ema", wild(col("tti_num")))
      .withColumn("tti_den_ema", wild(col("tti_den")))
      .withColumn("tmf_21", Cols.safeDiv(col("ad_ema"), col("vol_ema")))
      .withColumn("tti_proxy_v1_21",
        Cols.safeDiv(col("tti_num_ema"), col("tti_den_ema")))
    df
      .withColumn("tmf_ready_21", col("tmf_21").isNotNull)
      .withColumn("tti_proxy_ready_21", col("tti_proxy_v1_21").isNotNull)
      .withColumn("tmf_abs", abs(col("tmf_21")))
      .withColumn("tmf_sign",
        when(col("tmf_21") > 0, 1).when(col("tmf_21") < 0, -1)
          .when(col("tmf_21").isNotNull, 0))
      .withColumn("tti_proxy_sign",
        when(col("tti_proxy_v1_21") > 0, 1)
          .when(col("tti_proxy_v1_21") < 0, -1)
          .when(col("tti_proxy_v1_21").isNotNull, 0))
      .withColumn("tmf_zero_cross_up",
        Wins.zeroCrossUp(col("tmf_21"), W))
      .withColumn("tmf_zero_cross_down",
        Wins.zeroCrossDown(col("tmf_21"), W))
      .withColumn("tmf_slope_1", col("tmf_21") - lag("tmf_21", 1).over(W))
      .withColumn("tmf_slope_5", col("tmf_21") - lag("tmf_21", 5).over(W))
      .withColumn("tmf_ema_5",
        WilderEma.over(WilderEma.ewm(col("tmf_21"), Ema5Alpha, 1), part, ord))
      .withColumn("tmf_above_zero", col("tmf_21") > 0)
      .withColumn("tmf_below_zero", col("tmf_21") < 0)
  }

  /** DuckDB oracle: the four Wilder recursions carried through one
    * recursive CTE (bit-identical update arithmetic y += a*(x-y)), plus the
    * EMA5 over the emitted TMF. Expects `bars` CTE in scope. */
  def twiggsSql: String = s"""
      pre AS (
        SELECT ticker, bar_ts, bar_id, close, volume,
               row_number() OVER (PARTITION BY ticker
                 ORDER BY bar_ts, bar_id) AS rn,
               greatest(high, coalesce(lag(close) OVER (PARTITION BY ticker
                 ORDER BY bar_ts, bar_id), high)) AS trh,
               least(low, coalesce(lag(close) OVER (PARTITION BY ticker
                 ORDER BY bar_ts, bar_id), low)) AS trl
        FROM bars),
      pre2 AS (
        SELECT *, trh - trl AS tr_range,
               (2 * close - trh - trl) / greatest(trh - trl,
                 0.000000000001) AS pos
        FROM pre),
      pre3 AS MATERIALIZED (
        -- MATERIALIZED: referenced from the recursive term below; without
        -- it DuckDB re-executes this whole chain once per iteration.
        SELECT *, pos * volume AS ad, pos * abs(tr_range) AS tti_num,
               abs(tr_range) AS tti_den
        FROM pre2),
      rec0 AS (
        -- one recursion carrying all five accumulators: chaining a second
        -- recursive CTE onto a first re-executes the first per iteration
        -- in DuckDB (observed ~70x blowup), so the EMA5-of-TMF recursion
        -- is folded in via lateral column aliases.
        SELECT ticker, bar_ts, bar_id, rn, ad AS ad_ema,
               volume AS vol_ema, tti_num AS tti_num_ema,
               tti_den AS tti_den_ema, CAST(NULL AS DOUBLE) AS ema5
        FROM pre3 WHERE rn = 1
        UNION ALL
        SELECT b.ticker, b.bar_ts, b.bar_id, b.rn,
               r.ad_ema + $Alpha * (b.ad - r.ad_ema) AS ad_ema,
               r.vol_ema + $Alpha * (b.volume - r.vol_ema) AS vol_ema,
               r.tti_num_ema + $Alpha * (b.tti_num - r.tti_num_ema)
                 AS tti_num_ema,
               r.tti_den_ema + $Alpha * (b.tti_den - r.tti_den_ema)
                 AS tti_den_ema,
               CASE WHEN (CASE WHEN b.rn >= $Period
                      AND abs(r.vol_ema + $Alpha * (b.volume - r.vol_ema))
                        > 0.000000000001
                      THEN (r.ad_ema + $Alpha * (b.ad - r.ad_ema))
                        / (r.vol_ema + $Alpha * (b.volume - r.vol_ema)) END)
                      IS NULL THEN r.ema5
                 WHEN r.ema5 IS NULL THEN
                      (r.ad_ema + $Alpha * (b.ad - r.ad_ema))
                        / (r.vol_ema + $Alpha * (b.volume - r.vol_ema))
                 ELSE r.ema5 + $Ema5Alpha *
                      ((r.ad_ema + $Alpha * (b.ad - r.ad_ema))
                        / (r.vol_ema + $Alpha * (b.volume - r.vol_ema))
                       - r.ema5) END AS ema5
        FROM pre3 b JOIN rec0 r ON b.ticker = r.ticker AND b.rn = r.rn + 1),
      rec5 AS (
        SELECT ticker, bar_ts, bar_id, rn,
               CASE WHEN rn >= $Period AND abs(vol_ema) > 0.000000000001
                 THEN ad_ema / vol_ema END AS tmf_21,
               CASE WHEN rn >= $Period AND abs(tti_den_ema) > 0.000000000001
                 THEN tti_num_ema / tti_den_ema END AS tti,
               ema5
        FROM rec0),
      twiggs AS (
        SELECT ticker, bar_ts, bar_id,
               round(tmf_21, 6) AS tmf_21,
               tmf_21 IS NOT NULL AS tmf_ready_21,
               round(abs(tmf_21), 6) AS tmf_abs,
               CASE WHEN tmf_21 > 0 THEN 1 WHEN tmf_21 < 0 THEN -1
                    WHEN tmf_21 IS NOT NULL THEN 0 END AS tmf_sign,
               tmf_21 > 0 AND lag(tmf_21) OVER w <= 0 AS tmf_zero_cross_up,
               tmf_21 < 0 AND lag(tmf_21) OVER w >= 0 AS tmf_zero_cross_down,
               round(tmf_21 - lag(tmf_21) OVER w, 6) AS tmf_slope_1,
               round(tmf_21 - lag(tmf_21, 5) OVER w, 6) AS tmf_slope_5,
               round(ema5, 6) AS tmf_ema_5,
               tmf_21 > 0 AS tmf_above_zero,
               tmf_21 < 0 AS tmf_below_zero,
               round(tti, 6) AS tti_proxy_v1_21,
               tti IS NOT NULL AS tti_proxy_ready_21,
               CASE WHEN tti > 0 THEN 1 WHEN tti < 0 THEN -1
                    WHEN tti IS NOT NULL THEN 0 END AS tti_proxy_sign
        FROM rec5
        WINDOW w AS (PARTITION BY ticker ORDER BY bar_ts, bar_id))"""

  /** Engine-side projection matching twiggsSql's `twiggs` CTE. */
  def oracleProjection(df: DataFrame): DataFrame =
    df.select(col("ticker"), col("bar_ts"), col("bar_id"),
      round(col("tmf_21"), 6).as("tmf_21"), col("tmf_ready_21"),
      round(col("tmf_abs"), 6).as("tmf_abs"), col("tmf_sign"),
      col("tmf_zero_cross_up"), col("tmf_zero_cross_down"),
      round(col("tmf_slope_1"), 6).as("tmf_slope_1"),
      round(col("tmf_slope_5"), 6).as("tmf_slope_5"),
      round(col("tmf_ema_5"), 6).as("tmf_ema_5"),
      col("tmf_above_zero"), col("tmf_below_zero"),
      round(col("tti_proxy_v1_21"), 6).as("tti_proxy_v1_21"),
      col("tti_proxy_ready_21"), col("tti_proxy_sign"))
}
