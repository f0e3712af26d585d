package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Cols

/** Forward outcome labels (ref: src/mf_etl/research/forward_labels.py:
  * 41-80): fwd_ret_{5,10,20} via lead, fwd_abs_ret_10, and
  * fwd_vol_proxy_10 = std(ddof=0) of the next 10 daily returns, emitted
  * only when all 10 are present/finite.
  */
object ForwardLabels {

  import Silver.W

  def build(bars: DataFrame): DataFrame = {
    def fwdRet(k: Int) =
      Cols.safeDiv(lead("close", k).over(W), col("close")) - 1
    val dailyRet = Cols.safeDiv(col("close"), lag("close", 1).over(W)) - 1
    val fwdFrame = W.rowsBetween(1, 10)
    bars
      .withColumn("fwd_ret_5", fwdRet(5))
      .withColumn("fwd_ret_10", fwdRet(10))
      .withColumn("fwd_ret_20", fwdRet(20))
      .withColumn("fwd_abs_ret_10", abs(fwdRet(10)))
      .withColumn("_daily_ret", dailyRet)
      .withColumn("fwd_vol_proxy_10",
        when(count(col("_daily_ret")).over(fwdFrame) === 10,
          stddev_pop(col("_daily_ret")).over(fwdFrame)))
      .drop("_daily_ret")
  }

  /** Oracle SQL over `bars` → CTE `fwd`. */
  val sql: String = {
    val w = "PARTITION BY ticker ORDER BY bar_ts, bar_id"
    val f = s"$w ROWS BETWEEN 1 FOLLOWING AND 10 FOLLOWING"
    def safeDiv(num: String, den: String) =
      s"CASE WHEN abs($den) > 0.000000000001 THEN ($num) / ($den) END"
    s"""
      fw0 AS (
        SELECT ticker, bar_ts, bar_id, close,
               ${safeDiv("lead(close, 5) OVER ($W)", "close")
                  .replace("($W)", s"($w)")} - 1 AS fwd_ret_5,
               ${safeDiv("lead(close, 10) OVER ($W)", "close")
                  .replace("($W)", s"($w)")} - 1 AS fwd_ret_10,
               ${safeDiv("lead(close, 20) OVER ($W)", "close")
                  .replace("($W)", s"($w)")} - 1 AS fwd_ret_20,
               ${safeDiv("close", s"lag(close) OVER ($w)")} - 1 AS dr
        FROM bars),
      fwd AS (
        SELECT ticker, bar_ts, bar_id,
               round(fwd_ret_5, 9) AS fwd_ret_5,
               round(fwd_ret_10, 9) AS fwd_ret_10,
               round(fwd_ret_20, 9) AS fwd_ret_20,
               round(abs(fwd_ret_10), 9) AS fwd_abs_ret_10,
               round(CASE WHEN count(dr) OVER ($f) = 10
                 THEN stddev_pop(dr) OVER ($f) END, 9) AS fwd_vol_proxy_10
        FROM fw0)"""
  }

  def oracleProjection(df: DataFrame): DataFrame =
    df.select(col("ticker"), col("bar_ts"), col("bar_id"),
      round(col("fwd_ret_5"), 9).as("fwd_ret_5"),
      round(col("fwd_ret_10"), 9).as("fwd_ret_10"),
      round(col("fwd_ret_20"), 9).as("fwd_ret_20"),
      round(col("fwd_abs_ret_10"), 9).as("fwd_abs_ret_10"),
      round(col("fwd_vol_proxy_10"), 9).as("fwd_vol_proxy_10"))
}
