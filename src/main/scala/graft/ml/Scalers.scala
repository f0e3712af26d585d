package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Cols

/** Feature scaling (ref: src/mf_etl/research/preprocess.py:94-352):
  * standard (mean/std ddof=0) and robust (median/IQR) scalers, fit
  * globally or per-key, with non-finite→(0,1) fallback and ±clip.
  *
  * Per-key fit is a grouped aggregate + broadcast-able params join (J4);
  * global fit is one tiny aggregate cross-joined in — no per-row UDF,
  * everything codegen'd.
  */
object Scalers {

  val ZClip = 8.0

  /** Per-key robust scaler params: median and IQR per key. */
  def robustParamsByKey(df: DataFrame, key: String,
      valueCol: String): DataFrame = {
    val v = Cols.finiteOrNull(col(valueCol))
    df.groupBy(key).agg(
      percentile(v, lit(0.5)).as("center"),
      (percentile(v, lit(0.75)) - percentile(v, lit(0.25))).as("spread"))
  }

  /** Per-key standard scaler params: mean and std(ddof=0). */
  def standardParamsByKey(df: DataFrame, key: String,
      valueCol: String): DataFrame = {
    val v = Cols.finiteOrNull(col(valueCol))
    df.groupBy(key).agg(avg(v).as("center"), stddev_pop(v).as("spread"))
  }

  /** Transform with params joined on `key`: (x - center)/spread with
    * non-finite fallback center=0/spread=1 and z-clip (preprocess.py:
    * 296-352). Broadcast the params side — it's one row per key. */
  def transform(df: DataFrame, params: DataFrame, key: String,
      valueCol: String, outCol: String): DataFrame = {
    val safeCenter = coalesce(Cols.finiteOrNull(col("center")), lit(0.0))
    val safeSpread = coalesce(
      when(abs(Cols.finiteOrNull(col("spread"))) > Cols.Eps, col("spread")),
      lit(1.0))
    df.join(broadcast(params), Seq(key), "left")
      .withColumn(outCol,
        Cols.clip((Cols.finiteOrNull(col(valueCol)) - safeCenter)
          / safeSpread, -ZClip, ZClip))
      .drop("center", "spread")
  }
}
