package graft.backtest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{Cols, Wins}

/** Policy overlay + execution realism — the backtest gating layers.
  *
  * Overlay (ref: src/mf_etl/backtest/policy_overlay.py:211-519): primary
  * rows ⟕ policy rows on a composite key with dedupe-first on the right
  * side, duplicate audit, coverage stats, and a policy gate column.
  *
  * Execution realism (ref: src/mf_etl/backtest/execution_realism.py:
  * 166-313): rolling-median dollar-volume liquidity floor, price floor,
  * warmup, with a fixed reason-precedence for the block decision.
  */
object Overlay {

  /** Left-join policy onto primary with right-side dedupe-first;
    * adds `policy_allowed` (default allow when uncovered) +
    * `overlay_covered`. */
  def applyPolicy(primary: DataFrame, policy: DataFrame,
      keys: Seq[String]): DataFrame = {
    // dedupe-first with a deterministic tiebreak: blocked (false) wins
    // over allowed so conflicting duplicate policy rows resolve safely
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("policy_allowed").asc)
    val deduped = policy
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .drop("rn")
    primary.join(deduped, keys, "left")
      .withColumn("overlay_covered", col("policy_allowed").isNotNull)
      .withColumn("policy_allowed",
        coalesce(col("policy_allowed"), lit(true)))
  }

  /** Duplicate audit of the policy side (groupBy keys → count > 1). */
  def dupAudit(policy: DataFrame, keys: Seq[String]): DataFrame =
    policy.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)

  /** Coverage stats: rows, covered, coverage rate, allowed rate. */
  def coverageStats(overlaid: DataFrame): DataFrame =
    overlaid.agg(
      count(lit(1)).as("n_rows"),
      Cols.countIf(col("overlay_covered")).as("n_covered"),
      Cols.hitRate(col("overlay_covered")).as("coverage_rate"),
      Cols.hitRate(col("policy_allowed")).as("allow_rate"))

  /** Execution-realism filter: block reasons in precedence order
    * LIQUIDITY > PRICE_FLOOR > WARMUP; `exec_allowed` + first reason. */
  def executionRealism(bars: DataFrame, minDollarVol: Double,
      minPrice: Double, warmupBars: Int): DataFrame = {
    val w = Window.partitionBy("ticker").orderBy("bar_ts", "bar_id")
    bars
      .withColumn("dollar_vol", col("close") * col("volume"))
      .withColumn("dv_med_20",
        Wins.rollingMedian(col("dollar_vol"), w, 20, 1))
      .withColumn("bars_seen_x", count(lit(1)).over(Wins.cum(w)))
      .withColumn("exec_reason",
        when(col("dv_med_20") < minDollarVol, "LIQUIDITY")
          .when(col("close") < minPrice, "PRICE_FLOOR")
          .when(col("bars_seen_x") < warmupBars, "WARMUP"))
      .withColumn("exec_allowed", col("exec_reason").isNull)
      .drop("bars_seen_x")
  }
}
