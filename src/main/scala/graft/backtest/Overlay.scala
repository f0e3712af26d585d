package graft.backtest

import org.apache.spark.sql.{Column, DataFrame}
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

  /** OK / WARN / FAIL grade of a coverage-stats frame against the
    * `overlay_coverage_policy` thresholds (ref config.py:272-277):
    * FAIL below min_match_rate_fail, WARN below min_match_rate_warn,
    * OK otherwise — Settings-resolved, so the gate is tunable without
    * recompiling and the oracle interpolates the identical
    * thresholds. */
  def coverageStatus(rate: Column): Column = {
    val P = graft.Settings.overlayCoverage
    when(rate < P.minMatchRateFail, "FAIL")
      .when(rate < P.minMatchRateWarn, "WARN")
      .otherwise("OK")
  }

  /** SQL twin of [[coverageStatus]] over a rate expression. */
  def coverageStatusSql(rate: String): String = {
    val P = graft.Settings.overlayCoverage
    s"""CASE WHEN $rate < ${P.minMatchRateFail} THEN 'FAIL'
            WHEN $rate < ${P.minMatchRateWarn} THEN 'WARN'
            ELSE 'OK' END"""
  }

  /** Execution-realism filter with full reference parity
    * (ref execution_realism.py:208-468):
    *  - liquidity: rolling-MEDIAN dollar volume, window=minSamples=20,
    *    so the first 19 bars are null → liquidity fail (null fails);
    *  - volatility: raw series = (high-low)/close (range_pct fallback;
    *    an `atr_pct_14` input column would take precedence in the
    *    reference), with unit AUTO-DETECT from the series' own median/
    *    p90 — median>1 or p90>1 ⇒ the series is in percent points ⇒
    *    divide by 100 (ref _detect_vol_unit); the threshold normalizes
    *    the same way (input>1 ⇒ /100, ref _normalize_vol_threshold);
    *  - warmup: cumulative bar count < warmupBars;
    *  - price floor: close < minPrice.
    * Reason: >1 failing filter → 'multiple_reasons', else fixed
    * precedence price_floor > liquidity_floor > vol_cap > warmup,
    * else 'none'. `exec_allowed` = no filter fails.
    * The unit-detect aggregate is one tiny broadcast row — no extra
    * shuffle of the bar frame. */
  /** Threshold-FREE per-bar realism features: rolling-median dollar
    * volume, cumulative history bars, and the unit-normalized volatility
    * series. Split out so the single-profile gate and the calibration
    * sweep share ONE feature pass — the sweep applies its 280 threshold
    * combos on top of this frame instead of recomputing the windows per
    * combo (the reference re-runs the whole filter per combo). */
  def realismFeatures(bars: DataFrame,
      dvWindow: Int = graft.Settings.execRealism.dollarVolWindow)
      : DataFrame = {
    val w = Window.partitionBy("ticker").orderBy("bar_ts", "bar_id")
    val withCols = bars
      .withColumn("exec_dollar_vol",
        when(col("volume").isNotNull, col("close") * col("volume")))
      .withColumn("dv_med_20",
        Wins.rollingMedian(col("exec_dollar_vol"), w, dvWindow, dvWindow))
      .withColumn("exec_history_bars", count(lit(1)).over(Wins.cum(w)))
      .withColumn("exec_vol_raw",
        when(col("close") > 0, (col("high") - col("low")) / col("close")))
    val vstats = withCols.agg(
      median(col("exec_vol_raw")).as("vmed"),
      percentile(col("exec_vol_raw"), lit(0.9)).as("vp90"))
    withCols.crossJoin(broadcast(vstats))
      .withColumn("vol_divisor",
        when(col("vmed") > 1.0 || col("vp90") > 1.0, 100.0).otherwise(1.0))
      .withColumn("exec_vol_pct", col("exec_vol_raw") / col("vol_divisor"))
      .drop("vmed", "vp90")
  }

  /** Normalize a max-vol threshold the way the reference does: an input
    * above 1 is percent points and becomes a decimal. */
  def volThresholdDecimal(v: Double): Double = if (v > 1.0) v / 100.0 else v

  def executionRealism(bars: DataFrame, minDollarVol: Double,
      minPrice: Double, warmupBars: Int,
      maxVolPct: Option[Double] = None, dvWindow: Int = 20): DataFrame = {
    val thrDec = maxVolPct.map(volThresholdDecimal)
    val volFail = thrDec match {
      case Some(th) =>
        col("exec_vol_pct").isNull || col("exec_vol_pct") > th
      case None => lit(false)
    }
    val nf = Seq("f_price", "f_liq", "f_vol", "f_warm")
      .map(c => col(c).cast("int")).reduce(_ + _)
    realismFeatures(bars, dvWindow)
      .withColumn("f_price", col("close") < minPrice)
      .withColumn("f_liq",
        col("dv_med_20").isNull || col("dv_med_20") < minDollarVol)
      .withColumn("f_vol", volFail)
      .withColumn("f_warm", col("exec_history_bars") < warmupBars)
      .withColumn("n_fail", nf)
      .withColumn("exec_reason",
        when(col("n_fail") > 1, "multiple_reasons")
          .when(col("f_price"), "price_floor")
          .when(col("f_liq"), "liquidity_floor")
          .when(col("f_vol"), "vol_cap")
          .when(col("f_warm"), "warmup")
          .otherwise("none"))
      .withColumn("exec_allowed", col("n_fail") === 0)
  }

  /** SQL mirror of realismFeatures over CTE `bars` → CTE `erf` with
    * (ticker, bar_ts, bar_id, close, dv_med_20, hist, vol_pct). */
  def realismFeaturesSql(
      dvWindow: Int = graft.Settings.execRealism.dollarVolWindow)
      : String = s"""
      er0 AS (
        SELECT ticker, bar_ts, bar_id, close,
               CASE WHEN count(close * volume) OVER wdv >= $dvWindow
                 THEN median(close * volume) OVER wdv END AS dv_med_20,
               count(*) OVER wcum AS hist,
               CASE WHEN close > 0 THEN (high - low) / close END AS vol_raw
        FROM bars
        WINDOW wdv AS (PARTITION BY ticker ORDER BY bar_ts, bar_id
                 ROWS BETWEEN ${dvWindow - 1} PRECEDING AND CURRENT ROW),
               wcum AS (PARTITION BY ticker ORDER BY bar_ts, bar_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      vstats AS (SELECT median(vol_raw) AS vmed,
                        quantile_cont(vol_raw, 0.9) AS vp90 FROM er0),
      er1 AS (
        SELECT e.*, CASE WHEN s.vmed > 1.0 OR s.vp90 > 1.0
                 THEN 100.0 ELSE 1.0 END AS vol_div
        FROM er0 e CROSS JOIN vstats s),
      erf AS (SELECT *, vol_raw / vol_div AS vol_pct FROM er1)"""

  /** SQL mirror of executionRealism over CTE `bars` → CTE `exec_realism`
    * with (ticker, bar_ts, bar_id, dv_med_20, vol_pct, exec_reason,
    * exec_allowed). */
  def realismSql(minDollarVol: Double, minPrice: Double, warmupBars: Int,
      maxVolPct: Option[Double], dvWindow: Int = 20): String = {
    val thr = maxVolPct.map(volThresholdDecimal)
    val volFail = thr.map(t => s"(vol_pct IS NULL OR vol_pct > $t)")
      .getOrElse("false")
    s"""
      ${realismFeaturesSql(dvWindow)},
      er2 AS (
        SELECT *,
               (close < $minPrice) AS f_price,
               (dv_med_20 IS NULL OR dv_med_20 < $minDollarVol) AS f_liq,
               $volFail AS f_vol,
               (hist < $warmupBars) AS f_warm
        FROM erf),
      er3 AS (
        SELECT *, (CAST(f_price AS INT) + CAST(f_liq AS INT)
               + CAST(f_vol AS INT) + CAST(f_warm AS INT)) AS nf
        FROM er2),
      exec_realism AS (
        SELECT ticker, bar_ts, bar_id, dv_med_20, vol_pct,
               CASE WHEN nf > 1 THEN 'multiple_reasons'
                    WHEN f_price THEN 'price_floor'
                    WHEN f_liq THEN 'liquidity_floor'
                    WHEN f_vol THEN 'vol_cap'
                    WHEN f_warm THEN 'warmup'
                    ELSE 'none' END AS exec_reason,
               nf = 0 AS exec_allowed
        FROM er3)"""
  }

  /** Suppressed-signal reason table (ref _reason_table): all five block
    * reasons enumerated (zero rows included), with suppressed counts and
    * shares of suppressed / of all rows. `df` needs `entry_signal`,
    * `exec_allowed`, `exec_reason`. */
  def reasonTable(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val reasons = Seq("liquidity_floor", "multiple_reasons", "price_floor",
      "vol_cap", "warmup").toDF("reason")
    val sup = df.filter(col("entry_signal") && !col("exec_allowed"))
      .groupBy(col("exec_reason").as("reason"))
      .agg(count(lit(1)).as("cnt"))
    val totals = df.agg(count(lit(1)).as("n_rows"),
      Cols.countIf(col("entry_signal") && !col("exec_allowed"))
        .as("n_suppressed"))
    reasons.join(sup, Seq("reason"), "left")
      .crossJoin(broadcast(totals))
      .select(col("reason"),
        coalesce(col("cnt"), lit(0L)).as("suppressed_signal_count"),
        round(when(col("n_suppressed") > 0,
          coalesce(col("cnt"), lit(0L)).cast("double")
            / col("n_suppressed")).otherwise(0.0), 9)
          .as("suppressed_signal_share"),
        round(coalesce(col("cnt"), lit(0L)).cast("double")
          / col("n_rows"), 9).as("row_share_total"))
      .orderBy("reason")
  }
}
