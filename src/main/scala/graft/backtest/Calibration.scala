package graft.backtest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.Cols

/** Execution-realism calibration sweep (ref
  * src/mf_etl/backtest/execution_realism_calibration.py:546-770, default
  * grid + targets ref config.py:346-373): sweep the threshold grid over
  * the normalized bar+signal frame, collect per-combo eligibility and
  * suppression diagnostics, and recommend thresholds per target
  * eligibility band ("lite" / "strict" profiles).
  *
  * Spark-first shape: the reference re-applies the whole realism filter
  * once per combo — 280 passes over the frame. Here the threshold-free
  * features are computed ONCE (Overlay.realismFeatures), the 280-row
  * combo grid is broadcast, the filter flags are plain column programs
  * over the crossed frame, and metrics aggregate per (combo, year) then
  * roll up per combo. Partial (map-side) aggregation means the shuffle
  * carries grid×years rows, not bars — the sweep costs about one pass
  * over the data regardless of grid size, which is what survives a
  * 100 TB bar universe.
  */
object Calibration {

  /** Default sweep ranges (ref config.py:350-359), resolved live
    * through [[graft.Settings.execCalibration]] so a deployment tunes
    * the grid without recompiling; the oracle SQL interpolates the
    * same defs, so an override can never desynchronize engine vs
    * oracle. */
  def Prices: Seq[Double] = graft.Settings.execCalibration.sweepMinPrice
  def DollarVols: Seq[Double] =
    graft.Settings.execCalibration.sweepMinDollarVol20
  def MaxVolPcts: Seq[Option[Double]] =
    graft.Settings.execCalibration.sweepMaxVolPct
  def HistBars: Seq[Int] =
    graft.Settings.execCalibration.sweepMinHistoryBars

  /** Recommendation targets (ref config.py:365-372), Settings-backed
    * like the grid. */
  def LiteBand: (Double, Double) =
    (graft.Settings.execCalibration.liteEligibilityMin,
      graft.Settings.execCalibration.liteEligibilityMax)
  def StrictBand: (Double, Double) =
    (graft.Settings.execCalibration.strictEligibilityMin,
      graft.Settings.execCalibration.strictEligibilityMax)
  def MinEligibleSignals: Int =
    graft.Settings.execCalibration.minEligibleSignals
  def MaxSingleReasonShare: Double =
    graft.Settings.execCalibration.maxSingleReasonShare
  def TopK: Int = graft.Settings.execCalibration.topKRecommendations

  case class ExecCombo(idx: Int, minPrice: Double, minDollarVol: Double,
      maxVolPct: Option[Double], minHist: Int) {
    /** c0001… in itertools.product order, like the reference. */
    def comboId: String = f"c$idx%04d"
  }

  /** The 4×5×7×2 grid in product order (prices outermost), ids 1-based —
    * identical to the reference's enumerate(product(...), start=1).
    * A `def`: the ranges are live Settings lookups. */
  def Combos: Seq[ExecCombo] = for {
    (p, pi) <- Prices.zipWithIndex
    (d, di) <- DollarVols.zipWithIndex
    (v, vi) <- MaxVolPcts.zipWithIndex
    (h, hi) <- HistBars.zipWithIndex
  } yield ExecCombo(
    ((pi * DollarVols.size + di) * MaxVolPcts.size + vi)
      * HistBars.size + hi + 1, p, d, v, h)

  /** Grid as a (broadcastable) DataFrame, vol threshold pre-normalized. */
  def gridDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Combos.map(c => (c.comboId, c.minPrice, c.minDollarVol, c.maxVolPct,
        c.maxVolPct.map(Overlay.volThresholdDecimal), c.minHist))
      .toDF("combo_id", "min_price", "min_dollar_vol20",
        "max_vol_pct_input", "max_vol_dec", "min_history_bars")
  }

  /** Per-combo sweep metrics over `base` — one row per bar with
    * (close, dv_med_20, exec_vol_pct, exec_history_bars, entry_signal,
    * yr). Mirrors _collect_combo_row: row eligibility, candidate-signal
    * suppression with exclusive reason shares, eligible-signal feature
    * averages, and the per-year candidate eligibility envelope. */
  def sweep(base: DataFrame): DataFrame = {
    val spark = base.sparkSession
    val comboCols = Seq("combo_id", "min_price", "min_dollar_vol20",
      "max_vol_pct_input", "min_history_bars")
    val flagged = base.crossJoin(broadcast(gridDf(spark)))
      .withColumn("f_price", col("close") < col("min_price"))
      .withColumn("f_liq", col("dv_med_20").isNull
        || col("dv_med_20") < col("min_dollar_vol20"))
      .withColumn("f_vol", when(col("max_vol_dec").isNotNull,
        col("exec_vol_pct").isNull
          || col("exec_vol_pct") > col("max_vol_dec")).otherwise(false))
      .withColumn("f_warm",
        col("exec_history_bars") < col("min_history_bars"))
      .withColumn("n_fail", Seq("f_price", "f_liq", "f_vol", "f_warm")
        .map(c => col(c).cast("int")).reduce(_ + _))
      .withColumn("allowed", col("n_fail") === 0)
      .withColumn("reason",
        when(col("n_fail") > 1, "multiple_reasons")
          .when(col("f_price"), "price_floor")
          .when(col("f_liq"), "liquidity_floor")
          .when(col("f_vol"), "vol_cap")
          .when(col("f_warm"), "warmup")
          .otherwise("none"))
    val sig = col("entry_signal")
    val ok = sig && col("allowed")
    def supBy(r: String) =
      Cols.countIf(sig && !col("allowed") && col("reason") === r)
    val byYear = flagged
      .groupBy((comboCols :+ "yr").map(col): _*)
      .agg(
        count(lit(1)).as("rows_total"),
        Cols.countIf(col("allowed")).as("rows_eligible"),
        Cols.countIf(sig).as("cand_before"),
        Cols.countIf(ok).as("cand_after"),
        supBy("price_floor").as("sup_price"),
        supBy("liquidity_floor").as("sup_liq"),
        supBy("vol_cap").as("sup_vol"),
        supBy("warmup").as("sup_warm"),
        supBy("multiple_reasons").as("sup_multi"),
        // DECIMAL sums: exact and partition-order-independent, so the
        // averages can't straddle a rounding boundary differently than
        // the oracle's sequential double sum (Q scaladoc convention)
        sum(when(ok, col("close")).cast("decimal(38,12)")).as("sum_close"),
        count(when(ok, col("close"))).as("n_close"),
        sum(when(ok, col("dv_med_20")).cast("decimal(38,12)")).as("sum_dv"),
        count(when(ok, col("dv_med_20"))).as("n_dv"),
        sum(when(ok, col("exec_vol_pct")).cast("decimal(38,18)"))
          .as("sum_vol"),
        count(when(ok, col("exec_vol_pct"))).as("n_vol"))
    val yearRate = when(col("cand_before") > 0,
      col("cand_after").cast("double") / col("cand_before"))
    val supTotal = col("cand_before") - col("cand_after")
    def share(c: org.apache.spark.sql.Column) =
      round(when(supTotal > 0, c.cast("double") / supTotal)
        .otherwise(0.0), 9)
    byYear
      .withColumn("year_rate", round(yearRate, 9))
      .groupBy(comboCols.map(col): _*)
      .agg(
        sum("rows_total").as("rows_total"),
        sum("rows_eligible").as("rows_eligible"),
        sum("cand_before").as("cand_before"),
        sum("cand_after").as("cand_after"),
        sum("sup_price").as("sup_price"),
        sum("sup_liq").as("sup_liq"),
        sum("sup_vol").as("sup_vol"),
        sum("sup_warm").as("sup_warm"),
        sum("sum_close").as("sum_close"), sum("n_close").as("n_close"),
        sum("sum_dv").as("sum_dv"), sum("n_dv").as("n_dv"),
        sum("sum_vol").as("sum_vol"), sum("n_vol").as("n_vol"),
        min("year_rate").as("year_eligibility_min"),
        max("year_rate").as("year_eligibility_max"))
      .select(
        col("combo_id"), col("min_price"), col("min_dollar_vol20"),
        col("max_vol_pct_input"), col("min_history_bars").cast("long")
          .as("min_history_bars"),
        col("cand_before").as("candidate_signals_before"),
        col("cand_after").as("candidate_signals_after"),
        supTotal.as("suppressed_signal_count"),
        round(col("rows_eligible").cast("double") / col("rows_total"), 9)
          .as("eligibility_rate"),
        round(when(col("cand_before") > 0,
          supTotal.cast("double") / col("cand_before")).otherwise(0.0), 9)
          .as("suppressed_signal_share"),
        share(col("sup_price")).as("suppressed_by_price_share"),
        share(col("sup_liq")).as("suppressed_by_liquidity_share"),
        share(col("sup_vol")).as("suppressed_by_vol_share"),
        share(col("sup_warm")).as("suppressed_by_warmup_share"),
        greatest(share(col("sup_price")), share(col("sup_liq")),
          share(col("sup_vol")), share(col("sup_warm")))
          .as("max_reason_share"),
        round(col("sum_close").cast("double") / col("n_close"), 6)
          .as("eligible_avg_close"),
        round(col("sum_dv").cast("double") / col("n_dv"), 6)
          .as("eligible_avg_dollar_vol_20"),
        round(col("sum_vol").cast("double") / col("n_vol"), 9)
          .as("eligible_avg_vol_pct"),
        col("year_eligibility_min"), col("year_eligibility_max"))
  }

  /** Threshold recommendation per target profile (ref
    * _recommend_thresholds): score = 1 − |elig − band mid|
    * + 0.25·coverage − 0.5·dominance penalty, candidates filtered to the
    * band (falling back to signal-floor-only, then to all), top-5 per
    * profile. Deviation from the reference: ties rank by the grid sort
    * key instead of inheriting polars' stable input order, so the
    * ranking is deterministic across engines. */
  def recommend(grid: DataFrame): DataFrame = {
    val profiles = Seq(("lite", LiteBand), ("strict", StrictBand))
    profiles.map { case (label, (lo, hi)) =>
      val mid = (lo + hi) / 2.0
      val dist = abs(col("eligibility_rate") - lit(mid))
      val coverage = least(col("candidate_signals_after").cast("double")
        / (MinEligibleSignals * 5.0), lit(1.0))
      val penalty =
        greatest(col("max_reason_share") - MaxSingleReasonShare, lit(0.0))
      val scored = grid
        .withColumn("profile", lit(label))
        .withColumn("dist_to_mid", dist)
        .withColumn("score",
          lit(1.0) - dist + lit(0.25) * coverage - lit(0.5) * penalty)
        .withColumn("band_ok",
          col("eligibility_rate") >= lo && col("eligibility_rate") <= hi
            && col("candidate_signals_after") >= MinEligibleSignals
            && col("max_reason_share") <= MaxSingleReasonShare)
        .withColumn("floor_ok",
          col("candidate_signals_after") >= MinEligibleSignals)
      val wAll = Window.partitionBy("profile")
      val tiered = scored
        .withColumn("any_band", max(col("band_ok").cast("int")).over(wAll))
        .withColumn("any_floor",
          max(col("floor_ok").cast("int")).over(wAll))
        .withColumn("selection_tier",
          when(col("any_band") === 1, 0)
            .when(col("any_floor") === 1, 1).otherwise(2))
        .filter(
          when(col("any_band") === 1, col("band_ok"))
            .when(col("any_floor") === 1, col("floor_ok"))
            .otherwise(lit(true)))
      tiered.withColumn("rnk", row_number().over(
          Window.partitionBy("profile").orderBy(
            col("score").desc, col("candidate_signals_after").desc,
            col("dist_to_mid").asc, col("min_price"),
            col("min_dollar_vol20"),
            col("max_vol_pct_input").asc_nulls_first,
            col("min_history_bars"))))
        .filter(col("rnk") <= TopK)
        .select(col("profile"), col("rnk").cast("long").as("rnk"),
          col("combo_id"), col("min_price"), col("min_dollar_vol20"),
          col("max_vol_pct_input"), col("min_history_bars"),
          col("eligibility_rate"), col("candidate_signals_after"),
          col("max_reason_share"), col("suppressed_by_vol_share"),
          round(col("score"), 9).as("score"),
          col("selection_tier").cast("long").as("selection_tier"))
    }.reduce(_.unionByName(_)).orderBy("profile", "rnk")
  }

  /** SQL grid CTEs → `grid` (combo_id, thresholds, max_vol_dec), ids in
    * the same product order as `Combos`. */
  def gridSql: String = {
    def values[A](xs: Seq[A])(f: A => String): String =
      xs.zipWithIndex.map { case (x, i) => s"($i, ${f(x)})" }.mkString(", ")
    // DuckDB types bare decimal literals as DECIMAL, not DOUBLE — cast
    // explicitly so the grid columns Arrow-match the Spark side
    def dbl(x: Double) = s"CAST($x AS DOUBLE)"
    s"""
      cal_pr AS (SELECT * FROM (VALUES ${values(Prices)(dbl)})
        t(pi, min_price)),
      cal_dv AS (SELECT * FROM (VALUES ${values(DollarVols)(dbl)})
        t(di, min_dollar_vol20)),
      cal_vv AS (SELECT * FROM (VALUES ${values(MaxVolPcts)(
        _.map(dbl).getOrElse("CAST(NULL AS DOUBLE)"))})
        t(vi, max_vol_pct_input)),
      cal_hh AS (SELECT * FROM (VALUES ${values(HistBars)(_.toString)})
        t(hi, min_history_bars)),
      grid AS (
        SELECT printf('c%04d',
                 ((pi * ${DollarVols.size} + di) * ${MaxVolPcts.size} + vi)
                   * ${HistBars.size} + hi + 1) AS combo_id,
               min_price, min_dollar_vol20, max_vol_pct_input,
               CASE WHEN max_vol_pct_input > 1.0
                 THEN max_vol_pct_input / 100.0
                 ELSE max_vol_pct_input END AS max_vol_dec,
               min_history_bars
        FROM cal_pr, cal_dv, cal_vv, cal_hh)"""
  }

  /** SQL mirror of `sweep` over CTEs `erf` (realism features) and
    * `signals` → CTE `cal_grid_metrics`. */
  def sweepSql: String = s"""
      $gridSql,
      cal_base AS (
        SELECT f.close, f.dv_med_20, f.vol_pct AS exec_vol_pct,
               f.hist AS exec_history_bars, s.entry_signal,
               year(make_timestamp(f.bar_ts)) AS yr
        FROM erf f JOIN signals s USING (ticker, bar_ts, bar_id)),
      cal_fl AS (
        SELECT g.*, b.*,
               (b.close < g.min_price) AS f_price,
               (b.dv_med_20 IS NULL
                 OR b.dv_med_20 < g.min_dollar_vol20) AS f_liq,
               (CASE WHEN g.max_vol_dec IS NOT NULL
                 THEN (b.exec_vol_pct IS NULL
                   OR b.exec_vol_pct > g.max_vol_dec)
                 ELSE false END) AS f_vol,
               (b.exec_history_bars < g.min_history_bars) AS f_warm
        FROM cal_base b CROSS JOIN grid g),
      cal_fl2 AS (
        SELECT *, (CAST(f_price AS INT) + CAST(f_liq AS INT)
                 + CAST(f_vol AS INT) + CAST(f_warm AS INT)) AS n_fail
        FROM cal_fl),
      cal_fl3 AS (
        SELECT *, (n_fail = 0) AS allowed,
               CASE WHEN n_fail > 1 THEN 'multiple_reasons'
                    WHEN f_price THEN 'price_floor'
                    WHEN f_liq THEN 'liquidity_floor'
                    WHEN f_vol THEN 'vol_cap'
                    WHEN f_warm THEN 'warmup'
                    ELSE 'none' END AS reason
        FROM cal_fl2),
      cal_by AS (
        SELECT combo_id, min_price, min_dollar_vol20, max_vol_pct_input,
               min_history_bars, yr,
               count(*) AS rows_total,
               count(CASE WHEN allowed THEN 1 END) AS rows_eligible,
               count(CASE WHEN entry_signal THEN 1 END) AS cand_before,
               count(CASE WHEN entry_signal AND allowed THEN 1 END)
                 AS cand_after,
               count(CASE WHEN entry_signal AND NOT allowed
                 AND reason = 'price_floor' THEN 1 END) AS sup_price,
               count(CASE WHEN entry_signal AND NOT allowed
                 AND reason = 'liquidity_floor' THEN 1 END) AS sup_liq,
               count(CASE WHEN entry_signal AND NOT allowed
                 AND reason = 'vol_cap' THEN 1 END) AS sup_vol,
               count(CASE WHEN entry_signal AND NOT allowed
                 AND reason = 'warmup' THEN 1 END) AS sup_warm,
               sum(CAST(CASE WHEN entry_signal AND allowed THEN close END
                 AS DECIMAL(38,12))) AS sum_close,
               count(CASE WHEN entry_signal AND allowed THEN close END)
                 AS n_close,
               sum(CAST(CASE WHEN entry_signal AND allowed
                 THEN dv_med_20 END AS DECIMAL(38,12))) AS sum_dv,
               count(CASE WHEN entry_signal AND allowed THEN dv_med_20 END)
                 AS n_dv,
               sum(CAST(CASE WHEN entry_signal AND allowed
                 THEN exec_vol_pct END AS DECIMAL(38,18))) AS sum_vol,
               count(CASE WHEN entry_signal AND allowed
                 THEN exec_vol_pct END) AS n_vol
        FROM cal_fl3
        GROUP BY 1, 2, 3, 4, 5, 6),
      cal_by2 AS (
        SELECT *, round(CASE WHEN cand_before > 0
          THEN CAST(cand_after AS DOUBLE) / cand_before END, 9)
          AS year_rate
        FROM cal_by),
      cal_grid_metrics AS (
        SELECT combo_id, min_price, min_dollar_vol20, max_vol_pct_input,
               CAST(min_history_bars AS BIGINT) AS min_history_bars,
               CAST(sum(cand_before) AS BIGINT)
                 AS candidate_signals_before,
               CAST(sum(cand_after) AS BIGINT)
                 AS candidate_signals_after,
               CAST(sum(cand_before) - sum(cand_after) AS BIGINT)
                 AS suppressed_signal_count,
               round(CAST(sum(rows_eligible) AS DOUBLE)
                 / sum(rows_total), 9) AS eligibility_rate,
               round(CASE WHEN sum(cand_before) > 0
                 THEN CAST(sum(cand_before) - sum(cand_after) AS DOUBLE)
                   / sum(cand_before) ELSE 0.0 END, 9)
                 AS suppressed_signal_share,
               round(CASE WHEN sum(cand_before) - sum(cand_after) > 0
                 THEN CAST(sum(sup_price) AS DOUBLE)
                   / (sum(cand_before) - sum(cand_after)) ELSE 0.0 END, 9)
                 AS suppressed_by_price_share,
               round(CASE WHEN sum(cand_before) - sum(cand_after) > 0
                 THEN CAST(sum(sup_liq) AS DOUBLE)
                   / (sum(cand_before) - sum(cand_after)) ELSE 0.0 END, 9)
                 AS suppressed_by_liquidity_share,
               round(CASE WHEN sum(cand_before) - sum(cand_after) > 0
                 THEN CAST(sum(sup_vol) AS DOUBLE)
                   / (sum(cand_before) - sum(cand_after)) ELSE 0.0 END, 9)
                 AS suppressed_by_vol_share,
               round(CASE WHEN sum(cand_before) - sum(cand_after) > 0
                 THEN CAST(sum(sup_warm) AS DOUBLE)
                   / (sum(cand_before) - sum(cand_after)) ELSE 0.0 END, 9)
                 AS suppressed_by_warmup_share,
               greatest(
                 round(CASE WHEN sum(cand_before) - sum(cand_after) > 0
                   THEN CAST(sum(sup_price) AS DOUBLE)
                     / (sum(cand_before) - sum(cand_after))
                   ELSE 0.0 END, 9),
                 round(CASE WHEN sum(cand_before) - sum(cand_after) > 0
                   THEN CAST(sum(sup_liq) AS DOUBLE)
                     / (sum(cand_before) - sum(cand_after))
                   ELSE 0.0 END, 9),
                 round(CASE WHEN sum(cand_before) - sum(cand_after) > 0
                   THEN CAST(sum(sup_vol) AS DOUBLE)
                     / (sum(cand_before) - sum(cand_after))
                   ELSE 0.0 END, 9),
                 round(CASE WHEN sum(cand_before) - sum(cand_after) > 0
                   THEN CAST(sum(sup_warm) AS DOUBLE)
                     / (sum(cand_before) - sum(cand_after))
                   ELSE 0.0 END, 9)) AS max_reason_share,
               round(CAST(sum(sum_close) AS DOUBLE) / sum(n_close), 6)
                 AS eligible_avg_close,
               round(CAST(sum(sum_dv) AS DOUBLE) / sum(n_dv), 6)
                 AS eligible_avg_dollar_vol_20,
               round(CAST(sum(sum_vol) AS DOUBLE) / sum(n_vol), 9)
                 AS eligible_avg_vol_pct,
               min(year_rate) AS year_eligibility_min,
               max(year_rate) AS year_eligibility_max
        FROM cal_by2
        GROUP BY 1, 2, 3, 4, 5)"""

  /** SQL mirror of `recommend` over CTE `cal_grid_metrics` → CTE
    * `cal_reco`. */
  def recommendSql: String = {
    def profile(label: String, lo: Double, hi: Double): String = {
      val mid = (lo + hi) / 2.0
      s"""
        SELECT '$label' AS profile,
               abs(eligibility_rate - $mid) AS dist_to_mid,
               1.0 - abs(eligibility_rate - $mid)
                 + 0.25 * least(CAST(candidate_signals_after AS DOUBLE)
                     / ${MinEligibleSignals * 5.0}, 1.0)
                 - 0.5 * greatest(max_reason_share
                     - $MaxSingleReasonShare, 0.0) AS score,
               (eligibility_rate >= $lo AND eligibility_rate <= $hi
                 AND candidate_signals_after >= $MinEligibleSignals
                 AND max_reason_share <= $MaxSingleReasonShare) AS band_ok,
               (candidate_signals_after >= $MinEligibleSignals)
                 AS floor_ok,
               *
        FROM cal_grid_metrics"""
    }
    s"""
      cal_sc AS (${profile("lite", LiteBand._1, LiteBand._2)}
        UNION ALL ${profile("strict", StrictBand._1, StrictBand._2)}),
      cal_sc2 AS (
        SELECT *,
               max(CAST(band_ok AS INT)) OVER (PARTITION BY profile)
                 AS any_band,
               max(CAST(floor_ok AS INT)) OVER (PARTITION BY profile)
                 AS any_floor
        FROM cal_sc),
      cal_sc3 AS (
        SELECT *, CASE WHEN any_band = 1 THEN 0
                       WHEN any_floor = 1 THEN 1 ELSE 2 END
                 AS selection_tier
        FROM cal_sc2
        WHERE CASE WHEN any_band = 1 THEN band_ok
                   WHEN any_floor = 1 THEN floor_ok ELSE true END),
      cal_reco AS (
        SELECT profile, CAST(rnk AS BIGINT) AS rnk, combo_id, min_price,
               min_dollar_vol20, max_vol_pct_input, min_history_bars,
               eligibility_rate, candidate_signals_after,
               max_reason_share, suppressed_by_vol_share,
               round(score, 9) AS score,
               CAST(selection_tier AS BIGINT) AS selection_tier
        FROM (
          SELECT *, row_number() OVER (PARTITION BY profile
            ORDER BY score DESC, candidate_signals_after DESC,
                     dist_to_mid ASC, min_price, min_dollar_vol20,
                     max_vol_pct_input ASC NULLS FIRST, min_history_bars)
            AS rnk
          FROM cal_sc3)
        WHERE rnk <= $TopK)"""
  }
}
