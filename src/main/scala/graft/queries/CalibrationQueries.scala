package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.backtest.{Calibration, Overlay, Signals}
import graft.etl.{EventGrammar, Indicators, MarketData}

/** Execution-realism calibration surface (ref
  * src/mf_etl/backtest/execution_realism_calibration.py, CLI
  * `exec-realism-calibrate`): the threshold-grid sweep a real user runs
  * before every backtest campaign, plus the per-profile threshold
  * recommendation. Both queries share one cached base (features ⋈
  * signals) and one cached grid result; the sweep itself is a single
  * pass — see Calibration's scaladoc for the 280×-fewer-passes shape.
  */
object CalibrationQueries extends QueryModule {

  /** Feature ⋈ signal base frame for the sweep: one row per bar with the
    * threshold-free realism features, the default-combo entry signal,
    * and the bar's year. */
  private[queries] def calBase(s: SparkSession, dir: String): DataFrame =
    Stage.cached(s, dir, "exec_calib_base") {
      val bars = MarketData.barsFromEvents(t(s, dir, "events"))
      val feats = Overlay.realismFeatures(bars)
        .select("ticker", "bar_ts", "bar_id", "close", "dv_med_20",
          "exec_vol_pct", "exec_history_bars")
      val sig = Signals.generate(BacktestQueries2.gramSlim(s, dir),
          "state_entry", 2)
        .select("ticker", "bar_ts", "bar_id", "entry_signal")
      feats.join(sig, Seq("ticker", "bar_ts", "bar_id"))
        .withColumn("yr", year(timestamp_micros(col("bar_ts"))))
    }

  private[queries] def calGrid(s: SparkSession, dir: String): DataFrame =
    Stage.cached(s, dir, "exec_calib_grid") {
      Calibration.sweep(calBase(s, dir))
    }

  private def prefixSql = s"""${MarketData.barsSql},
      ${Indicators.twiggsSql},
      ${EventGrammar.grammarSql},
      ${Signals.sql("state_entry", 2)},
      ${Overlay.realismFeaturesSql()},
      ${Calibration.sweepSql}"""

  def all: Seq[Q] = Seq(

    // Execution-realism calibration grid: 280 threshold combos × the
    // eligibility / suppression / eligible-feature diagnostics of
    // _collect_combo_row, in one pass over the bar frame
    Q("q_exec_calibration", Some(s"""
      WITH RECURSIVE $prefixSql
      SELECT combo_id, min_price, min_dollar_vol20, max_vol_pct_input,
             min_history_bars, candidate_signals_before,
             candidate_signals_after, suppressed_signal_count,
             eligibility_rate, suppressed_signal_share,
             suppressed_by_price_share, suppressed_by_liquidity_share,
             suppressed_by_vol_share, suppressed_by_warmup_share,
             max_reason_share, eligible_avg_close,
             eligible_avg_dollar_vol_20, eligible_avg_vol_pct,
             year_eligibility_min, year_eligibility_max
      FROM cal_grid_metrics
      ORDER BY min_price, min_dollar_vol20,
               max_vol_pct_input NULLS FIRST, min_history_bars""")) {
      (s, dir) =>
      calGrid(s, dir).orderBy(col("min_price"), col("min_dollar_vol20"),
        col("max_vol_pct_input").asc_nulls_first, col("min_history_bars"))
    },

    // Threshold recommendation: top-5 combos per target profile
    // (lite 20-60% eligibility, strict 5-30%), scored by band distance,
    // signal coverage, and reason-dominance penalty
    Q("q_exec_calibration_reco", Some(s"""
      WITH RECURSIVE $prefixSql,
      ${Calibration.recommendSql}
      SELECT profile, rnk, combo_id, min_price, min_dollar_vol20,
             max_vol_pct_input, min_history_bars, eligibility_rate,
             candidate_signals_after, max_reason_share,
             suppressed_by_vol_share, score, selection_tier
      FROM cal_reco ORDER BY profile, rnk""")) { (s, dir) =>
      Calibration.recommend(calGrid(s, dir))
    }
  )
}
