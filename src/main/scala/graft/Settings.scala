package graft

import java.io.FileInputStream
import java.util.Properties

/** Runtime configuration surface — the engine mirror of the reference's
  * externalized settings (ref: src/mf_etl/config.py:667-724,
  * configs/settings.yaml). The reference layers pydantic-settings
  * sources: init args > `MF_ETL_*` env vars (`__` nesting) > the YAML
  * file > defaults. The engine keeps the same key names and the same
  * defaults, resolved per lookup (driver-side, plan-construction time —
  * never in a hot path) with the same precedence shape:
  *
  *   1. JVM system property  `graft.<section>.<key>`    (tests, ad hoc)
  *   2. environment variable `GRAFT_<SECTION>__<KEY>`   (deploy-time)
  *   3. properties file named by `-Dgraft.settings.file` /
  *      `GRAFT_SETTINGS_FILE` (keys as `section.key`)   (site config)
  *   4. compiled default     (== configs/settings.yaml value)
  *
  * Lookups are live `def`s, so a test can set a system property, build a
  * plan, and clear it — no reload machinery. Values are memoized per
  * (key, defaults-unset) only via the props-file cache; the sysprop/env
  * checks are O(1).
  *
  * Deliberately compile-time (NOT exposed here): `indicators.tmf_period`
  * — the period is baked into downstream feature NAMES (`tmf_21`,
  * `tti_proxy_v1_21`, ... across silver/gold/grammar), so changing it is
  * a schema change, not a tuning knob; the reference has the same
  * coupling (silver/indicators_twiggs.py names columns by period).
  */
object Settings {

  /** Properties file (source 3), loaded once per named file. */
  @volatile private var fileCache: Option[(String, Properties)] = None

  private def fileProps(): Option[Properties] = {
    val path = sys.props.get("graft.settings.file")
      .orElse(sys.env.get("GRAFT_SETTINGS_FILE"))
    path.map { p =>
      fileCache match {
        case Some((cp, props)) if cp == p => props
        case _ =>
          val props = new Properties()
          val in = new FileInputStream(p)
          try props.load(in) finally in.close()
          fileCache = Some((p, props))
          props
      }
    }
  }

  private def envKey(key: String): String =
    "GRAFT_" + key.toUpperCase.replace(".", "__")

  /** Raw lookup through the precedence chain; None → compiled default. */
  def raw(key: String): Option[String] =
    sys.props.get(s"graft.$key")
      .orElse(sys.env.get(envKey(key)))
      .orElse(fileProps().flatMap(p => Option(p.getProperty(key))))

  def str(key: String, default: String): String = raw(key).getOrElse(default)
  def int(key: String, default: Int): Int = raw(key).map(_.trim.toInt).getOrElse(default)
  def dbl(key: String, default: Double): Double = raw(key).map(_.trim.toDouble).getOrElse(default)
  def bool(key: String, default: Boolean): Boolean = raw(key).map(_.trim.toBoolean).getOrElse(default)
  /** Comma-separated int list (yaml `[5, 20]` → `5,20`). */
  def ints(key: String, default: Seq[Int]): Seq[Int] =
    raw(key).map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(default)

  // ---- typed views of the sections the engine consumes --------------
  // Key names and defaults match configs/settings.yaml verbatim.

  /** `validation:` block (settings.yaml:24-28). */
  object validation {
    def suspiciousRangePct: Double = dbl("validation.suspicious_range_pct_threshold", 0.5)
    def gapDaysWarn: Int = int("validation.gap_days_warn_threshold", 7)
    /** `validation.bootstrap:` (settings.yaml:29-34). */
    def bootstrapNBoot: Int = int("validation.bootstrap.n_boot", 1000)
    def bootstrapCi: Double = dbl("validation.bootstrap.ci", 0.95)
    def bootstrapBlockLength: Int = int("validation.bootstrap.block_length", 10)
    def bootstrapSeed: Int = int("validation.bootstrap.random_state", 42)
    /** `validation.event_study:` (settings.yaml:35-38). */
    def eventWindowPre: Int = int("validation.event_study.window_pre", 10)
    def eventWindowPost: Int = int("validation.event_study.window_post", 20)
    def minEventsPerTransition: Int = int("validation.event_study.min_events_per_transition", 50)
    /** `validation.rolling_stability:` (settings.yaml:39-41). */
    def stabilityWindowMonths: Int = int("validation.rolling_stability.window_months", 12)
    def stabilityStepMonths: Int = int("validation.rolling_stability.step_months", 3)
  }

  /** `event_grammar:` block (settings.yaml:58-65). */
  object eventGrammar {
    def respectFailLookback: Int = int("event_grammar.respect_fail_lookahead_bars", 10)
    def holdBars: Int = int("event_grammar.hold_consecutive_bars", 5)
    def burstAbsThreshold: Double = dbl("event_grammar.tmf_burst_abs_threshold", 0.15)
    def burstSlopeThreshold: Double = dbl("event_grammar.tmf_burst_slope_threshold", 0.05)
    def activityWindows: Seq[Int] = ints("event_grammar.activity_windows", Seq(5, 20))
    /** Respect band — the |lag(tmf)| < band gate on respect-zero pivots
      * (ref: src/mf_etl/gold/event_grammar_v1.py respect_zero band). */
    def respectBand: Double = dbl("event_grammar.respect_band", 0.10)
  }

  /** `gold_features:` block (settings.yaml:67-76). */
  object goldFeatures {
    def wZero: Double = dbl("gold_features.score_weights.zero", 1.0)
    def wRespect: Double = dbl("gold_features.score_weights.respect", 2.0)
    def wBurst: Double = dbl("gold_features.score_weights.burst", 2.0)
    def wHold: Double = dbl("gold_features.score_weights.hold", 1.5)
    def recencyClipBars: Int = int("gold_features.recency_clip_bars", 20)
  }

  /** `backtest:` defaults (settings.yaml:129-140). */
  object backtest {
    def holdBars: Int = int("backtest.hold_bars", 10)
    def feeBpsPerSide: Double = dbl("backtest.fee_bps_per_side", 0.0)
    def slippageBpsPerSide: Double = dbl("backtest.slippage_bps_per_side", 0.0)
  }

  /** `backtest_sensitivity:` (ref sensitivity_runner max_combos cap). */
  object sensitivity {
    def maxCombos: Int = int("backtest_sensitivity.max_combos", 500)
  }

  /** `precision:` block (settings.yaml:14-17) — layer float dtypes.
    * Accepted values: `float32` | `float64`. */
  object precision {
    def bronzeFloat: String = str("precision.bronze_float", "float64")
    def silverFloat: String = str("precision.silver_float", "float32")
    def goldFloat: String = str("precision.gold_float", "float32")
  }

  /** `parquet:` block (settings.yaml:19-22). */
  object parquet {
    def compression: String = str("parquet.compression", "zstd")
  }
}
