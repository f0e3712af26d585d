package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}
import graft.etl.{EventGrammar, GoldFeatures, Precision}

/** Runtime config surface (ref: src/mf_etl/config.py:667-724,
  * configs/settings.yaml): same key names, same defaults, overridable
  * via `graft.*` system properties / `GRAFT_*__*` env / a properties
  * file — without recompiling. Tests drive the sysprop source (the env
  * source shares the same resolution path). */
class SettingsSpec extends SparkSpec {
  import spark.implicits._

  private def withProp[A](key: String, value: String)(body: => A): A = {
    sys.props(key) = value
    try body finally sys.props.remove(key)
  }

  test("defaults mirror configs/settings.yaml") {
    assert(Settings.validation.suspiciousRangePct == 0.5)
    assert(Settings.validation.gapDaysWarn == 7)
    assert(Settings.validation.bootstrapNBoot == 1000)
    assert(Settings.validation.bootstrapCi == 0.95)
    assert(Settings.validation.bootstrapBlockLength == 10)
    assert(Settings.eventGrammar.holdBars == 5)
    assert(Settings.eventGrammar.respectFailLookback == 10)
    assert(Settings.eventGrammar.burstAbsThreshold == 0.15)
    assert(Settings.eventGrammar.burstSlopeThreshold == 0.05)
    assert(Settings.eventGrammar.activityWindows == Seq(5, 20))
    assert(Settings.goldFeatures.wZero == 1.0)
    assert(Settings.goldFeatures.wRespect == 2.0)
    assert(Settings.goldFeatures.wBurst == 2.0)
    assert(Settings.goldFeatures.wHold == 1.5)
    assert(Settings.goldFeatures.recencyClipBars == 20)
    assert(Settings.sensitivity.maxCombos == 500)
    assert(Settings.precision.silverFloat == "float32")
    assert(Settings.parquet.compression == "zstd")
  }

  test("system property overrides win over defaults and clear cleanly") {
    assert(EventGrammar.HoldBars == 5)
    withProp("graft.event_grammar.hold_consecutive_bars", "3") {
      assert(EventGrammar.HoldBars == 3)
      assert(Settings.eventGrammar.holdBars == 3)
    }
    assert(EventGrammar.HoldBars == 5)

    withProp("graft.gold_features.score_weights.zero", "4.0") {
      assert(GoldFeatures.WZero == 4.0)
    }
    withProp("graft.event_grammar.activity_windows", "3, 9") {
      assert(Settings.eventGrammar.activityWindows == Seq(3, 9))
    }
  }

  test("precision policy override flips the layer dtype") {
    assert(Precision.SilverLayer.floatType == FloatType)
    withProp("graft.precision.silver_float", "float64") {
      assert(Precision.SilverLayer.floatType == DoubleType)
      val df = Seq(("A", 1.5)).toDF("k", "v")
      val out = Precision.withPrecision(df, Precision.SilverLayer)
      assert(out.schema("v").dataType == DoubleType)
    }
    assert(Precision.SilverLayer.floatType == FloatType)
    intercept[IllegalArgumentException] {
      withProp("graft.precision.gold_float", "float16") {
        Precision.GoldLayer.floatType
      }
    }
  }

  test("gap threshold override changes the bronze warn flag end-to-end") {
    // two bars 5 calendar days apart: not a gap at the default 7,
    // a gap when the threshold is tightened to 3
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("ticker").orderBy("trade_date")
    def gapFlag() = Seq(("A", "2024-01-01"), ("A", "2024-01-06"))
      .toDF("ticker", "d")
      .select(col("ticker"), col("d").cast("date").as("trade_date"))
      .select(col("ticker"), coalesce(
        datediff(col("trade_date"), lag("trade_date", 1).over(w))
          > Settings.validation.gapDaysWarn, lit(false)).as("gap"))
      .agg(sum(when(col("gap"), 1).otherwise(0))).as[Long].head()
    assert(gapFlag() == 0L)
    withProp("graft.validation.gap_days_warn_threshold", "3") {
      assert(gapFlag() == 1L)
    }
  }

  test("properties file source resolves below sysprops") {
    val f = java.io.File.createTempFile("graft-settings", ".properties")
    f.deleteOnExit()
    val pw = new java.io.PrintWriter(f)
    pw.println("backtest_sensitivity.max_combos = 42")
    pw.println("event_grammar.hold_consecutive_bars = 9")
    pw.close()
    withProp("graft.settings.file", f.getAbsolutePath) {
      assert(Settings.sensitivity.maxCombos == 42)
      assert(EventGrammar.HoldBars == 9)
      // sysprop still wins over the file
      withProp("graft.event_grammar.hold_consecutive_bars", "2") {
        assert(EventGrammar.HoldBars == 2)
      }
    }
    assert(Settings.sensitivity.maxCombos == 500)
  }
}
