package graft.queries

import org.apache.spark.sql.functions._
import graft.etl.{EventGrammar, ForwardLabels, GoldFeatures, Indicators,
  MarketData, Precision, Silver}

/** The reference's domain feature layers (SURVEY §2.7) run over the
  * deterministic OHLCV bars synthesized from `events`
  * (MarketData.barsFromEvents): silver base features and the TMF/TTI
  * indicator layer, each oracle-checked column-by-column.
  */
object TimeSeriesQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    Q("q_silver_base", Some(s"""
      WITH ${MarketData.barsSql},
      ${Silver.featuresSql}
      SELECT * FROM silver ORDER BY ticker, bar_ts, bar_id""")) { (s, dir) =>
      Silver.oracleProjection(
          Silver.baseFeatures(MarketData.barsFromEvents(t(s, dir, "events"))))
        .orderBy("ticker", "bar_ts", "bar_id")
    },

    // §1.2 layer precision policy: compute in Float64, downcast to
    // Float32 as the FINAL projection (ref transform/dtypes.py:11-45,
    // silver/features_base.py:213-218 — cast order matters for parity).
    // Engine side: Precision.withPrecision(SilverLayer) over the rounded
    // Float64 silver slice; oracle mirrors with CAST(… AS FLOAT) on the
    // same values — identical IEEE round-to-nearest on both engines.
    Q("q_precision_silver", Some(s"""
      WITH ${MarketData.barsSql},
      ${Silver.featuresSql}
      SELECT ticker, bar_ts, bar_id,
             CAST(ret_1d AS FLOAT) AS ret_1d,
             CAST(atr_14 AS FLOAT) AS atr_14,
             CAST(close_sma_20 AS FLOAT) AS close_sma_20,
             CAST(dollar_volume AS FLOAT) AS dollar_volume,
             warmup_20_complete
      FROM silver ORDER BY ticker, bar_ts, bar_id""")) { (s, dir) =>
      Precision.withPrecision(
          Silver.oracleProjection(Silver.baseFeatures(
              MarketData.barsFromEvents(t(s, dir, "events"))))
            .select("ticker", "bar_ts", "bar_id", "ret_1d", "atr_14",
              "close_sma_20", "dollar_volume", "warmup_20_complete"),
          Precision.SilverLayer)
        .orderBy("ticker", "bar_ts", "bar_id")
    },

    Q("q_twiggs_indicators", Some(s"""
      WITH RECURSIVE ${MarketData.barsSql},
      ${Indicators.twiggsSql}
      SELECT * FROM twiggs ORDER BY ticker, bar_ts, bar_id""")) { (s, dir) =>
      Indicators.oracleProjection(
          Indicators.twiggs(MarketData.barsFromEvents(t(s, dir, "events"))))
        .orderBy("ticker", "bar_ts", "bar_id")
    },

    Q("q_event_grammar", Some(s"""
      WITH RECURSIVE ${MarketData.barsSql},
      ${Indicators.twiggsSql},
      ${EventGrammar.grammarSql}
      SELECT * FROM grammar ORDER BY ticker, bar_ts, bar_id""")) { (s, dir) =>
      EventGrammar.oracleProjection(
          EventGrammar.build(Indicators.twiggs(
            MarketData.barsFromEvents(t(s, dir, "events")))))
        .orderBy("ticker", "bar_ts", "bar_id")
    },

    Q("q_gold_features", Some(s"""
      WITH RECURSIVE ${MarketData.barsSql},
      ${Indicators.twiggsSql},
      ${EventGrammar.grammarSql},
      ${GoldFeatures.goldSql}
      SELECT * FROM gold ORDER BY ticker, bar_ts, bar_id""")) { (s, dir) =>
      GoldFeatures.oracleProjection(
          GoldFeatures.build(EventGrammar.build(Indicators.twiggs(
            MarketData.barsFromEvents(t(s, dir, "events"))))))
        .orderBy("ticker", "bar_ts", "bar_id")
    },

    Q("q_forward_labels", Some(s"""
      WITH ${MarketData.barsSql},
      ${ForwardLabels.sql}
      SELECT * FROM fwd ORDER BY ticker, bar_ts, bar_id""")) { (s, dir) =>
      ForwardLabels.oracleProjection(
          ForwardLabels.build(MarketData.barsFromEvents(t(s, dir, "events"))))
        .orderBy("ticker", "bar_ts", "bar_id")
    }
  )
}
