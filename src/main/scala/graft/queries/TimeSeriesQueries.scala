package graft.queries

import org.apache.spark.sql.functions._
import graft.etl.{EventGrammar, ForwardLabels, GoldFeatures, Indicators,
  MarketData, Silver}

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
