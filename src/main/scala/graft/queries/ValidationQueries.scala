package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.backtest.Overlay
import graft.etl.{EventGrammar, ForwardLabels, Indicators, MarketData}
import graft.ml.Bootstrap
import graft.ops.{Cols, Wins}

/** Validation + orchestration surface: transition event studies (Q4),
  * policy overlay with dedupe/coverage (J6), execution-realism gating
  * (W7 + reason precedence), cluster hardening policy (M11), and the
  * stacked dataset export with deterministic sampling (S10/O3).
  */
object ValidationQueries extends QueryModule {

  // Shared SLIM cached grammar projection (the wide frame stays uncached
  // so pruning still works; consumers only ever read these 7 columns).
  private def gramBars(s: SparkSession, dir: String): DataFrame =
    Stage.slimGrammar(s, dir)

  /** The demo execution-realism gate the q_exec_* queries apply —
    * resolved live through `backtest_execution_realism.gate.*` (same
    * defaults as the former literals), interpolated into both the
    * engine calls and the oracle SQL so overrides can't desync. */
  private def G = graft.Settings.execRealism

  private val W = Window.partitionBy("ticker").orderBy("bar_ts", "bar_id")

  // Event-study window (validation.event_study.window_pre/window_post).
  // The registered query pins ±5 (fixture sequences are short); the
  // reference yaml default is 10/20 — overridable either way, and the
  // oracle SQL interpolates the same defs so both sides always agree.
  private def EvPre: Int =
    graft.Settings.int("validation.event_study.window_pre", 5)
  private def EvPost: Int =
    graft.Settings.int("validation.event_study.window_post", 5)

  def all: Seq[Q] = Seq(

    // Q4: transition event study — ±5-bar relative return paths keyed by
    // transition code (ref: src/mf_etl/validation/event_studies.py:52-260)
    Q("q_event_study", Some(s"""
      WITH RECURSIVE ${MarketData.barsSql},
      ${Indicators.twiggsSql},
      ${EventGrammar.grammarSql},
      rb AS (
        SELECT g.ticker, g.flow_state_code, b.close,
               row_number() OVER (PARTITION BY g.ticker
                 ORDER BY g.bar_ts, g.bar_id) AS rn
        FROM grammar g JOIN bars b USING (ticker, bar_ts, bar_id)),
      ev AS (
        SELECT ticker, rn AS ern, close AS base_close,
               lag(flow_state_code) OVER (PARTITION BY ticker ORDER BY rn)
                 * 10 + flow_state_code AS tc
        FROM rb
        QUALIFY lag(flow_state_code) OVER (PARTITION BY ticker ORDER BY rn)
          IS NOT NULL
          AND flow_state_code <> lag(flow_state_code)
            OVER (PARTITION BY ticker ORDER BY rn)),
      offs AS (
        SELECT ticker, ern, base_close, tc,
               CAST(unnest(range(-$EvPre, ${EvPost + 1})) AS INT) AS rel_bar
        FROM ev),
      path AS (
        SELECT o.tc, o.rel_bar, r.close / o.base_close - 1 AS rel_ret
        FROM offs o JOIN rb r
          ON o.ticker = r.ticker AND r.rn = o.ern + o.rel_bar)
      SELECT CAST(tc AS INT) AS tc, rel_bar, count(*) AS n,
             round(avg(rel_ret), 6) AS mean_rel_ret
      FROM path GROUP BY 1, 2 ORDER BY 1, 2""")) { (s, dir) =>
      // close rides on the slim grammar frame — no bars re-join needed
      val rb = gramBars(s, dir)
        .select(col("ticker"), col("bar_ts"), col("bar_id"),
          col("flow_state_code"), col("close"))
        .withColumn("rn", row_number().over(W))
      val prev = lag("flow_state_code", 1).over(W)
      val ev = rb
        .withColumn("prev", prev)
        .filter(col("prev").isNotNull
          && col("flow_state_code") =!= col("prev"))
        .select(col("ticker"), col("rn").as("ern"),
          col("close").as("base_close"),
          (col("prev").cast("int") * 10
            + col("flow_state_code").cast("int")).as("tc"))
      val offs = ev.withColumn("rel_bar",
        explode(sequence(lit(-EvPre), lit(EvPost)))).as("o")
      val rbp = rb.select(col("ticker").as("r_ticker"),
        col("rn").as("r_rn"), col("close").as("r_close")).as("r")
      offs.join(rbp,
          col("o.ticker") === col("r_ticker")
            && col("r_rn") === col("o.ern") + col("o.rel_bar"))
        .select(col("o.tc").as("tc"), col("o.rel_bar").as("rel_bar"),
          (col("r_close") / col("o.base_close") - 1).as("rel_ret"))
        .groupBy("tc", "rel_bar")
        .agg(count(lit(1)).as("n"),
          round(avg(col("rel_ret")), 6).as("mean_rel_ret"))
        .orderBy("tc", "rel_bar")
    },

    // J6: policy overlay — synthesized policy side with duplicates, right
    // dedupe-first, default-allow on uncovered keys
    Q("q_policy_overlay", Some(s"""
      WITH RECURSIVE ${MarketData.barsSql},
      ${Indicators.twiggsSql},
      ${EventGrammar.grammarSql},
      pol0 AS (
        SELECT ticker, bar_ts, bar_id, bar_id % 5 <> 0 AS policy_allowed
        FROM grammar WHERE bar_id % 3 = 0
        UNION ALL
        SELECT ticker, bar_ts, bar_id, false AS policy_allowed
        FROM grammar WHERE bar_id % 21 = 0),
      pol AS (
        SELECT ticker, bar_ts, bar_id, policy_allowed FROM (
          SELECT *, row_number() OVER (PARTITION BY ticker, bar_ts, bar_id
            ORDER BY policy_allowed ASC) AS rn
          FROM pol0) WHERE rn = 1)
      SELECT g.ticker, g.bar_ts, g.bar_id, g.flow_state_code,
             p.policy_allowed IS NOT NULL AS overlay_covered,
             coalesce(p.policy_allowed, true) AS policy_allowed
      FROM grammar g LEFT JOIN pol p USING (ticker, bar_ts, bar_id)
      ORDER BY g.ticker, g.bar_ts, g.bar_id""")) { (s, dir) =>
      val gram = gramBars(s, dir)
        .select("ticker", "bar_ts", "bar_id", "flow_state_code")
      val pol0 = gram.filter(col("bar_id") % 3 === 0)
        .select(col("ticker"), col("bar_ts"), col("bar_id"),
          (col("bar_id") % 5 =!= 0).as("policy_allowed"))
        .unionByName(gram.filter(col("bar_id") % 21 === 0)
          .select(col("ticker"), col("bar_ts"), col("bar_id"),
            lit(false).as("policy_allowed")))
      Overlay.applyPolicy(gram, pol0, Seq("ticker", "bar_ts", "bar_id"))
        .select("ticker", "bar_ts", "bar_id", "flow_state_code",
          "overlay_covered", "policy_allowed")
        .orderBy("ticker", "bar_ts", "bar_id")
    },

    // Overlay dup audit + coverage stats in one result
    Q("q_overlay_coverage", Some(s"""
      WITH RECURSIVE ${MarketData.barsSql},
      ${Indicators.twiggsSql},
      ${EventGrammar.grammarSql},
      pol0 AS (
        SELECT ticker, bar_ts, bar_id, bar_id % 5 <> 0 AS policy_allowed
        FROM grammar WHERE bar_id % 3 = 0
        UNION ALL
        SELECT ticker, bar_ts, bar_id, false AS policy_allowed
        FROM grammar WHERE bar_id % 21 = 0),
      pol AS (
        SELECT ticker, bar_ts, bar_id, policy_allowed FROM (
          SELECT *, row_number() OVER (PARTITION BY ticker, bar_ts, bar_id
            ORDER BY policy_allowed ASC) AS rn
          FROM pol0) WHERE rn = 1),
      ov AS (
        SELECT g.ticker, p.policy_allowed IS NOT NULL AS overlay_covered,
               coalesce(p.policy_allowed, true) AS policy_allowed
        FROM grammar g LEFT JOIN pol p USING (ticker, bar_ts, bar_id)),
      dups AS (SELECT count(*) AS n_dup_keys FROM (
        SELECT ticker, bar_ts, bar_id FROM pol0
        GROUP BY 1, 2, 3 HAVING count(*) > 1)),
      base AS (
        SELECT count(*) AS n_rows,
               count(CASE WHEN overlay_covered THEN 1 END) AS n_covered,
               CAST(count(CASE WHEN overlay_covered THEN 1 END)
                 AS DOUBLE) / count(*) AS coverage_rate,
               CAST(count(CASE WHEN policy_allowed THEN 1 END) AS DOUBLE)
                 / count(*) AS allow_rate,
               (SELECT n_dup_keys FROM dups) AS n_dup_keys
        FROM ov)
      SELECT *,
             ${Overlay.coverageStatusSql("coverage_rate")}
               AS coverage_status
      FROM base""")) { (s, dir) =>
      val gram = gramBars(s, dir)
        .select("ticker", "bar_ts", "bar_id", "flow_state_code")
      val pol0 = gram.filter(col("bar_id") % 3 === 0)
        .select(col("ticker"), col("bar_ts"), col("bar_id"),
          (col("bar_id") % 5 =!= 0).as("policy_allowed"))
        .unionByName(gram.filter(col("bar_id") % 21 === 0)
          .select(col("ticker"), col("bar_ts"), col("bar_id"),
            lit(false).as("policy_allowed")))
      val ov = Overlay.applyPolicy(gram, pol0,
        Seq("ticker", "bar_ts", "bar_id"))
      val nDup = Overlay.dupAudit(pol0, Seq("ticker", "bar_ts", "bar_id"))
        .count()
      Overlay.coverageStats(ov).withColumn("n_dup_keys", lit(nDup))
        // the overlay_coverage_policy gate (Settings-resolved) applied
        // to the measured coverage rate — the nightly-ops grade column
        .withColumn("coverage_status",
          Overlay.coverageStatus(col("coverage_rate")))
    },

    // Execution realism: price/liquidity/vol-cap/warmup gate with
    // volume-unit auto-detect and full reason precedence
    // (ref backtest/execution_realism.py:208-468)
    Q("q_exec_realism", Some(s"""
      WITH ${MarketData.barsSql},
      ${Overlay.realismSql(minDollarVol = G.gateMinDollarVol,
        minPrice = G.gateMinPrice, warmupBars = G.gateWarmupBars,
        maxVolPct = G.gateMaxVolPct)}
      SELECT ticker, bar_ts, bar_id,
             round(dv_med_20, 6) AS dv_med_20,
             round(vol_pct, 9) AS exec_vol_pct,
             exec_reason, exec_allowed
      FROM exec_realism ORDER BY ticker, bar_ts, bar_id""")) { (s, dir) =>
      Overlay.executionRealism(MarketData.barsFromEvents(t(s, dir, "events")),
          minDollarVol = G.gateMinDollarVol, minPrice = G.gateMinPrice,
          warmupBars = G.gateWarmupBars, maxVolPct = G.gateMaxVolPct)
        .select(col("ticker"), col("bar_ts"), col("bar_id"),
          round(col("dv_med_20"), 6).as("dv_med_20"),
          round(col("exec_vol_pct"), 9).as("exec_vol_pct"),
          col("exec_reason"), col("exec_allowed"))
        .orderBy("ticker", "bar_ts", "bar_id")
    },

    // Suppressed-signal reason distribution (ref _reason_table): entry
    // signals killed by the realism gate, per block reason, all five
    // reasons enumerated
    Q("q_exec_reasons", Some(s"""
      WITH RECURSIVE ${MarketData.barsSql},
      ${Indicators.twiggsSql},
      ${EventGrammar.grammarSql},
      ${graft.backtest.Signals.sql("state_entry", 2)},
      ${Overlay.realismSql(minDollarVol = G.gateMinDollarVol,
        minPrice = G.gateMinPrice, warmupBars = G.gateWarmupBars,
        maxVolPct = G.gateMaxVolPct)},
      je AS (
        SELECT s.ticker, s.entry_signal, e.exec_reason, e.exec_allowed
        FROM signals s JOIN exec_realism e USING (ticker, bar_ts, bar_id)),
      reasons(reason) AS (VALUES ('liquidity_floor'), ('multiple_reasons'),
        ('price_floor'), ('vol_cap'), ('warmup')),
      sup AS (
        SELECT exec_reason AS reason, count(*) AS cnt
        FROM je WHERE entry_signal AND NOT exec_allowed GROUP BY 1),
      tot AS (
        SELECT count(*) AS n_rows,
               count(CASE WHEN entry_signal AND NOT exec_allowed
                 THEN 1 END) AS n_sup
        FROM je)
      SELECT r.reason,
             coalesce(s.cnt, 0) AS suppressed_signal_count,
             round(CASE WHEN t.n_sup > 0
               THEN CAST(coalesce(s.cnt, 0) AS DOUBLE) / t.n_sup
               ELSE 0.0 END, 9) AS suppressed_signal_share,
             round(CAST(coalesce(s.cnt, 0) AS DOUBLE) / t.n_rows, 9)
               AS row_share_total
      FROM reasons r LEFT JOIN sup s USING (reason) CROSS JOIN tot t
      ORDER BY r.reason""")) { (s, dir) =>
      val bars = MarketData.barsFromEvents(t(s, dir, "events"))
      val sig = graft.backtest.Signals.generate(gramBars(s, dir),
        "state_entry", 2)
      val er = Overlay.executionRealism(bars, minDollarVol = G.gateMinDollarVol,
        minPrice = G.gateMinPrice, warmupBars = G.gateWarmupBars,
        maxVolPct = G.gateMaxVolPct)
      val je = sig.select(col("ticker"), col("bar_ts"), col("bar_id"),
          col("entry_signal"))
        .join(er.select("ticker", "bar_ts", "bar_id", "exec_reason",
          "exec_allowed"), Seq("ticker", "bar_ts", "bar_id"))
      Overlay.reasonTable(je)
    },

    // M11: hardening policy — ALLOW/WATCH/BLOCK from bootstrap CI signs
    Q("q_cluster_hardening", Some(s"""
      WITH RECURSIVE ${MarketData.barsSql},
      ${Indicators.twiggsSql},
      ${EventGrammar.grammarSql},
      ${ForwardLabels.sql},
      bv AS (
        SELECT g.flow_state_code AS state, f.fwd_ret_10 AS v
        FROM grammar g JOIN fwd f USING (ticker, bar_ts, bar_id)
        WHERE f.fwd_ret_10 IS NOT NULL),
      ${Bootstrap.sql("state", nBoot = 200)}
      SELECT state, n, point_mean, ci_lo, ci_hi,
             CASE WHEN ci_lo > 0 THEN 'LONG'
                  WHEN ci_hi < 0 THEN 'SHORT' ELSE 'NONE' END AS direction,
             CASE WHEN n < 100 THEN 'BLOCK'
                  WHEN ci_lo > 0 OR ci_hi < 0 THEN 'ALLOW'
                  ELSE 'WATCH' END AS hardening_class
      FROM boot ORDER BY state""")) { (s, dir) =>
      val gram = gramBars(s, dir)
      val fwd = Stage.slimFwd(s, dir)
      val keys = Seq("ticker", "bar_ts", "bar_id")
      val bv = gram.select((keys :+ "flow_state_code").map(col): _*)
        .join(fwd.select((keys :+ "fwd_ret_10").map(col): _*), keys)
        .filter(col("fwd_ret_10").isNotNull)
        .select(col("flow_state_code").as("state"),
          col("fwd_ret_10").as("value"))
      Bootstrap.meanCi(bv, "state", "value", nBoot = 200)
        .withColumn("direction",
          when(col("ci_lo") > 0, "LONG")
            .when(col("ci_hi") < 0, "SHORT").otherwise("NONE"))
        .withColumn("hardening_class",
          when(col("n") < 100, "BLOCK")
            .when(col("ci_lo") > 0 || col("ci_hi") < 0, "ALLOW")
            .otherwise("WATCH"))
        .orderBy("state")
    },

    // S10/O3: stacked dataset export — filter, deterministic sample,
    // sort, projection (ref: gold/features_pipeline.py:575-722)
    Q("q_export_dataset", Some(s"""
      WITH RECURSIVE ${MarketData.barsSql},
      ${Indicators.twiggsSql},
      ${EventGrammar.grammarSql}
      SELECT ticker, bar_ts, bar_id, flow_state_code, flow_state_label,
             tmf_event_activity_20
      FROM grammar
      WHERE flow_state_code <> 0
        AND ((bar_id * 2654435761) % 1000000007) < 700000000
      ORDER BY ticker, bar_ts, bar_id""")) { (s, dir) =>
      gramBars(s, dir)
        .filter(col("flow_state_code") =!= 0
          && (col("bar_id") * 2654435761L) % 1000000007L < 700000000L)
        .select("ticker", "bar_ts", "bar_id", "flow_state_code",
          "flow_state_label", "tmf_event_activity_20")
        .orderBy("ticker", "bar_ts", "bar_id")
    },

    // Export metadata sidecar (counts, bounds, distinct keys)
    Q("q_export_meta", Some(s"""
      WITH RECURSIVE ${MarketData.barsSql},
      ${Indicators.twiggsSql},
      ${EventGrammar.grammarSql}
      SELECT count(*) AS n_rows,
             count(DISTINCT ticker) AS n_tickers,
             min(bar_ts) AS min_ts, max(bar_ts) AS max_ts,
             count(DISTINCT flow_state_code) AS n_states
      FROM grammar
      WHERE flow_state_code <> 0
        AND ((bar_id * 2654435761) % 1000000007) < 700000000""")) { (s, dir) =>
      gramBars(s, dir)
        .filter(col("flow_state_code") =!= 0
          && (col("bar_id") * 2654435761L) % 1000000007L < 700000000L)
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("ticker")).as("n_tickers"),
          min("bar_ts").as("min_ts"), max("bar_ts").as("max_ts"),
          countDistinct(col("flow_state_code")).as("n_states"))
    }
  )
}
