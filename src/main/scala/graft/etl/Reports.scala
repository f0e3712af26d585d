package graft.etl

import java.nio.file.Paths
import org.apache.spark.sql.{Row, SparkSession}

/** Report builders — the artifact-composition layer over the
  * oracle-verified query surface (ref
  * src/mf_etl/backtest/execution_realism_report.py:1-948 and
  * src/mf_etl/validation/walkforward_reports.py:1-556): markdown + CSV +
  * JSON run reports a research user reads, generated from the SAME
  * registered queries the driver hash-checks, so every number in a
  * report is independently verified. All heavy lifting is the query
  * surface; this layer collects tiny result frames (≤280 rows) and
  * renders them.
  */
object Reports {

  case class ReportResult(outputDir: String, artifacts: Seq[String])

  private def md(header: Seq[String], rows: Seq[Seq[Any]],
      maxRows: Int = 20): String = {
    val shown = rows.take(maxRows)
    val lines = Seq(
      header.mkString("| ", " | ", " |"),
      header.map(_ => "---").mkString("| ", " | ", " |")) ++
      shown.map(_.map(v => if (v == null) "" else v.toString)
        .mkString("| ", " | ", " |"))
    val tail = if (rows.size > maxRows)
      s"\n_…${rows.size - maxRows} more rows in the CSV._" else ""
    lines.mkString("\n") + tail
  }

  /** Exact interpolated median over a small driver-side sample (the
    * same statistic polars' median reports in the reference summary). */
  private def median(xs: Seq[Double]): Option[Double] = {
    val v = xs.sorted
    if (v.isEmpty) None
    else if (v.size % 2 == 1) Some(v(v.size / 2))
    else Some((v(v.size / 2 - 1) + v(v.size / 2)) / 2.0)
  }

  private def cell(r: Row, name: String): Any =
    if (r.isNullAt(r.fieldIndex(name))) null else r.getAs[Any](name)

  private def dbl(r: Row, name: String): Option[Double] =
    Option(cell(r, name)).map(_.asInstanceOf[Double])

  /** Boxed-or-null JSON value from an Option of an AnyVal. */
  private def j[A](o: Option[A]): Any = o.map(x => x: Any).orNull

  /** Execution Realism Calibration Report v1 (ref
    * execution_realism_report.py + _render_calibration_report):
    * threshold-sweep grid CSV, sweep summary + recommendations JSON,
    * and a markdown report with the reason table, top grid rows, and
    * per-profile recommendations. */
  def executionRealismReport(spark: SparkSession, sfDir: String,
      artifactsRoot: String, asOfTag: String): ReportResult = {
    val q = graft.SparkEntry.queries
    val grid = q("q_exec_calibration")(spark, sfDir).collect()
    val reco = q("q_exec_calibration_reco")(spark, sfDir).collect()
    val reasons = q("q_exec_reasons")(spark, sfDir).collect()

    val runId = s"execreal-$asOfTag"
    val outDir = Paths.get(artifactsRoot, "exec_realism_reports",
      s"${runId}_execution_realism_v1")
    val gridHeader = grid.headOption.map(_.schema.fieldNames.toSeq)
      .getOrElse(Seq.empty)
    RunArtifacts.writeCsv(
      outDir.resolve("execution_calibration_grid.csv").toString,
      gridHeader, grid.toSeq.map(r => gridHeader.map(cell(r, _))))

    val eligRates = grid.toSeq.flatMap(dbl(_, "eligibility_rate"))
    val candAfter = grid.toSeq
      .map(_.getAs[Long]("candidate_signals_after").toDouble)
    val summary = Map(
      "combos_total" -> grid.length,
      "eligibility_rate_min" -> j(eligRates.minOption),
      "eligibility_rate_p50" -> j(median(eligRates)),
      "eligibility_rate_max" -> j(eligRates.maxOption),
      "candidate_after_min" -> j(candAfter.minOption.map(_.toLong)),
      "candidate_after_p50" -> j(median(candAfter)),
      "candidate_after_max" -> j(candAfter.maxOption.map(_.toLong)))
    val recoByProfile = reco.toSeq.groupBy(_.getAs[String]("profile"))
      .map { case (p, rows) =>
        val top = rows.minBy(_.getAs[Long]("rnk"))
        p -> Map(
          "recommended_combo" -> top.getAs[String]("combo_id"),
          "min_price" -> cell(top, "min_price"),
          "min_dollar_vol20" -> cell(top, "min_dollar_vol20"),
          "max_vol_pct_input" -> cell(top, "max_vol_pct_input"),
          "min_history_bars" -> cell(top, "min_history_bars"),
          "eligibility_rate" -> cell(top, "eligibility_rate"),
          "selection_tier" -> cell(top, "selection_tier"))
      }
    RunArtifacts.writeJson(
      outDir.resolve("execution_calibration_summary.json").toString,
      Map("run_id" -> runId, "as_of_tag" -> asOfTag, "sf_dir" -> sfDir,
        "sweep_summary" -> summary, "recommendations" -> recoByProfile))

    val reasonHeader = Seq("reason", "suppressed_signal_count",
      "suppressed_signal_share", "row_share_total")
    val topGrid = grid.toSeq
      .sortBy(r => (-dbl(r, "eligibility_rate").getOrElse(-1e9),
        r.getAs[String]("combo_id"))).take(10)
    val recoHeader = Seq("profile", "rnk", "combo_id", "eligibility_rate",
      "candidate_signals_after", "score", "selection_tier")
    val report = s"""# Execution Realism Calibration Report v1
       |
       |## Run
       |- run_id: $runId
       |- input: $sfDir
       |- combos swept: ${grid.length}
       |
       |## Sweep summary
       |${summary.map { case (k, v) => s"- $k: $v" }.mkString("\n")}
       |
       |## Suppression reasons (default profile)
       |${md(reasonHeader,
            reasons.toSeq.map(r => reasonHeader.map(cell(r, _))))}
       |
       |## Top combos by eligibility
       |${md(gridHeader.take(9),
            topGrid.map(r => gridHeader.take(9).map(cell(r, _))))}
       |
       |## Recommendations
       |${md(recoHeader,
            reco.toSeq.map(r => recoHeader.map(cell(r, _))))}
       |""".stripMargin
    RunArtifacts.writeText(
      outDir.resolve("execution_realism_report.md").toString, report)

    ReportResult(outDir.toString, Seq("execution_calibration_grid.csv",
      "execution_calibration_summary.json", "execution_realism_report.md"))
  }

  /** Walk-forward report v1 (ref walkforward_reports.py): per-split
    * CSV, aggregate + consistency JSON, and a markdown report over the
    * oracle-verified q_bt_walk_forward / q_hybrid_wf results. */
  def walkForwardReport(spark: SparkSession, sfDir: String,
      artifactsRoot: String, asOfTag: String): ReportResult = {
    val q = graft.SparkEntry.queries
    val bySplit = q("q_bt_walk_forward")(spark, sfDir)
      .orderBy("split_idx").collect()
    val wfRow = q("q_hybrid_wf")(spark, sfDir).head()

    val runId = s"wf-$asOfTag"
    val outDir = Paths.get(artifactsRoot, "walkforward_reports",
      s"${runId}_walkforward_v1")
    val splitHeader = bySplit.headOption.map(_.schema.fieldNames.toSeq)
      .getOrElse(Seq.empty)
    RunArtifacts.writeCsv(
      outDir.resolve("wf_grid_by_split.csv").toString,
      splitHeader, bySplit.toSeq.map(r => splitHeader.map(cell(r, _))))

    val exps = bySplit.toSeq.flatMap(dbl(_, "expectancy"))
    val totalTrades = bySplit.toSeq.map(_.getAs[Long]("n_trades")).sum
    val positiveShare =
      if (exps.isEmpty) null
      else exps.count(_ > 0).toDouble / exps.size
    val summary = Map(
      "run_id" -> runId, "as_of_tag" -> asOfTag, "sf_dir" -> sfDir,
      "split_count" -> bySplit.length,
      "total_trades" -> totalTrades,
      "mean_expectancy" ->
        (if (exps.isEmpty) null else exps.sum / exps.size),
      "positive_split_share" -> positiveShare,
      "wf_consistency_score" -> cell(wfRow, "wf_consistency_score"),
      "hybrid_wins_expectancy" -> cell(wfRow, "hybrid_wins_expectancy"),
      "avg_delta_expectancy" -> cell(wfRow, "avg_delta_expectancy"))
    RunArtifacts.writeJson(
      outDir.resolve("walkforward_summary.json").toString, summary)

    val consHeader = Seq("source", "comparison", "split_count",
      "hybrid_wins_expectancy", "hybrid_wins_pf", "hybrid_wins_ret_cv",
      "avg_delta_expectancy", "wf_consistency_score")
    val report = s"""# Walk-Forward Report v1
       |
       |## Run
       |- run_id: $runId
       |- input: $sfDir
       |- splits: ${bySplit.length}, total trades: $totalTrades
       |
       |## Per-split results
       |${md(splitHeader,
            bySplit.toSeq.map(r => splitHeader.map(cell(r, _))))}
       |
       |## Hybrid consistency (baseline vs block_veto)
       |${md(consHeader, Seq(consHeader.map(cell(wfRow, _))))}
       |""".stripMargin
    RunArtifacts.writeText(
      outDir.resolve("walkforward_report.md").toString, report)

    ReportResult(outDir.toString, Seq("wf_grid_by_split.csv",
      "walkforward_summary.json", "walkforward_report.md"))
  }

  /** Sensitivity grid report (ref backtest/sensitivity_reports.py:24-98
    * render_grid_report): grid metrics CSV, summary JSON with the best
    * combo + the grid-sanity verdict, and a markdown report sorted by
    * robustness v2. */
  def sensitivityGridReport(spark: SparkSession, sfDir: String,
      artifactsRoot: String, asOfTag: String): ReportResult = {
    val q = graft.SparkEntry.queries
    val grid = q("q_bt_robustness_v2")(spark, sfDir).collect()
    val sanity = q("q_grid_sanity")(spark, sfDir).head()

    val runId = s"grid-$asOfTag"
    val outDir = Paths.get(artifactsRoot, "sensitivity_reports",
      s"${runId}_sensitivity_grid_v1")
    val header = grid.headOption.map(_.schema.fieldNames.toSeq)
      .getOrElse(Seq.empty)
    RunArtifacts.writeCsv(
      outDir.resolve("grid_metrics_table.csv").toString,
      header, grid.toSeq.map(r => header.map(cell(r, _))))

    val ranked = grid.toSeq.sortBy(r =>
      (-dbl(r, "robustness_score_v2").getOrElse(-1e9),
        r.getAs[String]("mode"), r.getAs[Int]("confirm_bars"),
        r.getAs[Int]("hold_bars")))
    val comboLabel = (r: Row) => s"${r.getAs[String]("mode")}_c" +
      s"${r.getAs[Int]("confirm_bars")}_h${r.getAs[Int]("hold_bars")}"
    val summary = Map(
      "run_id" -> runId, "as_of_tag" -> asOfTag, "sf_dir" -> sfDir,
      "combos_total" -> grid.length,
      "zero_trade_combos" ->
        grid.count(_.getAs[Long]("trade_count") == 0L),
      "best_combo" -> j(ranked.headOption.map(comboLabel)),
      "best_robustness_v2" ->
        j(ranked.headOption.flatMap(dbl(_, "robustness_score_v2"))),
      "sanity_status" -> sanity.getAs[String]("status"),
      "non_finite_metric_cells" ->
        sanity.getAs[Long]("non_finite_metric_cells"))
    RunArtifacts.writeJson(
      outDir.resolve("grid_summary.json").toString, summary)

    val report = s"""# Sensitivity Grid Report v1
       |
       |## Run
       |- run_id: $runId
       |- input: $sfDir
       |- combos: ${grid.length}, sanity: ${
            sanity.getAs[String]("status")}
       |
       |## Combos by robustness v2
       |${md(header, ranked.map(r => header.map(cell(r, _))))}
       |""".stripMargin
    RunArtifacts.writeText(
      outDir.resolve("grid_report.md").toString, report)

    ReportResult(outDir.toString, Seq("grid_metrics_table.csv",
      "grid_summary.json", "grid_report.md"))
  }

  /** Production Candidate Pack reports (ref
    * backtest/production_candidates_reports.py:106-128): policy packet
    * JSON, candidates table CSV, summary JSON, markdown report — the
    * reference's exact artifact set over the oracle-verified pack. */
  def productionCandidateReports(spark: SparkSession, sfDir: String,
      artifactsRoot: String, asOfTag: String): ReportResult = {
    val q = graft.SparkEntry.queries
    val pack = q("q_candidate_pack")(spark, sfDir)
      .orderBy("label").collect()

    val runId = s"candidates-$asOfTag"
    val outDir = Paths.get(artifactsRoot, "production_candidates",
      s"${runId}_candidate_pack_v1")
    val header = pack.headOption.map(_.schema.fieldNames.toSeq)
      .getOrElse(Seq.empty)

    val packet = Map(
      "pack_version" -> "v1", "run_id" -> runId,
      "as_of_tag" -> asOfTag, "sf_dir" -> sfDir,
      "candidates" -> pack.toSeq.map(r => Map(
        "label" -> r.getAs[String]("label"),
        "combo_id" -> r.getAs[String]("combo_id"),
        "mode" -> r.getAs[String]("mode"),
        "confirm_bars" -> cell(r, "confirm_bars"),
        "hold_bars" -> cell(r, "hold_bars"),
        "fee_bps" -> cell(r, "fee_bps"),
        "robustness_score_v2" -> cell(r, "robustness_score_v2"))))
    RunArtifacts.writeJson(
      outDir.resolve("production_policy_packet_v1.json").toString, packet)
    RunArtifacts.writeCsv(
      outDir.resolve("production_candidates_table.csv").toString,
      header, pack.toSeq.map(r => header.map(cell(r, _))))
    RunArtifacts.writeJson(
      outDir.resolve("production_candidates_summary.json").toString, Map(
        "run_id" -> runId, "candidate_count" -> pack.length,
        "zero_trade_candidates" ->
          pack.count(_.getAs[Boolean]("zero_trade_combo")),
        "trade_threshold_used" -> j(pack.headOption.map(
          cell(_, "selection_trade_threshold_used")))))
    val report = s"""# Production Candidate Pack v1
       |
       |## Run
       |- run_id: $runId
       |- input: $sfDir
       |- candidates: ${pack.length}
       |
       |## Candidates
       |${md(header, pack.toSeq.map(r => header.map(cell(r, _))))}
       |""".stripMargin
    RunArtifacts.writeText(
      outDir.resolve("production_candidate_pack_report.md").toString,
      report)

    ReportResult(outDir.toString, Seq("production_policy_packet_v1.json",
      "production_candidates_table.csv",
      "production_candidates_summary.json",
      "production_candidate_pack_report.md"))
  }

  /** Candidate re-run reports (ref
    * backtest/candidate_rerun_reports.py:85-111): rerun manifest JSON,
    * candidates table CSV, drift-status summary JSON, markdown report. */
  def candidateRerunReports(spark: SparkSession, sfDir: String,
      artifactsRoot: String, asOfTag: String): ReportResult = {
    val q = graft.SparkEntry.queries
    val rerun = q("q_candidate_rerun")(spark, sfDir)
      .orderBy("label").collect()

    val runId = s"rerun-$asOfTag"
    val outDir = Paths.get(artifactsRoot, "candidate_reruns",
      s"${runId}_candidate_rerun_v1")
    val header = rerun.headOption.map(_.schema.fieldNames.toSeq)
      .getOrElse(Seq.empty)

    RunArtifacts.writeJson(
      outDir.resolve("rerun_manifest.json").toString, Map(
        "run_id" -> runId, "as_of_tag" -> asOfTag, "sf_dir" -> sfDir,
        "candidate_count" -> rerun.length,
        "artifacts" -> Seq("rerun_manifest.json",
          "rerun_candidates_table.csv", "rerun_summary.json",
          "rerun_report.md")))
    RunArtifacts.writeCsv(
      outDir.resolve("rerun_candidates_table.csv").toString,
      header, rerun.toSeq.map(r => header.map(cell(r, _))))
    val statusCounts = rerun.toSeq
      .groupBy(_.getAs[String]("drift_status"))
      .map { case (k, v) => k -> v.size }
    RunArtifacts.writeJson(
      outDir.resolve("rerun_summary.json").toString, Map(
        "run_id" -> runId, "candidate_count" -> rerun.length,
        "drift_status_counts" -> statusCounts,
        "total_flags" -> rerun.toSeq.map(_.getAs[Long]("n_flags")).sum))
    val report = s"""# Candidate Re-run Report v1
       |
       |## Run
       |- run_id: $runId
       |- input: $sfDir
       |- candidates: ${rerun.length}
       |- drift statuses: ${statusCounts.toSeq.sortBy(_._1)
            .map { case (k, v) => s"$k=$v" }.mkString(", ")}
       |
       |## Candidates
       |${md(header, rerun.toSeq.map(r => header.map(cell(r, _))))}
       |""".stripMargin
    RunArtifacts.writeText(
      outDir.resolve("rerun_report.md").toString, report)

    ReportResult(outDir.toString, Seq("rerun_manifest.json",
      "rerun_candidates_table.csv", "rerun_summary.json",
      "rerun_report.md"))
  }

  /** Cluster QA report (ref validation/cluster_qa_reports.py +
    * cluster_qa.py issue accounting): flagged-states CSV, per-state
    * best/worst window diagnostics CSV, issue-count summary JSON, and a
    * markdown report — all from the oracle-verified hardening + QA
    * window queries. */
  def clusterQaReport(spark: SparkSession, sfDir: String,
      artifactsRoot: String, asOfTag: String): ReportResult = {
    val q = graft.SparkEntry.queries
    val states = q("q_cluster_hardening_full")(spark, sfDir)
      .orderBy("state").collect()
    val windows = q("q_qa_state_windows")(spark, sfDir).collect()

    val runId = s"clusterqa-$asOfTag"
    val outDir = Paths.get(artifactsRoot, "cluster_qa_reports",
      s"${runId}_cluster_qa_v1")
    val flagged = states.toSeq
      .filter(_.getAs[String]("qa_labels").nonEmpty)
    val stHeader = states.headOption.map(_.schema.fieldNames.toSeq)
      .getOrElse(Seq.empty)
    RunArtifacts.writeCsv(
      outDir.resolve("cluster_qa_flagged_states.csv").toString,
      stHeader, flagged.map(r => stHeader.map(cell(r, _))))
    val winHeader = windows.headOption.map(_.schema.fieldNames.toSeq)
      .getOrElse(Seq.empty)
    RunArtifacts.writeCsv(
      outDir.resolve("cluster_qa_state_windows.csv").toString,
      winHeader, windows.toSeq.map(r => winHeader.map(cell(r, _))))

    // issue_counts (ref cluster_qa.py:73-85): per-label count over the
    // flagged states' comma-joined label sets
    val issueCounts = flagged
      .flatMap(_.getAs[String]("qa_labels").split(',').filter(_.nonEmpty))
      .groupBy(identity).map { case (k, v) => k -> v.size }
    RunArtifacts.writeJson(
      outDir.resolve("cluster_qa_summary.json").toString, Map(
        "run_id" -> runId, "as_of_tag" -> asOfTag, "sf_dir" -> sfDir,
        "states_total" -> states.length,
        "states_flagged" -> flagged.size,
        "issue_counts" -> issueCounts))

    val flaggedCols = Seq("state", "class_label", "tradability_score",
      "qa_labels", "reasons")
    val report = s"""# Cluster QA Report v1
       |
       |## Run
       |- run_id: $runId
       |- input: $sfDir
       |- states: ${states.length}, flagged: ${flagged.size}
       |
       |## Issue counts
       |${issueCounts.toSeq.sortBy(_._1)
            .map { case (k, v) => s"- $k: $v" }.mkString("\n")}
       |
       |## Flagged states
       |${md(flaggedCols, flagged.map(r => flaggedCols.map(cell(r, _))))}
       |
       |## Best/worst windows per state
       |${md(winHeader,
            windows.toSeq.map(r => winHeader.map(cell(r, _))), 30)}
       |""".stripMargin
    RunArtifacts.writeText(
      outDir.resolve("cluster_qa_report.md").toString, report)

    ReportResult(outDir.toString, Seq("cluster_qa_flagged_states.csv",
      "cluster_qa_state_windows.csv", "cluster_qa_summary.json",
      "cluster_qa_report.md"))
  }

  /** Bronze quality report (ref validate/reports.py:33-138): the
    * per-ticker validity/warning/duplicate rollup as CSV + a corpus
    * summary JSON + markdown. */
  def bronzeQualityReport(spark: SparkSession, sfDir: String,
      artifactsRoot: String, asOfTag: String): ReportResult = {
    val q = graft.SparkEntry.queries
    val rows = q("q_bronze_quality_report")(spark, sfDir).collect()

    val runId = s"bronzeq-$asOfTag"
    val outDir = Paths.get(artifactsRoot, "bronze_quality",
      s"${runId}_bronze_quality_v1")
    val header = rows.headOption.map(_.schema.fieldNames.toSeq)
      .getOrElse(Seq.empty)
    RunArtifacts.writeCsv(
      outDir.resolve("bronze_quality_by_ticker.csv").toString,
      header, rows.toSeq.map(r => header.map(cell(r, _))))
    RunArtifacts.writeJson(
      outDir.resolve("bronze_quality_summary.json").toString, Map(
        "run_id" -> runId, "as_of_tag" -> asOfTag, "sf_dir" -> sfDir,
        "tickers" -> rows.length,
        "rows_total" -> rows.toSeq.map(_.getAs[Long]("rows_total")).sum,
        "rows_invalid" ->
          rows.toSeq.map(_.getAs[Long]("rows_invalid")).sum,
        "warnings_total" ->
          rows.toSeq.map(_.getAs[Long]("warnings_total")).sum))
    val worst = rows.toSeq.sortBy(r =>
      (-r.getAs[Long]("rows_invalid"), r.getAs[String]("ticker")))
    val report = s"""# Bronze Quality Report v1
       |
       |## Run
       |- run_id: $runId
       |- input: $sfDir
       |- tickers: ${rows.length}
       |
       |## Worst tickers by invalid rows
       |${md(header, worst.map(r => header.map(cell(r, _))))}
       |""".stripMargin
    RunArtifacts.writeText(
      outDir.resolve("bronze_quality_report.md").toString, report)

    ReportResult(outDir.toString, Seq("bronze_quality_by_ticker.csv",
      "bronze_quality_summary.json", "bronze_quality_report.md"))
  }
}
