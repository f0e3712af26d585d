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
}
