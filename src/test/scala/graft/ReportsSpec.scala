package graft

import java.nio.file.{Files, Paths}
import graft.etl.Reports

/** Report-builder composition contract: the artifact set lands, every
  * number comes from the oracle-verified query surface, and the content
  * invariants hold (row counts, value ranges, required sections). */
class ReportsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("execution realism report writes grid CSV, summary JSON, and " +
      "markdown with required sections") {
    val root = Files.createTempDirectory("execrep").toString
    val r = Reports.executionRealismReport(spark, dir, root,
      asOfTag = "2026-01-01")
    assert(r.artifacts.forall(a =>
      Files.exists(Paths.get(r.outputDir, a))), s"missing: ${r.artifacts}")

    val csv = Files.readString(
      Paths.get(r.outputDir, "execution_calibration_grid.csv"))
      .trim.split("\n")
    // 280-combo sweep + header
    assert(csv.length == 281, s"grid rows: ${csv.length - 1}")
    assert(csv.head.startsWith("combo_id,"))

    val json = Files.readString(
      Paths.get(r.outputDir, "execution_calibration_summary.json"))
    assert(json.contains("\"combos_total\": 280"))
    assert(json.contains("\"recommendations\""))
    assert(json.contains("\"lite\"") && json.contains("\"strict\""))

    val mdTxt = Files.readString(
      Paths.get(r.outputDir, "execution_realism_report.md"))
    for (section <- Seq("# Execution Realism Calibration Report v1",
        "## Sweep summary", "## Suppression reasons",
        "## Top combos by eligibility", "## Recommendations"))
      assert(mdTxt.contains(section), s"missing section: $section")
    // the reason table enumerates all five reasons
    for (reason <- Seq("liquidity_floor", "multiple_reasons",
        "price_floor", "vol_cap", "warmup"))
      assert(mdTxt.contains(reason), s"missing reason: $reason")
  }

  test("walk-forward report writes by-split CSV, summary JSON, and " +
      "markdown with consistency section") {
    val root = Files.createTempDirectory("wfrep").toString
    val r = Reports.walkForwardReport(spark, dir, root,
      asOfTag = "2026-01-01")
    assert(r.artifacts.forall(a =>
      Files.exists(Paths.get(r.outputDir, a))), s"missing: ${r.artifacts}")

    val csv = Files.readString(
      Paths.get(r.outputDir, "wf_grid_by_split.csv")).trim.split("\n")
    assert(csv.length == 5, s"expected 4 splits + header: ${csv.length}")

    val json = Files.readString(
      Paths.get(r.outputDir, "walkforward_summary.json"))
    assert(json.contains("\"split_count\": 4"))
    assert(json.contains("\"wf_consistency_score\""))
    // consistency score is clipped to [0, 100]
    val score = "\"wf_consistency_score\": ([0-9.eE+-]+)".r
      .findFirstMatchIn(json).map(_.group(1).toDouble)
    assert(score.exists(s => s >= 0.0 && s <= 100.0), s"score: $score")
    // positive_split_share is a share
    val share = "\"positive_split_share\": ([0-9.eE+-]+)".r
      .findFirstMatchIn(json).map(_.group(1).toDouble)
    assert(share.forall(s => s >= 0.0 && s <= 1.0), s"share: $share")

    val mdTxt = Files.readString(
      Paths.get(r.outputDir, "walkforward_report.md"))
    for (section <- Seq("# Walk-Forward Report v1", "## Per-split results",
        "## Hybrid consistency"))
      assert(mdTxt.contains(section), s"missing section: $section")
    graft.queries.Stage.clear()
  }

  test("sensitivity grid report carries the scored grid + sanity verdict") {
    val root = Files.createTempDirectory("gridrep").toString
    val r = Reports.sensitivityGridReport(spark, dir, root, "2026-01-01")
    assert(r.artifacts.forall(a =>
      Files.exists(Paths.get(r.outputDir, a))), s"missing: ${r.artifacts}")
    val csv = Files.readString(
      Paths.get(r.outputDir, "grid_metrics_table.csv")).trim.split("\n")
    assert(csv.length == 9, s"expected 8 combos + header: ${csv.length}")
    val json = Files.readString(
      Paths.get(r.outputDir, "grid_summary.json"))
    assert(json.contains("\"combos_total\": 8"))
    assert(json.contains("\"sanity_status\": \"PASS\""))
    assert(json.contains("\"best_combo\""))
    val mdTxt = Files.readString(Paths.get(r.outputDir, "grid_report.md"))
    assert(mdTxt.contains("## Combos by robustness v2"))
  }

  test("production candidate pack reports write the reference artifact " +
      "set") {
    val root = Files.createTempDirectory("candrep").toString
    val r = Reports.productionCandidateReports(spark, dir, root,
      "2026-01-01")
    assert(r.artifacts == Seq("production_policy_packet_v1.json",
      "production_candidates_table.csv",
      "production_candidates_summary.json",
      "production_candidate_pack_report.md"))
    assert(r.artifacts.forall(a =>
      Files.exists(Paths.get(r.outputDir, a))), s"missing: ${r.artifacts}")
    val packet = Files.readString(
      Paths.get(r.outputDir, "production_policy_packet_v1.json"))
    assert(packet.contains("\"pack_version\": \"v1\""))
    assert(packet.contains("\"candidates\""))
    // packet candidate count == CSV rows
    val csv = Files.readString(
      Paths.get(r.outputDir, "production_candidates_table.csv"))
      .trim.split("\n")
    val labels = "\"label\":".r.findAllIn(packet).size
    assert(csv.length - 1 == labels,
      s"csv rows ${csv.length - 1} != packet candidates $labels")
  }

  test("candidate rerun reports summarize drift statuses consistently") {
    val root = Files.createTempDirectory("rerunrep").toString
    val r = Reports.candidateRerunReports(spark, dir, root, "2026-01-01")
    assert(r.artifacts.forall(a =>
      Files.exists(Paths.get(r.outputDir, a))), s"missing: ${r.artifacts}")
    val csv = Files.readString(
      Paths.get(r.outputDir, "rerun_candidates_table.csv"))
      .trim.split("\n")
    val json = Files.readString(
      Paths.get(r.outputDir, "rerun_summary.json"))
    val n = "\"candidate_count\": (\\d+)".r
      .findFirstMatchIn(json).map(_.group(1).toInt)
    assert(n.contains(csv.length - 1),
      s"summary count $n != csv rows ${csv.length - 1}")
    // status counts sum to candidate_count
    val counts = "\"DRIFT_[A-Z]+\": (\\d+)|\"OK\": (\\d+)".r
      .findAllMatchIn(json)
      .map(m => Option(m.group(1)).orElse(Option(m.group(2))).get.toInt)
      .sum
    assert(counts == n.get, s"status counts $counts != ${n.get}")
  }

  test("cluster QA report: flagged states subset + issue counts + " +
      "windows table") {
    val root = Files.createTempDirectory("qarep").toString
    val r = Reports.clusterQaReport(spark, dir, root, "2026-01-01")
    assert(r.artifacts.forall(a =>
      Files.exists(Paths.get(r.outputDir, a))), s"missing: ${r.artifacts}")
    val json = Files.readString(
      Paths.get(r.outputDir, "cluster_qa_summary.json"))
    val total = "\"states_total\": (\\d+)".r
      .findFirstMatchIn(json).map(_.group(1).toInt).get
    val flagged = "\"states_flagged\": (\\d+)".r
      .findFirstMatchIn(json).map(_.group(1).toInt).get
    assert(flagged <= total && total > 0)
    val winCsv = Files.readString(
      Paths.get(r.outputDir, "cluster_qa_state_windows.csv"))
      .trim.split("\n")
    // ≤ 6 window rows (3 worst + 3 best) per state
    assert(winCsv.length - 1 <= total * 6)
    assert(winCsv.head.contains("window_kind"))
    graft.queries.Stage.clear()
  }

  test("bronze quality report totals match the per-ticker table") {
    val root = Files.createTempDirectory("bqrep").toString
    val r = Reports.bronzeQualityReport(spark, dir, root, "2026-01-01")
    assert(r.artifacts.forall(a =>
      Files.exists(Paths.get(r.outputDir, a))), s"missing: ${r.artifacts}")
    val csv = Files.readString(
      Paths.get(r.outputDir, "bronze_quality_by_ticker.csv"))
      .trim.split("\n")
    val json = Files.readString(
      Paths.get(r.outputDir, "bronze_quality_summary.json"))
    val tickers = "\"tickers\": (\\d+)".r
      .findFirstMatchIn(json).map(_.group(1).toInt)
    assert(tickers.contains(csv.length - 1))
    // rows_total in summary == sum of the CSV rows_total column
    val idx = csv.head.split(",").indexOf("rows_total")
    val csvSum = csv.tail.map(_.split(",")(idx).toLong).sum
    val jsonTotal = "\"rows_total\": (\\d+)".r
      .findFirstMatchIn(json).map(_.group(1).toLong)
    assert(jsonTotal.contains(csvSum), s"$jsonTotal != $csvSum")
  }
}
