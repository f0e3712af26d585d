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
}
