package graft

import java.nio.file.{Files, Paths}
import graft.etl.{NightlyOps, Reports, Sanity}

/** Artifact-level run sanity (ref backtest/sanity.py summarize_backtest_run
  * + sensitivity_sanity.py summarize_grid_run): a healthy run dir
  * summarizes clean, and each corruption class the reference checks for
  * (missing artifact, row-count mismatch, out-of-range rate) is caught. */
class SanitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("jsonField extracts flat string/number fields from our JSON") {
    val payload = """{"run_id": "ops-x", "rate": 0.25, "n": 3,
      "nested": {"a": 1}, "status": "OK"}"""
    assert(Sanity.jsonField(payload, "run_id").contains("ops-x"))
    assert(Sanity.jsonField(payload, "rate").contains("0.25"))
    assert(Sanity.jsonField(payload, "n").contains("3"))
    assert(Sanity.jsonField(payload, "status").contains("OK"))
    assert(Sanity.jsonField(payload, "absent").isEmpty)
  }

  test("a healthy nightly ops run passes; corruptions are caught") {
    val root = Files.createTempDirectory("sanity-ops").toString
    val res = NightlyOps.run(spark, dir, root, asOfTag = "2026-01-02")
    val ok = Sanity.summarizeOpsRun(res.outputDir)
    assert(ok.errors.isEmpty, s"unexpected errors: ${ok.errors}")
    assert(ok.status == "PASS")

    // corruption 1: delete the report CSV → missing_artifact
    val report = Paths.get(res.outputDir, "nightly_ops_report.csv")
    val saved = Files.readString(report)
    Files.delete(report)
    val miss = Sanity.summarizeOpsRun(res.outputDir)
    assert(miss.errors.exists(_.startsWith("missing_artifact")),
      s"got: ${miss.errors}")

    // corruption 2: truncate the CSV → candidate_count_mismatch
    Files.writeString(report,
      saved.split('\n').take(1).mkString("", "\n", "\n"))
    val mismatch = Sanity.summarizeOpsRun(res.outputDir)
    assert(mismatch.errors.contains("candidate_count_mismatch"),
      s"got: ${mismatch.errors}")

    // corruption 3: out-of-range coverage rate in the summary
    val summary = Paths.get(res.outputDir, "nightly_ops_summary.json")
    Files.writeString(summary, Files.readString(summary)
      .replaceAll("\"coverage_match_rate\": [0-9.eE+-]+",
        "\"coverage_match_rate\": 1.7"))
    Files.writeString(report, saved)
    val badRate = Sanity.summarizeOpsRun(res.outputDir)
    assert(badRate.errors.contains("coverage_match_rate_out_of_range"),
      s"got: ${badRate.errors}")
    graft.queries.Stage.clear()
  }

  test("report-run summarizer validates artifact sets and row parity") {
    val root = Files.createTempDirectory("sanity-rep").toString
    val r = Reports.sensitivityGridReport(spark, dir, root, "2026-01-02")
    val ok = Sanity.summarizeReportRun(r,
      csvRowParity = Map("grid_metrics_table.csv" -> 8))
    assert(ok.errors.isEmpty, s"unexpected errors: ${ok.errors}")

    val wrong = Sanity.summarizeReportRun(r,
      csvRowParity = Map("grid_metrics_table.csv" -> 5))
    assert(wrong.errors.exists(_.startsWith("row_count_mismatch")),
      s"got: ${wrong.errors}")

    val missing = Sanity.summarizeReportRun(
      r.copy(artifacts = r.artifacts :+ "not_written.json"))
    assert(missing.errors.contains("missing_artifact:not_written.json"),
      s"got: ${missing.errors}")
  }

  test("pruneRuns keeps the newest N run dirs") {
    val root = Files.createTempDirectory("sanity-prune")
    for (tag <- Seq("a", "b", "c", "d"))
      Files.createDirectories(root.resolve(s"run-${tag}_x_v1"))
    val deleted = Sanity.pruneRuns(root.toString, "run-.*_x_v1",
      keepLastN = 2)
    assert(deleted == Seq("run-a_x_v1", "run-b_x_v1"), deleted.toString)
    val left = Files.list(root).iterator()
    val names = scala.jdk.CollectionConverters
      .IteratorHasAsScala(left).asScala.map(_.getFileName.toString).toSeq
    assert(names.sorted == Seq("run-c_x_v1", "run-d_x_v1"))
  }
}
