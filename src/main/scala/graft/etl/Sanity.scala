package graft.etl

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Run-directory sanity summarizers — the artifact-level half of the
  * reference's sanity modules (ref backtest/sanity.py:28-156
  * `summarize_backtest_run`, backtest/sensitivity_sanity.py:41-200
  * `summarize_grid_run`, validation/sanity.py:30-83): required artifacts
  * exist, payload fields parse and sit in range, and cross-artifact row
  * counts agree. The DATA invariants live in the oracle-checked
  * q_bt_sanity / q_grid_sanity / q_sanity_gold_audit queries; this layer
  * validates the files a run leaves behind, so it is deliberately plain
  * driver-side IO (the artifacts are tiny sidecars).
  */
object Sanity {

  case class RunSummary(runDir: String, errors: Seq[String],
      warnings: Seq[String]) {
    def status: String = if (errors.nonEmpty) "FAIL" else "PASS"
  }

  private def requireFile(dir: Path, name: String,
      errors: scala.collection.mutable.Buffer[String]): Option[String] =
    if (Files.isRegularFile(dir.resolve(name)))
      Some(Files.readString(dir.resolve(name)))
    else { errors += s"missing_artifact:$name"; None }

  /** Extract a scalar JSON field written by RunArtifacts.render (flat
    * string/number/bool values only — exactly what our writers emit). */
  private[graft] def jsonField(payload: String, key: String):
      Option[String] = {
    val r = ("\"" + java.util.regex.Pattern.quote(key) +
      "\":\\s*(\"(?:[^\"\\\\]|\\\\.)*\"|[^,}\\]]+)").r
    r.findFirstMatchIn(payload).map(_.group(1).trim).map { v =>
      if (v.startsWith("\"")) v.substring(1, v.length - 1) else v
    }
  }

  private def rate01(payload: String, key: String, label: String,
      errors: scala.collection.mutable.Buffer[String]): Unit =
    jsonField(payload, key) match {
      case None => errors += s"${label}_missing"
      case Some(v) => v.toDoubleOption match {
        case Some(d) if d >= 0.0 && d <= 1.0 => ()
        case _ => errors += s"${label}_out_of_range"
      }
    }

  private def csvRowCount(content: String): Int =
    content.split('\n').count(_.nonEmpty) - 1 // minus header

  /** Validate one NightlyOps run dir (the engine's backtest-ops run
    * analogue of `summarize_backtest_run`): required artifact set,
    * status vocabulary, coverage rates in [0,1], and report-CSV row
    * parity against the summary's candidate statuses. */
  def summarizeOpsRun(runDir: String): RunSummary = {
    val dir = Paths.get(runDir)
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]

    val manifest = requireFile(dir, "nightly_ops_manifest.json", errors)
    val summary = requireFile(dir, "nightly_ops_summary.json", errors)
    val report = requireFile(dir, "nightly_ops_report.csv", errors)

    manifest.foreach { m =>
      if (jsonField(m, "run_id").isEmpty) errors += "manifest_run_id_missing"
    }
    summary.foreach { s =>
      jsonField(s, "ops_status") match {
        case Some(st) if Seq("OK", "WARN", "FAIL").contains(st) =>
          if (st == "WARN") warnings += "ops_status_warn"
          if (st == "FAIL") errors += "ops_status_fail"
        case Some(other) => errors += s"ops_status_invalid:$other"
        case None => errors += "ops_status_missing"
      }
      rate01(s, "coverage_match_rate", "coverage_match_rate", errors)
      rate01(s, "coverage_unknown_rate", "coverage_unknown_rate", errors)
      report.foreach { c =>
        // candidate_statuses renders as {"label": "STATUS", ...} — count
        // its entries and demand CSV parity (ref trade_count_mismatch)
        val inner = "\"candidate_statuses\":\\s*\\{([^}]*)\\}".r
          .findFirstMatchIn(s).map(_.group(1)).getOrElse("")
        val n = if (inner.trim.isEmpty) 0 else inner.count(_ == ':')
        if (csvRowCount(c) != n) errors += "candidate_count_mismatch"
      }
    }
    RunSummary(runDir, errors.toSeq, warnings.toSeq)
  }

  /** Validate a report dir produced by one of the `Reports` builders
    * (the `summarize_grid_run` analogue, generalized): every artifact
    * the builder declared must exist and be non-empty, every declared
    * CSV must carry at least a header, and an expected row count can be
    * asserted against a named CSV. */
  def summarizeReportRun(result: Reports.ReportResult,
      csvRowParity: Map[String, Int] = Map.empty): RunSummary = {
    val dir = Paths.get(result.outputDir)
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]
    result.artifacts.foreach { name =>
      requireFile(dir, name, errors).foreach { content =>
        if (content.isEmpty) errors += s"empty_artifact:$name"
        else if (name.endsWith(".csv") && csvRowCount(content) < 0)
          errors += s"headerless_csv:$name"
      }
    }
    csvRowParity.foreach { case (name, expected) =>
      requireFile(dir, name, errors).foreach { content =>
        val n = csvRowCount(content)
        if (n != expected)
          errors += s"row_count_mismatch:$name:$n!=$expected"
      }
    }
    RunSummary(result.outputDir, errors.toSeq, warnings.toSeq)
  }

  /** Prune run dirs beyond keep-last-N (shared helper; ref
    * sensitivity runner --keep-last-n). Returns deleted dir names. */
  def pruneRuns(root: String, pattern: String, keepLastN: Int):
      Seq[String] = {
    val rootPath = Paths.get(root)
    if (!Files.isDirectory(rootPath)) return Seq.empty
    val dirs = {
      val s = Files.list(rootPath)
      try s.iterator().asScala
        .filter(p => Files.isDirectory(p)
          && p.getFileName.toString.matches(pattern))
        .toSeq.sortBy(_.getFileName.toString)
      finally s.close()
    }
    dirs.dropRight(keepLastN).map { d =>
      val w = Files.walk(d)
      try w.iterator().asScala.toSeq.reverse.foreach(Files.delete(_))
      finally w.close()
      d.getFileName.toString
    }
  }
}
