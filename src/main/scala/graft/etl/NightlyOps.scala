package graft.etl

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Nightly Research Ops Pack runner (ref cli.py:5857-6120
  * `ops-nightly-run` / `ops-nightly-sanity` / `ops-ledger-view`, config
  * OpsNightlyConfig): the production entry point that composes the
  * candidate pack, the candidate rerun drift check, and the overlay
  * coverage gate into one run directory plus an append-only ledger CSV.
  *
  * All heavy lifting is the registered query surface (q_candidate_pack /
  * q_candidate_rerun / q_overlay_coverage — each independently
  * oracle-verified); this layer only collects their tiny result frames
  * (≤2 rows each), grades an overall status, and writes artifacts. The
  * caller supplies `asOfTag` so runs are deterministic and replayable.
  */
object NightlyOps {

  /** Coverage policy thresholds (ref config.py:272-277 overlay policy
    * defaults), resolved live through
    * [[graft.Settings.overlayCoverage]]. */
  def MatchRateWarn: Double =
    graft.Settings.overlayCoverage.minMatchRateWarn
  def MatchRateFail: Double =
    graft.Settings.overlayCoverage.minMatchRateFail
  def UnknownRateWarn: Double =
    graft.Settings.overlayCoverage.unknownRateWarn
  def UnknownRateFail: Double =
    graft.Settings.overlayCoverage.unknownRateFail

  /** Ledger location + retention defaults (ref config.py:469-476
    * OpsNightlyConfig), retention via [[graft.Settings.opsNightly]]. */
  val DefaultLedgerRelPath = "ops_ledger/ops_ledger.csv"
  def DefaultKeepLastN: Int = graft.Settings.opsNightly.keepLastN

  case class Result(
    runId: String,
    outputDir: String,
    opsStatus: String,
    coverageStatus: String,
    candidateStatuses: Map[String, String],
    warnings: Seq[String],
    ledgerPath: String)

  private def worst(statuses: Seq[String]): String =
    if (statuses.contains("FAIL")) "FAIL"
    else if (statuses.contains("WARN")) "WARN"
    else "OK"

  private def atomicWrite(path: Path, content: String): Unit = {
    Option(path.getParent).foreach(Files.createDirectories(_))
    val tmp = Paths.get(path.toString + ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** RFC-4180 quoting: a field containing a comma, quote, or newline is
    * wrapped and its quotes doubled — a label or combo id with a comma
    * must not corrupt the row. */
  private def csv(fields: Seq[Any]): String =
    fields.map { f =>
      val s = String.valueOf(f)
      if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    }.mkString(",")

  /** `Files.list`/`Files.walk` hold an open directory handle until
    * closed — leak-free iteration for a long-lived driver. */
  private def withStream[A, B](s: java.util.stream.Stream[A])(
      f: java.util.stream.Stream[A] => B): B =
    try f(s) finally s.close()

  /** Run the nightly ops composition against `sfDir`, writing artifacts
    * under `artifactsRoot`. `coverageMode` is `warn_only` (a failing
    * coverage gate demotes to WARN with a recorded warning) or
    * `strict_fail` (ref --overlay-coverage-mode). */
  def run(spark: SparkSession, sfDir: String, artifactsRoot: String,
      asOfTag: String,
      coverageMode: String =
        graft.Settings.opsNightly.defaultCoverageMode,
      keepLastN: Int = DefaultKeepLastN): Result = {
    require(Seq("warn_only", "strict_fail").contains(coverageMode),
      s"coverageMode must be warn_only or strict_fail, got $coverageMode")
    val queries = graft.SparkEntry.queries
    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]

    // 1. candidate rerun drift (pulls the pack through its shared stage)
    val rerunRows = queries("q_candidate_rerun")(spark, sfDir)
      .orderBy("label").collect()
    if (rerunRows.isEmpty)
      warnings += "empty_candidate_pack: no eligible combos"
    val candStatuses = rerunRows.map { r =>
      r.getAs[String]("label") -> r.getAs[String]("drift_status")
    }.toMap
    val driftOps = candStatuses.values.toSeq.map {
      case "DRIFT_FAIL" => "FAIL"
      case "DRIFT_WARN" => "WARN"
      case _ => "OK"
    }

    // 2. overlay coverage gate
    val cov = queries("q_overlay_coverage")(spark, sfDir).head
    val matchRate = cov.getAs[Double]("coverage_rate")
    val unknownRate = 1.0 - matchRate
    val covRaw =
      if (matchRate < MatchRateFail || unknownRate > UnknownRateFail)
        "FAIL"
      else if (matchRate < MatchRateWarn || unknownRate > UnknownRateWarn)
        "WARN"
      else "OK"
    val coverageStatus =
      if (covRaw == "FAIL" && coverageMode == "warn_only") {
        warnings += f"coverage_fail_demoted_warn_only: match_rate=" +
          f"$matchRate%.4f"
        "WARN"
      } else covRaw

    val opsStatus = worst(driftOps :+ coverageStatus :+
      (if (rerunRows.isEmpty) "FAIL" else "OK"))

    // 3. artifacts
    val runId = s"ops-$asOfTag"
    val outDir = Paths.get(artifactsRoot, "ops_runs",
      s"${runId}_nightly_ops_v1")
    Files.createDirectories(outDir)

    RunArtifacts.writeJson(outDir.resolve("nightly_ops_manifest.json")
      .toString, Map(
      "run_id" -> runId, "as_of_tag" -> asOfTag, "sf_dir" -> sfDir,
      "coverage_mode" -> coverageMode,
      "artifacts" -> Seq("nightly_ops_manifest.json",
        "nightly_ops_summary.json", "nightly_ops_report.csv")))
    RunArtifacts.writeJson(outDir.resolve("nightly_ops_summary.json")
      .toString, Map(
      "run_id" -> runId, "ops_status" -> opsStatus,
      "coverage_status" -> coverageStatus,
      "coverage_match_rate" -> matchRate,
      "coverage_unknown_rate" -> unknownRate,
      "candidate_statuses" -> candStatuses,
      "warnings" -> warnings.toSeq))

    val reportHeader = "candidate_label,combo_id,drift_status," +
      "observed_expectancy,observed_profit_factor,observed_ret_cv," +
      "observed_trades,n_flags,coverage_status"
    val reportLines = rerunRows.map { r =>
      csv(Seq(r.getAs[String]("label"), r.getAs[String]("combo_id"),
        r.getAs[String]("drift_status"),
        Option(r.getAs[Any]("observed_expectancy")).getOrElse(""),
        Option(r.getAs[Any]("observed_profit_factor")).getOrElse(""),
        Option(r.getAs[Any]("observed_ret_cv")).getOrElse(""),
        r.getAs[Long]("observed_trades"), r.getAs[Long]("n_flags"),
        coverageStatus))
    }
    atomicWrite(outDir.resolve("nightly_ops_report.csv"),
      (reportHeader +: reportLines.toSeq).mkString("", "\n", "\n"))

    // 4. ledger append (header created on first write)
    val ledger = Paths.get(artifactsRoot, DefaultLedgerRelPath)
    val ledgerHeader = "built_ts,run_id,ops_status,coverage_status," +
      "candidate_count,n_warnings"
    val row = csv(Seq(asOfTag, runId, opsStatus, coverageStatus,
      rerunRows.length, warnings.length))
    val existing =
      if (Files.exists(ledger)) Files.readString(ledger).stripLineEnd
      else ledgerHeader
    atomicWrite(ledger, existing + "\n" + row + "\n")

    // 5. keep-last-N pruning of ops run dirs (ref --keep-last-n)
    val runsRoot = Paths.get(artifactsRoot, "ops_runs")
    val runDirs = withStream(Files.list(runsRoot)) {
      _.iterator().asScala
        .filter(p => Files.isDirectory(p)
          && p.getFileName.toString.matches("ops-.*_nightly_ops_v1"))
        .toSeq.sortBy(_.getFileName.toString)
    }
    runDirs.dropRight(keepLastN).foreach { dir =>
      withStream(Files.walk(dir)) {
        _.iterator().asScala.toSeq.reverse.foreach(Files.delete(_))
      }
    }

    Result(runId, outDir.toString, opsStatus, coverageStatus,
      candStatuses, warnings.toSeq, ledger.toString)
  }
}
