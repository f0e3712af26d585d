package graft

import java.nio.file.{Files, Paths}
import graft.etl.NightlyOps

/** Nightly-ops composition contract: artifacts land in the run
  * directory, the ledger appends one row per run, keep-last-N prunes
  * old run dirs, and statuses come from the oracle-verified query
  * surface. */
class NightlyOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("nightly ops writes artifacts, appends ledger, prunes old runs") {
    val root = Files.createTempDirectory("opsroot").toString

    val r1 = NightlyOps.run(spark, dir, root, asOfTag = "2026-01-01",
      coverageMode = "warn_only", keepLastN = 1)
    assert(Set("OK", "WARN", "FAIL").contains(r1.opsStatus))
    assert(Files.exists(Paths.get(r1.outputDir,
      "nightly_ops_manifest.json")))
    assert(Files.exists(Paths.get(r1.outputDir,
      "nightly_ops_summary.json")))
    assert(Files.exists(Paths.get(r1.outputDir, "nightly_ops_report.csv")))
    val ledger1 = Files.readString(Paths.get(r1.ledgerPath)).trim
      .split("\n")
    assert(ledger1.length == 2 && ledger1.head.startsWith("built_ts,"))

    // the sf0.001 overlay fixture covers ~33% of rows → coverage gate
    // fails raw; warn_only must demote it to WARN and record why
    assert(r1.coverageStatus == "WARN")
    assert(r1.warnings.exists(_.startsWith("coverage_fail_demoted")))
    val strict = NightlyOps.run(spark, dir, root, asOfTag = "2026-01-02",
      coverageMode = "strict_fail", keepLastN = 1)
    assert(strict.coverageStatus == "FAIL" && strict.opsStatus == "FAIL")

    // ledger appended; keepLastN=1 leaves only the newest run dir
    val ledger2 = Files.readString(Paths.get(strict.ledgerPath)).trim
      .split("\n")
    assert(ledger2.length == 3)
    val runDirs = Files.list(Paths.get(root, "ops_runs")).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]
    while (runDirs.hasNext) names += runDirs.next().getFileName.toString
    assert(names.toSeq == Seq("ops-2026-01-02_nightly_ops_v1"))

    // candidate statuses come straight from the rerun query surface
    assert(r1.candidateStatuses.keySet.subsetOf(
      Set("CANDIDATE_ALPHA", "CANDIDATE_EXEC")))
    r1.candidateStatuses.values.foreach(s =>
      assert(Set("OK", "DRIFT_WARN", "DRIFT_FAIL").contains(s)))
  }
}
