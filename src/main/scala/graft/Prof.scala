package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main: time named queries (args) individually with
  * the same session shape as Bench. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries
    // `--profile-out <path>`: regenerate bench_profile.json — prewarm
    // the shared stages, then time EVERY registered query three times
    // in this one JVM and record min(rep2, rep3) (true steady: JIT and
    // stage builds land in rep1). Run this in the same clean window as
    // the committed bench (the r9 verdict's profile-staleness item).
    if (args.length == 1 && args(0) == "--warmup-only") {
      // time ONLY the shared-stage prewarm (per-build wall times print
      // with GRAFT_WARMUP_TIMES=1) — the warmup-cost feedback loop
      val t0 = System.nanoTime()
      val rep = graft.queries.Warmup.prewarm(spark, sfDir)
      rep.phases.foreach { case (n, s) => println(f"[prof] $n $s%.2f s") }
      println(f"[prof] warmup total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    } else if (args.length == 2 && args(0) == "--profile-out") {
      try graft.queries.Warmup.prewarm(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[prof] prewarm failed: ${e.getMessage}") }
      def once(n: String): Double = {
        val t0 = System.nanoTime()
        try qs(n)(spark, sfDir).count()
        catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      val steady = qs.keys.toSeq.sorted.map { n =>
        once(n)
        val s = math.min(once(n), once(n))
        println(f"[prof] $n steady $s%.3f s")
        n -> s
      }
      def r3(v: Double) = math.round(v * 1000) / 1000.0
      val json = steady.map { case (n, s) => s""""$n":${r3(s)}""" }
        .mkString("{", ",", "}")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(args(1)), json)
      println(s"[prof] wrote ${steady.size} steady times to ${args(1)}")
    } else {
      for (n <- args; rep <- 1 to 3) {
        val t0 = System.nanoTime()
        val c = qs(n)(spark, sfDir).count()
        println(f"[prof] $n rep$rep rows=$c ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    graft.queries.Stage.clear()
    spark.stop()
  }
}
