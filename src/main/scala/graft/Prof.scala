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
    for (n <- args; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val c = qs(n)(spark, sfDir).count()
      println(f"[prof] $n rep$rep rows=$c ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
