package graft

import org.apache.spark.sql.SparkSession

/** Plan-shape inspector: prints formatted physical plans for selected
  * queries so scan pruning, pushed filters, join strategies, and exchange
  * counts can be audited (the 100 TB design review loop). Usage:
  *   runMain graft.Plans [queryName ...]   (default: a representative set)
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_scan_project", "q_join_enrich", "q_silver_base",
        "q_agg_stats", "q_d_minhash")
    val qs = SparkEntry.queries
    for (n <- names) {
      println(s"\n================ $n ================")
      val df = qs(n)(spark, dir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange (?!SinglePartition)".r
        .findAllIn(plan).length
      println(s"[plans] $n: ${exchanges} non-single-partition exchanges")
    }
    spark.stop()
  }
}
