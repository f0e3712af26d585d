package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are contributed by the per-family modules in graft.queries. */
object SparkEntry {

  /** Engine session settings the queries rely on. ANSI must be off: the
    * reference uses non-strict casts and null-on-zero division (SURVEY
    * §1.2); Spark 4 defaults ANSI on. Safe to set at runtime. */
  def tune(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // Kept defensively: the fixture has shipped events.ts as both
    // TIMESTAMP(NANOS) and TIMESTAMP(MICROS). The flag only affects
    // NANOS columns (read as LONG instead of erroring); MICROS columns
    // are untouched. graft.etl.EventTime dispatches on the actual type.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  }

  private val modules: Seq[QueryModule] = Seq(
    Relational, Windows, TextQueries, AnnQueries, DedupQueries,
    MultimodalQueries, TimeSeriesQueries,
    BacktestQueries, IngestQueries, ResearchQueries, MlQueries,
    ValidationQueries, BacktestQueries2, CompareQueries,
    ProductionQueries, CalibrationQueries, HybridQueries, CurationQueries,
    EventQueries, SanityQueries)

  // a def, NOT a lazy val: every module's `all` interpolates live
  // graft.Settings lookups into its oracle SQL, so the registry must be
  // rebuilt per access for a Settings override to reach BOTH the engine
  // plan and the oracle text (the desync-proof contract SettingsSpec
  // locks). Registry construction is pure string/closure assembly —
  // no Spark actions — so the per-access cost is milliseconds.
  private def registry: Seq[Q] = modules.flatMap(_.all)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises scan → broadcast dim join → fact join → agg → window rank. */
  def entry(spark: SparkSession): DataFrame = {
    tune(spark)
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val c = spark.read.parquet(s"$dir/customer.parquet")
    val n = spark.read.parquet(s"$dir/nation.parquet")
    import org.apache.spark.sql.expressions.Window
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("yr"))
      .agg(graft.ops.Cols.moneySum(
        col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .withColumn("rank_in_year", rank().over(
        Window.partitionBy("yr").orderBy(col("revenue").desc)))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { q =>
      q.name -> { (s: SparkSession, dir: String) =>
        tune(s); q.run(s, dir)
      }
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    * Every string passes through [[graft.ops.OracleSql.materializeCtes]]
    * — a row-identical evaluation-strategy pin that keeps the driver's
    * DuckDB compare from re-inlining shared CTE scaffolds (the gate's
    * fixed cost, not the engine's). */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o =>
      q.name -> graft.ops.OracleSql.materializeCtes(o))).toMap

  /** The authored (untransformed) oracle text — spec seam for locking
    * that the post-pass is insertion-only. */
  private[graft] def rawOracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
