package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark program plus (optionally) the exact
  * DuckDB SQL oracle the driver hash-compares against.
  *
  * Oracle-parity conventions (see SURVEY.md §7.5):
  *  - deterministic total row order via non-null sort keys, mirrored in an
  *    ORDER BY in the SQL;
  *  - money-column sums routed through DECIMAL(18,2) on BOTH sides — exact
  *    and order-independent, so results are bit-stable regardless of
  *    partitioning / combine order (critical on a real cluster);
  *  - ratio-of-exact-counts divisions are bit-exact; everything else
  *    floating is `round(..., 6..9)` on both sides;
  *  - timestamps are never emitted raw (precision differs between engines):
  *    emit `CAST(ts AS DATE)` or `epoch µs` instead;
  *  - aliases identical on both sides (driver sorts columns by name).
  */
final case class Q(
    name: String,
    oracle: Option[String])(
    val run: (SparkSession, String) => DataFrame)

trait QueryModule {
  def all: Seq[Q]

  /** Read one driver testdata table (TESTDATA.md). */
  protected def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
