package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar column combinators — the §2.2 inventory of SURVEY.md as reusable,
  * codegen-friendly `Column` functions (no UDFs).
  *
  * Reference semantics reproduced:
  *  - safeDiv: null (not inf/NaN) when |denominator| <= eps
  *    (ref: src/mf_etl/silver/features_base.py:54-57).
  *  - finiteOrNull: NaN/±Inf normalized to null before any aggregation
  *    (ref: src/mf_etl/research/forward_labels.py:23-38,
  *     src/mf_etl/validation/dataset_adapters.py:111-127). Spark aggregates
  *    otherwise *include* NaN, which silently diverges from the reference.
  */
object Cols {
  val Eps = 1e-12

  /** Null-safe division with epsilon guard: null where |d| <= eps. */
  def safeDiv(n: Column, d: Column, eps: Double = Eps): Column =
    when(abs(d) > eps, n / d)

  /** NaN / ±Inf → null; null passes through as null. */
  def finiteOrNull(c: Column): Column =
    when(!isnan(c) && abs(c) =!= Double.PositiveInfinity, c)

  /** Clamp to [lo, hi] (ref: z-clip ±8, src/mf_etl/research/preprocess.py). */
  def clip(c: Column, lo: Double, hi: Double): Column =
    greatest(least(c, lit(hi)), lit(lo))

  /** Null or blank-string detector (ref: src/mf_etl/validate/rules.py:77-82). */
  def nullOrBlank(c: Column): Column = c.isNull || trim(c) === ""

  // ---- Oracle-stable aggregation patterns -------------------------------
  // Double summation is order-dependent; on a 1000-executor cluster the
  // combine order is nondeterministic run-to-run. Summing through
  // DECIMAL(18,2) is exact and order-independent, then one cast back to
  // double is deterministic. Used for money-like columns so results are
  // bit-stable at any scale / parallelism.

  /** Exact, order-independent sum of a 2-decimal money column. */
  def moneySum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Exact-sum-based mean of a money column (bit-stable). */
  def moneyAvg(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double") / count(c)

  /** Conditional exact sum: SUM(x) FILTER (WHERE pred). */
  def moneySumIf(pred: Column, c: Column): Column =
    sum(when(pred, c.cast("decimal(18,2)"))).cast("double")

  /** Conditional mean over a money column (bit-stable). */
  def moneyAvgIf(pred: Column, c: Column): Column =
    sum(when(pred, c.cast("decimal(18,2)"))).cast("double") /
      count(when(pred, lit(1)))

  /** Count of rows matching a predicate: COUNT(*) FILTER (WHERE pred). */
  def countIf(pred: Column): Column = count(when(pred, lit(1)))

  /** Share of rows matching a predicate (hit rate,
    * ref: src/mf_etl/research/profiles.py:63-65). Long/Long division →
    * double, bit-exact. */
  def hitRate(pred: Column): Column =
    count(when(pred, lit(1))).cast("double") / count(lit(1))
}
