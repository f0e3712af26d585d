package graft.functions

import org.apache.spark.sql.Column
// ORACLE CONTRACT NOTE: the engine warms up on the count of NON-NULL
// inputs (Polars min_samples semantics), while every SQL oracle gates on
// row number (rn >= period). These agree only on null-free series — which
// the bar pipeline guarantees (close/volume are parsed-and-validated
// before indicators run). A null-bearing series would warm up later here
// than in the oracle; that is the engine-correct behavior.
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.graftinternal.Bridge
import org.apache.spark.sql.types._

/** Wilder / exponentially-weighted moving average as a native Catalyst
  * window function (running frame, one ordered pass per partition — no
  * typed-row round trip, executes inside the window exec operator).
  *
  * Semantics match Polars `ewm_mean(alpha, adjust=False, min_samples=m,
  * ignore_nulls=...)` as used by the reference for TMF21/TTI smoothing
  * (ref: src/mf_etl/silver/indicators_twiggs.py:41-44,139-146):
  *   - y_1 = x_1 ; y_t = y_{t-1} + alpha * (x_t - y_{t-1})
  *   - null inputs do not update the smoothed value (it carries through)
  *   - output is null until `minSamples` non-null inputs have been seen.
  *
  * Scale note: this is a running-frame DeclarativeAggregate, so the window
  * operator evaluates it incrementally (O(1) per row); the only shuffle is
  * the partitionBy exchange that any per-key window already requires.
  */
case class WilderEma(child: Expression, alphaExpr: Expression,
    minSamplesExpr: Expression)
  extends AggregateWindowFunction {

  override def children: Seq[Expression] =
    Seq(child, alphaExpr, minSamplesExpr)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val ema = AttributeReference("ema", DoubleType)()
  private lazy val seen = AttributeReference("seen", LongType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(ema, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, DoubleType), Literal(0L))

  private def x: Expression = Cast(child, DoubleType)
  private def a: Expression = Cast(alphaExpr, DoubleType)

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(x), ema,
      If(IsNull(ema), x, Add(ema, Multiply(a, Subtract(x, ema))))),
    If(IsNull(x), seen, Add(seen, Literal(1L)))
  )

  override lazy val evaluateExpression: Expression =
    If(GreaterThanOrEqual(seen, Cast(minSamplesExpr, LongType)),
      ema, Literal.create(null, DoubleType))

  override def prettyName: String = "wilder_ema"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WilderEma =
    copy(child = newChildren(0), alphaExpr = newChildren(1),
      minSamplesExpr = newChildren(2))
}

object WilderEma {
  /** Wilder smoothing with period n: alpha = 1/n, warmup n non-null rows. */
  def wilder(c: Column, n: Int): Column =
    ewm(c, 1.0 / n, n)

  /** Span-style EMA: alpha = 2/(span+1) (ref: ewm_mean(span=5) at
    * src/mf_etl/silver/indicators_twiggs.py:174). */
  def span(c: Column, s: Int, minSamples: Int = 1): Column =
    ewm(c, 2.0 / (s + 1.0), minSamples)

  def ewm(c: Column, alpha: Double, minSamples: Int): Column =
    Bridge.col(WilderEma(Bridge.expr(c), Literal(alpha), Literal(minSamples)))

  /** Build the WindowExpression directly (Spark 4's `Column.over` does not
    * recognize expression-backed custom window functions): partition and
    * ascending order columns; the function supplies its own running frame.
    */
  def over(fn: Column, partition: Seq[Column], order: Seq[Column]): Column = {
    val f = Bridge.expr(fn)
    val spec = WindowSpecDefinition(
      partition.map(Bridge.expr),
      order.map(c => SortOrder(Bridge.expr(c), Ascending)),
      f.asInstanceOf[AggregateWindowFunction].frame)
    Bridge.col(WindowExpression(f, spec))
  }

  def wilderOver(c: Column, n: Int, partition: Seq[Column],
      order: Seq[Column]): Column =
    over(wilder(c, n), partition, order)
}
