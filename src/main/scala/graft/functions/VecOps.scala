package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftinternal.Bridge
import org.apache.spark.sql.types._

/** Native vector fold expressions for the embedding-similarity hot path.
  *
  * The ANN family originally scored pairs through interpreted
  * higher-order functions (`aggregate(zip_with(a, b, (x,y) => x*y), …)`)
  * — no codegen, one closure call per element per pair. These
  * expressions run the same index-ordered fold as a tight generated
  * loop inside whole-stage codegen (and a `while` loop in interpreted
  * eval), with HOF-identical semantics so every oracle stays bit-exact:
  * sequential left-to-right accumulation from 0.0, null result when the
  * inputs differ in length (zip_with would null-pad) or any element is
  * null.
  */
abstract class VecFold extends BinaryExpression {

  /** Per-element contribution, e.g. x*y for dot. */
  protected def combine(x: Double, y: Double): Double
  /** Java source of the contribution over element vars `x`/`y`. */
  protected def combineJava(x: String, y: String): String

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"$prettyName requires array<double> inputs, got $l / $r")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc = acc + combine(x.getDouble(i), y.getDouble(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        final int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) {
              ${ev.isNull} = true;
              break;
            }
            final double $x = $a.getDouble($i);
            final double $y = $b.getDouble($i);
            $acc += ${combineJava(x, y)};
          }
          if (!${ev.isNull}) {
            ${ev.value} = $acc;
          }
        }
      """
    })
}

/** Σ aᵢ·bᵢ — the cosine numerator. */
case class VecDot(left: Expression, right: Expression) extends VecFold {
  override protected def combine(x: Double, y: Double): Double = x * y
  override protected def combineJava(x: String, y: String): String =
    s"$x * $y"
  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDot = copy(newLeft, newRight)
}

/** Σ (aᵢ−bᵢ)² — squared Euclidean distance (IVF probe, centroid
  * assignment). */
case class VecSqDist(left: Expression, right: Expression) extends VecFold {
  override protected def combine(x: Double, y: Double): Double =
    (x - y) * (x - y)
  override protected def combineJava(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override def prettyName: String = "vec_sqdist"
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecSqDist = copy(newLeft, newRight)
}

/** Exact-decimal fold runtime shared by interpreted eval and generated
  * code (top-level object → static forwarders, callable from codegen).
  *
  * `sqDist18` is BIT-IDENTICAL to the repo's interpreted HOF
  * formulation `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)),
  * 0 as decimal(32,18), (acc,t) => (acc + cast(t as
  * decimal(24,18))).cast(decimal(32,18))).cast(double)`:
  *  - each term rounds to scale 18 via the canonical-string BigDecimal
  *    of the double (exactly Spark's double→decimal cast) with
  *    HALF_UP;
  *  - a term with ≥ 7 integer digits (≥ 10^6) overflows the (24,18)
  *    cast → null, as does NaN/±Inf, a null element, or a length
  *    mismatch (zip_with would null-pad);
  *  - accumulation is exact; the result is BigDecimal.doubleValue
  *    (= Decimal.toDouble).
  */
object VecDecimal {
  def sqDist18(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      val dd = d * d
      if (!(dd < 1e6)) return null // NaN / Inf / (24,18) overflow
      acc = acc.add(new java.math.BigDecimal(
          java.lang.Double.toString(dd))
        .setScale(18, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    java.lang.Double.valueOf(acc.doubleValue)
  }

  /** [[sqDist18]] over plain JVM arrays (boxed side may carry nulls —
    * the RDD twin of an `array<double>` column with containsNull) —
    * same null/overflow contract as the ArrayData form. Used by the
    * driver-iterated fit loops (LloydKmeans) whose per-round math must
    * stay bit-identical to the column program. */
  def sqDist18(x: Array[java.lang.Double], y: Array[Double])
      : java.lang.Double = {
    if (x == null || y == null || x.length != y.length) return null
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < x.length) {
      if (x(i) == null) return null
      val d = x(i).doubleValue - y(i)
      val dd = d * d
      if (!(dd < 1e6)) return null // NaN / Inf / (24,18) overflow
      acc = acc.add(new java.math.BigDecimal(
          java.lang.Double.toString(dd))
        .setScale(18, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    java.lang.Double.valueOf(acc.doubleValue)
  }

  /** JVM twin of Spark's `CAST(double AS DECIMAL(38,18))`: canonical
    * Double.toString → BigDecimal, setScale(18, HALF_UP), null on
    * NaN/Inf or precision overflow (> 38 digits) — exactly
    * Cast.changePrecision under ANSI off. */
  def dec18(d: Double): java.math.BigDecimal = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
      return null
    val b = new java.math.BigDecimal(java.lang.Double.toString(d))
      .setScale(18, java.math.RoundingMode.HALF_UP)
    if (b.precision > 38) null else b
  }

  /** JVM twin of Spark's `round(double, scale)` (RoundBase, HALF_UP):
    * NaN/Inf pass through, otherwise decimal-string BigDecimal setScale
    * — the tiebreak/emit rounding the fit loops share with the column
    * program. */
  def roundD(d: Double, scale: Int): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else new java.math.BigDecimal(java.lang.Double.toString(d))
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue
}

/** Exact scale-18 Σ (aᵢ−bᵢ)² as a native expression — the PQ/Lloyd
  * encode hot path (one tight JIT loop instead of an interpreted HOF
  * chain; see [[VecDecimal.sqDist18]] for the bit-parity contract). */
case class VecSqDist18(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"vec_sqdist18 requires array<double> inputs, got $l / $r")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sqdist18"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDecimal.sqDist18(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
        java.lang.Double $r =
          graft.functions.VecDecimal.sqDist18($a, $b);
        if ($r == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $r.doubleValue();
        }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecSqDist18 = copy(newLeft, newRight)
}

object VecOps {
  def dot(a: Column, b: Column): Column =
    Bridge.col(VecDot(Bridge.expr(a), Bridge.expr(b)))

  def sqDist(a: Column, b: Column): Column =
    Bridge.col(VecSqDist(Bridge.expr(a), Bridge.expr(b)))

  def sqDist18(a: Column, b: Column): Column =
    Bridge.col(VecSqDist18(Bridge.expr(a), Bridge.expr(b)))
}
