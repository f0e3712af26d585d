package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftinternal.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash runtime (Rabin-Karp): all k-byte-gram hashes
  * of a text in ONE O(len) pass —
  *
  *   h(i) = ( Σ_{j=0}^{k-1} byte(i+j) · B^{k-1-j} ) mod P
  *
  * advanced per position as h(i+1) = ((h(i) − byte(i)·B^{k-1}) · B +
  * byte(i+k)) mod P. A per-position direct evaluation is O(len·k) — the
  * same shape as the per-position `substr()` trap — and a generic
  * `transform(sequence(...), i -> aggregate(...))` formulation is both
  * O(len·k) AND interpreted; this expression is the reason winnowing
  * fingerprints cost one pass per document.
  *
  * Hashes are over UTF-8 BYTES (the MOSS convention; on the ASCII
  * fixtures byte == code point, which is what makes the DuckDB twin —
  * `unicode()` per char with the same coefficient table — exact).
  * B = 31, P = 1000000007 (the repo's portable-hash prime); every
  * intermediate fits a long: h < P ≈ 2^30, h·B + c < 2^35.
  */
object RollingHashes {
  val Base = 31L
  val Prime = 1000000007L

  /** B^(k-1) mod P — the drop-out coefficient. */
  def topCoef(k: Int): Long = {
    var c = 1L
    var j = 1
    while (j < k) { c = c * Base % Prime; j += 1 }
    c
  }

  /** All k-gram hashes of `text`'s bytes; length max(0, len-k+1). */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val top = topCoef(k)
    val out = new Array[Long](n - k + 1)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * Base + (bytes(i) & 0xff)) % Prime; i += 1 }
    out(0) = h
    i = 1
    while (i <= n - k) {
      h = ((h - (bytes(i - 1) & 0xff) * top % Prime + Prime) % Prime
        * Base + (bytes(i + k - 1) & 0xff)) % Prime
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `rolling_hash(text, k)` → array<long> of every k-gram hash, O(len)
  * (see [[RollingHashes]]). k must be a positive literal — it shapes
  * the plan, not the data. */
case class RollingHash(child: Expression, k: Int)
    extends UnaryExpression {
  require(k > 0, s"rolling_hash k must be positive, got $k")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"rolling_hash requires a string input, got $t")
    }
  override def dataType: DataType = ArrayType(LongType, false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.RollingHashes.compute($s, $k);")

  override protected def withNewChildInternal(newChild: Expression)
      : RollingHash = copy(child = newChild)
}

object RollingHashOps {
  def rollingHash(text: Column, k: Int): Column =
    Bridge.col(RollingHash(Bridge.expr(text), k))
}
