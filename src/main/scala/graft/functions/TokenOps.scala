package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftinternal.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native marker-membership counter for the text-quality hot path.
  *
  * The quality/lang-ID battery originally counted marker tokens through
  * an interpreted higher-order function (`size(filter(toks,
  * t => t.isin(markers)))`) — `ArrayFilter` has no codegen, so every
  * document paid one closure call per token per marker family (6
  * families: stopwords + 5 languages). This expression runs the same
  * count as a generated loop over a broadcast-shared hash set inside
  * whole-stage codegen.
  *
  * Semantics match the HOF form for NON-NULL arrays (null elements
  * never match; duplicates count). A null array yields NULL — the
  * oracle/DuckDB semantics — intentionally diverging from the legacy
  * `size(filter(null, ...))` = -1 under spark.sql.legacy.sizeOfNull
  * (TokenOpsSpec documents this divergence).
  */
case class MarkerCount(child: Expression, markers: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got $other")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "marker_count"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](markers.size * 2)
    markers.foreach(m => s.add(UTF8String.fromString(m)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // the marker set is a per-plan reference object — built once on
      // the driver, shipped with the serialized plan, shared by every
      // row the generated loop scans
      val setTerm = ctx.addReferenceObj("markerSet", set,
        "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("cnt")
      s"""
        final int $n = $a.numElements();
        int $c = 0;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i) && $setTerm.contains($a.getUTF8String($i))) {
            $c++;
          }
        }
        ${ev.value} = $c;
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): MarkerCount = copy(child = newChild)
}

object TokenOps {
  /** Count of array elements contained in `markers` (codegen'd). */
  def markerCount(tokens: Column, markers: Seq[String]): Column =
    Bridge.col(MarkerCount(Bridge.expr(tokens), markers))
}
