package graft.functions.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One greedy left-to-right BPE merge pass: every adjacent (left, right)
  * token pair in the array becomes the single token `left+right`, scanning
  * once and never re-matching a token produced by this same pass (the
  * standard BPE application rule: "a a a" under merge (a,a) → ["aa","a"],
  * not ["aa","aa"-overlap]).
  *
  * Exists as a native expression because the HOF formulation (aggregate
  * with an array accumulator) copies the accumulator array per element —
  * O(len²) allocation per document, the exact trap that cost t4 16 s —
  * while this is one tight loop and one output array per row. Eval-based
  * (CodegenFallback): the per-row work is the loop, not dispatch.
  * `left`/`right` are per-round constants, so each training round plans
  * one new literal-parameterized operator, not a data-dependent join.
  */
case class BpeMergePass(child: Expression, left: String, right: String)
  extends UnaryExpression with CodegenFallback {

  require(left.nonEmpty && right.nonEmpty, "BPE merge tokens must be non-empty")

  @transient private lazy val l = UTF8String.fromString(left)
  @transient private lazy val r = UTF8String.fromString(right)
  @transient private lazy val lr = UTF8String.fromString(left + right)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"BpeMergePass needs array<string> input, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    var o = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (i + 1 < n && t == l && arr.getUTF8String(i + 1) == r) {
        out(o) = lr
        i += 2
      } else {
        out(o) = t
        i += 1
      }
      o += 1
    }
    new GenericArrayData(
      if (o == n) out
      else java.util.Arrays.copyOfRange(out.asInstanceOf[Array[AnyRef]], 0, o))
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergePass =
    copy(child = newChild)
}

object BpeMergePass {
  def apply(tokens: Column, left: String, right: String): Column =
    GraftBridge.column(BpeMergePass(GraftBridge.expression(tokens), left, right))
}
