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
case class BpeMergePass(child: Expression, left: String, right: String,
    merged: String = null) extends UnaryExpression with CodegenFallback {

  require(left.nonEmpty && right.nonEmpty, "BPE merge tokens must be non-empty")

  @transient private lazy val l = UTF8String.fromString(left)
  @transient private lazy val r = UTF8String.fromString(right)
  // the merged symbol defaults to plain concatenation (BPE); WordPiece's
  // ##-continuation merges override it (l + r minus the right's ## prefix)
  @transient private lazy val lr =
    UTF8String.fromString(if (merged == null) left + right else merged)

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
  def apply(tokens: Column, left: String, right: String, merged: String): Column =
    GraftBridge.column(
      BpeMergePass(GraftBridge.expression(tokens), left, right, merged))
}

/** Applies a whole trained MERGE TABLE (in training order) to one token
  * array: for each merge, one greedy left-to-right [[BpeMergePass]]-style
  * sweep. A single pass per merge is complete under these semantics —
  * merging produces a strictly longer symbol, so it can never recreate
  * its own (left, right) adjacency — which makes this expression the
  * exact encoder for what [[graft.operators.BpeTrain]] learned (the
  * trainer rewrites the corpus with the same one-pass rule each round).
  *
  * One native expression for the WHOLE table, instead of a chain of
  * `merges.size` nested [[BpeMergePass]] nodes: the chain allocates an
  * intermediate array per row PER MERGE and bloats the plan linearly in
  * vocabulary size; this loops over the table inside one row visit,
  * merging in place in a single reused buffer. Per-row cost is
  * O(merges × tokens) — fine for the symbol-sequence gate fixtures, but
  * corpus tokenization at a production vocab must go through
  * [[graft.operators.BpeEncode.tokenizeCorpus]], which encodes each
  * DISTINCT word once (vocab-scale work) and joins back, never paying
  * this loop per corpus token.
  */
case class BpeApply(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression with CodegenFallback {

  require(merges.nonEmpty, "BPE merge table must be non-empty")
  require(merges.forall { case (l, r) => l.nonEmpty && r.nonEmpty },
    "BPE merge tokens must be non-empty")

  @transient private lazy val table: Array[(UTF8String, UTF8String, UTF8String)] =
    merges.iterator.map { case (l, r) =>
      (UTF8String.fromString(l), UTF8String.fromString(r), UTF8String.fromString(l + r))
    }.toArray

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"BpeApply needs array<string> input, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var n = arr.numElements()
    val buf = new Array[AnyRef](n)
    var i = 0
    while (i < n) { buf(i) = arr.getUTF8String(i); i += 1 }
    var m = 0
    while (m < table.length && n > 1) {
      val (l, r, lr) = table(m)
      // in-place sweep: out <= in at every step, so reads stay ahead of
      // writes and no second buffer is needed
      var in = 0
      var out = 0
      while (in < n) {
        val t = buf(in)
        if (in + 1 < n && t == l && buf(in + 1) == r) {
          buf(out) = lr
          in += 2
        } else {
          buf(out) = t
          in += 1
        }
        out += 1
      }
      n = out
      m += 1
    }
    new GenericArrayData(
      if (n == buf.length) buf else java.util.Arrays.copyOfRange(buf, 0, n))
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApply =
    copy(child = newChild)
}

object BpeApply {
  def apply(tokens: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeApply(GraftBridge.expression(tokens), merges))
}
