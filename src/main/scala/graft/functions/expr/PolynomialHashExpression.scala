package graft.functions.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass polynomial rolling hash: acc ← (acc·31 + byte) mod 1e9+7 over
  * the string's bytes — the document fingerprint `TextAnalysis.rollingHash`
  * computes, as a single tight loop.
  *
  * Exists for the same measured reason as [[HashedWordShingles]]: the HOF
  * formulation (`transform(sequence(1, length), i → ascii(substr(i, 1)))`
  * folded by `aggregate`) re-evaluates its interpreted lambda per
  * CHARACTER with an O(position) substr each time — O(len²) per document,
  * and 16 s of the sf0.1 verify pass against this loop's sub-second.
  *
  * CONTRACT: input must already be ASCII-folded (the rollingHash canon
  * replaces every non-ASCII char with '?'), because this loop reads BYTES
  * while the HOF form reads code points — identical only on ASCII. The
  * guard enforces it instead of silently diverging from the DuckDB
  * oracle on a stray multi-byte char.
  */
case class PolynomialHash(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"PolynomialHash needs string input, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b < 0) throw new IllegalArgumentException(
        "PolynomialHash input must be ASCII-folded first (non-ASCII byte at " +
          s"offset $i) — fold with the rollingHash canon before hashing")
      acc = (acc * 31L + b) % 1000000007L
      i += 1
    }
    acc
  }

  override def prettyName: String = "graft_polynomial_hash"

  override protected def withNewChildInternal(newChild: Expression): PolynomialHash =
    copy(child = newChild)
}

object PolynomialHash {
  def apply(text: Column): Column =
    GraftBridge.column(PolynomialHash(GraftBridge.expression(text)))
}
