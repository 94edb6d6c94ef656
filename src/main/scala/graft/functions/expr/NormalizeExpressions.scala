package graft.functions.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) — the corpus-cleaning
  * step that folds decomposed sequences (`e` + U+0301) into their composed
  * forms (`é`) so that dedup fingerprints, token counts, and equality
  * joins don't split on byte-level encoding accidents. Spark has no
  * built-in for this; the JDK's `java.text.Normalizer` implements the
  * same Unicode standard DuckDB's `nfc_normalize` does, which is what
  * lets the query oracle hash-match across engines.
  *
  * Eval-based (CodegenFallback) with an `isNormalized` fast path: real
  * corpora are overwhelmingly already-NFC (all of ASCII is), and the
  * quick check is a scan without allocation — only rows that actually
  * need composing pay the String round-trip.
  */
case class NfcNormalize(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"NfcNormalize needs string input, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) {
      input
    } else {
      UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
  }

  override def prettyName: String = "graft_nfc_normalize"

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def apply(text: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(text)))
}
