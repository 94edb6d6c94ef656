package graft.functions.expr

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair (the ftfy method, public) as a native Catalyst
  * expression — the encoding-damage fixer every web-corpus pipeline
  * runs: UTF-8 text that was once decoded as Latin-1 / Windows-1252
  * shows up as "Ã©" for "é" and "â€™" for "'"; this reverses that
  * damage and ONLY that damage.
  *
  * Algorithm (one pass, iterated to a bounded fixed point for
  * double-encoded damage):
  *
  *  1. map each UTF-16 char back to the byte that would have produced
  *     it under a "sloppy cp1252" decode — codepoints < 0x100 are their
  *     own byte (the Latin-1 identity, which also covers the C1
  *     controls a pure Latin-1 mis-decode leaves), and the 27 printable
  *     Windows-1252 specials (€ ‚ ƒ „ … † ‡ ˆ ‰ Š ‹ Œ Ž ' ' " " • – —
  *     ˜ ™ š › œ ž Ÿ) map to 0x80–0x9F. Any other char means the
  *     string is NOT a mis-decode — return it untouched;
  *  2. STRICTLY decode those bytes as UTF-8 (malformed/unmappable →
  *     REPORT). Failure means the high bytes are legitimate Latin-1
  *     text ("café" stays "café"); success means they were UTF-8
  *     sequences all along — keep the decode;
  *  3. repeat (≤ 3 passes) so double-mojibake ("ÃƒÂ©") unwinds fully.
  *
  * Conservative by construction: pure-ASCII strings short-circuit, and
  * a single stray high byte that does not parse as UTF-8 vetoes the
  * whole string (no partial rewrites — the documented whole-string
  * atomicity; ftfy's segment-wise repair is a superset). Deterministic,
  * total, NULL-propagating. Narrow per-row map riding the scan.
  */
case class FixMojibake(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"FixMojibake needs a string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(FixMojibake.fix(v.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(newChild: Expression): FixMojibake =
    copy(child = newChild)

  override def prettyName: String = "fix_mojibake"
}

object FixMojibake {
  def apply(c: Column): Column =
    GraftBridge.column(FixMojibake(GraftBridge.expression(c)))

  /** Reverse map of the Windows-1252 printable specials at 0x80–0x9F. */
  private val cp1252: Map[Char, Int] = Map(
    '€' -> 0x80, '‚' -> 0x82, 'ƒ' -> 0x83, '„' -> 0x84,
    '…' -> 0x85, '†' -> 0x86, '‡' -> 0x87, 'ˆ' -> 0x88,
    '‰' -> 0x89, 'Š' -> 0x8A, '‹' -> 0x8B, 'Œ' -> 0x8C,
    'Ž' -> 0x8E, '‘' -> 0x91, '’' -> 0x92, '“' -> 0x93,
    '”' -> 0x94, '•' -> 0x95, '–' -> 0x96, '—' -> 0x97,
    '˜' -> 0x98, '™' -> 0x99, 'š' -> 0x9A, '›' -> 0x9B,
    'œ' -> 0x9C, 'ž' -> 0x9E, 'Ÿ' -> 0x9F)

  private[graft] def fix(s: String, maxPasses: Int = 3): String = {
    var cur = s
    var pass = 0
    while (pass < maxPasses) {
      val next = onePass(cur)
      if (next == null) return cur
      cur = next
      pass += 1
    }
    cur
  }

  /** One repair pass; null = no repair applies (ASCII, unmappable char,
    * or the bytes are not valid UTF-8). */
  private def onePass(s: String): String = {
    val bytes = new Array[Byte](s.length)
    var hasHigh = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val b = if (c < 0x100) c.toInt else cp1252.getOrElse(c, -1)
      if (b < 0) return null
      if (b >= 0x80) hasHigh = true
      bytes(i) = b.toByte
      i += 1
    }
    if (!hasHigh) return null
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try dec.decode(ByteBuffer.wrap(bytes)).toString
    catch { case _: CharacterCodingException => null }
  }
}
