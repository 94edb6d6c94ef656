package graft.functions.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** RFC 9309 robots.txt rule matching as a native Catalyst expression —
  * the FULL published pattern language (`*` wildcard, `$` end anchor),
  * upgrading the literal-prefix subset documented on
  * [[graft.functions.RobotsTxt]].
  *
  * Semantics per RFC 9309 §2.2.2 ("The match evaluates the rule's path
  * pattern against the path portion of the URI"):
  *
  *  - a pattern is a PREFIX match unless it ends with `$`;
  *  - `*` matches any sequence of octets, including none and including
  *    `/` (the RFC wildcard is unrestricted — not a glob path segment);
  *  - `$` is special ONLY as the final octet, where it anchors the match
  *    to the end of the path; anywhere else it is a literal;
  *  - matching is on raw octets (we match UTF-8 bytes via the JVM string
  *    code units — identical for the ASCII patterns robots files use).
  *
  * The matcher is the classic greedy glob algorithm: the first
  * `*`-separated segment must sit at position 0, middle segments bind at
  * their LEFTMOST occurrence after the previous one (leftmost is optimal
  * — it leaves maximal room for later segments), and the last segment is
  * either a suffix check (anchored) or one more leftmost find (prefix
  * semantics). O(|path|·|pattern|) worst case, O(|path|) for the common
  * star-free and single-star shapes.
  *
  * Eval-based (CodegenFallback, the JaroWinkler rationale): the per-row
  * work is the matching loop, not expression dispatch. Narrow per-row
  * map, zero shuffle; rule FAN-OUT stays the caller's broadcast join.
  */
case class RobotsMatch(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"RobotsMatch needs (path string, pattern string), got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(path: Any, pattern: Any): Any =
    RobotsMatch.matches(
      path.asInstanceOf[UTF8String].toString,
      pattern.asInstanceOf[UTF8String].toString)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsMatch =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "robots_match"
}

object RobotsMatch {
  def apply(path: Column, pattern: Column): Column =
    GraftBridge.column(RobotsMatch(GraftBridge.expression(path), GraftBridge.expression(pattern)))

  /** Greedy RFC 9309 pattern match. Empty pattern matches everything as
    * a zero-length prefix — callers drop empty rules at parse time per
    * the RFC, so this path never decides a verdict. */
  private[graft] def matches(path: String, pattern: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val p = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    // -1 keeps trailing empty segments: "/tmp*" → ["/tmp", ""]
    val segs = p.split("\\*", -1)
    if (!path.startsWith(segs(0))) return false
    var pos = segs(0).length
    if (segs.length == 1) return !anchored || path.length == pos
    var i = 1
    while (i < segs.length - 1) {
      val idx = path.indexOf(segs(i), pos)
      if (idx < 0) return false
      pos = idx + segs(i).length
      i += 1
    }
    val last = segs(segs.length - 1)
    if (anchored) path.length - last.length >= pos && path.endsWith(last)
    else path.indexOf(last, pos) >= 0
  }
}
