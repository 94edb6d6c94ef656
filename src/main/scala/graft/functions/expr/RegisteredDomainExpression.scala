package graft.functions.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Registered-domain (eTLD+1) extraction against the FULL Public Suffix
  * List — the publicsuffix.org algorithm (public data, MPL-2.0; the list
  * ships as a classpath resource, `public_suffix_list.dat`, so swapping
  * in a newer snapshot stays a data change):
  *
  *   1. a rule matches when its labels equal the host's trailing labels
  *      (`*` matches exactly one label at its position);
  *   2. if an EXCEPTION rule (`!`) matches, the public suffix is that
  *      rule minus its leftmost label — exceptions beat everything;
  *   3. otherwise the prevailing rule is the LONGEST match (a wildcard
  *      rule's `*` label counts toward its length, and only matches when
  *      the host actually has that label);
  *   4. no match → the implicit `*` rule (public suffix = last label);
  *   5. registered domain = public suffix + one more label. A host that
  *      IS a public suffix (or a bare single label) passes through
  *      unchanged — the engine routes such rows rather than nulling them
  *      (the UrlNorm contract; the strict spec would say "undefined").
  *
  * Per row the match is O(min(#labels, maxRuleLabels)) hash probes
  * against a JVM-static table built ONCE from the resource (~9.5k rules,
  * max 5 labels) — a narrow no-shuffle map, same scale posture as the
  * rest of UrlNorm. CodegenFallback like the repo's other table-driven
  * expressions; the table is per-JVM static so executors pay the parse
  * once, not per task.
  */
case class RegisteredDomain(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"RegisteredDomain needs a string host, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      RegisteredDomain.registrable(input.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(newChild: Expression): RegisteredDomain =
    copy(child = newChild)
}

object RegisteredDomain {
  // rule-kind bitmask (one key can in principle carry several kinds)
  private final val Normal = 1
  private final val Wildcard = 2 // key is the rule WITHOUT its "*." prefix
  private final val Exception = 4

  /** (rule key → kind bitmask, max labels over any key). Built once per
    * JVM from the classpath resource; both ICANN and PRIVATE sections are
    * loaded (private suffixes like `github.io` bucket by OWNER exactly
    * like ICANN ones for dedup/quota purposes). */
  private lazy val (rules, maxRuleLabels): (java.util.HashMap[String, Integer], Int) = {
    val in = getClass.getResourceAsStream("/public_suffix_list.dat")
    require(in != null, "public_suffix_list.dat missing from the classpath")
    val m = new java.util.HashMap[String, Integer](32768)
    var maxL = 1
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      src.getLines().foreach { raw =>
        val line = raw.trim
        if (line.nonEmpty && !line.startsWith("//")) {
          val (key, kind) =
            if (line.startsWith("!")) (line.substring(1), Exception)
            else if (line.startsWith("*.")) (line.substring(2), Wildcard)
            else (line, Normal)
          val prev: Integer = m.getOrDefault(key, 0)
          m.put(key, prev | kind)
          var l = 1
          var i = 0
          while (i < key.length) { if (key.charAt(i) == '.') l += 1; i += 1 }
          if (l > maxL) maxL = l
        }
      }
    } finally src.close()
    (m, maxL)
  }

  /** The publicsuffix.org match over an already-lowercased, no-trailing-
    * dot host (UrlNorm.host's output contract). */
  private[graft] def registrable(host: String): String = {
    val labels = host.split('.')
    val n = labels.length
    if (n <= 1) return host
    var psNormal = 1 // the implicit "*" rule
    var psException = -1
    var suffix = labels(n - 1)
    var k = 1
    val maxK = math.min(n, maxRuleLabels)
    while (k <= maxK) {
      if (k > 1) suffix = labels(n - k) + "." + suffix
      val kind: Int = rules.getOrDefault(suffix, 0)
      if ((kind & Normal) != 0 && k > psNormal) psNormal = k
      if ((kind & Wildcard) != 0 && n >= k + 1 && k + 1 > psNormal) psNormal = k + 1
      if ((kind & Exception) != 0) psException = k - 1
      k += 1
    }
    val ps = if (psException >= 0) psException else psNormal
    if (n <= ps) host
    else {
      val sb = new java.lang.StringBuilder(host.length)
      var i = n - ps - 1
      while (i < n) {
        if (i > n - ps - 1) sb.append('.')
        sb.append(labels(i))
        i += 1
      }
      sb.toString
    }
  }

  def apply(hostCol: Column): Column =
    GraftBridge.column(RegisteredDomain(GraftBridge.expression(hostCol)))
}
