package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Catalyst optimizer rule: rewrite a pure range join — point-in-interval
  * OR interval-overlap theta join, no equi predicate — into the bucketed
  * equi-join plans that [[graft.operators.RangeJoin]] builds by hand — so
  * the optimization also reaches joins written DIRECTLY against the
  * DataFrame or SQL API, where Spark would otherwise plan
  * BroadcastNestedLoopJoin: O(|P|·|I|) pair evaluation, and a broadcast
  * (or worse, cartesian) that dies once neither side is small.
  *
  * Fires on `Join(Inner, cond)` where cond's conjuncts contain a lower and
  * an upper bound comparing the SAME numeric point expression from one
  * side against bound expressions from the other, and NO equi conjunct
  * (if one exists, Spark already hash-joins on it and the explode would
  * only add rows). The rewrite:
  *
  *   points   → Project  [+ __bucket = floor(p / w)]
  *   intervals→ Generate [explode(sequence(floor(lo/w), floor(hi/w)))]
  *   join on  __bucket = __bucket AND <original condition verbatim>
  *   Project back to the original output — same schema, same rows.
  *
  * Each point lands in exactly ONE bucket, so no dedup pass is needed;
  * intervals ship one row per overlapped bucket (the aligned-end bucket is
  * kept deliberately — see RangeJoin.bucketSpans on the floating-point
  * boundary case; spurious pairs die in the exact predicate). Strict vs
  * non-strict bounds all bucket identically: p > lo ⇒ bucket(p) ≥
  * bucket(lo) and p < hi ⇒ bucket(p) ≤ bucket(hi), and the original
  * condition re-checks exactness after the equi match. NULL points bucket
  * to NULL (never equi-match) and NULL interval ends sequence to no rows —
  * both agree with the theta join, where NULL comparisons are false.
  *
  * The bucket width is the session conf `spark.graft.rangeJoin.bucketWidth`
  * (same opt-in shape as engines that take a bin-size hint for their range
  * join optimization); unset or non-positive disables the rule. Width
  * should sit near the typical interval span: the shuffle then carries
  * |P| + |I|·O(1) rows on an 8-byte key. Fixed-point safe: the rewritten
  * join HAS an equi conjunct, so the rule never re-fires on its own output.
  *
  * Install on a live session via [[BucketedRangeJoinRule.install]]
  * (`spark.experimental.extraOptimizations` — the public seam for exactly
  * this) or for fresh sessions via `spark.sql.extensions=graft.engine
  * .GraftExtensions`, which injects it alongside the graft_* functions.
  */
object BucketedRangeJoinRule extends Rule[LogicalPlan] {

  val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  /** Upper bound on buckets one interval may explode to. A bucketWidth far
    * below the widest interval would otherwise generate floor(hi/w) -
    * floor(lo/w) + 1 elements per row — past ~2^31 Sequence throws, and
    * executor memory dies long before — so a misconfigured opt-in would
    * turn a slow-but-working nested-loop join into a failing one with an
    * opaque error. The guard raises a named, actionable error instead; no
    * silent fallback, because dropping the rewrite mid-query would hide
    * the misconfiguration the error is pointing at. */
  val MaxBucketsConf = "spark.graft.rangeJoin.maxBucketsPerInterval"
  val MaxBucketsDefault = 1000000L

  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  private def width: Option[Double] =
    try Option(SQLConf.get.getConfString(WidthConf, "")).filter(_.nonEmpty)
      .map(_.toDouble).filter(_ > 0)
    catch { case _: NumberFormatException => None }

  /** One interpretation of a comparison conjunct: `point` (from the side
    * `pointOnLeft` says) bounded by `bound` from the other side. */
  private case class Cand(
      point: Expression, bound: Expression, lower: Boolean, pointOnLeft: Boolean)

  private def sideOf(e: Expression, l: AttributeSet, r: AttributeSet): Option[Boolean] =
    if (e.references.isEmpty || !e.deterministic) None
    else if (e.references.subsetOf(l)) Some(true)
    else if (e.references.subsetOf(r)) Some(false)
    else None

  /** A comparison a◦b where a and b come from opposite sides admits two
    * readings (a as the point, or b as the point); emit both and let the
    * pairing step find a lower+upper pair over the same point expression. */
  private def candidates(
      c: Expression, l: AttributeSet, r: AttributeSet): Seq[Cand] = {
    def mk(a: Expression, b: Expression, aIsLowerBounded: Boolean): Seq[Cand] =
      (sideOf(a, l, r), sideOf(b, l, r)) match {
        case (Some(sa), Some(sb)) if sa != sb &&
            a.dataType.isInstanceOf[NumericType] &&
            b.dataType.isInstanceOf[NumericType] =>
          Seq(Cand(a, b, lower = aIsLowerBounded, pointOnLeft = sa),
            Cand(b, a, lower = !aIsLowerBounded, pointOnLeft = sb))
        case _ => Seq.empty
      }
    c match {
      case GreaterThanOrEqual(a, b) => mk(a, b, aIsLowerBounded = true)
      case GreaterThan(a, b) => mk(a, b, aIsLowerBounded = true)
      case LessThanOrEqual(a, b) => mk(a, b, aIsLowerBounded = false)
      case LessThan(a, b) => mk(a, b, aIsLowerBounded = false)
      case _ => Seq.empty
    }
  }

  private def isEquiConjunct(c: Expression, l: AttributeSet, r: AttributeSet): Boolean =
    c match {
      case EqualTo(a, b) =>
        (sideOf(a, l, r), sideOf(b, l, r)) match {
          case (Some(sa), Some(sb)) => sa != sb
          case _ => false
        }
      case EqualNullSafe(a, b) =>
        (sideOf(a, l, r), sideOf(b, l, r)) match {
          case (Some(sa), Some(sb)) => sa != sb
          case _ => false
        }
      case _ => false
    }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConj(a) ++ splitConj(b)
    case other => Seq(other)
  }

  private def bucketOf(e: Expression, w: Double): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w, DoubleType))), LongType)

  /** Sequence is TimeZoneAwareExpression: in the optimizer no analyzer
    * pass will fill the zone in, so resolve it here. An inverted span
    * (empty interval, lo > hi) must emit NO buckets — Sequence with an
    * explicit +1 step throws on start > stop, and without one it would
    * count DOWNWARD (spurious rows). NULL ends take the else branch (If
    * on a null predicate) → empty span, matching the theta join where
    * NULL comparisons are false. */
  private def spanGen(
      child: LogicalPlan, start: Expression, end: Expression,
      w: Double): (Generate, AttributeReference) = {
    val startB = bucketOf(start, w)
    val stopB = bucketOf(end, w)
    val maxBuckets =
      try Option(SQLConf.get.getConfString(MaxBucketsConf, "")).filter(_.nonEmpty)
        .map(_.toLong).filter(_ > 0).getOrElse(MaxBucketsDefault)
      catch { case _: NumberFormatException => MaxBucketsDefault }
    val arrTy = org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
    val spanLen = Add(Subtract(stopB, startB), Literal(1L, LongType))
    val tooWide = Cast(RaiseError(Concat(Seq(
      Literal(s"graft bucketed range join: an interval spans "),
      Cast(spanLen, org.apache.spark.sql.types.StringType),
      Literal(s" buckets (> $MaxBucketsConf=$maxBuckets); raise " +
        s"$WidthConf toward the typical interval width or unset it to " +
        "disable the rewrite")))), arrTy)
    val span = If(
      LessThanOrEqual(startB, stopB),
      If(LessThanOrEqual(spanLen, Literal(maxBuckets, LongType)),
        new Sequence(startB, stopB,
          Some(Literal(1L, LongType)),
          Some(SQLConf.get.sessionLocalTimeZone)),
        tooWide),
      Literal.create(Array.empty[Long], arrTy))
    val bucketAttr = AttributeReference("__bucket", LongType, nullable = false)()
    (Generate(Explode(span), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(bucketAttr), child), bucketAttr)
  }

  /** point-in-interval: one side contributes a single point expression
    * bounded below and above by the other side. */
  private def rewritePointInInterval(
      j: Join, conj: Seq[Expression], w: Double): Option[LogicalPlan] = {
    val Join(left, right, _, Some(cond), hint) = j: @unchecked
    val cands = conj.flatMap(candidates(_, left.outputSet, right.outputSet))
    (for {
      lo <- cands.iterator if lo.lower
      hi <- cands.iterator
      if !hi.lower && hi.pointOnLeft == lo.pointOnLeft &&
        lo.point.semanticEquals(hi.point)
    } yield (lo, hi)).nextOption().map { case (lb, ub) =>
      val (pointPlan, intervalPlan) =
        if (lb.pointOnLeft) (left, right) else (right, left)
      // point side: one computed bucket column (a point has ONE bucket, so
      // no dedup pass is needed on the output)
      val pAlias = Alias(bucketOf(lb.point, w), "__bucket")()
      val pProj = Project(pointPlan.output :+ pAlias, pointPlan)
      val (gen, bucketAttr) = spanGen(intervalPlan, lb.bound, ub.bound, w)
      val newCond = And(EqualTo(pAlias.toAttribute, bucketAttr), cond)
      val (nl, nr): (LogicalPlan, LogicalPlan) =
        if (lb.pointOnLeft) (pProj, gen) else (gen, pProj)
      Project(left.output ++ right.output,
        Join(nl, nr, Inner, Some(newCond), hint))
    }
  }

  /** interval × interval overlap (`lStart < rEnd && rStart < lEnd`, any
    * strictness): BOTH sides explode to their bucket spans and a pair is
    * emitted only from the bucket holding max(lStart, rStart) — the
    * overlap's left edge, which both spans provably contain — so each
    * pair appears exactly once with no dedup pass (the same report-once
    * trick as operators/RangeJoin.intervalOverlap). */
  private def rewriteOverlap(
      j: Join, conj: Seq[Expression], w: Double): Option[LogicalPlan] = {
    val Join(left, right, _, Some(cond), hint) = j: @unchecked
    val (l, r) = (left.outputSet, right.outputSet)
    // a crossing conjunct start < end: (start, end, startOnLeft)
    def dir(s: Expression, en: Expression): Option[(Expression, Expression, Boolean)] =
      (sideOf(s, l, r), sideOf(en, l, r)) match {
        case (Some(ss), Some(es)) if ss != es &&
            s.dataType.isInstanceOf[NumericType] &&
            en.dataType.isInstanceOf[NumericType] => Some((s, en, ss))
        case _ => None
      }
    val crossed = conj.flatMap {
      case LessThan(a, b) => dir(a, b)
      case LessThanOrEqual(a, b) => dir(a, b)
      case GreaterThan(a, b) => dir(b, a)
      case GreaterThanOrEqual(a, b) => dir(b, a)
      case _ => None
    }
    for {
      (lStart, rEnd, _) <- crossed.find(_._3)
      (rStart, lEnd, _) <- crossed.find(!_._3)
    } yield {
      // Spans are least/greatest-NORMALIZED: the theta join does not carry
      // the operator API's start<=end contract, and an inverted row (say
      // lStart=5, lEnd=3 vs r=[0,10]) still satisfies the condition — an
      // empty span would silently drop it. With normalized spans the
      // report-once bucket always lies in BOTH: m = max(lStart, rStart);
      // m <= max(lStart, lEnd) since rStart < lEnd by the matched
      // condition, and m >= min trivially — symmetrically for the right.
      def castD(e: Expression) = Cast(e, DoubleType)
      def norm(a: Expression, b: Expression) =
        (Least(Seq(castD(a), castD(b))), Greatest(Seq(castD(a), castD(b))))
      val (ls, le) = norm(lStart, lEnd)
      val (rs, re) = norm(rStart, rEnd)
      val (genL, bL) = spanGen(left, ls, le, w)
      val (genR, bR) = spanGen(right, rs, re, w)
      // the overlap's left edge; NULL starts never reach this test (the
      // original condition already rejected the pair)
      val edge = Greatest(Seq(castD(lStart), castD(rStart)))
      val newCond = And(EqualTo(bL, bR),
        And(cond, EqualTo(bL, bucketOf(edge, w))))
      Project(left.output ++ right.output,
        Join(genL, genR, Inner, Some(newCond), hint))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = width match {
    case None => plan
    case Some(w) => plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _)
          if j.resolved && {
            val conj = splitConj(cond)
            !conj.exists(isEquiConjunct(_, left.outputSet, right.outputSet))
          } =>
        val conj = splitConj(cond)
        rewritePointInInterval(j, conj, w)
          .orElse(rewriteOverlap(j, conj, w))
          .getOrElse(j)
    }
  }
}
