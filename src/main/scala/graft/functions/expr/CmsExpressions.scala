package graft.functions.expr

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Codegen'd point-frequency probe against a pre-built Count-Min sketch —
  * the frequency-estimation member of the engine's mergeable-sketch family
  * (HLL = distinct count, GK = quantiles, Bloom = membership, CMS =
  * frequency). Same embedding pattern as [[BloomMightContainLong]]: the
  * sketch travels as serialized bytes (plan-equality-friendly), is
  * deserialized once per JVM via a transient lazy val, and codegen attaches
  * the live sketch with `addReferenceObj`, so the probe is a pure
  * hash-and-min per row inside whole-stage codegen.
  *
  * StringType only by contract — the sketch is built over UTF-8 token
  * bytes; a differently-typed probe would hash differently and silently
  * return garbage (the same contract BloomMightContainLong pins for longs).
  * CMS guarantees estimate ≥ true count (counters only increment) and
  * estimate ≤ true + ε·N with confidence 1−δ.
  */
case class CmsEstimateString(child: Expression, cmsBytes: Array[Byte])
  extends UnaryExpression {

  // Value equality over the sketch bytes (reference equality would defeat
  // semanticEquals / exchange reuse — same trade as BloomMightContainLong).
  override def equals(other: Any): Boolean = other match {
    case c: CmsEstimateString =>
      child == c.child && java.util.Arrays.equals(cmsBytes, c.cmsBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(cmsBytes)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"CmsEstimateString needs a STRING probe key, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(cmsBytes))

  override def nullSafeEval(v: Any): Any =
    cms.estimateCount(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", cms, classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.estimateCount($v.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimateString =
    copy(child = newChild)
}

object CmsEstimateString {
  /** Estimated frequency of `key` in the stream `cmsBytes` summarizes. */
  def estimate(key: Column, cmsBytes: Array[Byte]): Column =
    GraftBridge.column(CmsEstimateString(GraftBridge.expression(key), cmsBytes))
}
