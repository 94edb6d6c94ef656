package graft.functions.expr

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a pre-built Bloom filter — the
  * runtime-filter primitive behind [[graft.operators.BloomPrefilter]].
  *
  * The sketch travels as SERIALIZED BYTES in the expression (compact,
  * plan-equality-friendly) and is deserialized once per JVM via a transient
  * lazy val; codegen attaches the live filter with `addReferenceObj`, the
  * same pattern Spark's own injected `BloomFilterMightContain` uses. The
  * probe is a pure hash + bit-test per row: no shuffle, no allocation,
  * stays inside whole-stage codegen.
  *
  * LongType only by contract — the sketch is built with `putLong`, and a
  * differently-typed probe would hash differently and silently return
  * garbage; callers cast integral keys to long on both sides
  * (BloomPrefilter does).
  */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
  extends UnaryExpression {

  // Array[Byte] gives the generated case-class equals reference semantics,
  // which would make byte-identical probes compare unequal and defeat
  // semanticEquals / exchange reuse. Compare the sketch by value instead.
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContainLong =>
      child == b.child && java.util.Arrays.equals(bloomBytes, b.bloomBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"BloomMightContainLong needs a BIGINT probe key, got ${t.catalogString}")
  }

  override def dataType: DataType = BooleanType

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

object BloomMightContainLong {
  /** True when `key` might be in the set `bloomBytes` encodes (no false
    * negatives; false positives at the sketch's configured fpp). */
  def mightContain(key: Column, bloomBytes: Array[Byte]): Column =
    GraftBridge.column(
      BloomMightContainLong(GraftBridge.expression(key.cast("long")), bloomBytes))
}
