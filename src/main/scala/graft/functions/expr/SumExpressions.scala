package graft.functions.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnscaledValue}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

import java.math.BigInteger

/** Exact 128-bit sum of scaled-integer money values.
  *
  * Spark's `sum(decimal(p,s))` widens the result to `decimal(p+10,s)`;
  * past 18 digits that leaves the compact-long representation, so every
  * per-row add allocates a JavaBigDecimal (measured 2.5× the cost of a
  * double sum on the q1 shape). DuckDB — the correctness oracle — sums
  * decimals in int128. This aggregate does the same: the input is the
  * UNSCALED long (cents / 10^-4 units, produced by a codegen'd
  * `UnscaledValue(cast)` in the projection BELOW the aggregate), the
  * accumulator is a two-long 128-bit integer (overflow at 1.7e38 — the
  * same headroom as decimal(38)), and only the final per-group value
  * materializes a BigDecimal. Result: `decimal(38, scale)`, bit-identical
  * to the decimal-sum formulation, NULL on empty/all-null groups exactly
  * like `sum`.
  */
case class Int128Sum(
    child: Expression,
    scale: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DecimalType(38, scale)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"Int128Sum needs a bigint (unscaled) input, got ${child.dataType.catalogString}")

  // buffer = (hi, lo, nonNullCount)
  override def createAggregationBuffer(): Array[Long] = new Array[Long](3)

  /** 128-bit two's-complement add of a sign-extended long. */
  @inline private def add(buf: Array[Long], v: Long): Unit = {
    val lo = buf(1)
    val newLo = lo + v
    // unsigned carry out of the low word
    val carry = ((lo & v) | ((lo | v) & ~newLo)) >>> 63
    buf(0) += (v >> 63) + carry
    buf(1) = newLo
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      add(buf, v.asInstanceOf[Long])
      buf(2) += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val lo = a(1)
    val newLo = lo + b(1)
    val carry = ((lo & b(1)) | ((lo | b(1)) & ~newLo)) >>> 63
    a(0) += b(0) + carry
    a(1) = newLo
    a(2) += b(2)
    a
  }

  override def eval(buf: Array[Long]): Any = {
    if (buf(2) == 0) null
    else {
      val unscaled =
        if (buf(0) == (buf(1) >> 63)) BigInteger.valueOf(buf(1)) // fits a long
        else BigInteger.valueOf(buf(0)).shiftLeft(64)
          .add(BigInteger.valueOf(buf(1)).and(Int128Sum.Mask64))
      Decimal(new java.math.BigDecimal(unscaled, scale), 38, scale)
    }
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](24)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.putLong(buf(0)); bb.putLong(buf(1)); bb.putLong(buf(2))
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array(bb.getLong(), bb.getLong(), bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): Int128Sum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): Int128Sum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Int128Sum =
    copy(child = newChildren(0))
}

object Int128Sum {
  private[expr] val Mask64 =
    BigInteger.ONE.shiftLeft(64).subtract(BigInteger.ONE)

  /** Sum a pre-scaled long column as decimal(38, scale). */
  def sumScaled(unscaled: Column, scale: Int): Column =
    GraftBridge.column(
      Int128Sum(GraftBridge.expression(unscaled), scale).toAggregateExpression())

  /** Codegen'd unscaled-cents projection of a 2-dp money column: the exact
    * decimal(18,2) cast (HALF_UP, matching both engines) then the compact
    * long it holds — no BigDecimal in the per-row path. */
  def unscaled2(c: Column): Column =
    GraftBridge.column(
      UnscaledValue(GraftBridge.expression(c.cast(DecimalType(18, 2)))))
}
