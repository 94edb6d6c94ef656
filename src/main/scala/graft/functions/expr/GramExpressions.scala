package graft.functions.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Distributed Gram matrix (Σ qᵢqⱼ) + per-dimension sums over fixed-point
  * vectors — the one-pass sufficient statistics for covariance, PCA, and
  * whitening over an embedding column: cov(i,j) = (n·dot − sᵢ·sⱼ) / n²
  * in EXACT integers, eigen work happens driver-side on the d×d result
  * (bounded by dimension, never by data).
  *
  * The scale shape is the whole point: the naive formulation explodes
  * every row to its d(d+1)/2 index pairs and shuffles |rows|·d²/2 — this
  * aggregate keeps ONE d(d+1)/2+d+1 long buffer per task, map-side
  * combines, and ships a single ~2 k-entry buffer per partition through
  * the final 1-row merge (the d² explode is the ORACLE's job, which is
  * exactly what a 100 TB run cannot do).
  *
  * Exactness: inputs are pre-rounded fixed-point longs (the caller
  * rounds; this aggregate is pure integer so the result is independent
  * of partitioning and merge order), and every accumulation is
  * `Math.addExact`/`multiplyExact` — overflow REFUSES loudly instead of
  * wrapping (capacity at 1e6 scale and unit-norm inputs: ~9e6 rows per
  * group; larger corpora lower the caller's scale).
  *
  * Output: struct<n, sums: array<long> (length d),
  * entries: array<struct<i:int, j:int, dot:long>> (upper triangle,
  * 1-BASED i ≤ j, row-major)>.
  */
case class GramMatrix(
    q: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(dim >= 1 && dim <= 512,
    s"dim must be in [1, 512] (d² buffer per task), got $dim")

  private val nTri = dim * (dim + 1) / 2
  // buffer layout: [n, sums(dim), dots(nTri)]
  private val bufLen = 1 + dim + nTri

  override def children: Seq[Expression] = Seq(q)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("entries", ArrayType(StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("dot", LongType, nullable = false))), containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = q.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"GramMatrix needs array<bigint> (pre-rounded fixed point), got ${t.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val a = q.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"GramMatrix(dim=$dim) got a vector of length ${arr.numElements()}")
      val v = arr.toLongArray()
      buf(0) = Math.addExact(buf(0), 1L)
      var i = 0
      var t = 1 + dim
      while (i < dim) {
        buf(1 + i) = Math.addExact(buf(1 + i), v(i))
        var j = i
        while (j < dim) {
          buf(t) = Math.addExact(buf(t), Math.multiplyExact(v(i), v(j)))
          t += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bufLen) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val sums = new GenericArrayData(java.util.Arrays.copyOfRange(buf, 1, 1 + dim))
    val entries = new Array[Any](nTri)
    var i = 0
    var t = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        entries(t) = InternalRow(i + 1, j + 1, buf(1 + dim + t))
        t += 1
        j += 1
      }
      i += 1
    }
    InternalRow(buf(0), sums, new GenericArrayData(entries))
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bufLen * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < bufLen) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](bufLen)
    var i = 0
    while (i < bufLen) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrix =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrix =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GramMatrix =
    copy(q = newChildren(0))
}

object GramMatrix {
  /** Aggregate column over a fixed-point `array<bigint>` vector column. */
  def gram(q: Column, dim: Int): Column =
    GraftBridge.column(
      GramMatrix(GraftBridge.expression(q), dim).toAggregateExpression())
}
