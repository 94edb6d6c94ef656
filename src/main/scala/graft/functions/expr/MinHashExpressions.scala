package graft.functions.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd k-permutation MinHash signature over an array<long> of feature
  * hashes: sig[j] = min over features of ((h mod P)·a_j + b_j) mod P.
  *
  * Replaces the higher-order `aggregate` fold (which allocates a k-slot
  * array per feature and evaluates k lambda frames per element) with one
  * tight two-level loop — the arithmetic is identical, so signatures match
  * the HOF formulation bit-for-bit. No overflow: operands stay under 2^31,
  * products under 2^62.
  */
case class MinHashSignature(child: Expression, k: Int, seed: Long)
  extends UnaryExpression {

  import MinHashSignature.P

  @transient private lazy val coeffs: (Array[Long], Array[Long]) = {
    var state = seed
    def next(): Long = { state = state * 6364136223846793005L + 1442695040888963407L; state }
    val as = new Array[Long](k)
    val bs = new Array[Long](k)
    var i = 0
    while (i < k) {
      as(i) = math.abs(next()) % (P - 1) + 1
      bs(i) = math.abs(next()) % P
      i += 1
    }
    (as, bs)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"MinHashSignature needs array<bigint>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val (as, bs) = coeffs
    val sig = Array.fill(k)(P)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      var hp = arr.getLong(i) % P
      if (hp < 0) hp += P
      var j = 0
      while (j < k) {
        val v = (hp * as(j) + bs(j)) % P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", coeffs._1, "long[]")
    val bRef = ctx.addReferenceObj("mhB", coeffs._2, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val hp = ctx.freshName("hp")
      val v = ctx.freshName("v")
      s"""
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, ${P}L);
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $hp = $arr.getLong($i) % ${P}L;
         |  if ($hp < 0) $hp += ${P}L;
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = ($hp * $aRef[$j] + $bRef[$j]) % ${P}L;
         |    if ($v < $sig[$j]) $sig[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  val P: Long = 2147483647L // 2^31-1, matches MinHashLSH.P

  def apply(hashed: Column, k: Int, seed: Long): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(hashed), k, seed))
}
