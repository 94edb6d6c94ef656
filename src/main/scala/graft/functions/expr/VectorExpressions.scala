package graft.functions.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two numeric arrays.
  *
  * The similarity operators need millions of 64-dim dot products per task;
  * the `zip_with`+`aggregate` higher-order formulation allocates a lambda
  * frame per element and never enters whole-stage codegen. This expression
  * compiles to a tight primitive loop (same accumulation order — a
  * sequential left fold in double — so results are bit-identical to the
  * higher-order version and to DuckDB's list_dot_product).
  *
  * Inputs: array<float> or array<double> (mixed allowed). Null if either
  * side is null; mismatched lengths fold over the common prefix.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isNumericArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isNumericArray(left.dataType) && isNumericArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"ArrayDotProduct needs array<float|double> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType

  // A null ELEMENT nulls the whole product, exactly like the zip_with +
  // aggregate formulation (null product poisons the fold) and DuckDB's
  // list_dot_product — so the expression can be null even when both array
  // children are non-null.
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val x = if (lf) xs.getFloat(i).toDouble else xs.getDouble(i)
      val y = if (rf) ys.getFloat(i).toDouble else ys.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += (double) $a.$lGet($i) * (double) $b.$rGet($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** All L random-hyperplane LSH signatures of a vector in ONE codegen'd
  * pass: result[t] = OR over p of (1<<p when v·plane_{t,p} >= 0).
  *
  * The planes are DERIVED DATA (seeded LCG, identical to
  * `Similarity.hyperplanes`), held in the expression object and attached
  * via `addReferenceObj` — never as `typedLit` child literals. The literal
  * formulation embeds tables×planes×dim doubles in the plan tree, and
  * analyzing/optimizing/canonicalizing that tree costs more than executing
  * the query at moderate scale (measured ~0.5s per run for 6×8×64).
  * Arithmetic is bit-identical to the dotNative+literal version: same
  * sequential double fold over the common prefix, same `>= 0` bit test.
  */
case class HyperplaneSignatures(
    child: Expression, dim: Int, nPlanes: Int, tables: Int, seed: Long)
  extends UnaryExpression {

  @transient private lazy val planes: Array[Array[Array[Double]]] =
    Array.tabulate(tables) { t =>
      var state = seed + t
      def next(): Double = {
        state = state * 6364136223846793005L + 1442695040888963407L
        (state >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
      }
      Array.fill(nPlanes)(Array.fill(dim)(next()))
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"HyperplaneSignatures needs array<float|double>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    val sigs = new Array[Long](tables)
    val n = math.min(v.numElements(), dim) // invariant across tables×planes
    // A null element nulls every dot product; `when(d >= 0, bit)` in the
    // literal formulation then sets NO bit — so all signatures are 0.
    var anyNull = false
    var j = 0
    while (j < n && !anyNull) { anyNull = v.isNullAt(j); j += 1 }
    if (!anyNull) {
      var t = 0
      while (t < tables) {
        var sig = 0L
        var p = 0
        while (p < nPlanes) {
          val plane = planes(t)(p)
          var acc = 0.0
          var i = 0
          while (i < n) {
            val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
            acc += x * plane(i)
            i += 1
          }
          if (acc >= 0.0) sig |= 1L << p
          p += 1
        }
        sigs(t) = sig
        t += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val pRef = ctx.addReferenceObj("hpPlanes", planes, "double[][][]")
    nullSafeCodeGen(ctx, ev, v => {
      val sigs = ctx.freshName("sigs")
      val sig = ctx.freshName("sig")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val anyNull = ctx.freshName("anyNull")
      val plane = ctx.freshName("plane")
      s"""
         |long[] $sigs = new long[$tables];
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |boolean $anyNull = false;
         |for (int $j = 0; $j < $n && !$anyNull; $j++) { $anyNull = $v.isNullAt($j); }
         |if (!$anyNull) {
         |  for (int $t = 0; $t < $tables; $t++) {
         |    long $sig = 0L;
         |    for (int $p = 0; $p < $nPlanes; $p++) {
         |      double[] $plane = $pRef[$t][$p];
         |      double $acc = 0.0;
         |      for (int $i = 0; $i < $n; $i++) {
         |        $acc += (double) $v.$get($i) * $plane[$i];
         |      }
         |      if ($acc >= 0.0) $sig |= 1L << $p;
         |    }
         |    $sigs[$t] = $sig;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignatures =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column-level handle for the codegen'd dot product. */
  def dotNative(a: Column, b: Column): Column =
    GraftBridge.column(
      ArrayDotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column-level handle for the L-table signature bank. */
  def hyperplaneSignatures(
      vec: Column, dim: Int, nPlanes: Int, tables: Int, seed: Long): Column =
    GraftBridge.column(
      HyperplaneSignatures(GraftBridge.expression(vec), dim, nPlanes, tables, seed))
}
