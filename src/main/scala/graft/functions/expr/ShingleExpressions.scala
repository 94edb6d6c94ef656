package graft.functions.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Tokenization shared by the native shingle expressions — EXACTLY Spark's
  * `split(lower(trim(text)), '\s+')` tree, via the same UTF8String ops the
  * column functions lower to: space-only trim (Java's String.trim strips
  * all whitespace ≤ U+0020 — different), UTF8String.toLowerCase (Java's
  * default-locale toLowerCase diverges on tr_TR 'I'), split with limit -1
  * (Java's default split drops trailing empty tokens — different). Any
  * cheaper tokenizer here silently desynchronizes the native expressions
  * from the HOF forms and the DuckDB oracles on whitespace-weird text.
  */
private[expr] object ShingleTok {
  private val WS = UTF8String.fromString("\\s+")
  /** Decoded ONCE per token here — the shingle loops read each token up to
    * n times, and a per-read UTF8String→String decode would triple the
    * allocation on the hottest scan path. */
  // The split line is DELIBERATELY duplicated with [[tokensU8]], not
  // delegated: routing this method through tokensU8 measured a consistent
  // ~10% slowdown on the d4-family scan (back-to-back isolated bench:
  // 1.90 → 2.15 s median, recovered on revert) — the extra non-inlined
  // frame on the per-row hot path defeats the JIT's escape analysis of
  // the token array. Keep the two lines textually in sync.
  def tokens(input: UTF8String): Array[String] = {
    val ts = input.trim().toLowerCase().split(WS, -1)
    val out = new Array[String](ts.length)
    var i = 0
    while (i < ts.length) { out(i) = ts(i).toString; i += 1 }
    out
  }

  /** Raw UTF8String tokens — for consumers that emit tokens back into
    * InternalRows ([[WordNgramStructs]]); skips the String decode. */
  def tokensU8(input: UTF8String): Array[UTF8String] =
    input.trim().toLowerCase().split(WS, -1)
}

/** One-pass hashed word-shingling: lowercase+trim the text, split on
  * whitespace, hash every n-gram shingle ("tok_i … tok_{i+n-1}") with
  * xxhash64 (seed 42, identical to `functions.xxhash64` on the shingle
  * string). Returns array<long>, duplicates INCLUDED — MinHash minima are
  * invariant to duplicates, so dedup is wasted work on this path.
  *
  * Exists because the HOF formulation (split → transform(sequence) →
  * slice/concat_ws → xxhash64 per element) allocates several arrays per
  * shingle and dominates the near-dup pipeline's runtime; this is a single
  * tight loop per document. Eval-based (CodegenFallback): the per-row work
  * is the loop itself, not expression dispatch.
  */
case class HashedWordShingles(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"HashedWordShingles needs string input, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = ShingleTok.tokens(input.asInstanceOf[UTF8String])
    val m = toks.length - (n - 1)
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HashedWordShingles =
    copy(child = newChild)
}

object HashedWordShingles {
  def apply(text: Column, n: Int): Column =
    GraftBridge.column(HashedWordShingles(GraftBridge.expression(text), n))
}

/** One-pass STRING word-shingling — the exact-pipeline sibling of
  * [[HashedWordShingles]] for operators whose shingles must stay readable
  * strings (the d4-family inverted index, whose DuckDB oracle rebuilds the
  * same shingles). Same tokenization, same single tight loop per document;
  * `distinct = true` dedups in first-occurrence order, bit-compatible with
  * `array_distinct` over the HOF stream (parity pinned in DedupSpec).
  *
  * Exists for the same reason as its hashed sibling: the HOF formulation
  * is interpreted (HOFs are CodegenFallback) and allocates a sliced array
  * + concat per position through lambda dispatch — measured ~10× slower
  * per scan branch on the shingle-join family, and those queries evaluate
  * the shingling once per join branch by design (recompute beats caching
  * a full-corpus shingle stream at 100 TB).
  */
case class WordShingleStrings(child: Expression, n: Int, distinct: Boolean)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"WordShingleStrings needs string input, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = ShingleTok.tokens(input.asInstanceOf[UTF8String])
    val m = toks.length - (n - 1)
    if (m <= 0) return new GenericArrayData(Array.empty[AnyRef])
    val sb = new java.lang.StringBuilder(64)
    if (distinct) {
      val seen = new java.util.LinkedHashSet[String](m * 2)
      var i = 0
      while (i < m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[AnyRef](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[AnyRef](m)
      var i = 0
      while (i < m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingleStrings =
    copy(child = newChild)
}

object WordShingleStrings {
  /** String shingles of `text`; `distinct` keeps first-occurrence order. */
  def apply(text: Column, n: Int, distinct: Boolean = true): Column =
    GraftBridge.column(WordShingleStrings(GraftBridge.expression(text), n, distinct))
}

/** One-pass word n-gram STRUCT stream — the Kneser-Ney-family sibling of
  * [[WordShingleStrings]]: array<struct<w1..wn:string>> of every n-gram
  * window, duplicates kept, document order. Short documents (< n tokens)
  * yield an empty array, exactly like the `when(size(ts) >= n, …)
  * .otherwise(empty)` HOF guard it replaces.
  *
  * Exists because the HOF formulations — zip_with over slices (orders 2
  * and 3) and transform(sequence)+element_at (order N) — are interpreted
  * (higher-order functions are CodegenFallback) and dispatch a lambda per
  * position with per-element array allocation; on the LM family's target
  * stream that interpretation was the single largest execution cost
  * (measured: the order-5 scoring join spends its scan time here). This
  * is one tight loop per document over [[ShingleTok]]'s pinned-parity
  * tokenizer; the emitted UTF8String tokens are SHARED across the up-to-n
  * windows that contain them instead of re-sliced per window.
  */
case class WordNgramStructs(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 2 && n <= 8, "n-gram order must be in [2, 8]")

  override def dataType: DataType = ArrayType(
    StructType((1 to n).map(k => StructField(s"w$k", StringType))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"WordNgramStructs needs string input, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = ShingleTok.tokensU8(input.asInstanceOf[UTF8String])
    val m = toks.length - (n - 1)
    if (m <= 0) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](m)
    var i = 0
    while (i < m) {
      val vals = new Array[Any](n)
      var j = 0
      while (j < n) { vals(j) = toks(i + j); j += 1 }
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgramStructs =
    copy(child = newChild)
}

object WordNgramStructs {
  def apply(text: Column, n: Int): Column =
    GraftBridge.column(WordNgramStructs(GraftBridge.expression(text), n))
}
