package graft.engine

import graft.functions.expr._
import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** SQL-surface registration of the engine's native expressions, so
  * `spark.sql(...)` users get the same codegen'd primitives as the Column
  * API — the library-completeness seam for SQL-first callers.
  *
  *   - `graft_dot(a, b)`            — sequential-fold double dot product
  *   - `graft_shingles(text, n)`    — hashed distinct word n-gram shingles
  *   - `graft_minhash(hashes, k, seed)` — k-permutation MinHash signature
  *   - `graft_hyperplane_sigs(vec, dim, nplanes, tables, seed)` — LSH bank
  *   - `graft_sum_scaled(unscaledLong, scale)` — exact int128 money sum
  *   - `graft_zvalue(a, b)`         — Z-order (Morton) clustering key
  *   - `graft_word_shingles(text, n, distinct)` — string word n-grams
  *   - `graft_cms_estimate(key, sketchBytes)` — Count-Min frequency probe
  *   - `graft_nfc_normalize(text)` — Unicode NFC canonical composition
  *   - `graft_jaro_winkler(a, b)`  — byte-exact Jaro–Winkler similarity
  *   - `graft_simhash64(hashes)`   — 64-bit SimHash of feature hashes
  *
  * Static parameters (k, seed, dim, …) must be literals — they are baked
  * into the expression at resolution time exactly like the Column API.
  * Call [[registerAll]] on a live session; sessions built fresh can use
  * `spark.sql.extensions=graft.engine.GraftExtensions` instead.
  */
object GraftFunctions {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def litLong(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> { args =>
      require(args.length == 2, "graft_dot(a, b)")
      ArrayDotProduct(args(0), args(1))
    },
    "graft_shingles" -> { args =>
      require(args.length == 2, "graft_shingles(text, n)")
      HashedWordShingles(args(0), litInt(args(1), "n"))
    },
    "graft_minhash" -> { args =>
      require(args.length == 3, "graft_minhash(hashes, k, seed)")
      MinHashSignature(args(0), litInt(args(1), "k"), litLong(args(2), "seed"))
    },
    "graft_hyperplane_sigs" -> { args =>
      require(args.length == 5, "graft_hyperplane_sigs(vec, dim, nplanes, tables, seed)")
      HyperplaneSignatures(args(0), litInt(args(1), "dim"), litInt(args(2), "nplanes"),
        litInt(args(3), "tables"), litLong(args(4), "seed"))
    },
    "graft_sum_scaled" -> { args =>
      require(args.length == 2, "graft_sum_scaled(unscaledLong, scale)")
      // Return the bare AggregateFunction: the analyzer wraps it itself,
      // which is what routes SQL DISTINCT / FILTER (WHERE ...) modifiers
      // correctly — an eager toAggregateExpression() would reject them.
      Int128Sum(args(0), litInt(args(1), "scale"))
    },
    "graft_zvalue" -> { args =>
      require(args.length == 2, "graft_zvalue(a, b)")
      // Coerce like the Column API (ZValue.zValue casts to long): without
      // this, INT inputs would fail analysis instead of widening.
      ZValue(
        org.apache.spark.sql.catalyst.expressions.Cast(args(0), org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.catalyst.expressions.Cast(args(1), org.apache.spark.sql.types.LongType))
    },
    "graft_word_shingles" -> { args =>
      require(args.length == 3, "graft_word_shingles(text, n, distinct)")
      val dist = args(2) match {
        case Literal(v: Boolean, _) => v
        case other => throw new IllegalArgumentException(
          s"distinct must be a boolean literal, got $other")
      }
      WordShingleStrings(args(0), litInt(args(1), "n"), dist)
    },
    "graft_cms_estimate" -> { args =>
      require(args.length == 2, "graft_cms_estimate(key, sketchBytes)")
      val bytes = args(1) match {
        case Literal(v: Array[Byte], org.apache.spark.sql.types.BinaryType) => v
        case other => throw new IllegalArgumentException(
          s"sketchBytes must be a binary literal (a serialized CMS), got $other")
      }
      CmsEstimateString(args(0), bytes)
    },
    "graft_bloom_might_contain" -> { args =>
      require(args.length == 2, "graft_bloom_might_contain(key, sketchBytes)")
      val bytes = args(1) match {
        case Literal(v: Array[Byte], org.apache.spark.sql.types.BinaryType) => v
        case other => throw new IllegalArgumentException(
          s"sketchBytes must be a binary literal (a serialized Bloom sketch), got $other")
      }
      // Coerce like graft_zvalue (and the Column API's mightContain, which
      // casts its probe): INT keys widen to LONG instead of failing the
      // expression's LongType input check.
      BloomMightContainLong(
        org.apache.spark.sql.catalyst.expressions.Cast(args(0), org.apache.spark.sql.types.LongType),
        bytes)
    },
    "graft_nfc_normalize" -> { args =>
      require(args.length == 1, "graft_nfc_normalize(text)")
      NfcNormalize(args(0))
    },
    "graft_jaro_winkler" -> { args =>
      require(args.length == 2, "graft_jaro_winkler(a, b)")
      JaroWinkler(args(0), args(1))
    },
    "graft_simhash64" -> { args =>
      require(args.length == 1, "graft_simhash64(hashes)")
      SimHash64(args(0))
    })

  /** Register every graft SQL function on a live session. Idempotent. */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      GraftBridge.registerFunction(spark, name, builder)
    }
}

/** `spark.sql.extensions` entry point for sessions built fresh:
  * `--conf spark.sql.extensions=graft.engine.GraftExtensions`. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.engine.GraftFunctions", name),
        builder))
    }
    // Conf-gated (spark.graft.rangeJoin.bucketWidth): a no-op until opted in.
    ext.injectOptimizerRule(_ => graft.plans.BucketedRangeJoinRule)
  }
}
