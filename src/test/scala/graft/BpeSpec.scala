package graft

import graft.functions.expr.{BpeApply, BpeMergePass}
import graft.operators.{BpeEncode, BpeTrain}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE training semantics: the greedy single-pass merge rule, the
  * deterministic argmax tie-break, early stop on a merge-less corpus, and
  * a hand-traced end-to-end training run (the t45 gate repeats the trace
  * against DuckDB at every SF). */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pass(tokens: Seq[String], l: String, r: String): Seq[String] =
    Seq(tokens).toDF("t")
      .select(BpeMergePass(col("t"), l, r).as("m"))
      .as[Seq[String]].collect()(0)

  test("merge pass is greedy left-to-right, never re-matching its own output") {
    // the canonical overlap case: only ONE merge fires in "a a a"
    assert(pass(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(pass(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    // a produced token may not chain within the same pass
    assert(pass(Seq("a", "b", "b"), "a", "b") == Seq("ab", "b"))
    // non-adjacent occurrences all merge
    assert(pass(Seq("a", "b", "x", "a", "b"), "a", "b") == Seq("ab", "x", "ab"))
    // no match → unchanged; empty and 1-token arrays survive
    assert(pass(Seq("x", "y"), "a", "b") == Seq("x", "y"))
    assert(pass(Seq("x"), "a", "b") == Seq("x"))
    assert(pass(Seq.empty[String], "a", "b") == Seq.empty)
  }

  test("training learns the hand-traced merge table with deterministic tie-breaks") {
    // 5 docs, (a b)^k c for k=1..5 — the t45 fixture at m=1
    val docs = (1 to 5).map(k =>
      (1 to k).flatMap(_ => Seq("a", "b")) :+ "c").toDF("toks")
    val got = BpeTrain.train(docs, "toks", rounds = 4)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "a", "b", 15L),      // Σk
      (2L, "ab", "ab", 10L),    // Σ(k-1)
      (3L, "ab", "c", 3L),      // k odd
      (4L, "abab", "abab", 2L)  // three-way tie at 2, right-token order wins
    ))
  }

  test("training stops early when no pair repeats") {
    val docs = Seq(Seq("p", "q"), Seq("r", "s")).toDF("toks")
    val got = BpeTrain.train(docs, "toks", rounds = 10).count()
    assert(got == 0, "every pair is unique — merging would memorize one document")
  }

  test("a requested round count larger than the corpus supports degrades to exhaustion") {
    val docs = Seq(Seq("a", "b"), Seq("a", "b"), Seq("c", "d")).toDF("toks")
    val got = BpeTrain.train(docs, "toks", rounds = 10)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a", "b", 2L)),
      "after merging (a,b) no pair repeats; training must stop, not loop")
  }

  test("BpeApply(table) equals the chain of per-merge passes, and preserves the stream") {
    val merges = Seq(("a", "b"), ("ab", "ab"), ("ab", "c"), ("abab", "abab"))
    // 32 pseudo-random docs over the {a,b,c} alphabet (deterministic LCG)
    val docs = (1 to 32).map { seed =>
      var s = seed * 2654435761L
      (0 until (seed % 11 + 1)).map { _ =>
        s = s * 6364136223846793005L + 1442695040888963407L
        Seq("a", "b", "c")((math.abs(s) % 3).toInt)
      }
    }.toDF("toks")
    val viaTable = docs.select(BpeApply(col("toks"), merges).as("m"))
      .as[Seq[String]].collect().toSeq
    val viaChain = docs.select(
        merges.foldLeft(col("toks")) { case (c, (l, r)) => BpeMergePass(c, l, r) }.as("m"))
      .as[Seq[String]].collect().toSeq
    assert(viaTable == viaChain)
    val original = docs.as[Seq[String]].collect().toSeq
    assert(viaTable.map(_.mkString) == original.map(_.mkString),
      "encoding must be lossless: concatenated subtokens == concatenated input")
  }

  test("tokenizeCorpus: distinct-word memoization equals direct per-doc encode, in word order") {
    val merges = Seq(("a", "b"), ("ab", "ab"), ("ab", "c"))
    val texts = Seq(
      (1L, "ab ababc ab"), (2L, "abc abab"), (3L, ""), (4L, "   "),
      (5L, "ababab c ab ababab")).toDF("id", "text")
    val got = BpeEncode.tokenizeCorpus(texts, "id", "text", merges)
      .orderBy("id")
      .select(col("id"), col("toks"), col("n_tokens"))
      .as[(Long, Seq[String], Long)].collect().toSeq
    // direct path: per-doc char-split each word, encode, concatenate
    val direct = texts.select(col("id"),
        flatten(transform(split(lower(trim(col("text"))), "\\s+"),
          w => BpeApply(split(w, ""), merges))).as("toks"))
      .orderBy("id")
      .as[(Long, Seq[String])].collect().toSeq
    got.zip(direct).foreach { case ((id, toks, n), (id2, dToks)) =>
      assert(id == id2)
      // the direct path maps empty text to [""]-split debris; real docs only
      if (dToks.nonEmpty && dToks.forall(_.nonEmpty)) {
        assert(toks == dToks, s"doc $id: memoized path diverged")
        assert(n == toks.size)
      }
    }
    // empty/whitespace docs keep a row with an empty token array
    assert(got.find(_._1 == 3L).get._2.isEmpty)
    assert(got.find(_._1 == 4L).get._2.isEmpty)
    assert(got.find(_._1 == 4L).get._3 == 0L)
  }
}
