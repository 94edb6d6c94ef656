package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BpeTrain, WordPiece}
import org.apache.spark.sql.functions._

class WordPieceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // per-row symbol stream: ab×3 among a×4/b×3 (score 1/4N), cd×2 among
  // c×2/d×2 (score 1/2N) — the likelihood ranking INVERTS the raw-count
  // ranking, which is the whole point of WordPiece vs BPE
  private val stream = Seq("a", "b", "a", "b", "a", "b", "c", "d", "c", "d", "a")

  private def corpus(k: Int) = Seq.fill(k)(stream).toDF("toks")

  test("hand-traced training: score-ranked merges, exact cross-multiplied tie, early stop") {
    val got = WordPiece.train(corpus(3), "toks", rounds = 10)
      .as[(Long, String, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // r1: cd wins on score (1/(2K)) over the more frequent ab (1/(4K));
    // r2: ab vs cd-cd is an EXACT double tie (both 1/(4K)) → (l,r) asc →
    // ab; r3+: every once-per-row pair has count K = 3 ≥ 2, so training
    // correctly collapses each row to one symbol — the rarest-units
    // score keeps preferring the low-frequency side at every step
    // (hand-verified round by round):
    assert(got == Seq(
      (1L, "c", "d", 6L, 6L, 6L),
      (2L, "a", "b", 9L, 12L, 9L),
      (3L, "cd", "a", 3L, 6L, 3L),
      (4L, "cd", "cda", 3L, 3L, 3L),
      (5L, "ab", "cdcda", 3L, 9L, 3L),
      (6L, "ab", "abcdcda", 3L, 6L, 3L),
      (7L, "ab", "ababcdcda", 3L, 3L, 3L)), got.toString)
  }

  test("exact ties break in UTF-8 byte order, not UTF-16 code-unit order") {
    // two independent pairs with IDENTICAL scores 2/(2·2): left symbols
    // U+FFFD (UTF-8 EF BF BD; UTF-16 code unit 0xFFFD) vs U+20000
    // (UTF-8 F0 A0 80 80; UTF-16 starts with surrogate 0xD840). UTF-8
    // byte order puts U+FFFD FIRST; String.compareTo would pick the
    // surrogate-leading U+20000 — the divergence the u8cmp tie-break
    // exists to prevent (the engine orderBy and DuckDB both compare
    // UTF-8 bytes)
    val supp = new String(Character.toChars(0x20000))
    val docs = (Seq.fill(2)(Seq(supp, "x")) ++ Seq.fill(2)(Seq("�", "y")))
      .toDF("toks")
    val got = WordPiece.train(docs, "toks", rounds = 1)
      .as[(Long, String, String, Long, Long, Long)].collect()
    assert(got.head._2 == "�" && got.head._3 == "y", got.toSeq.toString)
  }

  test("the ranking is the load-bearing difference from BPE on the same corpus") {
    val bpe = BpeTrain.train(corpus(3), "toks", rounds = 1)
      .as[(Long, String, String, Long)].collect().head
    assert((bpe._2, bpe._3) == (("a", "b")), "BPE merges the most FREQUENT pair first")
    val wp = WordPiece.train(corpus(3), "toks", rounds = 1)
      .as[(Long, String, String, Long, Long, Long)].collect().head
    assert((wp._2, wp._3) == (("c", "d")), "WordPiece merges the best-SCORING pair first")
  }

  test("counts scale with the corpus; the merge order does not") {
    val small = WordPiece.train(corpus(2), "toks", rounds = 10)
      .as[(Long, String, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val big = WordPiece.train(corpus(14), "toks", rounds = 10)
      .as[(Long, String, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(small.map(m => (m._1, m._2, m._3)) == big.map(m => (m._1, m._2, m._3)))
    assert(big.map(_._4) == small.map(_._4 / 2 * 14))
  }

  test("trainFromWords: the low/lower/lowest trace with ##-stripping merges") {
    // words per doc: low low lower lowest → seeds [l,##o,##w]×2,
    // [l,##o,##w,##e,##r], [l,##o,##w,##e,##s,##t]. The likelihood
    // score makes RARE pairs of RARE symbols win first — the suffixes
    // crystallize before the frequent stem (hand-verified round by
    // round, incl. the four-way 0.125 tie at r4 broken '##o' first
    // and the right-asc ties at r5/r7/r8):
    val docs = Seq.fill(2)("low low lower lowest").toDF("text")
    val got = WordPiece.trainFromWords(docs, "text", rounds = 20)
      .as[(Long, String, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "##s", "##t", 2L, 2L, 2L),
      (2L, "##e", "##r", 2L, 4L, 2L),
      (3L, "##e", "##st", 2L, 2L, 2L),
      (4L, "##o", "##w", 8L, 8L, 8L),
      (5L, "##ow", "##er", 2L, 8L, 2L),
      (6L, "##ow", "##est", 2L, 6L, 2L),
      (7L, "l", "##ow", 4L, 8L, 4L),
      (8L, "l", "##ower", 2L, 4L, 2L),
      (9L, "l", "##owest", 2L, 2L, 2L)), got.toString)
  }

  test("train -> encode loop: the learned vocab drives the greedy encoder") {
    val docs = Seq("low low lower lowest").toDF("text")
    val merged = WordPiece.trainFromWords(docs, "text", rounds = 10)
      .as[(Long, String, String, Long, Long, Long)].collect()
      .map(m => m._2 + (if (m._3.startsWith("##")) m._3.drop(2) else m._3))
    val seeds = Seq("l", "##o", "##w", "##e", "##r", "##s", "##t")
    val vocab = seeds ++ merged
    val enc = WordPiece.encodeCorpus(
        Seq((1L, "lowest low lowly")).toDF("id", "text"), "id", "text", vocab)
      .select(concat_ws(" ", col("toks"))).as[String].head()
    // K=1: once-per-corpus suffix pairs fail the cnt ≥ 2 bar, so the
    // vocab is {##ow, ##owe, low, lowe} — lowest → lowe+##s+##t, and
    // lowly dead-ends after 'low' ('##l' was never a seed piece)
    assert(enc == "lowe ##s ##t low <unk>", enc)
  }

  test("greedy encoding: longest match, ## continuations, all-or-nothing unk") {
    val v = Set("un", "a", "b", "unb", "##able", "##ble", "##e")
    def enc(w: String) = WordPiece.greedyPieces(w, v, maxPieceLen = 8)
    assert(enc("unable") == List("un", "##able"))
    assert(enc("able") == List("a", "##ble"), "longest FIRST piece is 'a' (no 'able')")
    // 'unb' beats 'un' at position 0 (longest match) — and then "a" is
    // NOT a continuation piece ('##a' absent), so the word dead-ends
    assert(enc("unba") == Nil)
    assert(enc("unb") == List("unb"))
    // a mid-word dead end voids the WHOLE word (published rule)
    assert(enc("bx") == Nil)
    assert(enc("ablee") == List("a", "##ble", "##e"))
  }

  test("encodeCorpus: document order, unk substitution, empty docs kept") {
    val v = Seq("un", "a", "b", "##able", "##ble", "##e")
    val docs = Seq((1L, "unable able"), (2L, "bx"), (3L, "")).toDF("id", "text")
    val got = WordPiece.encodeCorpus(docs, "id", "text", v)
      .select(col("id"), concat_ws(" ", col("toks")).as("t"), col("n_tokens"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "un ##able a ##ble", 4L),
      (2L, "<unk>", 1L),
      (3L, "", 0L)), got.toString)
  }

  test("rounds guard refuses loudly; unrepeatable corpus learns nothing") {
    val e = intercept[IllegalArgumentException](
      WordPiece.train(corpus(1), "toks", rounds = 0))
    assert(e.getMessage.contains("rounds"), e.getMessage)
    val none = WordPiece.train(
      Seq(Seq("x", "y", "z")).toDF("toks"), "toks", rounds = 5)
    assert(none.count() == 0L, "no pair repeats — nothing to merge")
  }
}
