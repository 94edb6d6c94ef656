package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.UnigramLm
import org.apache.spark.sql.functions._

/** Laws for the unigram-LM (SentencePiece-style) trainer. The t56 gate
  * hash-compares the full 3-round trace cross-engine; these pin the
  * pieces the gate can't see in isolation: the Viterbi DP's exact
  * tie-breaks, the hand-traced EM round (every intermediate number
  * derived on paper in the t56 comment), and the loud boundaries.
  */
class UnigramLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixtureDocs(reps: Int) =
    spark.range(reps).select(
      concat(flatten(array_repeat(array(lit("aab")), 10)),
        array(lit("ab")), array(lit("aa"))).as("toks"))

  test("hand-traced EM: seed → round-1 counts → round-2 FLIP → round-3 fixed point") {
    val got = UnigramLm.train(fixtureDocs(1), "toks", rounds = 3, maxPieceLen = 2)
      .as[(Long, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // round 1 under seed probs (a 23/56, b/aa/ab 11/56):
    //   aab → [a][ab], ab → [ab], aa → [aa]
    assert(got((1L, "a")) == ((10L, 454545L)))
    assert(got((1L, "ab")) == ((11L, 500000L)))
    assert(got((1L, "aa")) == ((1L, 45454L)))
    assert(got((1L, "b")) == ((0L, 0L)))
    // round 2: re-weighted probs flip "aa" to [a][a] — (1+1)·26 = 52
    // beats (10+1)² = 121 the OTHER way, so [aa] loses
    assert(got((2L, "a")) == ((12L, 521739L)))
    assert(got((2L, "ab")) == ((11L, 478260L)))
    assert(got((2L, "aa")) == ((0L, 0L)))
    // round 3 == round 2: the EM fixed point
    Seq("a", "aa", "ab", "b").foreach { p =>
      assert(got((3L, p)) == got((2L, p)), s"round 3 must be the fixed point at piece $p")
    }
  }

  test("trace is frequency-scale-invariant: 7× the corpus multiplies counts, keeps prob_fp") {
    val one = UnigramLm.train(fixtureDocs(1), "toks", rounds = 2, maxPieceLen = 2)
      .as[(Long, String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val seven = UnigramLm.train(fixtureDocs(7), "toks", rounds = 2, maxPieceLen = 2)
      .as[(Long, String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(one.map(r => (r._1, r._2, r._3 * 7, r._4)).toSeq ==
      seven.map(r => (r._1, r._2, r._3, r._4)).toSeq)
  }

  test("viterbi: exact DP with total tie-break; unknown characters refuse with Nil") {
    val logp = Map("a" -> -100L, "b" -> -100L, "ab" -> -150L)
    // [ab] (-150) beats [a][b] (-200)
    assert(UnigramLm.viterbi("ab", logp, 2) == List("ab"))
    // score tie: [ab][a] = [a][ab] = -250 → fewer-pieces equal (2 vs 2)
    // → the per-position rule picks the smaller FINAL piece ("a" < "ba")
    assert(UnigramLm.viterbi("aba", logp, 2) == List("ab", "a"))
    // fewer pieces wins an exact score tie
    val tie = Map("a" -> -100L, "aa" -> -200L)
    assert(UnigramLm.viterbi("aa", tie, 2) == List("aa"))
    assert(UnigramLm.viterbi("ax", logp, 2) == Nil)
    assert(UnigramLm.viterbi("", logp, 2) == Nil)
  }

  test("encodeCorpus: fixed-point segmentations, <unk> routing, empty docs kept") {
    // train on the fixture, encode with the FINAL round's inventory
    val pieces = UnigramLm.train(fixtureDocs(1), "toks", rounds = 3, maxPieceLen = 2)
      .filter(col("round") === 3L)
      .as[(Long, String, Long, Long)].collect().map(r => (r._2, r._3)).toSeq
    val docs = Seq(
      (1L, "aab ab aa"),   // the three trained words
      (2L, "aaxb aa"),     // 'x' is outside every piece → <unk>
      (3L, "")             // empty doc keeps an empty array
    ).toDF("id", "text")
    val got = UnigramLm.encodeCorpus(docs, "id", "text", pieces, maxPieceLen = 2)
      .select(col("id"), concat_ws("|", col("toks")).as("tj"), col("n_tokens"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, "a|ab|ab|a|a", 5L)),
      "fixed-point model must segment aa as [a][a] — the EM flip is visible in encoding")
    assert(got(1) == ((2L, "<unk>|a|a", 3L)))
    assert(got(2) == ((3L, "", 0L)))
  }

  test("trainPruned: loss-driven drop inverts count order; chars never prune") {
    // {ab×6, cd×2, a×4, b×4}: 'ab' is used 3× more than 'cd' but its
    // alternative [a][b] is ~1.8 nats — 'cd' without itself falls to two
    // α-floor singletons. Loss ranks ab BELOW cd, so the HIGH-count
    // piece drops (a usage-ranked pruner keeps it and fails here).
    val docs = spark.range(10).select(
      concat(
        flatten(array_repeat(array(lit("ab")), 6)),
        flatten(array_repeat(array(lit("cd")), 2)),
        flatten(array_repeat(array(lit("a")), 4)),
        flatten(array_repeat(array(lit("b")), 4))).as("toks"))
    val got = UnigramLm.trainPruned(docs, "toks", targetVocab = 5,
      emRoundsPerStage = 2, maxPieceLen = 2)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq("a", "b", "c", "cd", "d"), s"got $got")
    assert(got.map(_._2) == Seq(100L, 100L, 0L, 20L, 0L))
    // pruning below the alphabet refuses loudly
    val e = intercept[IllegalArgumentException] {
      UnigramLm.trainPruned(docs, "toks", targetVocab = 2,
        emRoundsPerStage = 1, maxPieceLen = 2)
    }
    assert(e.getMessage.contains("alphabet"), e.getMessage)
  }

  test("soft EM: hand-built lattice on one word — exact BigInt forward-backward") {
    // corpus = the single word "ab"; seed counts a:1 b:1 ab:1, total 3
    // → prob0 = 333333 each → q = 333334 each, T = 3·333334 = 1000002.
    // Lattice: [ab] (num q·T) vs [a][b] (num q²); Z = q·T + q².
    val docs = spark.range(1).select(array(lit("ab")).as("toks"))
    val got = UnigramLm.trainSoft(docs, "toks", rounds = 1, maxPieceLen = 2)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._2 -> (r._3, r._4)).toMap
    val q = BigInt(333334)
    val t = q * 3
    val z = q * t + q * q
    val eAb = (q * t * 1000000 / z).toLong
    val eA = (q * q * 1000000 / z).toLong
    assert(got("ab")._1 == eAb)
    assert(got("a")._1 == eA && got("b")._1 == eA)
    val tot = BigInt(eAb) + 2 * BigInt(eA)
    assert(got("ab")._2 == (BigInt(eAb) * 1000000 / tot).toLong)
    // posterior mass: [ab] carries ~75% (q·T vs q² at q≈T/3 → 3:1)
    assert(got("ab")._1 > 700000L && got("ab")._1 < 800000L)
  }

  test("soft EM: a single-segmentation word earns exact hard counts") {
    // maxPieceLen 1 forces [c][d]: posterior 1, ec = n·1e6 exactly
    val docs = spark.range(1).select(
      concat(array_repeat(lit("cd"), 3)).as("toks"))
    val got = UnigramLm.trainSoft(docs, "toks", rounds = 2, maxPieceLen = 1)
      .as[(Long, String, Long, Long)].collect()
      .filter(_._1 == 2L).map(r => r._2 -> r._3).toMap
    assert(got == Map("c" -> 3000000L, "d" -> 3000000L))
  }

  test("soft EM splits mass where hard EM commits: 'aa' under the t56 fixture") {
    val soft = UnigramLm.trainSoft(fixtureDocs(1), "toks", rounds = 1, maxPieceLen = 2)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._2 -> r._3).toMap
    // hard EM round 1 gave aa exactly 1 word's worth (1e6 in fp units,
    // all from the aa word, none from aab); soft EM must give it MORE
    // than that (partial credit from aab's [aa][b] path) but strictly
    // less than its 11-word occurrence ceiling (1×aa + 10×aab)
    assert(soft("aa") > 1000000L && soft("aa") < 11000000L, s"aa = ${soft("aa")}")
    // every candidate keeps nonzero expected mass (no hard zeros)
    Seq("a", "b", "aa", "ab").foreach(p => assert(soft(p) > 0L, s"piece $p"))
  }

  test("soft EM is deterministic: identical trace on re-run") {
    val a = UnigramLm.trainSoft(fixtureDocs(3), "toks", rounds = 2, maxPieceLen = 2)
      .as[(Long, String, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val b = UnigramLm.trainSoft(fixtureDocs(3), "toks", rounds = 2, maxPieceLen = 2)
      .as[(Long, String, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(a == b)
  }

  test("loud boundaries: candidate cap and alpha floor") {
    val e = intercept[IllegalArgumentException] {
      UnigramLm.train(fixtureDocs(1), "toks", rounds = 1, maxPieceLen = 2,
        maxCandidates = 3)
    }
    assert(e.getMessage.contains("maxCandidates"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      UnigramLm.train(fixtureDocs(1), "toks", rounds = 1, maxPieceLen = 2, alpha = 0L)
    }
    assert(e2.getMessage.contains("alpha"), e2.getMessage)
  }
}
