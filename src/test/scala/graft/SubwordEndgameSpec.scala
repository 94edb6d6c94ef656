package graft

import graft.operators.{BpeTrain, ByteBpe, WordPiece}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The subword trainers' serial endgame (LocalSubword — the Scc/Bfs
  * `localFinishMaxRows` doctrine killing the one-Spark-job-per-merge
  * scheduling wall) must be BIT-IDENTICAL to the distributed per-round
  * loop: budget=0 forces the distributed path, the default budget takes
  * the endgame, and the full merge tables are compared row for row.
  * Fixtures deliberately hit the incremental-count edge cases: l == r
  * pairs over odd runs ("a a a"), merges that create new pairs hotter
  * than surviving old ones, frequency-weighted histograms (ByteBpe),
  * WordPiece's likelihood re-ranking where a unit-count drop RAISES a
  * surviving candidate's score (the reason a stale-entry max-heap is
  * unsound and the endgame scans the candidate map).
  */
class SubwordEndgameSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def table(df: DataFrame): Seq[Seq[Any]] =
    df.orderBy(col("round")).collect().toSeq.map(_.toSeq)

  // symbol corpus with overlap runs, ties, and merge-created pairs;
  // duplicated rows exercise weighting-by-multiplicity
  private lazy val symDocs = Seq(
    Seq("a", "a", "a", "b"),
    Seq("a", "a", "a", "b"),
    Seq("b", "a", "a", "c"),
    Seq("c", "a", "b", "a", "b"),
    Seq("x", "y", "x", "y", "x", "y"),
    Seq("a")).toDF("toks")

  test("BpeTrain: endgame == forced-distributed, full table") {
    val local = table(BpeTrain.train(symDocs, "toks", rounds = 8))
    val dist = table(BpeTrain.train(symDocs, "toks", rounds = 8,
      localFinishMaxRows = 0L))
    assert(local.nonEmpty && local == dist)
  }

  test("ByteBpe: endgame == forced-distributed on real multi-byte text") {
    val docs = Seq("aé bé", "aé bé x", "don't stop don't",
      "naïve café!", "日本 語", "a  b").toDF("text")
    val local = table(ByteBpe.train(docs, "text", rounds = 10))
    val dist = table(ByteBpe.train(docs, "text", rounds = 10,
      localFinishMaxRows = 0L))
    assert(local.nonEmpty && local == dist)
  }

  test("WordPiece: endgame == forced-distributed incl. unit-count re-ranking") {
    // the t80 shape: rare-pair-of-rare-symbols outscores frequent pair;
    // after round 1 the unit counts shift and re-rank the survivors
    val docs = Seq(
      Seq("q", "z"), Seq("q", "z"),
      Seq("a", "b"), Seq("a", "b"), Seq("a", "b"), Seq("a", "b"),
      Seq("a", "b", "q"), Seq("b", "a", "z"),
      Seq("a", "a", "a")).toDF("toks")
    val local = table(WordPiece.train(docs, "toks", rounds = 6))
    val dist = table(WordPiece.train(docs, "toks", rounds = 6,
      localFinishMaxRows = 0L))
    assert(local.nonEmpty && local == dist)
  }

  test("WordPiece from words: endgame == forced-distributed, ##-fusion") {
    val docs = Seq("unable able", "unable unable bx", "able bx able")
      .toDF("text")
    val local = table(WordPiece.trainFromWords(docs, "text", rounds = 8))
    val dist = table(WordPiece.trainFromWords(docs, "text", rounds = 8,
      localFinishMaxRows = 0L))
    assert(local.nonEmpty && local == dist)
  }

  test("early stop parity: both paths stop when no pair repeats") {
    val docs = Seq(Seq("a", "b", "c"), Seq("d", "e")).toDF("toks")
    val local = table(BpeTrain.train(docs, "toks", rounds = 5))
    val dist = table(BpeTrain.train(docs, "toks", rounds = 5,
      localFinishMaxRows = 0L))
    assert(local.isEmpty && dist.isEmpty)
  }

  test("deep training is wall-clock sane in the endgame (120 rounds)") {
    // ~800 distinct-ish pseudo-words; 120 merge rounds should take
    // seconds driver-side where the distributed path would schedule 120
    // sequential jobs
    val docs = spark.range(3000)
      .select(concat_ws(" ",
        concat(lit("alphabet"), (col("id") % 211).cast("string")),
        concat(lit("bravado"), (col("id") % 127).cast("string")),
        concat(lit("charlatan"), (col("id") % 89).cast("string")),
        concat(lit("alphabet"), (col("id") % 211).cast("string"))).as("text"))
    val t0 = System.nanoTime()
    val merges = ByteBpe.train(docs, "text", rounds = 120)
    val n = merges.count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(n == 120L, s"expected 120 merges, got $n")
    assert(secs < 120.0, s"endgame took ${secs}s")
  }
}
