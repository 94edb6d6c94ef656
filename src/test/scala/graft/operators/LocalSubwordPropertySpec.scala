package graft.operators

import scala.collection.mutable

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property pin for the serial endgame's INCREMENTAL machinery (the
  * risky half of LocalSubword): the occurrence-indexed, multiset-diff
  * trainer must equal a NAIVE full-recount trainer — reimplemented here
  * from the published rules with zero shared helpers, so a bug in the
  * shared code cannot hide — on randomized corpora engineered for the
  * classic incremental-BPE traps: "a a a" overlap runs, l == r pairs,
  * a BASE symbol ("ab") that collides with a merged symbol (a+b),
  * weighted rows, and WordPiece's likelihood re-ranking where unit
  * counts shift every round. Pure JVM — hundreds of corpora in
  * milliseconds, far beyond what the Spark-backed parity spec
  * (SubwordEndgameSpec) can afford.
  */
class LocalSubwordPropertySpec extends AnyFunSuite {

  // the trap-rich alphabet: "ab" is a base symbol AND the concat of two
  // other base symbols, so merged-symbol collisions actually occur
  private val alphabet = Seq("a", "b", "c", "ab", "é")

  private def corpusGen: Gen[(Array[Array[String]], Array[Long])] =
    for {
      n <- Gen.choose(1, 14)
      rows <- Gen.listOfN(n, Gen.choose(0, 9)
        .flatMap(len => Gen.listOfN(len, Gen.oneOf(alphabet)).map(_.toArray)))
      ws <- Gen.listOfN(n, Gen.choose(1L, 5L))
    } yield (rows.toArray, ws.toArray)

  private def sample(round: Int): (Array[Array[String]], Array[Long]) =
    corpusGen.pureApply(Gen.Parameters.default, Seed(4242L + round))

  // ---- the independent naive oracle ----

  private def cmp(x: String, y: String): Int =
    UTF8String.fromString(x).compareTo(UTF8String.fromString(y))

  private def rewrite(row: Array[String], l: String, r: String,
      lr: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < row.length) {
      if (i + 1 < row.length && row(i) == l && row(i + 1) == r) {
        out += lr; i += 2
      } else { out += row(i); i += 1 }
    }
    out.toArray
  }

  private def recountPairs(rows: Array[Array[String]], ws: Array[Long]) = {
    val m = mutable.HashMap.empty[(String, String), Long]
    for (i <- rows.indices; j <- 0 until rows(i).length - 1) {
      val p = (rows(i)(j), rows(i)(j + 1))
      m.update(p, m.getOrElse(p, 0L) + ws(i))
    }
    m
  }

  private def naiveBpe(rows0: Array[Array[String]], ws: Array[Long],
      rounds: Int): Seq[(Int, String, String, Long)] = {
    var rows = rows0.map(_.clone())
    val out = mutable.ListBuffer.empty[(Int, String, String, Long)]
    var round = 1
    var stop = false
    while (round <= rounds && !stop) {
      val m = recountPairs(rows, ws).filter(_._2 >= 2L)
      if (m.isEmpty) stop = true
      else {
        val (p, c) = m.toSeq.minBy(identity)(Ordering.fromLessThan {
          (a, b) =>
            if (a._2 != b._2) a._2 > b._2
            else if (cmp(a._1._1, b._1._1) != 0) cmp(a._1._1, b._1._1) < 0
            else cmp(a._1._2, b._1._2) < 0
        })
        out += ((round, p._1, p._2, c))
        rows = rows.map(rewrite(_, p._1, p._2, p._1 + p._2))
        round += 1
      }
    }
    out.toSeq
  }

  private def naiveWordPiece(rows0: Array[Array[String]], ws: Array[Long],
      rounds: Int, merged: (String, String) => String)
      : Seq[(Int, String, String, Long, Long, Long)] = {
    var rows = rows0.map(_.clone())
    val out = mutable.ListBuffer.empty[(Int, String, String, Long, Long, Long)]
    var round = 1
    var stop = false
    while (round <= rounds && !stop) {
      val pairs = recountPairs(rows, ws).filter(_._2 >= 2L)
      val units = mutable.HashMap.empty[String, Long]
      for (i <- rows.indices; s <- rows(i))
        units.update(s, units.getOrElse(s, 0L) + ws(i))
      if (pairs.isEmpty) stop = true
      else {
        // argmax of cnt/(lc·rc) by exact cross-multiplication
        val best = pairs.toSeq.minBy(identity)(Ordering.fromLessThan {
          (a, b) =>
            val sa = BigInt(a._2) * BigInt(units(b._1._1)) * BigInt(units(b._1._2))
            val sb = BigInt(b._2) * BigInt(units(a._1._1)) * BigInt(units(a._1._2))
            if (sa != sb) sa > sb
            else if (cmp(a._1._1, b._1._1) != 0) cmp(a._1._1, b._1._1) < 0
            else cmp(a._1._2, b._1._2) < 0
        })
        val ((l, r), c) = best
        out += ((round, l, r, c, units(l), units(r)))
        rows = rows.map(rewrite(_, l, r, merged(l, r)))
        round += 1
      }
    }
    out.toSeq
  }

  test("incremental bpeLocal == naive full-recount trainer (200 corpora)") {
    (1 to 200).foreach { round =>
      val (rows, ws) = sample(round)
      val rounds = 1 + round % 12
      val got = LocalSubword.bpeLocal(rows.map(_.clone()), ws, rounds)
      val want = naiveBpe(rows, ws, rounds)
      assert(got == want, s"seed round $round rounds=$rounds\n" +
        s"corpus=${rows.map(_.mkString("[", " ", "]")).mkString(",")} w=${ws.mkString(",")}")
    }
  }

  test("incremental wordPieceLocal == naive full-recount trainer (200 corpora)") {
    val merged = (l: String, r: String) =>
      l + (if (r.startsWith("##")) r.substring(2) else r)
    (1 to 200).foreach { round =>
      val (rows, ws) = sample(1000 + round)
      val rounds = 1 + round % 10
      val got = LocalSubword.wordPieceLocal(rows.map(_.clone()), ws, rounds, merged)
      val want = naiveWordPiece(rows, ws, rounds, merged)
      assert(got == want, s"seed round $round rounds=$rounds\n" +
        s"corpus=${rows.map(_.mkString("[", " ", "]")).mkString(",")} w=${ws.mkString(",")}")
    }
  }
}
