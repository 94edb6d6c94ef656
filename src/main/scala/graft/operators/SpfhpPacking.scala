package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SPFHP — shortest-pack-first (best-fit-decreasing) histogram packing,
  * the published heuristic of the LM sequence-packing literature (Krell
  * et al. 2021's SPFHP; classical best-fit-decreasing in bin-packing
  * terms), completing the packing family between [[PairPacking]]'s
  * one-bin-at-a-time greedy (t74) and [[OptimalPacking]]'s certified
  * exact solve (t78): unlike the greedy, packs stay OPEN — a later
  * (shorter) length class can still enter a pack opened for an earlier
  * length, which is the property that recovers padding the greedy
  * strands.
  *
  * Semantics (documented precisely — the tie rules are this
  * implementation's contract, pinned by the t79 oracle): lengths process
  * in DESCENDING order; each sequence of length l goes, one at a time,
  * into the open pack with the SMALLEST remaining capacity ≥ l (best
  * fit; ties resolve to the earliest-created pack class), else opens a
  * new pack. Because a just-filled pack whose remaining capacity is
  * still ≥ l immediately becomes the best fit for the next sequence,
  * consecutive sequences CASCADE into the same pack until it drops below
  * l — so each pack of a class at remaining r absorbs a = ⌊r/l⌋
  * sequences, and the whole one-at-a-time process collapses to
  * COUNT-SCALE bulk arithmetic over pack classes (never a per-document
  * driver loop — the 100 TB posture [[PairPacking]] established).
  *
  * Rank assignment: within a length, documents are consumed in doc-order
  * rank; a class's packs take consecutive rank blocks, so every slot is
  * (len, firstRank, stride) and membership is pure modular arithmetic —
  * the broadcast span join's predicate. Class count is guarded loudly.
  */
object SpfhpPacking {

  /** One per-length slot of a pack class: pack i (1-based) of the class
    * holds the doc of `len` with rank firstRank + (i-1)·stride. */
  private[graft] case class SpfhpSlot(len: Long, firstRank: Long, stride: Long)

  /** A set of identically-shaped open packs: composition in FILL order,
    * shared remaining capacity, pack count, and per-constituent slots. */
  private[graft] case class SpfhpClass(
      comp: List[Long], remaining: Long, count: Long, slots: Vector[SpfhpSlot])

  /** The count-scale SPFHP plan: final pack classes in creation order. */
  private[graft] def planSpfhp(hist: Map[Long, Long], budget: Long,
      maxClasses: Int = 100000): Seq[SpfhpClass] = {
    // cascade depths materialize via List.fill(t.toInt) with t ≤ budget —
    // an Int.MaxValue budget cap keeps the truncation impossible
    require(budget >= 1 && budget <= Int.MaxValue,
      s"budget must be in [1, ${Int.MaxValue}], got $budget")
    require(hist.keys.forall(l => l > 0 && l <= budget),
      s"lengths must be in (0, $budget]: ${hist.keys.filterNot(l => l > 0 && l <= budget).take(3)}")
    val classes = scala.collection.mutable.ArrayBuffer.empty[SpfhpClass]
    def guard(): Unit = require(classes.length <= maxClasses,
      s"SPFHP class count exceeds maxClasses=$maxClasses — " +
        "degenerate histogram; use PairPacking.packGreedy")
    val lengths = hist.keys.toSeq.sorted(Ordering[Long].reverse)
    lengths.foreach { l =>
      var c = hist(l)
      var used = 0L
      while (c > 0L) {
        // best fit: smallest remaining ≥ l, ties to the earliest class
        var bi = -1
        var i = 0
        while (i < classes.length) {
          val cl = classes(i)
          if (cl.count > 0 && cl.remaining >= l &&
              (bi < 0 || cl.remaining < classes(bi).remaining)) bi = i
          i += 1
        }
        if (bi >= 0) {
          val a0 = classes(bi)
          val a = a0.remaining / l // cascade depth per pack
          if (c >= a) {
            val fullPacks = math.min(a0.count, c / a)
            val newSlots = (1L to a).map(j => SpfhpSlot(l, used + j, a)).toVector
            classes += SpfhpClass(a0.comp ++ List.fill(a.toInt)(l),
              a0.remaining - a * l, fullPacks, a0.slots ++ newSlots)
            guard()
            val restCount = a0.count - fullPacks
            if (restCount == 0L) classes.remove(bi)
            else classes(bi) = a0.copy(count = restCount,
              slots = a0.slots.map(s => s.copy(firstRank = s.firstRank + fullPacks * s.stride)))
            used += fullPacks * a
            c -= fullPacks * a
          } else {
            // fewer sequences than one pack's cascade: partial-fill ONE pack
            val newSlots = (1L to c).map(j => SpfhpSlot(l, used + j, 1L)).toVector
            classes += SpfhpClass(a0.comp ++ List.fill(c.toInt)(l),
              a0.remaining - c * l, 1L, a0.slots ++ newSlots)
            guard()
            if (a0.count == 1L) classes.remove(bi)
            else classes(bi) = a0.copy(count = a0.count - 1L,
              slots = a0.slots.map(s => s.copy(firstRank = s.firstRank + s.stride)))
            used += c
            c = 0L
          }
        } else {
          // nothing fits: open packs; each fresh pack cascades to t = ⌊budget/l⌋
          val t = budget / l
          val fullPacks = c / t
          if (fullPacks > 0L) {
            classes += SpfhpClass(List.fill(t.toInt)(l), budget - t * l, fullPacks,
              (1L to t).map(j => SpfhpSlot(l, used + j, t)).toVector)
            guard()
            used += fullPacks * t
            c -= fullPacks * t
          }
          val rem = c
          if (rem > 0L) {
            classes += SpfhpClass(List.fill(rem.toInt)(l), budget - rem * l, 1L,
              (1L to rem).map(j => SpfhpSlot(l, used + j, 1L)).toVector)
            guard()
            used += rem
            c = 0L
          }
        }
      }
    }
    classes.toSeq
  }

  /** SPFHP packing of `docs` (idCol, lenCol ≤ budget). Output:
    * (idCol, len, rank_in_len, pack_size, pack_fill, pack_csv — the
    * pack's lengths, DESCENDING, comma-joined: [[PairPacking.packGreedy]]'s
    * contract). */
  def pack(docs: DataFrame, idCol: String, lenCol: String, budget: Long,
      maxDistinct: Int = 100000, maxClasses: Int = 100000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lens = docs.select(col(idCol), col(lenCol).cast("long").as("len"))
    val hist = lens.groupBy(col("len")).agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect()
    require(hist.length <= maxDistinct,
      s"${hist.length} distinct lengths exceed maxDistinct=$maxDistinct")
    val classes = planSpfhp(hist.toMap, budget, maxClasses)
    val spans = classes.flatMap { cl =>
      val shape = cl.comp.sorted(Ordering[Long].reverse)
      val csv = shape.mkString(",")
      cl.slots.map(s => (s.len, s.firstRank, s.stride, cl.count,
        cl.comp.length.toLong, cl.comp.sum, csv))
    }
    val spanDf = spans
      .toDF("len", "__first", "__stride", "__count", "pack_size", "pack_fill", "pack_csv")
    val ranked = lens.withColumn("rank_in_len",
      row_number().over(Window.partitionBy(col("len")).orderBy(col(idCol))).cast("long"))
    ranked.join(broadcast(spanDf),
        ranked("len") === spanDf("len") &&
          col("rank_in_len") >= col("__first") &&
          col("rank_in_len") <= col("__first") + (col("__count") - 1L) * col("__stride") &&
          pmod(col("rank_in_len") - col("__first"), col("__stride")) === 0L)
      .select(ranked(idCol), ranked("len"), col("rank_in_len"),
        col("pack_size"), col("pack_fill"), col("pack_csv"))
  }
}
