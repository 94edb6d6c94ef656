package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Greedy complement PAIR packing — the published "sorted best-fit, at
  * most two sequences per pack" baseline of the sequence-packing
  * literature (Krell et al. 2021's analysis of LM corpora shows packs
  * of ≤2-3 sequences already recover most padding waste): process
  * lengths longest-first; the current longest doc pairs with the
  * LARGEST remaining length m with n + m ≤ budget (itself, when ≥2 of
  * that length remain), else packs alone. Where t34/t35's concat-and-
  * chunk CUTS documents at sequence boundaries, pair packing keeps
  * every document whole — the padding-free variant for training recipes
  * that forbid cross-document attention.
  *
  * The distributed shape is the histogram trick: per-doc lengths are
  * bounded by `budget`, so the groupBy(length) histogram has ≤ budget
  * rows — it collects to the driver (loud refusal past the bound), the
  * greedy runs there in O(distinct²) worst case over COUNTS (never
  * docs), and the result broadcasts back as rank SPANS: within each
  * length, docs are consumed in doc-order rank, so a span
  * (length, fromRank, toRank → partnerLen) assigns every doc without
  * ever materializing pairs. One window shuffle on the length key +
  * one broadcast range join; plan size is independent of corpus size.
  *
  * Determinism contract: within a length, ranks follow ascending id;
  * span emission follows the greedy's processing order; everything
  * else is count arithmetic. The t68 oracle replays the greedy's
  * closed form on a fixture whose class counts make every branch
  * (no-partner, cross-pair, self-pair, odd-leftover cascade) fire.
  */
object PairPacking {

  /** One assignment span: docs of `len` with rank in [fromRank, toRank]
    * pair with a doc of `partnerLen` (None = pack alone). */
  private[graft] case class Span(len: Long, fromRank: Long, toRank: Long,
      partnerLen: Option[Long])

  /** The histogram greedy. `hist` maps length → count (all lengths must
    * be in (0, budget]). Returns spans in processing order. */
  private[graft] def planSpans(hist: Map[Long, Long], budget: Long): Seq[Span] = {
    require(hist.keys.forall(l => l > 0 && l <= budget),
      s"lengths must be in (0, $budget]: ${hist.keys.filterNot(l => l > 0 && l <= budget).take(3)}")
    val counts = scala.collection.mutable.TreeMap.empty[Long, Long] ++
      hist.filter(_._2 > 0)
    val used = scala.collection.mutable.HashMap.empty[Long, Long].withDefaultValue(0L)
    val out = Seq.newBuilder[Span]
    def take(len: Long, k: Long, partner: Option[Long]): Unit = {
      out += Span(len, used(len) + 1, used(len) + k, partner)
      used(len) += k
      val left = counts(len) - k
      if (left == 0) counts.remove(len) else counts(len) = left
    }
    while (counts.nonEmpty) {
      val n = counts.lastKey
      val cn = counts(n)
      val cap = budget - n
      // largest partner ≤ cap with availability (self needs ≥ 2)
      val partner = counts.rangeTo(cap).keysIterator.foldLeft(Option.empty[Long]) {
        (best, m) => if (m != n || cn >= 2) Some(m) else best
      }
      partner match {
        case None =>
          take(n, cn, None) // nothing fits beside n: all of them pack alone
        case Some(m) if m == n =>
          val pairs = cn / 2
          take(n, 2 * pairs, Some(n))
        // an odd survivor loops back and finds a smaller partner (or none)
        case Some(m) =>
          val k = math.min(cn, counts(m))
          take(n, k, Some(m))
          take(m, k, Some(n))
      }
    }
    out.result()
  }

  /** One greedy multi-item span: docs of `len` with rank in
    * [fromRank, toRank] belong to packs shaped `template` (lengths in
    * descending order). */
  private[graft] case class GreedySpan(len: Long, fromRank: Long, toRank: Long,
      template: Seq[Long])

  /** The MULTI-item histogram greedy — [[planSpans]] without the
    * two-per-pack cap (the shape the packing literature calls greedy /
    * shortest-pack-first): each pack starts from the largest remaining
    * length and keeps adding the LARGEST length that still fits the
    * remaining budget (a length may repeat if enough of it remains),
    * closing when nothing fits. Because the choice depends only on the
    * COUNTS, the pack template repeats in bulk: reps = min over the
    * template's distinct lengths of ⌊count/uses⌋ — exactly how many
    * one-at-a-time packs would reuse the template before some length
    * runs short — so the loop runs O(distinct templates), never O(docs).
    * Within a length, docs are consumed in rank (doc-order) across
    * templates, the [[planSpans]] contract. */
  private[graft] def planGreedySpans(hist: Map[Long, Long], budget: Long): Seq[GreedySpan] = {
    require(hist.keys.forall(l => l > 0 && l <= budget),
      s"lengths must be in (0, $budget]: ${hist.keys.filterNot(l => l > 0 && l <= budget).take(3)}")
    val counts = scala.collection.mutable.TreeMap.empty[Long, Long] ++
      hist.filter(_._2 > 0)
    val used = scala.collection.mutable.HashMap.empty[Long, Long].withDefaultValue(0L)
    val out = Seq.newBuilder[GreedySpan]
    while (counts.nonEmpty) {
      // build one pack template greedily against the live counts
      val uses = scala.collection.mutable.HashMap.empty[Long, Long].withDefaultValue(0L)
      val template = Seq.newBuilder[Long]
      var left = budget
      var fits = true
      while (fits) {
        // largest m ≤ left with count(m) > uses(m)
        val m = counts.rangeTo(left).foldLeft(Option.empty[Long]) {
          case (best, (k, c)) => if (c > uses(k)) Some(k) else best
        }
        m match {
          case Some(k) => template += k; uses(k) += 1; left -= k
          case None => fits = false
        }
      }
      val t = template.result()
      // counts is nonempty and every length ≤ budget, so t is nonempty
      val reps = uses.iterator.map { case (k, u) => counts(k) / u }.min
      val shape = t.sorted(Ordering[Long].reverse)
      shape.distinct.foreach { k => // deterministic span order: template desc
        val u = uses(k)
        out += GreedySpan(k, used(k) + 1, used(k) + u * reps, shape)
        used(k) += u * reps
        val c = counts(k) - u * reps
        if (c == 0) counts.remove(k) else counts(k) = c
      }
    }
    out.result()
  }

  /** [[pack]]'s multi-item twin over [[planGreedySpans]]. Output:
    * (idCol, len, rank_in_len, pack_size, pack_fill, pack_csv — the
    * pack's lengths, descending, comma-joined). */
  def packGreedy(docs: DataFrame, idCol: String, lenCol: String, budget: Long,
      maxDistinct: Int = 100000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lens = docs.select(col(idCol), col(lenCol).cast("long").as("len"))
    val hist = lens.groupBy(col("len")).agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect()
    require(hist.length <= maxDistinct,
      s"${hist.length} distinct lengths exceed maxDistinct=$maxDistinct")
    val spans = planGreedySpans(hist.toMap, budget)
    val spanDf = spans.map(s => (s.len, s.fromRank, s.toRank,
        s.template.length.toLong, s.template.sum, s.template.mkString(",")))
      .toDF("len", "__from", "__to", "pack_size", "pack_fill", "pack_csv")
    val ranked = lens.withColumn("rank_in_len",
      row_number().over(Window.partitionBy(col("len")).orderBy(col(idCol))).cast("long"))
    ranked.join(broadcast(spanDf),
        ranked("len") === spanDf("len") &&
          col("rank_in_len") >= col("__from") && col("rank_in_len") <= col("__to"))
      .select(ranked(idCol), ranked("len"), col("rank_in_len"),
        col("pack_size"), col("pack_fill"), col("pack_csv"))
  }

  /** Pack `docs` (idCol, lenCol with integral token lengths ≤ budget —
    * longer docs must be chunked upstream, refused loudly here) into
    * pairs. Output: (idCol, len, rank_in_len, partner_len NULLable,
    * pack_size, pack_fill = len + partner). */
  def pack(docs: DataFrame, idCol: String, lenCol: String, budget: Long,
      maxDistinct: Int = 100000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lens = docs.select(col(idCol), col(lenCol).cast("long").as("len"))
    val hist = lens.groupBy(col("len")).agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect()
    require(hist.length <= maxDistinct,
      s"${hist.length} distinct lengths exceed maxDistinct=$maxDistinct")
    val spans = planSpans(hist.toMap, budget)
    val spanDf = spans.map(s => (s.len, s.fromRank, s.toRank, s.partnerLen))
      .toDF("len", "__from", "__to", "partner_len")
    val ranked = lens.withColumn("rank_in_len",
      row_number().over(Window.partitionBy(col("len")).orderBy(col(idCol))).cast("long"))
    ranked.join(broadcast(spanDf),
        ranked("len") === spanDf("len") &&
          col("rank_in_len") >= col("__from") && col("rank_in_len") <= col("__to"))
      .select(ranked(idCol), ranked("len"), col("rank_in_len"), col("partner_len"),
        when(col("partner_len").isNull, 1L).otherwise(2L).as("pack_size"),
        (ranked("len") + coalesce(col("partner_len"), lit(0L))).as("pack_fill"))
  }
}
