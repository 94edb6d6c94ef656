package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CERTIFIED-OPTIMAL histogram sequence packing — the exact counterpart
  * of [[PairPacking.packGreedy]]'s greedy (t74) for the packs-of-whole-
  * documents training recipe. Greedy/best-fit-decreasing is provably
  * suboptimal on real histograms (the gate's fixture is one: greedy
  * burns ~6.3 packs per 10 docs where 5 suffice); the packing
  * literature's exact formulation is CUTTING STOCK (Gilmore–Gomory
  * 1961, the published method; Krell et al. 2021 §NNLSHP is the same
  * pattern-LP idea for LM sequence packing):
  *
  *   minimize Σ_p m_p   s.t.   Σ_p m_p · uses(p, len) = hist(len),  m ≥ 0
  *
  * over PATTERNS p (multisets of lengths with sum ≤ budget). The
  * pipeline here, all count-scale and exact:
  *
  *  1. enumerate patterns canonically (descending lexicographic;
  *     per-length multiplicity capped by both budget and the histogram
  *     — a pattern the corpus cannot fill is never generated), loud
  *     refusal past `maxPatterns`;
  *  2. solve the pattern LP EXACTLY — two-phase primal simplex over
  *     BigInt rationals with Bland's rule (no cycling, no floats, no
  *     seed: bit-identical plan on every run and partitioning);
  *  3. certify integrality: take ⌊m*⌋, expand the (provably count-
  *     scale: ≤ #lengths fractional basics × items-per-pattern) residual
  *     into individual items and solve it EXACTLY by branch-and-bound;
  *     if ⌈z*⌉ = Σ⌊m*⌋ + residual bins, the integer solution is
  *     CERTIFIED optimal (the LP is a lower bound). Otherwise refuse
  *     loudly naming the greedy route — by the MIRUP property of
  *     cutting stock the gap exceeds the certificate only on
  *     pathological instances, and an uncertified "optimal" would be a
  *     lie in the gate hash.
  *
  * Distributed shape: identical to [[PairPacking]] — one groupBy(length)
  * histogram collect (≤ budget rows, loud refusal), the driver solve
  * over COUNTS, and a broadcast rank-span join back; within a length,
  * docs are consumed in doc-order rank across pattern instances in
  * canonical order, so `pack_id` is a pure arithmetic function of the
  * rank. Plan size is independent of corpus size.
  */
object OptimalPacking {

  /** Exact rational arithmetic over BigInt — the "exact rational pivots"
    * the simplex needs for determinism (an IEEE simplex tie-breaks by
    * rounding noise; this one cannot). Always stored reduced with d > 0. */
  private[graft] final case class Rat(n: BigInt, d: BigInt) extends Ordered[Rat] {
    def +(o: Rat): Rat = Rat.of(n * o.d + o.n * d, d * o.d)
    def -(o: Rat): Rat = Rat.of(n * o.d - o.n * d, d * o.d)
    def *(o: Rat): Rat = Rat.of(n * o.n, d * o.d)
    def /(o: Rat): Rat = { require(o.n != 0, "division by zero"); Rat.of(n * o.d, d * o.n) }
    def compare(o: Rat): Int = (n * o.d).compare(o.n * d)
    def isZero: Boolean = n == 0
    def floor: BigInt = if (n >= 0) n / d else -((-n + d - 1) / d)
    def ceil: BigInt = -Rat(-n, d).floor
  }
  private[graft] object Rat {
    val Zero: Rat = Rat(0, 1)
    val One: Rat = Rat(1, 1)
    def of(n: BigInt, d: BigInt): Rat = {
      require(d != 0, "zero denominator")
      val s = if (d < 0) -1 else 1
      val g = n.gcd(d)
      if (g == 0) Rat(0, 1) else Rat(s * n / g, s * d / g)
    }
    def apply(v: BigInt): Rat = Rat(v, 1)
  }

  /** All patterns (multisets of `lengths`, descending within a pattern)
    * with total ≤ budget, per-length multiplicity ≤ min(⌊budget/len⌋,
    * hist(len)), in DESCENDING LEXICOGRAPHIC order — the canonical order
    * pack ids are assigned in. Empty pattern excluded. */
  private[graft] def enumeratePatterns(
      hist: Map[Long, Long], budget: Long, maxPatterns: Int): Seq[Seq[Long]] = {
    val lengths = hist.keys.toSeq.sorted(Ordering[Long].reverse)
    val out = Seq.newBuilder[Seq[Long]]
    var produced = 0
    def rec(i: Int, left: Long, acc: List[Long]): Unit = {
      if (i == lengths.length) {
        if (acc.nonEmpty) {
          produced += 1
          require(produced <= maxPatterns,
            s"pattern count exceeds maxPatterns=$maxPatterns " +
              "(too many distinct lengths for the exact solve — use PairPacking.packGreedy)")
          out += acc.reverse
        }
      } else {
        val l = lengths(i)
        val maxK = math.min(left / l, hist(l))
        var k = maxK // high multiplicity first → descending lexicographic
        while (k >= 0) {
          rec(i + 1, left - k * l, List.fill(k.toInt)(l) reverse_::: acc)
          k -= 1
        }
      }
    }
    rec(0, budget, Nil)
    out.result()
  }

  /** Two-phase primal simplex, minimize cᵀx s.t. Ax = b, x ≥ 0, exact
    * rationals, Bland's rule (entering: smallest-index negative reduced
    * cost; leaving: smallest-index among min-ratio ties) — terminates
    * without cycling and is fully deterministic. Returns (z*, x*).
    * Infeasibility cannot occur for the packing LP (singleton patterns
    * always cover), but is still refused loudly. */
  private[graft] def simplexMin(
      a: Array[Array[Rat]], b: Array[Rat], c: Array[Rat]): (Rat, Array[Rat]) = {
    val m = a.length
    val n = if (m == 0) 0 else a(0).length
    if (m == 0) return (Rat.Zero, Array.fill(n)(Rat.Zero))
    // tableau: m rows × (n + m artificials + 1 rhs); start basis = artificials
    val t = Array.tabulate(m) { i =>
      val row = new Array[Rat](n + m + 1)
      var j = 0
      while (j < n) { row(j) = a(i)(j); j += 1 }
      while (j < n + m) { row(j) = if (j - n == i) Rat.One else Rat.Zero; j += 1 }
      row(n + m) = b(i)
      row
    }
    val basis = Array.tabulate(m)(i => n + i)
    def pivot(pr: Int, pc: Int): Unit = {
      val piv = t(pr)(pc)
      var j = 0
      while (j <= n + m) { t(pr)(j) = t(pr)(j) / piv; j += 1 }
      var i = 0
      while (i < m) {
        if (i != pr && !t(i)(pc).isZero) {
          val f = t(i)(pc)
          var k = 0
          while (k <= n + m) { t(i)(k) = t(i)(k) - f * t(pr)(k); k += 1 }
        }
        i += 1
      }
      basis(pr) = pc
    }
    def phase(cost: Int => Rat, cols: Int): Unit = {
      // reduced-cost row built ONCE per phase (O(n·m)) and MAINTAINED per
      // pivot (O(n)) — recomputing every column from the basis on every
      // Bland scan was O(n·m) rational ops per scan (self-review finding)
      val z = Array.tabulate(n + m) { j =>
        var r = cost(j)
        var i = 0
        while (i < m) { r = r - cost(basis(i)) * t(i)(j); i += 1 }
        r
      }
      var improving = true
      while (improving) {
        improving = false
        var enter = -1
        var j = 0
        while (j < cols && enter < 0) { // Bland: first negative
          if (z(j) < Rat.Zero) enter = j
          j += 1
        }
        if (enter >= 0) {
          var leave = -1
          var best: Rat = null
          var i = 0
          while (i < m) {
            if (t(i)(enter) > Rat.Zero) {
              val ratio = t(i)(n + m) / t(i)(enter)
              if (leave < 0 || ratio < best ||
                  (ratio == best && basis(i) < basis(leave))) {
                leave = i; best = ratio
              }
            }
            i += 1
          }
          require(leave >= 0, "packing LP unbounded — impossible for a covering objective")
          pivot(leave, enter)
          // the pivot row is normalized in place, so the standard update
          // z ← z − z_enter · t(leave)(·) zeroes z(enter) exactly
          val f = z(enter)
          if (!f.isZero) {
            var k = 0
            while (k < n + m) {
              if (!t(leave)(k).isZero) z(k) = z(k) - f * t(leave)(k)
              k += 1
            }
          }
          improving = true
        }
      }
    }
    // phase 1: drive artificials out
    phase(j => if (j >= n) Rat.One else Rat.Zero, n + m)
    val infeas = (0 until m).foldLeft(Rat.Zero) { (s, i) =>
      if (basis(i) >= n) s + t(i)(n + m) else s
    }
    require(infeas.isZero, "packing LP infeasible — histogram/pattern mismatch")
    // pivot any degenerate artificial out of the basis where possible
    for (i <- 0 until m if basis(i) >= n) {
      var j = 0
      var done = false
      while (j < n && !done) {
        if (!t(i)(j).isZero) { pivot(i, j); done = true }
        j += 1
      }
      // all-zero structural row: redundant constraint, harmless at rhs 0
    }
    // phase 2 over structural columns only
    phase(j => if (j < n) c(j) else Rat(BigInt(1) << 62), n)
    val x = Array.fill(n)(Rat.Zero)
    for (i <- 0 until m if basis(i) < n) x(basis(i)) = t(i)(n + m)
    val z = (0 until n).foldLeft(Rat.Zero)((s, j) => s + c(j) * x(j))
    (z, x)
  }

  /** Exact minimal-bin packing of a SMALL item list (the LP residual) by
    * depth-first branch and bound: items descending, each placed into
    * every distinct-remaining open bin or one new bin, incumbent/lower-
    * bound pruning. Node budget refused loudly — residuals past it mean
    * the instance is outside the certified regime. */
  private[graft] def residualPack(
      items: Seq[Long], budget: Long, maxNodes: Long = 2000000L): Seq[Seq[Long]] = {
    if (items.isEmpty) return Nil
    val sorted = items.sorted(Ordering[Long].reverse).toArray
    var best = sorted.length // one bin per item upper bound
    var bestBins: Seq[Seq[Long]] = sorted.map(Seq(_)).toSeq
    var nodes = 0L
    val bins = scala.collection.mutable.ArrayBuffer.empty[Long]
    val contents = scala.collection.mutable.ArrayBuffer.empty[List[Long]]
    def lb(i: Int): Long = {
      val remaining = (i until sorted.length).map(sorted(_)).sum
      val free = bins.map(budget - _).sum
      bins.length + math.max(0L, (remaining - free + budget - 1) / budget)
    }
    def rec(i: Int): Unit = {
      nodes += 1
      require(nodes <= maxNodes,
        s"residual bin-packing exceeded $maxNodes nodes — " +
          "instance outside the certified regime; use PairPacking.packGreedy")
      if (i == sorted.length) {
        if (bins.length < best) {
          best = bins.length
          bestBins = contents.map(_.reverse).toSeq
        }
        return
      }
      if (lb(i) >= best) return
      val item = sorted(i)
      val tried = scala.collection.mutable.HashSet.empty[Long]
      var bi = 0
      while (bi < bins.length) {
        val fill = bins(bi)
        if (fill + item <= budget && !tried.contains(fill)) {
          tried += fill // bins at the same fill are symmetric
          bins(bi) = fill + item
          contents(bi) = item :: contents(bi)
          rec(i + 1)
          contents(bi) = contents(bi).tail
          bins(bi) = fill
        }
        bi += 1
      }
      bins += item
      contents += List(item)
      rec(i + 1)
      contents.remove(contents.length - 1)
      bins.remove(bins.length - 1)
    }
    rec(0)
    bestBins
  }

  /** One plan entry: `mult` packs of `pattern` (descending lengths). */
  private[graft] case class PatternUse(pattern: Seq[Long], mult: Long)

  /** The certified-optimal plan for `hist` under `budget`: pattern uses
    * in canonical (descending-lexicographic) order plus the LP lower
    * bound ⌈z*⌉ it was certified against. Refuses loudly when the
    * floor+residual construction cannot meet the LP bound. */
  private[graft] def planOptimal(hist: Map[Long, Long], budget: Long,
      maxPatterns: Int = 20000, maxResidualItems: Int = 64): (Seq[PatternUse], Long) = {
    // pattern multiplicities materialize via List.fill(k.toInt) with
    // k ≤ budget/len — an Int.MaxValue budget cap keeps that exact
    require(budget >= 1 && budget <= Int.MaxValue,
      s"budget must be in [1, ${Int.MaxValue}], got $budget")
    require(hist.keys.forall(l => l > 0 && l <= budget),
      s"lengths must be in (0, $budget]: ${hist.keys.filterNot(l => l > 0 && l <= budget).take(3)}")
    val live = hist.filter(_._2 > 0)
    if (live.isEmpty) return (Nil, 0L)
    val lengths = live.keys.toSeq.sorted(Ordering[Long].reverse)
    val patterns = enumeratePatterns(live, budget, maxPatterns)
    val a = Array.tabulate(lengths.length, patterns.length) { (i, j) =>
      Rat(BigInt(patterns(j).count(_ == lengths(i))))
    }
    val b = lengths.map(l => Rat(BigInt(live(l)))).toArray
    val c = Array.fill(patterns.length)(Rat.One)
    val (z, x) = simplexMin(a, b, c)
    val lpBound = z.ceil.toLong
    val base = x.map(_.floor)
    // exact residual NEEDS first (h − A·⌊x⌋ per length), the cap checked
    // BEFORE any expansion — materializing first could OOM or Int-wrap
    // right where the loud refusal was promised (self-review finding)
    val needs = lengths.indices.map { i =>
      val covered = patterns.indices.foldLeft(BigInt(0)) { (s, j) =>
        s + base(j) * patterns(j).count(_ == lengths(i))
      }
      val need = BigInt(live(lengths(i))) - covered
      require(need >= 0, "floor over-covered — impossible")
      need
    }
    val totalNeed = needs.sum
    require(totalNeed <= maxResidualItems,
      s"$totalNeed residual items exceed maxResidualItems=$maxResidualItems — " +
        "instance outside the certified regime; use PairPacking.packGreedy")
    val residual = lengths.indices.flatMap(i =>
      Seq.fill(needs(i).toInt)(lengths(i)))
    // solve the residual exactly — the search returns the best PARTITION,
    // so its bins become pattern uses directly
    val resPartition = residualPack(residual, budget)
    val total = base.map(_.toLong).sum + resPartition.length
    require(total == lpBound,
      s"certified-optimality gap: LP bound $lpBound < constructed $total — " +
        "this instance is outside the rounding-certified regime (MIRUP gap); " +
        "use PairPacking.packGreedy for a near-optimal plan")
    val resUses: Seq[PatternUse] = resPartition
      .map(_.sorted(Ordering[Long].reverse))
      .groupBy(identity).map { case (p, xs) => PatternUse(p, xs.length.toLong) }
      .toSeq
    val floorUses = patterns.indices.collect {
      case j if base(j) > 0 => PatternUse(patterns(j), base(j).toLong)
    }
    // canonical order: descending lexicographic over the pattern seq,
    // merging duplicates (a residual template may equal a floored one)
    implicit val seqOrd: Ordering[Seq[Long]] = new Ordering[Seq[Long]] {
      def compare(p: Seq[Long], q: Seq[Long]): Int = {
        val it = p.iterator.zipAll(q.iterator, Long.MinValue, Long.MinValue)
        while (it.hasNext) {
          val (x1, y1) = it.next()
          if (x1 != y1) return -x1.compare(y1) // descending
        }
        0
      }
    }
    val merged = (floorUses ++ resUses)
      .groupBy(_.pattern).map { case (p, us) => PatternUse(p, us.map(_.mult).sum) }
      .toSeq.sortBy(_.pattern)
    (merged, lpBound)
  }

  /** Pack `docs` (idCol, lenCol ≤ budget) certified-optimally. Output:
    * (idCol, len, rank_in_len, pack_id, pack_size, pack_fill, pack_csv,
    * n_packs, lp_bound) — pack_id assigned canonically (patterns in
    * descending-lexicographic order, instances in rank order within each
    * pattern), n_packs = lp_bound on every row (the certificate, in the
    * gate hash). */
  def pack(docs: DataFrame, idCol: String, lenCol: String, budget: Long,
      maxDistinct: Int = 64, maxPatterns: Int = 20000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lens = docs.select(col(idCol), col(lenCol).cast("long").as("len"))
    val hist = lens.groupBy(col("len")).agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect()
    require(hist.length <= maxDistinct,
      s"${hist.length} distinct lengths exceed maxDistinct=$maxDistinct " +
        "(exact solve is for bounded-vocabulary histograms; use PairPacking.packGreedy)")
    val (uses, lpBound) = planOptimal(hist.toMap, budget, maxPatterns)
    val nPacks = uses.map(_.mult).sum
    // spans: walk patterns in canonical order, assigning pack ids and
    // per-length rank intervals; a doc's pack instance is arithmetic on
    // its rank: pack_id = packBase + (rank - from) / usesInPattern
    val used = scala.collection.mutable.HashMap.empty[Long, Long].withDefaultValue(0L)
    var packBase = 0L
    val spans = Seq.newBuilder[(Long, Long, Long, Long, Long, Long, Long, String)]
    uses.foreach { case PatternUse(p, mult) =>
      val csv = p.mkString(",")
      val fill = p.sum
      p.distinct.foreach { l =>
        val k = p.count(_ == l).toLong
        spans += ((l, used(l) + 1, used(l) + k * mult, k, packBase,
          p.length.toLong, fill, csv))
        used(l) += k * mult
      }
      packBase += mult
    }
    val spanDf = spans.result()
      .toDF("len", "__from", "__to", "__uses", "__base", "pack_size", "pack_fill", "pack_csv")
    val ranked = lens.withColumn("rank_in_len",
      row_number().over(Window.partitionBy(col("len")).orderBy(col(idCol))).cast("long"))
    ranked.join(broadcast(spanDf),
        ranked("len") === spanDf("len") &&
          col("rank_in_len") >= col("__from") && col("rank_in_len") <= col("__to"))
      .select(ranked(idCol), ranked("len"), col("rank_in_len"),
        // integer `div`, NOT `/`+floor: Spark's `/` on longs is IEEE double
        // division, so rank offsets past 2^53 would round before the floor
        (col("__base") + expr("(rank_in_len - __from) div __uses")
          + lit(1L)).as("pack_id"),
        col("pack_size"), col("pack_fill"), col("pack_csv"),
        lit(nPacks).as("n_packs"), lit(lpBound).as("lp_bound"))
  }
}
