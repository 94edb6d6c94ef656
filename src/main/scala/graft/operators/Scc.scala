package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

/** Strongly connected components over a DIRECTED edge list — the
  * directed-graph partner of [[ConnectedComponents]]: link graphs,
  * citation networks, and crawl frontiers are directed, and "mutually
  * reachable" (a cycle of references) is a different — and for ranking
  * and dedup-cluster work, stronger — statement than "connected when you
  * ignore direction". PageRank's convergence structure, spider traps, and
  * link farms are all SCC phenomena.
  *
  * Algorithm: iterated TRIM + forward COLORING + backward pivot sweep —
  * the Multistep/coloring family (Orzan's coloring; Slota, Rajamanickam &
  * Madduri, IPDPS'14 — public algorithms), the standard label-propagation
  * formulation for distributed SCC (Tarjan's stack DFS does not
  * distribute):
  *
  *  1. TRIM: a vertex with no in-edge or no out-edge in the live subgraph
  *     can sit on no cycle — it is its own singleton SCC. Iterated to a
  *     fixpoint, this alone resolves every DAG-like region in
  *     O(longest-trimmable-chain) vertex-scale rounds.
  *  2. COLOR: propagate f(v) = min(f over in-neighbors ∪ {v}) to a
  *     fixpoint (the directed twin of [[ConnectedComponents.minLabel]],
  *     same label-sum convergence test). At the fixpoint f is constant on
  *     every SCC (mutual reachability), so colors partition the live
  *     graph into SCC-closed regions.
  *  3. SWEEP: every pivot (f(v) = v) is settled with scc = v, then the
  *     settled set grows backward along edges WITHIN the same color:
  *     u joins when some edge u→w has w settled and f(u) = scc(w) — i.e.
  *     u reaches its own color's pivot, which with f(u) = pivot →* u
  *     makes membership mutual. Extracted SCCs leave the graph; repeat.
  *  4. LOCAL ENDGAME: Multistep is explicitly a HYBRID — the distributed
  *     phases exist to extract the giant SCC and the trimmable periphery;
  *     the paper finishes the small remainder serially (its "serial
  *     step"). Once the live subgraph fits `localFinishMaxRows` (a
  *     count-scale driver budget), it is collected once and finished with
  *     iterative Tarjan — same min-id labeling, bit-identical output,
  *     and it replaces ~15 fixed-overhead distributed actions per outer
  *     round with one collect. At 100 TB the first rounds do the heavy
  *     lifting distributed; the endgame only ever sees what fits.
  *
  * Every extraction round removes at least the minimum live vertex's SCC
  * (the global min is always its own pivot), so the outer loop
  * terminates; `maxOuterRounds` guards the adversarial
  * chain-of-small-cycles shape with a loud refusal naming the knob.
  *
  * Scale shape: NO transitive closure is ever materialized (the
  * definitional reach×reach oracle this operator is gated against is
  * quadratic in SCC size — exactly what a 100 TB run cannot do). Per
  * inner round: one edge-keyed shuffle join + a map-side-combined min or
  * distinct + a vertex-scale anti/left join. Edges are induced once per
  * outer round from the shrinking live set. Iteration hygiene is the
  * d21/PageRank doctrine: every persisted frame is materialized and
  * re-rooted as an RDD leaf ([[truncateLineage]]), predecessors
  * unpersisted, so the plan stays one round deep no matter how many
  * rounds run.
  */
object Scc {

  /** Re-root a persisted, materialized frame as a leaf over its RDD (the
    * ConnectedComponents/TreeDepth rule): the sweep and the anti-joins
    * reference each round's state more than once, so un-truncated lineage
    * would nest geometrically. */
  private def truncateLineage(df: DataFrame): DataFrame =
    graft.engine.Lineage.truncate(df)

  /** persist → materialize → RDD-leaf view. Returns (view, handle, rows):
    * read through the view, unpersist through the handle; the row count is
    * the materializing action's result, kept because the endgame cutover
    * and the shrink tests need it (re-counting a cached frame would be an
    * extra action per round). */
  private def pin(df: DataFrame): (DataFrame, DataFrame, Long) = {
    val h = df.persist(MEMORY_AND_DISK)
    val rows = h.count()
    (truncateLineage(h), h, rows)
  }

  private def labelSum(df: DataFrame, c: String): java.math.BigDecimal =
    df.agg(sum(col(c).cast("decimal(38,0)"))).head().getDecimal(0)

  /** Condensation of a directed graph under an SCC labeling: the DISTINCT
    * (scc(src), scc(dst)) pairs with the intra-SCC edges dropped — by the
    * definition of SCCs this graph is a DAG (a cycle between condensation
    * nodes would merge them into one SCC). Two label equi-joins + one
    * distinct; edge-scale, no new machinery.
    *
    * @param labels (idCol → sccCol) as produced by [[components]]
    * @return (src, dst) condensation edges over SCC ids
    */
  def condensation(
      labels: DataFrame, idCol: String, sccCol: String,
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(
      col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    val ls = labels.select(
      col(idCol).cast("long").as("src"), col(sccCol).cast("long").as("__sa"))
    val ld = labels.select(
      col(idCol).cast("long").as("dst"), col(sccCol).cast("long").as("__sb"))
    e.join(ls, Seq("src")).join(ld, Seq("dst"))
      .filter(col("__sa") =!= col("__sb"))
      .select(col("__sa").as("src"), col("__sb").as("dst"))
      .distinct()
  }

  /** Longest-path topological LEVELS of a DAG: level(v) = 0 for sources,
    * else 1 + max(level of in-neighbors) — the scheduling depth of each
    * condensation node (every level can run after all lower levels; the
    * standard read for migration waves, crawl tiers, dependency stages).
    *
    * Iterative max-relaxation: after k rounds level_k(v) = the longest
    * path into v using ≤ k edges, pointwise nondecreasing, fixpoint at
    * k = DAG depth — so convergence is the exact-integer level-sum test
    * (the ConnectedComponents economy: ONE action per round). Per round
    * one edge-keyed join + a map-side-combined max + a node-scale left
    * join; the d21 lineage hygiene throughout. A CYCLE makes the sum grow
    * forever, so the maxRounds refusal doubles as a loud non-DAG check —
    * feed it [[condensation]] output, which is a DAG by construction.
    *
    * @param edges directed DAG edges (srcCol, dstCol); self-loops rejected
    *              by the refusal (they are cycles)
    * @return (id, level) for every vertex appearing in `edges`; isolated
    *         vertices never appear (the caller left-joins them at level 0)
    */
  def topologicalLevels(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 60): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val (e, eH, _) = pin(edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct())
    val (nodes, nodesH, nodeRows) = pin(
      e.select(col("src").as("id")).unionAll(e.select(col("dst").as("id"))).distinct())
    if (nodeRows == 0L) { // no edges at all — every vertex is the caller's
      eH.unpersist(blocking = false) // level-0 default; SUM() of an empty
      nodesH.unpersist(blocking = false) // frame is null and would NPE the
      return nodes.select(col("id"), lit(0L).as("level")) // convergence test
    }
    var lvlH = nodes.select(col("id"), lit(0L).as("level"))
      .persist(MEMORY_AND_DISK)
    var prevSum = labelSum(lvlH, "level")
    var lvl = truncateLineage(lvlH)
    var round = 0
    var converged = false
    def relax(cur: DataFrame): DataFrame = {
      val stepped = e.join(cur.select(col("id").as("src"), col("level")), Seq("src"))
        .groupBy(col("dst")).agg(max(col("level") + lit(1L)).as("nl"))
      nodes.join(stepped, nodes("id") === stepped("dst"), "left")
        .select(nodes("id"), coalesce(col("nl"), lit(0L)).as("level"))
    }
    // TWO relaxations per ACTION (the components color-loop economy):
    // levels are pointwise NONDECREASING in rounds, so sum(k) ==
    // sum(k+2) still reads "nothing moved in either round", and extra
    // rounds past the fixpoint are the identity — bit-identical output.
    while (!converged && round < maxRounds) {
      val midH = relax(lvl).persist(MEMORY_AND_DISK)
      val nH = relax(truncateLineage(midH)).persist(MEMORY_AND_DISK)
      val newSum = labelSum(nH, "level")
      lvlH.unpersist(blocking = false)
      midH.unpersist(blocking = false)
      lvl = truncateLineage(nH); lvlH = nH
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      round += 2
    }
    eH.unpersist(blocking = false)
    nodesH.unpersist(blocking = false)
    if (!converged) {
      lvlH.unpersist(blocking = false)
      throw new IllegalStateException(
        s"topologicalLevels did not converge in $maxRounds rounds — " +
          "the graph has a cycle (not a DAG) or depth exceeds maxRounds")
    }
    // lvl stays persisted (the components contract)
    lvl
  }

  /** Iterative Tarjan (explicit stacks — no recursion, so DFS depth = |V|
    * is safe) over a CSR adjacency built from the collected live subgraph.
    * Labels every component with its minimum vertex id — the same unique
    * labeling the distributed rounds produce, so the two phases compose
    * bit-identically. Edges with an endpoint outside `ids` are dropped
    * (the induced subgraph — the distributed path enforces the same via
    * its left_semi inductions). O(V + E) time, primitive arrays only.
    */
  private[graft] def tarjanMinLabels(
      ids: Array[Long], edges: Array[(Long, Long)]): Array[(Long, Long)] = {
    val n = ids.length
    val idx = new java.util.HashMap[Long, Integer](n * 2)
    var i = 0
    while (i < n) { idx.put(ids(i), i); i += 1 }
    val deg = new Array[Int](n)
    var m = 0
    edges.foreach { case (s, d) =>
      val si = idx.get(s); val di = idx.get(d)
      if (si != null && di != null) { deg(si) += 1; m += 1 }
    }
    val off = new Array[Int](n + 1)
    i = 0; while (i < n) { off(i + 1) = off(i) + deg(i); i += 1 }
    val adj = new Array[Int](m)
    val fill = java.util.Arrays.copyOf(off, n)
    edges.foreach { case (s, d) =>
      val si = idx.get(s); val di = idx.get(d)
      if (si != null && di != null) { adj(fill(si)) = di; fill(si) += 1 }
    }
    val index = Array.fill(n)(-1)
    val low = new Array[Int](n)
    val onStk = new Array[Boolean](n)
    val stk = new Array[Int](n); var sp = 0 // Tarjan's component stack
    val label = new Array[Long](n)
    var counter = 0
    val fv = new Array[Int](n); val fe = new Array[Int](n) // DFS frames
    var v0 = 0
    while (v0 < n) {
      if (index(v0) == -1) {
        var top = 0
        fv(0) = v0; fe(0) = off(v0)
        index(v0) = counter; low(v0) = counter; counter += 1
        stk(sp) = v0; sp += 1; onStk(v0) = true
        while (top >= 0) {
          val v = fv(top)
          if (fe(top) < off(v + 1)) {
            val w = adj(fe(top)); fe(top) += 1
            if (index(w) == -1) {
              index(w) = counter; low(w) = counter; counter += 1
              stk(sp) = w; sp += 1; onStk(w) = true
              top += 1; fv(top) = w; fe(top) = off(w)
            } else if (onStk(w) && index(w) < low(v)) low(v) = index(w)
          } else {
            if (low(v) == index(v)) { // v is its SCC's root: pop + min-label
              var minId = Long.MaxValue
              val base = { // find v's position on the stack (members above it)
                var b = sp - 1
                while (stk(b) != v) b -= 1
                b
              }
              var k = base
              while (k < sp) {
                if (ids(stk(k)) < minId) minId = ids(stk(k))
                k += 1
              }
              k = base
              while (k < sp) { label(stk(k)) = minId; onStk(stk(k)) = false; k += 1 }
              sp = base
            }
            top -= 1
            if (top >= 0 && low(v) < low(fv(top))) low(fv(top)) = low(v)
          }
        }
      }
      v0 += 1
    }
    Array.tabulate(n)(k => (ids(k), label(k)))
  }

  /** @param vertices one column `idCol` (long ids); isolated vertices are
    *                 their own singleton SCCs
    * @param edges    directed (srcCol, dstCol) long ids; self-loops are
    *                 ignored (they never change SCC membership)
    * @param localFinishMaxRows the Multistep hybrid's serial-phase cutover
    *                 (Slota et al. run trim + FW-BW distributed for the
    *                 giant SCC, then finish the small remainder serially):
    *                 when live vertices + live edges fit under this row
    *                 budget (default 4e6 ≈ tens of MB of primitive arrays
    *                 on the driver — count-scale by the repo's collect
    *                 doctrine), the live subgraph is collected ONCE and
    *                 finished with iterative Tarjan instead of paying
    *                 ~15 more fixed-overhead distributed actions. 0 forces
    *                 the all-distributed path (the parity spec uses this).
    * @return (id, scc) for every vertex, scc = min vertex id in its SCC
    */
  def components(
      vertices: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      maxOuterRounds: Int = 25, maxPropRounds: Int = 60,
      localFinishMaxRows: Long = 4000000L): DataFrame = {

    def labelSum(df: DataFrame, c: String): java.math.BigDecimal =
      df.agg(sum(col(c).cast("decimal(38,0)"))).head().getDecimal(0)

    val (e0, e0H, e0Rows) = pin(edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct())

    var (remaining, remainingH, remainingRows) = pin(
      vertices.select(col(idCol).cast("long").as("id")).distinct())

    // (id, scc) accumulator — re-pinned flat each time it grows, so it is
    // always ONE cached leaf, never a deepening union tree.
    var assigned: DataFrame = null
    var assignedH: DataFrame = null
    def addAssigned(part: DataFrame): Unit = {
      val grown = if (assigned == null) part else assigned.unionAll(part)
      val (v, h, _) = pin(grown)
      if (assignedH != null) assignedH.unpersist(blocking = false)
      assigned = v; assignedH = h
    }

    // Live induced edge set. Starts as e0's cache directly — re-pinning
    // would duplicate the largest frame for nothing. (Unpersist sites may
    // hit e0H twice on the first replacement; the second call is a no-op.)
    var ei = e0
    var eiH = e0H
    var eiRows = e0Rows
    var outer = 0
    while (remainingRows > 0L && outer < maxOuterRounds) {
      if (remainingRows + eiRows <= localFinishMaxRows) {
        // --- LOCAL ENDGAME (the Multistep hybrid's serial phase) ---
        // The live subgraph fits the documented driver budget: collect it
        // ONCE and finish with iterative Tarjan (which subsumes trim —
        // below the cutover, more distributed shrink rounds are pure
        // overhead). See the scaladoc: this is the published algorithm's
        // own endgame, not a shortcut; the distributed rounds exist
        // precisely to shrink a 100 TB graph down to this budget.
        val vs = remaining.select(col("id")).collect().map(_.getLong(0))
        val es = ei.select(col("src"), col("dst")).collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        Console.err.println(
          s"[scc] outer=$outer local-endgame vertices=${vs.length} edges=${es.length}")
        val labeled = tarjanMinLabels(vs, es)
        addAssigned(vertices.sparkSession.createDataFrame(labeled.toSeq)
          .toDF("id", "scc")
          .select(col("id").cast("long"), col("scc").cast("long")))
        remainingRows = 0L
      }
      if (remainingRows == 0L) { outer += 1 }
      else {
      // --- TRIM to a fixpoint: no-in or no-out ⇒ singleton SCC ---
      // Action economy (the d54 constant): the live test is ONE fused
      // degree aggregate (has-in AND has-out in one shuffle, not two
      // DISTINCT + two semi joins), the per-round induced edge set stays
      // LAZY inside the live action, and the edge cache is re-pinned
      // ONCE at the fixpoint instead of per shrink round.
      var trimming = true
      var trimRounds = 0
      var trimmedAny = false
      while (trimming && remainingRows > 0L) {
        trimRounds += 1
        val eLive =
          if (trimmedAny) ei
            .join(remaining.select(col("id").as("src")), Seq("src"), "left_semi")
            .join(remaining.select(col("id").as("dst")), Seq("dst"), "left_semi")
          else ei // entry edges are already induced on `remaining`
        val deg = eLive.select(col("src").as("id"), lit(1).as("o"), lit(0).as("i"))
          .unionAll(eLive.select(col("dst").as("id"), lit(0).as("o"), lit(1).as("i")))
          .groupBy(col("id")).agg(max(col("o")).as("ho"), max(col("i")).as("hi"))
        val live = remaining.join(
          deg.filter(col("ho") === 1 && col("hi") === 1).select(col("id")),
          Seq("id"), "left_semi")
        val (liveV, liveH, liveRows) = pin(live)
        if (liveRows == remainingRows) {
          liveH.unpersist(blocking = false)
          trimming = false
        } else {
          trimmedAny = true
          addAssigned(remaining.join(liveV, Seq("id"), "left_anti")
            .select(col("id"), col("id").as("scc")))
          remainingH.unpersist(blocking = false)
          remaining = liveV; remainingH = liveH; remainingRows = liveRows
        }
      }
      if (trimmedAny && remainingRows > 0L) {
        val (nei, neiH, neiRows) = pin(ei
          .join(remaining.select(col("id").as("src")), Seq("src"), "left_semi")
          .join(remaining.select(col("id").as("dst")), Seq("dst"), "left_semi"))
        eiH.unpersist(blocking = false)
        ei = nei; eiH = neiH; eiRows = neiRows
      }
      if (remainingRows > 0L) {
        // --- COLOR: forward min-label to fixpoint ---
        // labelSum is the materializing action for each round's persist
        // (ONE action per round, the CC.minLabel economy).
        var fH = remaining.select(col("id"), col("id").as("f")).persist(MEMORY_AND_DISK)
        var prevSum = labelSum(fH, "f")
        var f = truncateLineage(fH)
        var prop = 0
        var converged = false
        def colorStep(cur: DataFrame): DataFrame = {
          val nbrMin = ei.join(cur.select(col("id").as("src"), col("f")), Seq("src"))
            .groupBy(col("dst"))
            .agg(min(col("f")).as("nf"))
          cur.join(nbrMin, cur("id") === nbrMin("dst"), "left")
            .select(cur("id"), least(col("f"), coalesce(col("nf"), col("f"))).as("f"))
        }
        // TWO propagation rounds per ACTION (the d54 constant): the mid
        // round carries a persist marker and materializes as a side
        // effect of the outer round's labelSum — label sums decrease
        // strictly until the fixpoint, so sum(k) == sum(k+2) still means
        // "nothing moved in either round", and past the fixpoint an
        // extra min-step is the identity (labels unchanged — the output
        // is bit-identical to single-stepping).
        while (!converged && prop < maxPropRounds) {
          val midH = colorStep(f).persist(MEMORY_AND_DISK)
          // lazy truncation: .rdd plans through the persist marker, so the
          // mid round materializes (once) inside the SAME action as the
          // outer labelSum, and the self-referential join below sees a
          // clean leaf instead of shared attribute ids
          val nfH = colorStep(truncateLineage(midH)).persist(MEMORY_AND_DISK)
          val newSum = labelSum(nfH, "f")
          fH.unpersist(blocking = false)
          midH.unpersist(blocking = false)
          f = truncateLineage(nfH); fH = nfH
          converged = newSum.compareTo(prevSum) == 0
          prevSum = newSum
          prop += 2
        }
        if (!converged) {
          fH.unpersist(blocking = false)
          throw new IllegalStateException(
            s"SCC forward coloring did not converge in $maxPropRounds rounds " +
              "(graph diameter exceeds maxPropRounds — raise it)")
        }
        // --- SWEEP: settle pivots, grow backward within color ---
        // Settled is a LIST of per-wave leaves (the Bfs levels economy):
        // the anti-join reads their linear union, nothing re-materializes
        // per round. ONE action per wave (the frontier count).
        val (pivots, pivotsH, _) = pin(f.filter(col("id") === col("f"))
          .select(col("id"), col("f").as("scc")))
        val waves = scala.collection.mutable.ArrayBuffer((pivots, pivotsH))
        var frontier = pivots
        var frontierRows = -1L
        var sweep = 0
        def sweepWave(fr: DataFrame, settledIds: DataFrame): DataFrame = ei
          .join(fr.select(col("id").as("dst"), col("scc")), Seq("dst"))
          .select(col("src").as("id"), col("scc"))
          .distinct()
          .join(f, Seq("id"))
          .filter(col("f") === col("scc"))
          .select(col("id"), col("scc"))
          .join(settledIds, Seq("id"), "left_anti")
        // TWO waves per ACTION (the color-loop economy): w1 carries a
        // persist marker and materializes inside w2's count; w2 empty ⇒
        // preds(w1 ∪ settled) exhausted ⇒ the sweep is complete whether
        // or not w1 added rows, so the single count still terminates
        // correctly. Possibly-empty w1 leaves in `waves` union away.
        while (frontierRows != 0L && sweep < maxPropRounds) {
          val settledIds = waves.map(_._1).reduce(_ unionAll _).select(col("id"))
          val w1H = sweepWave(frontier, settledIds).persist(MEMORY_AND_DISK)
          val w1 = truncateLineage(w1H)
          val w2H = sweepWave(w1, settledIds.unionAll(w1.select(col("id"))))
            .persist(MEMORY_AND_DISK)
          frontierRows = w2H.count()
          waves += ((w1, w1H))
          if (frontierRows > 0L) {
            val w2 = truncateLineage(w2H)
            waves += ((w2, w2H))
            frontier = w2
          } else w2H.unpersist(blocking = false)
          sweep += 2
        }
        if (frontierRows != 0L) {
          throw new IllegalStateException(
            s"SCC backward sweep did not converge in $maxPropRounds rounds " +
              "(SCC internal diameter exceeds maxPropRounds — raise it)")
        }
        val settled = waves.map(_._1).reduce(_ unionAll _)
        // Round-count observability (the [verify-timing] convention): the
        // operator's cost is rounds × fixed job overhead, so the counts
        // ARE the profile.
        Console.err.println(
          s"[scc] outer=$outer trimRounds=$trimRounds colorRounds=$prop " +
            s"sweepWaves=${waves.size - 1} live=$remainingRows")
        addAssigned(settled) // materializes the union into the accumulator
        val nextRemaining = remaining.join(settled.select(col("id")), Seq("id"), "left_anti")
        val (rV, rH, rRows) = pin(nextRemaining)
        remainingRows = rRows
        remainingH.unpersist(blocking = false)
        fH.unpersist(blocking = false)
        waves.foreach(_._2.unpersist(blocking = false))
        remaining = rV; remainingH = rH
        if (remainingRows > 0L) {
          val (nei, neiH, neiRows) = pin(ei
            .join(remaining.select(col("id").as("src")), Seq("src"), "left_semi")
            .join(remaining.select(col("id").as("dst")), Seq("dst"), "left_semi"))
          eiH.unpersist(blocking = false)
          ei = nei; eiH = neiH; eiRows = neiRows
        }
      }
      outer += 1
      }
    }
    eiH.unpersist(blocking = false)
    e0H.unpersist(blocking = false)
    remainingH.unpersist(blocking = false)
    if (remainingRows > 0L) {
      if (assignedH != null) assignedH.unpersist(blocking = false)
      throw new IllegalStateException(
        s"SCC did not finish in $maxOuterRounds outer rounds " +
          "(chain-of-cycles structure — raise maxOuterRounds)")
    }
    // assigned stays persisted — the PageRank/Bfs contract: the caller
    // reads the result from cache; blocks age out via LRU.
    if (assigned == null) // no vertices at all
      vertices.sparkSession.emptyDataFrame
        .select(lit(0L).as("id"), lit(0L).as("scc")).limit(0)
    else assigned
  }
}
