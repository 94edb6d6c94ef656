package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Min-label connected components over an undirected edge list — the
  * cluster-assignment stage a dedup pipeline runs AFTER pair detection
  * (pairs → components → one keeper per component). An operator the
  * reference never needed (its dedup is per-row `unique`), but any
  * near-dup pipeline at scale does.
  *
  * Plan shape per round: one neighbor-min aggregation shuffle + one
  * vertex-keyed join — label propagation, driver-coordinated. Labels are
  * monotone non-increasing, so convergence is detected by comparing the
  * label-sum aggregate (decimal — an id-sum overflows a long at billions
  * of vertices) between rounds: strictly smaller iff something changed.
  * Rounds needed ≤ graph diameter; near-dup clusters are clique-like
  * (diameter 1-2). For adversarial long-chain graphs at 100 TB, the
  * alternating large-star/small-star variant converges in O(log n) rounds
  * — this implementation documents that as the scale escape hatch and
  * guards with `maxIters`.
  *
  * Cache lifecycle: each round's labels are persisted, materialized by the
  * convergence aggregate, and the PREVIOUS round is unpersisted — lineage
  * would otherwise deepen by two joins per round and recompute the whole
  * history every action. The returned frame is the final (vertex-count ×
  * 16 bytes) label set, still cached; long-lived sessions use
  * [[minLabelWithRelease]] and release after consuming.
  */
object ConnectedComponents {

  def minLabel(
      vertices: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 20): DataFrame =
    minLabelWithRelease(vertices, idCol, edges, srcCol, dstCol, maxIters)._1

  /** Weighted union-find with path compression over collected (id, edge)
    * arrays, labels = min id per component — the [[Scc.tarjanMinLabels]]
    * doctrine applied to the undirected case: the serial endgame for
    * graphs that fit the documented driver budget. Same unique labeling
    * as the distributed rounds, so the two paths are bit-identical. */
  private[graft] def unionFindMinLabels(
      ids: Array[Long], edges: Array[(Long, Long)]): Array[(Long, Long)] = {
    val n = ids.length
    val idx = new java.util.HashMap[Long, Integer](n * 2)
    var i = 0
    // FIRST occurrence wins the slot: the caller's vertex frame is not
    // required to be distinct (the distributed rounds tolerate duplicate
    // rows — both copies get the same label), so duplicates must SHARE a
    // union-find slot rather than shadow it (a put-always here mislabeled
    // the shadowed copy as its own singleton; found by self-review)
    while (i < n) { idx.putIfAbsent(ids(i), i); i += 1 }
    val parent = Array.tabulate(n)(identity)
    val rank = new Array[Int](n)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val ai = idx.get(a); val bi = idx.get(b)
      if (ai != null && bi != null) { // induced on the vertex set
        val ra = find(ai); val rb = find(bi)
        if (ra != rb) {
          if (rank(ra) < rank(rb)) parent(ra) = rb
          else if (rank(ra) > rank(rb)) parent(rb) = ra
          else { parent(rb) = ra; rank(ra) += 1 }
        }
      }
    }
    val minId = new java.util.HashMap[Integer, java.lang.Long](n * 2)
    i = 0
    while (i < n) {
      val slot = find(idx.get(ids(i))) // canonical slot, duplicate-safe
      val cur = minId.get(slot)
      if (cur == null || ids(i) < cur.longValue) minId.put(slot, ids(i))
      i += 1
    }
    // one output row per INPUT row (duplicates keep their multiplicity,
    // matching the distributed path's per-row labeling)
    Array.tabulate(n)(k => (ids(k), minId.get(find(idx.get(ids(k)))).longValue))
  }

  /** Alternating large-star/small-star contraction — the O(log n)-round
    * variant for graphs whose diameter defeats [[minLabel]] (long chains),
    * after Kiveris et al., "Connected Components in MapReduce and Beyond"
    * (SoCC'14 — public algorithm).
    *
    *  - large-star: every node u links each LARGER neighbor to
    *    m = min(N(u) ∪ {u});
    *  - small-star: every node u links each ≤-neighbor and itself to the
    *    minimum among them.
    *
    * Each half-round is one groupBy-min shuffle + an explode back to
    * edges; rounds until the canonical edge set fixpoints (exact `except`
    * check, one join per round — no hash-collision shortcuts). At the
    * fixpoint every node is directly attached to its component minimum.
    * Same cache lifecycle and release contract as [[minLabel]].
    */
  def starContractionWithRelease(
      vertices: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 30): (DataFrame, () => Unit) = {
    import org.apache.spark.sql.expressions.Window

    // canonical undirected pair set (a < b), deduped
    var cur = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
      .persist()
    cur.count()

    def adjacency(e: DataFrame): DataFrame =
      e.select(col("a").as("u"), col("b").as("v"))
        .union(e.select(col("b").as("u"), col("a").as("v")))

    // large-star: m = min over N(u) ∪ {u}; emit (v, m) for v ∈ N(u), v > u
    def largeStar(e: DataFrame): DataFrame = {
      val adj = adjacency(e)
      val m = min(least(col("v"), col("u"))).over(Window.partitionBy(col("u")))
      adj.withColumn("m", m)
        .filter(col("v") > col("u"))
        .select(least(col("v"), col("m")).as("a"), greatest(col("v"), col("m")).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
    }

    // small-star: over neighbors v ≤ u (plus u itself): link all to their min
    def smallStar(e: DataFrame): DataFrame = {
      val adjLe = adjacency(e).filter(col("v") <= col("u"))
      val m = min(col("v")).over(Window.partitionBy(col("u"))) // v ≤ u, so min incl. u is min(v)
      adjLe.withColumn("m", m)
        .select(explode(array(col("v"), col("u"))).as("n"), col("m"))
        .filter(col("n") =!= col("m"))
        .select(col("m").as("a"), col("n").as("b")) // m < n always
        .distinct()
    }

    var curHandle = cur // persist handle for unpersist; `cur` is the truncated view
    cur = truncateLineage(cur)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val nextHandle = smallStar(largeStar(cur)).persist()
      nextHandle.count()
      // Each round references the prior frame several times, so building
      // on the raw plan quadruples the logical tree per round (OOM by
      // round ~10 just RENDERING it). The cached data is re-rooted as a
      // leaf scan, which is what actually bounds iterative lineage.
      val next = truncateLineage(nextHandle)
      // exact fixpoint: identical canonical pair sets
      converged = next.except(cur).isEmpty && cur.except(next).isEmpty
      curHandle.unpersist()
      curHandle = nextHandle
      cur = next
      iter += 1
    }
    if (!converged) {
      curHandle.unpersist()
      throw new IllegalStateException(
        s"star contraction did not converge in $maxIters rounds")
    }
    // At the fixpoint each edge is (componentMin, member); isolated
    // vertices label themselves.
    val verts = vertices.select(col(idCol).cast("long").as("id"))
    val labels = verts
      .join(cur.select(col("b").as("id"), col("a").as("lbl")), Seq("id"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("label"))
      .persist()
    labels.count()
    curHandle.unpersist()
    (labels, () => { labels.unpersist(); () })
  }

  /** Re-root a persisted, materialized frame as a leaf over its RDD: the
    * DATA stays in the cache, but the logical plan stops nesting the whole
    * iteration history (which grows geometrically when a round references
    * its predecessor more than once). RDD lineage remains fault-tolerant
    * and linear. */
  private def truncateLineage(df: DataFrame): DataFrame =
    graft.engine.Lineage.truncate(df)

  /** @param localFinishMaxRows the serial-endgame cutover (the
    *        [[Scc.components]] doctrine): when vertices + directed edge
    *        rows fit under this count-scale driver budget, the graph is
    *        collected once and labeled by weighted union-find instead of
    *        paying per-round distributed actions — same min-id labels,
    *        bit-identical output. 0 forces the all-distributed path
    *        (the parity spec uses this). At 100 TB the entry check fails
    *        and the label-propagation rounds run unchanged. */
  def minLabelWithRelease(
      vertices: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 20, localFinishMaxRows: Long = 4000000L): (DataFrame, () => Unit) = {
    // Persisted for the loop: every round's neighbor-min join reads the
    // edge set, and without the cache each labelSum action would re-run
    // the caller's whole edge-producing subplan (e.g. d13's pair
    // detection) twice per round via the two union branches. Persisted
    // ALREADY HASH-PARTITIONED on the probe key: the cache retains the
    // repartition's output partitioning (InMemoryTableScan reports it),
    // so at shuffle-join scale each round's neighbor-min join re-shuffles
    // only the vertex-scale label frame — the edge set, the big side,
    // shuffles exactly once for the whole iteration instead of per round.
    val undirected = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .union(edges
        .select(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst")))
      .repartition(col("src"))
      .persist()
    // Materialize + re-root the edge cache as an RDD leaf too: each
    // round's neighbor-min join would otherwise re-embed the caller's
    // whole edge-producing subplan in the round's plan text (the d21
    // lesson — Catalyst re-analysis is paid per round even though
    // execution reads the cache).
    val edgeRows = undirected.count()
    val undirectedLeaf = truncateLineage(undirected)

    // NULL on an empty frame (sum over zero rows) — handled below.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)

    var labelsHandle = vertices
      .select(col(idCol).cast("long").as("id"), col(idCol).cast("long").as("label"))
      .persist()
    // ONE materializing action carries both the convergence seed and the
    // vertex count the endgame cutover needs
    val first = labelsHandle
      .agg(sum(col("label").cast("decimal(38,0)")).as("s"), count(lit(1)).as("n")).head()
    var prevSum = first.getDecimal(0)
    val vertexRows = first.getLong(1)
    if (prevSum == null) { // no vertices: trivially converged, nothing cached to keep
      undirected.unpersist()
      val empty = labelsHandle
      return (empty, () => { empty.unpersist(); () })
    }
    if (vertexRows + edgeRows <= localFinishMaxRows) {
      // --- SERIAL ENDGAME (the Scc.components doctrine): the whole graph
      // fits the documented driver budget — one collect + union-find
      // replaces diameter-many fixed-overhead distributed rounds.
      val ids = labelsHandle.select(col("id")).collect().map(_.getLong(0))
      val es = undirectedLeaf.select(col("src"), col("dst")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      Console.err.println(
        s"[cc] local-endgame vertices=${ids.length} directedEdges=${es.length}")
      val labeled = unionFindMinLabels(ids, es)
      undirected.unpersist()
      labelsHandle.unpersist()
      val out = vertices.sparkSession.createDataFrame(labeled.toSeq)
        .toDF("id", "label")
        .select(col("id").cast("long"), col("label").cast("long"))
        .persist()
      out.count()
      return (truncateLineage(out), () => { out.unpersist(); () })
    }
    // Each round references `labels` twice, so lineage must be re-rooted
    // per round (see truncateLineage) or the logical plan grows
    // geometrically with the iteration count.
    var labels = truncateLineage(labelsHandle)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val nbrMin = undirectedLeaf.join(labels, col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(min(col("label")).as("nbr_label"))
      val nextHandle = labels.join(nbrMin, labels("id") === nbrMin("dst"), "left")
        .select(labels("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .persist()
      val newSum = labelSum(nextHandle) // materializes, so the old cache can go
      labelsHandle.unpersist()
      labelsHandle = nextHandle
      labels = truncateLineage(nextHandle)
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      iter += 1
    }
    undirected.unpersist() // labels is materialized; the edge cache is done
    if (!converged) {
      labelsHandle.unpersist() // failure path hands out no release hook
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds " +
          "(long-chain graph: use starContractionWithRelease)")
    }
    // truncated view over the still-persisted final labels, so a caller
    // referencing the result more than once doesn't re-nest the rounds
    val done = labelsHandle
    (truncateLineage(done), () => { done.unpersist(); () })
  }
}
