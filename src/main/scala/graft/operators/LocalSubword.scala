package graft.operators

import scala.collection.mutable

import org.apache.spark.unsafe.types.UTF8String

/** Driver-side SERIAL ENDGAME for the subword trainers ([[BpeTrain]],
  * [[ByteBpe]], [[WordPiece]]) — the Scc/Bfs `localFinishMaxRows`
  * doctrine applied to merge training: the distributed rounds are
  * per-round VOCAB-scale (the data wall is solved), but a production
  * 32k–100k-merge vocabulary means ~10⁵ sequential Spark jobs — a
  * SCHEDULING wall (the r16 advisory). When the weighted symbol-stream
  * histogram fits an explicit row+symbol budget, the trainer collects
  * it ONCE and finishes here; above budget the distributed rounds
  * remain the default (they exist precisely to shrink/carry what the
  * driver cannot hold).
  *
  * This is the published production trainer shape (the HuggingFace
  * `tokenizers` BPE trainer): pair counts are maintained
  * INCREMENTALLY — a merge re-scans only the rows that contain the
  * merged pair (tracked by an occurrence index), never the whole
  * corpus — so per-round cost is O(affected rows + candidate scan),
  * not O(corpus). The candidate argmax is a full scan of the in-memory
  * pair map: for WordPiece that is forced (its likelihood score
  * cnt/(lc·rc) can INCREASE when a unit count drops, so a lazy
  * max-heap of stale entries is unsound), and for frequency-ranked BPE
  * it keeps one obviously-correct tie-break implementation; the map is
  * vocab-scale, so the scan is the cheap half of a round.
  *
  * BIT-PARITY with the distributed loops is the contract (the
  * budget=0 spec forces the distributed path and compares):
  *  - counts are exact longs, weighted per occurrence exactly like the
  *    distributed explode+sum;
  *  - the rewrite is [[graft.functions.expr.BpeMergePass]]'s greedy
  *    left-to-right single pass, re-implemented verbatim;
  *  - ties compare in UTF-8 BYTE order (UTF8String.compareTo — the
  *    order the distributed orderBy and WordPiece's u8cmp use), never
  *    String.compareTo's UTF-16 code-unit order;
  *  - count deltas come from a before/after pair-multiset DIFF of each
  *    rewritten row — immune to the classic incremental-BPE edge cases
  *    (overlapping "a a a" runs, l == r pairs, adjacent merges).
  */
private[operators] object LocalSubword {

  type Pair = (String, String)

  /** UTF-8 BYTE order — the order the distributed orderBy (UTF8String)
    * and DuckDB's memcmp use; shared with WordPiece's distributed argmax
    * (one copy, one tie semantics). */
  private[operators] def u8cmp(x: String, y: String): Int =
    UTF8String.fromString(x).compareTo(UTF8String.fromString(y))

  /** BpeMergePass.nullSafeEval, driver-side, verbatim semantics. */
  private[operators] def mergePass(
      toks: Array[String], l: String, r: String, lr: String): Array[String] = {
    val n = toks.length
    val out = new Array[String](n)
    var i = 0
    var o = 0
    while (i < n) {
      if (i + 1 < n && toks(i) == l && toks(i + 1) == r) {
        out(o) = lr
        i += 2
      } else {
        out(o) = toks(i)
        i += 1
      }
      o += 1
    }
    if (o == n) out else java.util.Arrays.copyOf(out, o)
  }

  /** The mutable training state: weighted rows, incremental pair
    * counts, per-pair row-occurrence index, and (for WordPiece) unit
    * counts. */
  private final class State(rows: Array[Array[String]], weights: Array[Long],
      trackUnits: Boolean) {
    val counts = mutable.HashMap.empty[Pair, Long]
    val occ = mutable.HashMap.empty[Pair, mutable.HashSet[Int]]
    val units = mutable.HashMap.empty[String, Long]

    {
      var idx = 0
      while (idx < rows.length) {
        val row = rows(idx)
        val w = weights(idx)
        var i = 0
        while (i + 1 < row.length) {
          val p = (row(i), row(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + w)
          occ.getOrElseUpdate(p, mutable.HashSet.empty) += idx
          i += 1
        }
        if (trackUnits) {
          i = 0
          while (i < row.length) {
            units.update(row(i), units.getOrElse(row(i), 0L) + w)
            i += 1
          }
        }
        idx += 1
      }
    }

    private def bump(m: mutable.HashMap[Pair, Long], k: Pair, d: Long): Unit = {
      val v = m.getOrElse(k, 0L) + d
      if (v == 0L) m.remove(k) else m.update(k, v)
    }

    /** Merge (l, r) → lr in every row containing the pair, maintaining
      * counts/occ/units via before/after multiset diffs. */
    def step(l: String, r: String, lr: String): Unit = {
      val touched = occ.getOrElse((l, r), mutable.HashSet.empty).toArray
      java.util.Arrays.sort(touched) // determinism of map iteration side effects
      for (idx <- touched) {
        val before = rows(idx)
        val after = mergePass(before, l, r, lr)
        val w = weights(idx)
        // pair multiset diff
        val delta = mutable.HashMap.empty[Pair, Long]
        var i = 0
        while (i + 1 < before.length) {
          bump(delta, (before(i), before(i + 1)), -1L); i += 1
        }
        i = 0
        while (i + 1 < after.length) {
          bump(delta, (after(i), after(i + 1)), 1L); i += 1
        }
        for ((p, d) <- delta) {
          val v = counts.getOrElse(p, 0L) + d * w
          if (v == 0L) counts.remove(p) else counts.update(p, v)
          // occurrence index: presence, not multiplicity — recheck both ways
          if (d > 0) occ.getOrElseUpdate(p, mutable.HashSet.empty) += idx
        }
        // pairs that vanished from this row entirely drop their index entry
        val afterSet = mutable.HashSet.empty[Pair]
        i = 0
        while (i + 1 < after.length) { afterSet += ((after(i), after(i + 1))); i += 1 }
        i = 0
        while (i + 1 < before.length) {
          val p = (before(i), before(i + 1))
          if (!afterSet.contains(p)) {
            occ.get(p).foreach { s => s -= idx; if (s.isEmpty) occ.remove(p) }
          }
          i += 1
        }
        if (trackUnits) {
          val ud = mutable.HashMap.empty[String, Long]
          i = 0
          while (i < before.length) {
            ud.update(before(i), ud.getOrElse(before(i), 0L) - 1L); i += 1
          }
          i = 0
          while (i < after.length) {
            ud.update(after(i), ud.getOrElse(after(i), 0L) + 1L); i += 1
          }
          for ((s, d) <- ud if d != 0L) {
            val v = units.getOrElse(s, 0L) + d * w
            if (v == 0L) units.remove(s) else units.update(s, v)
          }
        }
        rows(idx) = after
      }
    }
  }

  /** Frequency-ranked merge training ([[BpeTrain]]/[[ByteBpe]]
    * semantics): argmax count DESC then (l, r) UTF-8 ASC, stop when no
    * pair reaches weighted count 2.
    *
    * @return (round, left, right, pair_count) in training order */
  def bpeLocal(rows: Array[Array[String]], weights: Array[Long],
      rounds: Int): Seq[(Int, String, String, Long)] = {
    val st = new State(rows, weights, trackUnits = false)
    val merges = mutable.ListBuffer.empty[(Int, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      var best: Pair = null
      var bestCnt = 0L
      for ((p, c) <- st.counts if c >= 2L) {
        if (best == null || c > bestCnt ||
          (c == bestCnt && {
            val lc = u8cmp(p._1, best._1)
            lc < 0 || (lc == 0 && u8cmp(p._2, best._2) < 0)
          })) { best = p; bestCnt = c }
      }
      if (best == null) exhausted = true
      else {
        merges += ((round, best._1, best._2, bestCnt))
        st.step(best._1, best._2, best._1 + best._2)
        round += 1
      }
    }
    merges.toSeq
  }

  /** Likelihood-ranked merge training ([[WordPiece]] semantics):
    * argmax cnt/(lc·rc) by exact BigInt cross-multiplication, ties
    * (l, r) UTF-8 ASC, candidates need count ≥ 2; the merged symbol is
    * caller-shaped (##-continuation fusion).
    *
    * @return (round, left, right, pair_count, left_count, right_count) */
  def wordPieceLocal(rows: Array[Array[String]], weights: Array[Long],
      rounds: Int, mergedSymbol: (String, String) => String)
      : Seq[(Int, String, String, Long, Long, Long)] = {
    val st = new State(rows, weights, trackUnits = true)
    val merges = mutable.ListBuffer.empty[(Int, String, String, Long, Long, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      var best: Pair = null
      var bc = 0L; var blc = 0L; var brc = 0L
      for ((p, c) <- st.counts if c >= 2L) {
        val lc = st.units(p._1)
        val rc = st.units(p._2)
        if (best == null) { best = p; bc = c; blc = lc; brc = rc }
        else {
          val cmp = (BigInt(c) * BigInt(blc) * BigInt(brc))
            .compare(BigInt(bc) * BigInt(lc) * BigInt(rc))
          if (cmp > 0 || (cmp == 0 && {
            val lcm = u8cmp(p._1, best._1)
            lcm < 0 || (lcm == 0 && u8cmp(p._2, best._2) < 0)
          })) { best = p; bc = c; blc = lc; brc = rc }
        }
      }
      if (best == null) exhausted = true
      else {
        merges += ((round, best._1, best._2, bc, blc, brc))
        st.step(best._1, best._2, mergedSymbol(best._1, best._2))
        round += 1
      }
    }
    merges.toSeq
  }
}
