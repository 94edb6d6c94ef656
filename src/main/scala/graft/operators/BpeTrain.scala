package graft.operators

import scala.collection.mutable.ListBuffer

import graft.functions.expr.BpeMergePass
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative BPE merge training — the tokenizer-vocabulary loop (Sennrich
  * et al. 2016) over a distributed corpus: each round counts every
  * adjacent token pair, promotes the most frequent pair to a new symbol
  * (deterministic tie-break: count DESC, then left/right ASC), and
  * rewrites the corpus with one greedy merge pass. `t40_bpe_pair_counts`
  * gates a single round's counting; this operator is the full training
  * loop that produces the merge TABLE a tokenizer ships.
  *
  * Scale shape per round: ONE pair-count aggregate (map-side combine on
  * (left,right) — shuffle rows bounded by distinct pairs, not corpus
  * size), a 1-ROW collect for the argmax (never data-scale), and one
  * embarrassingly-parallel rewrite via the native [[BpeMergePass]]
  * expression. The corpus frame is persisted per round and re-rooted as
  * an RDD leaf (the PageRank/TreeDepth lineage rule: each round's frame
  * feeds BOTH the count job and the next round, and an un-truncated plan
  * would re-run every prior merge pass each round).
  */
object BpeTrain {

  /** @param docs     corpus frame
    * @param tokenCol array<string> column of pre-split tokens
    * @param rounds   merge table size to learn
    * @return (round, left, right, pair_count) — one row per learned
    *         merge, in training order; stops early when no pair repeats
    */
  def train(docs: DataFrame, tokenCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 10000, s"rounds=$rounds out of range")
    val spark = docs.sparkSession
    import spark.implicits._

    def truncate(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, df.schema)

    val h0 = docs.select(col(tokenCol).cast("array<string>").as("toks"))
      .persist()
    h0.count()
    var cur = truncate(h0)
    // handles hold the PERSISTED frames (unpersist on a truncated leaf
    // would be a no-op on the original's storage)
    val handles = ListBuffer(h0)
    val merges = ListBuffer.empty[(Int, String, String, Long)]
    try {
      var round = 1
      var exhausted = false
      while (round <= rounds && !exhausted) {
        val pairs = cur.select(explode(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(count(lit(1)).as("cnt"))
        val top = pairs
          .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
          .limit(1).collect()
        if (top.isEmpty || top(0).getLong(2) < 2) {
          // no pair occurs twice — further merges would memorize single
          // documents; standard trainers stop here
          exhausted = true
        } else {
          val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += ((round, l, r, cnt))
          val next = cur.select(BpeMergePass(col("toks"), l, r).as("toks"))
            .persist()
          next.count()
          val leaf = truncate(next)
          handles += next
          cur = leaf
          // previous round's blocks are no longer referenced
          handles.remove(0).unpersist(blocking = false)
          round += 1
        }
      }
    } finally handles.foreach(_.unpersist(blocking = false))
    merges.toSeq.toDF("round", "left", "right", "pair_count")
      .withColumn("round", col("round").cast("long"))
  }
}
