package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction — the table-maintenance companion to [[Layout]].
  *
  * Streaming sinks and incremental loads accrete files far below the
  * healthy task size; at 100 TB the cost is real (file-listing latency,
  * task-per-tiny-file scheduling, dead columnar compression). Compaction
  * rewrites a directory into ~`targetBytes` outputs:
  *
  *  - [[plan]] is the cheap read-only half: file sizes from parquet
  *    footer metadata (`_metadata.file_size` — one row per FILE, no data
  *    columns read), greedily binned in path order. The window it uses
  *    is over #files rows, never records, so its SinglePartition stage
  *    is bounded like a30's QI window.
  *  - [[compact]] executes: one repartition shuffle sized by the data
  *    being rewritten (that cost is the point — pay it once off the hot
  *    path instead of on every downstream scan), `maxRecordsPerFile`
  *    capped from the observed bytes/record so no output can overshoot.
  *
  * Writes go to a NEW directory: atomic swap (rename / catalog repoint)
  * is the caller's transaction, because overwriting in place would lose
  * the source on a mid-write failure.
  */
object Compaction {

  final case class Stats(
      filesBefore: Long, filesAfter: Long, bytes: Long, rows: Long)

  /** Greedy sequential bin-packing of the directory's files into
    * ~`targetBytes` bins: (file, size, bin). Read-only planning — decide
    * whether a rewrite is worth it from this frame's bin count vs file
    * count. */
  def plan(spark: SparkSession, path: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val files = spark.read.parquet(path)
      .select(col("_metadata.file_path").as("file"),
        col("_metadata.file_size").as("size"))
      .distinct()
    // cumulative-sum binning in path order: bin = floor(cumBefore / target)
    val w = Window.orderBy(col("file"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files
      .withColumn("cum", sum(col("size")).over(w))
      .withColumn("bin", ((col("cum") - col("size")) / targetBytes).cast("long"))
      .drop("cum")
  }

  /** Rewrite `inPath` into `outPath` as ⌈Σbytes / targetBytes⌉ files.
    * Exact row preservation (no dedup, no reorder semantics — compaction
    * is layout-only); returns before/after stats for the caller's
    * files/sec-style report. */
  def compact(
      spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long): Stats = {
    require(targetBytes > 0, "targetBytes must be positive")
    val totals = spark.read.parquet(inPath)
      .select(col("_metadata.file_path").as("file"),
        col("_metadata.file_size").as("size"))
      .distinct()
      .agg(count(lit(1)).as("files"), coalesce(sum(col("size")), lit(0L)).as("bytes"))
      .head()
    val (filesBefore, bytes) = (totals.getLong(0), totals.getLong(1))
    val df = spark.read.parquet(inPath)
    val rows = df.count()
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    // cap records per file from observed density so a skewed repartition
    // can't emit a file far past target (guard against nOut=1 extremes)
    val maxRecords =
      if (bytes == 0 || rows == 0) Long.MaxValue
      else math.max(1L, targetBytes / math.max(1L, bytes / rows))
    df.repartition(nOut)
      .write.mode(SaveMode.ErrorIfExists)
      .option("maxRecordsPerFile", maxRecords)
      .parquet(outPath)
    val filesAfter = spark.read.parquet(outPath)
      .select(col("_metadata.file_path")).distinct().count()
    Stats(filesBefore, filesAfter, bytes, rows)
  }
}
