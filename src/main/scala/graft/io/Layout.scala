package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data layout for scale (SURVEY §4.2 partition-pruning row and
  * the 100 TB posture): the two levers that delete shuffles and scans
  * before Catalyst ever plans a query.
  *
  *  - [[writePartitioned]]: hive-style directory partitioning — equality/IN
  *    filters on the partition key prune whole directories at planning time
  *    (the scan shows `PartitionFilters`, and unmatched partitions are never
  *    listed, let alone read);
  *  - [[writeBucketed]]: pre-shuffled table layout — two tables bucketed by
  *    the same key into the same bucket count join with NO Exchange on
  *    either side; the per-bucket sort also removes the SMJ sort. This is
  *    how a fact-fact join that would shuffle 100 TB per run instead
  *    shuffles once at write time and never again.
  *
  * Choose partition columns with bounded cardinality (date, region — not
  * user id: millions of tiny directories kill the file listing) and bucket
  * counts sized so a bucket ≈ one healthy task (128-512 MB).
  */
object Layout {

  def writePartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, numBuckets: Int,
      sortCol: Option[String] = None,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val spark = df.sparkSession
    mode match {
      case SaveMode.Overwrite =>
        val loc: org.apache.hadoop.fs.Path =
          if (spark.catalog.tableExists(table)) {
            val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
            new org.apache.hadoop.fs.Path(
              spark.sessionState.catalog.getTableMetadata(ident).location)
          } else new org.apache.hadoop.fs.Path(
            spark.conf.get("spark.sql.warehouse.dir"),
            table.toLowerCase(java.util.Locale.ROOT))
        spark.sql(s"DROP TABLE IF EXISTS `$table`")
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
      case SaveMode.Append => // legitimate add-to-existing-layout; never delete
      case other => throw new IllegalArgumentException(
        s"writeBucketed supports Overwrite and Append, got $other")
    }
    val w = df.write.mode(mode).format("parquet")
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** The co-located read side of [[writeBucketed]]: both tables written
    * with the SAME bucket count on their join keys join with NO Exchange
    * (each task zips bucket i of both sides — LayoutSpec pins the plan);
    * mismatched bucket counts degrade to a correct shuffling join. */
  def colocatedJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String,
      joinType: String = "inner"): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey), joinType)
  }

  /** Z-order clustered write: range-partition then sort by the Morton key
    * of (`colA`, `colB`), so every output file covers a NARROW min-max
    * envelope on BOTH columns — the multi-dimensional companion to
    * [[writePartitioned]] (one-dimensional pruning) for predicates that
    * alternate between two columns. One range shuffle at write time; see
    * [[statsIndex]] for turning the envelopes into a file-pruning list. */
  def writeZOrdered(
      df: DataFrame, path: String, colA: String, colB: String,
      numFiles: Int, mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(!df.columns.contains("__z"),
      "writeZOrdered reserves the column name __z; rename it before writing")
    val keyed = df.withColumn("__z",
      graft.functions.expr.ZValue.zValue(col(colA), col(colB)))
    keyed
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(mode).parquet(path)
  }

  /** k-dimensional companion to [[writeZOrdered]]: clusters on
    * [[graft.functions.expr.ZValue.zValueN]] (the composed bit-arithmetic
    * interleave that generalizes the codegen'd 2-column fast path) so
    * box predicates over ANY subset of `cols` prune at both the file
    * level ([[statsIndex]]) and the parquet row-group level (reader
    * min/max stats — measured in ZOrderSpec). */
  def writeZOrderedN(
      df: DataFrame, path: String, cols: Seq[String], bits: Int,
      numFiles: Int, mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(!df.columns.contains("__z"),
      "writeZOrderedN reserves the column name __z; rename it before writing")
    val z = graft.functions.expr.ZValue.zValueN(cols.map(col), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(mode).parquet(path)
  }

  /** File-level min-max stats index over a parquet directory — the
    * data-skipping catalog a lakehouse keeps per table. One narrow
    * aggregate keyed on `_metadata.file_path` (no shuffle wider than
    * #files); the output is file-count-sized and drives
    * [[pruneFiles]]-style planning without touching data. */
  def statsIndex(spark: SparkSession, path: String, cols: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(count(lit(1)).as("rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))): _*)

  /** Files whose [min, max] envelope on `column` may contain `value` —
    * the planning-time skip list (no false negatives; envelope overlap
    * only). Consumers pass the survivors to `spark.read.parquet(files:_*)`. */
  def pruneFiles(index: DataFrame, column: String, value: Long): DataFrame =
    index.filter(col(s"min_$column") <= value && col(s"max_$column") >= value)
      .select(col("file"))
}
