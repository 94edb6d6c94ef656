package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}

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

  /** Bucketed (and optionally per-bucket sorted) table in the session
    * catalog. Bucketed layout requires the table path (`saveAsTable`);
    * plain `.parquet(path)` cannot carry bucket metadata. */
  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, numBuckets: Int,
      sortCol: Option[String] = None,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).format("parquet")
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }
}
