package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — the CO-LOCATED JOIN primitive (SURVEY §6 scale
  * posture). Two tables bucketed into the same bucket count on their join
  * key hash-place matching keys in matching buckets at WRITE time, so a
  * later join needs NO shuffle at all: each task zips bucket i of both
  * sides. At 100 TB this converts the recurring fact⋈fact shuffle (the
  * single most expensive stage shape) into a one-time layout cost
  * amortized over every downstream join — the classic Hive/Spark bucketing
  * recipe, all public API (`DataFrameWriter.bucketBy/sortBy`).
  *
  * The reference has no equivalent (Polars is single-node); this is
  * engine-native scale surface. `BucketedLayoutSpec` pins the zero-
  * exchange plan; `j25_bucketed_colocated_join` hash-gates the VALUES
  * against a plain-join oracle, so layout can never change semantics.
  */
object Bucketed {

  /** Write `df` as a managed parquet table bucketed (and sorted) by
    * `keys` into `buckets` buckets, replacing any previous layout.
    * Sorting within buckets keeps merge-friendly run order and enables
    * sort-merge reads without a Sort node when bucket files stay single. */
  def writeBucketed(
      df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit = {
    require(keys.nonEmpty && buckets >= 1)
    val spark = df.sparkSession
    // Replace BOTH halves of any previous layout: the catalog entry (a
    // re-run in the same session) and the warehouse directory (a fresh
    // session's in-memory catalog no longer knows the table, but the
    // managed location survives the JVM and LOCATION_ALREADY_EXISTS
    // would reject the write).
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** The co-located read side: both tables must have been written through
    * [[writeBucketed]] with the SAME bucket count on their respective join
    * keys. Returns the joined frame; with broadcast out of the picture the
    * physical plan is a shuffle-free sort-merge over matching buckets. */
  def colocatedJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String,
      joinType: String = "inner"): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey), joinType)
  }
}
