package graft.engine

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Mirrors the reference's connection context (`src/utils.py:70-147` builds
  * Oracle/PG engines + a MinIO client eagerly) but Spark-first: one lazy
  * session, UTC session timezone (the reference normalizes Europe/Rome
  * timestamps to naive UTC-like values, `src/utils.py:298-306`), AQE on so
  * joins/aggregations re-plan at runtime, and a shuffle-partition count sized
  * for the local[32] test harness. On a real cluster the same builder is used
  * with `master` unset and shuffle partitions sized to cores × executors.
  */
object GraftSession {

  /** Defaults chosen for 100 TB posture:
    *  - AQE + skew-join handling: runtime re-plan beats static planning when
    *    key skew shows up at scale (TPC-H-ish data is uniform; real data isn't).
    *  - auto broadcast threshold raised: every dimension in the reference's
    *    join inventory (SURVEY §2.5) is ≤ thousands of rows.
    *  - shuffle partitions default 32 to match local[32]; override per env.
    */
  def builder(appName: String = "graft"): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession
      .builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Object-buffer aggregates (TypedImperativeAggregate, e.g. the top-k
      // ANN ranker) must stay hash-based: the default sort-fallback kicks in
      // at 128 distinct keys and re-sorts the whole input.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      // Kryo for broadcasts/closures (e.g. the ANN index matrix); DataFrame
      // shuffles already use Tungsten encoders either way.
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      // Managed-table warehouse for BUCKETED layouts (io/Bucketed): kept
      // out of the repo tree; on a cluster this is the shared warehouse
      // path instead.
      .config("spark.sql.warehouse.dir",
        sys.env.getOrElse("SPARK_GRAFT_WAREHOUSE", "/tmp/graft_warehouse"))
  }

  /** Local session for tests / CLI mains. */
  def local(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = builder(appName).master(s"local[$cpus]").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
