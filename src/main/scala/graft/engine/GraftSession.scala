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
      // Shuffle/spill scratch dir. Guide §2.1: local storage latency is
      // part of every shuffle's cost, and the iterative operators run
      // dozens of tiny per-round shuffles whose cost is FILE-CREATION
      // latency, not bandwidth — A/B on the iterative bench subset:
      // tmpfs scratch took d51 3.09→1.76 s, d56 1.85→1.40, h2 2.68→2.33
      // (d21 flat). Default = memory-backed /dev/shm when present (the
      // local-harness analog of the fast local NVMe scratch a production
      // cluster mounts for spark.local.dir); SPARK_GRAFT_LOCAL_DIR
      // overrides for deployments whose shuffle volume exceeds RAM.
      // r19 GUARD (r18 advice): a RAM-backed scratch dir fills MEMORY when
      // shuffle volume exceeds it — Docker's default /dev/shm is 64 MB and
      // tmpfs is typically capped at 50% RAM, so the tmpfs default only
      // applies when the mount has real headroom
      // (SPARK_GRAFT_SHM_MIN_FREE_GB, default 16 GiB usable). Under the
      // bound — or on any deployment whose cluster manager sets
      // spark.local.dir itself (YARN/K8s override this config) — the
      // scratch stays on disk-backed java.io.tmpdir.
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", {
          val shm = new java.io.File("/dev/shm")
          val minFree = sys.env.getOrElse(
            "SPARK_GRAFT_SHM_MIN_FREE_GB", "16").toLong * (1L << 30)
          if (shm.isDirectory && shm.canWrite && shm.getUsableSpace >= minFree)
            "/dev/shm/graft_scratch"
          else sys.props.getOrElse("java.io.tmpdir", "/tmp")
        }))
  }

  /** Local session for tests / CLI mains. */
  def local(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = builder(appName).master(s"local[$cpus]").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
