package graft

import graft.engine.GraftSession
import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (Spark startup is ~5 s;
  * per-suite sessions would dominate test time). */
object TestSpark {
  /** Smoke-tier test corpus (TESTDATA.md). */
  val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val s = GraftSession.builder("graft-test")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-test-warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
