package graft

/** Prints the formatted physical plan of named queries (plan-audit tool:
  * the "is this the plan you'd want at 100 TB" loop from the build notes).
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.local("explainq")
    val dir = sys.env.getOrElse("SFDIR", "/root/testdata/sf0.01")
    args.foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
