package graft
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.local("timeq")
    val dir = sys.env.getOrElse("SFDIR", "/root/testdata/sf0.01")
    args.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"TIMEQ $name rows=$n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
