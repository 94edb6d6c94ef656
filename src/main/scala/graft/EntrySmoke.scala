package graft
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.local("smoke")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_SMOKE rows=$n")
    df.show(5, false)
    spark.stop()
  }
}
