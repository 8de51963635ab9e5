package graft
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("bench-one", 32)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // same untimed fixture prewarm as Bench: run1 measures the query
    Prewarm.fixtures(spark, dir)
    args.drop(1).foreach { q =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).count()
        println(f"$q run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
