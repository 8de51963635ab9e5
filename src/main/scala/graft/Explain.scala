package graft
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("explain", 8)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    args.drop(1).foreach { q =>
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
