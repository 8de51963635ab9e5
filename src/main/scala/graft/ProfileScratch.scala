package graft

/** TEMPORARY profiling harness for the optimization round — times the
  * stages of the heaviest queries one action at a time. Not part of
  * the driver contract; deleted before the round closes.
  */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("profile", 32)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    Prewarm.fixtures(spark, dir)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // whole query twice for reference
    time("q_crawl_refresh run1")(SparkEntry.queries("q_crawl_refresh")(spark, dir).count())
    time("q_crawl_refresh run2")(SparkEntry.queries("q_crawl_refresh")(spark, dir).count())
    graft.ext.CrawlRefresh.profileStages(spark, dir)
    spark.stop()
  }
}
