package graft.core

/** Child-JVM writer for the cross-process TxTable race test: appends
  * `n` single-row commits tagged `tag` to the table at `args(0)` from
  * its OWN SparkSession in its OWN process, so the optimistic-
  * concurrency claim primitive (hard-link create on local FS) is
  * exercised across real process boundaries, not just threads.
  * Exits non-zero on any failure so the parent test sees it.
  */
object TxTableRaceHelper {
  def main(args: Array[String]): Unit = {
    val Array(tablePath, nStr, tag) = args
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("txtable-race-helper")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      import spark.implicits._
      val t = new TxTable(spark, tablePath)
      (0 until nStr.toInt).foreach { i =>
        t.append(Seq((s"$tag-$i", 1L)).toDF("k", "v"))
      }
    } finally spark.stop()
  }
}
