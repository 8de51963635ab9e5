package graft.core

/** Child-JVM writer for the cross-process TxTable race tests: from
  * its OWN SparkSession in its OWN process — so the optimistic-
  * concurrency claim primitive (hard-link create on local FS) is
  * exercised across real process boundaries, not just threads — either
  * appends `n` single-row commits tagged `tag` (mode "append"), or
  * upserts the single key `tag` n times with increasing values (mode
  * "merge"), retrying on the strict concurrent-commit abort until each
  * upsert lands. Exits non-zero on any failure so the parent test
  * sees it.
  */
object TxTableRaceHelper {
  def main(args: Array[String]): Unit = {
    val Array(tablePath, nStr, tag, mode) = args
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
      mode match {
        case "append" =>
          (0 until nStr.toInt).foreach { i =>
            t.append(Seq((s"$tag-$i", 1L)).toDF("k", "v"))
          }
        case "merge" =>
          (0 until nStr.toInt).foreach { i =>
            var attempts = 0
            var done = false
            while (!done) {
              try { t.merge(Seq((tag, i.toLong)).toDF("k", "v"), Seq("k")); done = true }
              catch {
                case _: java.util.ConcurrentModificationException =>
                  attempts += 1
                  if (attempts > 200) sys.error(s"merge $i starved after $attempts aborts")
              }
            }
          }
        case "identity" =>
          // identity appends re-stage internally on claim races — no
          // retry loop needed; ids must come out globally unique
          (0 until nStr.toInt).foreach { i =>
            t.append(Seq((s"$tag-$i")).toDF("v"))
          }
      }
    } finally spark.stop()
  }
}
