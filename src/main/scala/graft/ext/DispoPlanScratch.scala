package graft.ext

import org.apache.spark.sql.functions._

/** TEMPORARY plan-dump scratch for the round-13 disposition rework:
  * the graded q_crawl_refresh plan shows only the accounting read
  * (the disposition frame runs as a per-trigger side effect), so the
  * within-batch-tier evidence needs the disposition frame's own
  * explain. Removed at the end of the round.
  */
object DispoPlanScratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("dispo-plan", 8)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/root/repo/plans/r13")
    val suffix = args.lift(2).getOrElse("after")
    graft.Prewarm.fixtures(spark, dir)
    // mirror qCrawlRefresh's trigger shape (frontier collapse elided —
    // it feeds `gated` upstream of the legs this round touched)
    val fr = CrawlRefresh.parseFetches(
      graft.sources.Warc.read(spark, CrawlRefresh.crawlFixture(spark, dir)))
      .select(col("doc_id"), col("source"), col("text"))
    val gated = CrawlRefresh.gate(fr)
    val idxDir = IncrementalDedup.persistedIndexDir(spark, dir)
    val dfreq = IncrementalDedup.dfSide(spark, dir,
      spark.read.parquet(s"$idxDir/df"))
    val dispo = CrawlRefresh.dispositions(gated,
      Seq(CrawlRefresh.corpusParts(spark, dir)), Some(dfreq))
    val plan = dispo.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    new java.io.File(out).mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/dispositions_$suffix.txt"), plan)
    println(s"[dispo-plan] wrote $out/dispositions_$suffix.txt")
    spark.stop()
  }
}
