package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class JsonlIngestSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("streaming JSONL ingest is lossless, splits corrupt lines to the DLQ, admits incrementally") {
    val out = JsonlIngest.qJsonlIngest(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val expect = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq :+ (("_corrupt", JsonlIngest.CorruptLines.length.toLong, -1L))
    assert(out.toSeq.sortBy(_._1) == expect.sortBy(_._1))

    val (good, dlq) = JsonlIngest.ingest(spark, dir)
    // lossless and duplicate-free: every doc row round-trips the
    // to_json → gzip shard → streaming read exactly once
    assert(spark.read.parquet(good).count() == docs.count())
    val backIds = spark.read.parquet(good).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(backIds.distinct.length == backIds.length)
    // the DLQ holds exactly the malformed raw lines, verbatim
    val badLines = spark.read.parquet(dlq).collect().map(_.getString(0)).sorted
    assert(badLines.toSeq == JsonlIngest.CorruptLines.sorted)
    // text fidelity through JSON escaping: md5 of every text matches
    val a = docs.select(md5(col("text").cast("binary"))).collect().map(_.getString(0)).sorted
    val b = spark.read.parquet(good).select(md5(col("text").cast("binary")))
      .collect().map(_.getString(0)).sorted
    assert(a.toSeq == b.toSeq)
    // incremental admission: 5 input files at maxFilesPerTrigger=2 ⇒ 3
    // committed micro-batches in the checkpoint
    val commits = new java.io.File(
      good.stripSuffix("/docs") + "/_checkpoint/commits").list()
      .filterNot(_.startsWith("."))
    assert(commits.length == 3, s"expected 3 micro-batches, got ${commits.mkString(",")}")
  }
}
