package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical-layout utilities: bucketing for co-located joins.
  *
  * At 100 TB the fact-to-fact join (e.g. lineitem ⋈ orders) dominated
  * by its shuffle disappears when both tables are written bucketed by
  * the join key with the same bucket count — Spark's scan reports the
  * bucketing as HashPartitioning, and the SortMergeJoin plans with NO
  * Exchange on either side. Bucket count is a cluster-sizing choice
  * (≈ target parallelism); bucket pruning additionally serves
  * point-lookups on the bucket key.
  */
object Layout {

  /** Write `df` as a bucketed (+ sorted in-bucket) managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    path: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).bucketBy(buckets, key).sortBy(key)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Repartition-and-sort layout for non-catalog parquet output: one
    * file per hash partition of `key`, rows sorted within — the
    * poor-man's bucketing when no catalog is available (readers get
    * clustered data but no partitioning metadata).
    */
  def writeClustered(df: DataFrame, path: String, key: String, partitions: Int): Unit =
    df.repartition(partitions, df(key))
      .sortWithinPartitions(key)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Small-file compaction: rewrite a parquet directory into
    * ⌈bytes/targetBytes⌉ files. Streaming appends (AvailableNow
    * micro-batches, per-schema demux writes) accumulate files far
    * smaller than a scan's ideal split; at 100 TB the scheduled
    * compaction pass is what keeps scan task counts sane. Uses
    * coalesce (no shuffle) — pass a cluster key to [[writeClustered]]
    * instead when re-clustering is wanted. Writes to a temp dir then
    * swaps, so a crash never leaves the table half-compacted.
    */
  def compact(spark: SparkSession, path: String, targetBytes: Long = 128L << 20): Unit = {
    val src = new org.apache.hadoop.fs.Path(path)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(src).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "._compacting")
    spark.read.parquet(path).coalesce(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(src, true)
    if (!fs.rename(tmp, src))
      throw new java.io.IOException(s"compaction rename failed: $tmp -> $src")
  }
}
