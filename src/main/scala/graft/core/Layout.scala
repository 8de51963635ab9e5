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

  /** Crash-safe directory replacement: stage new contents via `write`
    * into `path._staging`, swap the live dir to `path._backup`, rename
    * staging in, drop the backup. Any crash leaves a recoverable
    * state: [[recoverDir]] (called on entry here too) restores the
    * backup when the live dir is missing, so no interleaving of crash
    * + retry can lose the previous contents — unlike a naive
    * delete-then-rename, where a crash between the two destroys the
    * target. `write` may read `path` lazily: the live dir is untouched
    * until staging has fully materialized.
    */
  def replaceDir(spark: SparkSession, path: String)(write: String => Unit): Unit = {
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverDir(spark, path)
    val staging = new org.apache.hadoop.fs.Path(path + "._staging")
    val backup = new org.apache.hadoop.fs.Path(path + "._backup")
    fs.delete(staging, true)
    write(staging.toString)
    fs.delete(backup, true)
    if (fs.exists(live) && !fs.rename(live, backup))
      throw new java.io.IOException(s"swap-out rename failed: $live -> $backup")
    if (!fs.rename(staging, live))
      throw new java.io.IOException(
        s"swap-in rename failed: $staging -> $live (backup preserved at $backup)")
    fs.delete(backup, true)
  }

  /** Heal an interrupted [[replaceDir]]: if the live dir is missing
    * but a backup exists, restore it. Idempotent; call before reading
    * a replaceDir-managed directory outside replaceDir itself.
    */
  def recoverDir(spark: SparkSession, path: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val backup = new org.apache.hadoop.fs.Path(path + "._backup")
    if (!fs.exists(live) && fs.exists(backup) && !fs.rename(backup, live))
      throw new java.io.IOException(s"recovery rename failed: $backup -> $live")
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ⌈bytes/targetBytes⌉ files. Streaming appends (AvailableNow
    * micro-batches, per-schema demux writes) accumulate files far
    * smaller than a scan's ideal split; at 100 TB the scheduled
    * compaction pass is what keeps scan task counts sane. Uses
    * coalesce (no shuffle) — pass a cluster key to [[writeClustered]]
    * instead when re-clustering is wanted; swaps via [[replaceDir]].
    */
  def compact(spark: SparkSession, path: String, targetBytes: Long = 128L << 20): Unit = {
    recoverDir(spark, path) // heal before statting: a prior crash may have left only the backup
    val src = new org.apache.hadoop.fs.Path(path)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(src).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    replaceDir(spark, path) { staging =>
      spark.read.parquet(path).coalesce(nFiles)
        .write.mode(SaveMode.Overwrite).parquet(staging)
    }
  }
}
