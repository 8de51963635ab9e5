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
}
