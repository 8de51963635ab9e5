package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ext.{EventQueries, Relational, Similarity, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each ext module owns its `queries` (Spark impls) and `oracle`
  * (DuckDB-equivalent SQL); this object is only the union. Queries
  * without an oracle entry get the driver's weaker rows-only check.
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracle),
      (EventQueries.queries, EventQueries.oracle),
      (TextAnalysis.queries, TextAnalysis.oracle),
      (Similarity.queries, Similarity.oracle),
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EventQueries.qGoldAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
