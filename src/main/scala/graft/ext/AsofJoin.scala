package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{EventTime, Tables}

/** As-of join — for each left row, the most recent right row with
  * right.time ≤ left.time within the same key — an operator Spark has
  * no builtin for (the prompt's canonical "custom operator" example).
  *
  * Implementation is the union-and-carry-forward technique rather
  * than a custom SparkPlan: tag both inputs, union them, and per key
  * take `last(right value, ignoreNulls)` over an ordered running
  * frame. Cost is ONE shuffle on the key (the same partitioning both
  * sides need anyway) + a per-partition sort — strictly cheaper than
  * the naive inequality join (O(n·m) BroadcastNestedLoop) and the
  * shape that survives 100 TB: no skew beyond what the key itself
  * has, no driver involvement. Right rows at the same (key, time)
  * must be pre-deduplicated for a deterministic result.
  */
object AsofJoin {

  /** Left rows (keyCol, timeCol, leftCols…) matched with the latest
    * `valueCol` from `right` at or before their time; unmatched → null.
    */
  def joinAsof(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
               valueCol: String): DataFrame = {
    val l = left.withColumn("_side", lit(1)).withColumn(valueCol, lit(null).cast(
      right.schema(valueCol).dataType))
    val r = right.select(col(keyCol), col(timeCol), col(valueCol))
      .withColumn("_side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // rights sort before lefts at equal time → "at or before" includes ties
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_matched", last(when(col("_side") === 0, col(valueCol)), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .drop("_side", valueCol)
      .withColumnRenamed("_matched", valueCol)
  }

  /** Each purchase matched with the user's latest click at-or-before
    * it (clicks deduped to one per (user, second) for determinism).
    */
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val loaded = Tables.load(s, dir, "events")
    val ev = loaded.withColumn("s", EventTime.sec(loaded))
    val clicks = ev.where($"event_type" === "click")
      .groupBy($"user_id", $"s").agg(max($"event_id").as("click_id"))
    val purchases = ev.where($"event_type" === "purchase")
      .select($"user_id", $"s", $"event_id".as("purchase_id"))
    joinAsof(purchases, clicks, "user_id", "s", "click_id")
      .select($"purchase_id", $"user_id", $"click_id")
      .orderBy($"purchase_id")
  }

  /** Non-equi range join: event values bucketed against a boundary
    * table (broadcast nested loop on a tiny broadcast side — the
    * right plan for literal range tables; for large range tables the
    * scale path is interval bucketing to an equi key).
    */
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ranges = Seq((0.0d, 50.0d, "low"), (50.0d, 100.0d, "mid"),
      (100.0d, 150.0d, "high"), (150.0d, 1e9, "extreme"))
      .toDF("lo", "hi", "bucket")
    Tables.load(s, dir, "events")
      .join(broadcast(ranges), $"value" >= $"lo" && $"value" < $"hi")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy($"bucket")
  }

  /** The large-range-table scale path for the same semantics:
    * [[graft.plans.BinnedRangeJoin]] turns the non-equi interval join
    * into a shuffled equi-join on bin ids. 40 overlapping intervals
    * ([5i, 5i+10), so every in-range value matches exactly two) keep
    * the duplicate semantics honest; the oracle is the PLAIN range
    * join in DuckDB — the rewrite provably changes nothing.
    */
  def qRangeJoinBinned(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val iv = s.range(0, 40).select(
      $"id".as("iv_id"),
      ($"id" * 5.0d).as("lo"),
      ($"id" * 5.0d + 10.0d).as("hi"))
    val joined = graft.plans.BinnedRangeJoin(
      Tables.load(s, dir, "events").select($"value"), iv,
      pt = $"value", lo = $"lo", hi = $"hi", binWidth = 10.0,
      condition = $"value" >= $"lo" && $"value" < $"hi")
    joined.groupBy($"iv_id")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy($"iv_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (qAsofJoin _),
    "q_range_join" -> (qRangeJoin _),
    "q_range_join_binned" -> (qRangeJoinBinned _),
  )

  val oracle: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH clicks AS (
        |  SELECT user_id, epoch_ms(ts) // 1000 AS s, MAX(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |purchases AS (
        |  SELECT user_id, epoch_ms(ts) // 1000 AS s, event_id AS purchase_id
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.purchase_id, p.user_id, c.click_id
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.s >= c.s
        |ORDER BY p.purchase_id""".stripMargin,
    "q_range_join" ->
      """SELECT bucket, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events JOIN (VALUES (0.0, 50.0, 'low'), (50.0, 100.0, 'mid'),
        |    (100.0, 150.0, 'high'), (150.0, 1000000000.0, 'extreme')) AS r(lo, hi, bucket)
        |  ON value >= lo AND value < hi
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_range_join_binned" ->
      """WITH iv AS (SELECT i AS iv_id, i * 5.0 AS lo, i * 5.0 + 10.0 AS hi
        |            FROM range(0, 40) t(i))
        |SELECT iv_id, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events JOIN iv ON value >= lo AND value < hi
        |GROUP BY iv_id ORDER BY iv_id""".stripMargin,
  )
}
