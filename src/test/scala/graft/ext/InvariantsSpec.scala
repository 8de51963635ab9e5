package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables

/** Spark-level invariance properties (SURVEY.md §5.2): dedup
  * idempotence, aggregation invariance under partitioning/row order.
  */
class InvariantsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("dedup is idempotent: dedup(xs ++ xs) == dedup(xs)") {
    val ev = Tables.load(spark, dir, "events")
    val once = ev.dropDuplicates("user_id", "event_type")
    val doubled = ev.unionAll(ev).dropDuplicates("user_id", "event_type")
    assert(once.count() == doubled.count())
    val a = once.select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val b = doubled.select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
  }

  test("aggregation results are invariant under repartition/row order") {
    val base = EventQueries.qGoldAgg(spark, dir).collect().map(_.toSeq).toSeq
    Seq(1, 7, 64).foreach { n =>
      val ev = Tables.load(spark, dir, "events").repartition(n)
      ev.createOrReplaceTempView("events_shuffled")
      // recompute the same aggregate over the shuffled layout
      val again = ev
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          max(expr("ts div 1000000000")).as("last_ts_sec"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .orderBy(col("event_type"))
        .collect().map(_.toSeq).toSeq
      assert(again == base, s"mismatch at repartition($n)")
    }
  }

  test("unionByName is order-insensitive on the merged schema") {
    val ev = Tables.load(spark, dir, "events")
    val v1 = ev.select(col("event_id"), col("event_type"))
    val v2 = ev.select(col("event_id"), col("event_type"), col("value"))
    val ab = v1.unionByName(v2, allowMissingColumns = true)
    val ba = v2.unionByName(v1, allowMissingColumns = true)
    assert(ab.columns.sorted.sameElements(ba.columns.sorted))
    assert(ab.count() == ba.count())
    assert(ab.where(col("value").isNull).count() == ba.where(col("value").isNull).count())
  }
}
