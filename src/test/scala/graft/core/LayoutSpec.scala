package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LayoutSpec extends SparkTestBase {

  test("bucketed tables join without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
    Layout.writeBucketed(orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_b", "o_custkey", buckets = 8)
    Layout.writeBucketed(customer.select("c_custkey", "c_mktsegment"),
      "customer_b", "c_custkey", buckets = 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange"), "bucketed join must not shuffle:\n" + plan.take(800))
      // and it is still correct
      val expected = orders.join(customer, col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("clustered parquet layout sorts rows within hash partitions") {
    val dir = "/root/testdata/sf0.001"
    val out = tmpDir("clustered")
    Layout.writeClustered(Tables.load(spark, dir, "orders"), out, "o_custkey", 4)
    val back = spark.read.parquet(out)
    assert(back.count() == Tables.load(spark, dir, "orders").count())
  }

  test("compaction collapses a fragmented directory, preserving rows") {
    val dir = "/root/testdata/sf0.001"
    val out = tmpDir("fragmented")
    val orders = Tables.load(spark, dir, "orders")
    orders.repartition(20).write.mode("overwrite").parquet(out)
    def parquetFiles: Int = new java.io.File(out).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles == 20)
    val rows = orders.count()
    Layout.compact(spark, out) // tiny table -> one file at default target
    assert(parquetFiles == 1, s"expected 1 file after compaction, got $parquetFiles")
    assert(spark.read.parquet(out).count() == rows)
  }
}
