package graft.ext

import graft.SparkTestBase

class AsofJoinSpec extends SparkTestBase {

  test("joinAsof picks the latest right row at or before each left time") {
    import spark.implicits._
    val right = Seq((1L, 10L, 100L), (1L, 20L, 200L), (2L, 5L, 500L))
      .toDF("user_id", "s", "click_id")
    val left = Seq((1L, 15L, 9001L), (1L, 20L, 9002L), (1L, 5L, 9003L), (3L, 50L, 9004L))
      .toDF("user_id", "s", "purchase_id")
    val out = AsofJoin.joinAsof(left, right, "user_id", "s", "click_id")
      .select("purchase_id", "click_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(9001L).contains(100L)) // 15 -> click at 10
    assert(out(9002L).contains(200L)) // tie at 20 matches (at-or-before)
    assert(out(9003L).isEmpty)        // before any click
    assert(out(9004L).isEmpty)        // user with no clicks
  }

  test("q_asof_join leaves no duplicate purchases and matches click users") {
    val out = AsofJoin.qAsofJoin(spark, "/root/testdata/sf0.001")
    val n = out.count()
    assert(n > 0)
    assert(out.select("purchase_id").distinct().count() == n)
  }
}
