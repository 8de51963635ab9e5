package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BinnedRangeJoinSpec extends SparkTestBase {

  import spark.implicits._

  /** Seeded messy inputs: duplicates, nulls, NaN/infinite points,
    * empty and non-finite intervals, negative domains.
    */
  private def points: DataFrame = {
    val rnd = new scala.util.Random(7)
    val vals: Seq[java.lang.Double] =
      Seq.tabulate(300)(i => java.lang.Double.valueOf(rnd.nextDouble() * 200 - 50)) ++
        Seq(null, java.lang.Double.valueOf(Double.NaN),
          java.lang.Double.valueOf(Double.PositiveInfinity),
          java.lang.Double.valueOf(Double.NegativeInfinity),
          java.lang.Double.valueOf(42.0), java.lang.Double.valueOf(42.0))
    vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("pid", "pt")
  }

  private def intervals: DataFrame = {
    val rnd = new scala.util.Random(13)
    val rows = Seq.tabulate(80) { i =>
      val lo = rnd.nextDouble() * 180 - 60
      (i.toLong, java.lang.Double.valueOf(lo),
        java.lang.Double.valueOf(lo + rnd.nextDouble() * 25))
    } ++ Seq(
      (1000L, java.lang.Double.valueOf(10.0), java.lang.Double.valueOf(5.0)),  // empty
      (1001L, null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(5.0)),
      (1002L, java.lang.Double.valueOf(42.0), java.lang.Double.valueOf(42.0)), // degenerate
      (1003L, java.lang.Double.valueOf(-60.0), java.lang.Double.valueOf(200.0))) // covers all
    rows.toDF("ivid", "lo", "hi")
  }

  private def naive: Set[(Long, Long)] =
    points.join(intervals, $"pt" >= $"lo" && $"pt" < $"hi")
      .select($"pid", $"ivid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("binned join equals the naive non-equi join, for any bin width") {
    val expected = naive
    for (w <- Seq(0.7, 5.0, 33.0, 1000.0)) {
      val got = BinnedRangeJoin(points, intervals,
        $"pt", $"lo", $"hi", w, $"pt" >= $"lo" && $"pt" < $"hi")
        .select($"pid", $"ivid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"bin width $w diverged")
    }
  }

  test("a tiny bin cap routes wide intervals through the exact fallback") {
    val expected = naive
    // cap of 3 bins at width 5 -> most intervals take the fallback path
    val got = BinnedRangeJoin(points, intervals,
      $"pt", $"lo", $"hi", 5.0, $"pt" >= $"lo" && $"pt" < $"hi",
      maxBinsPerInterval = 3)
      .select($"pid", $"ivid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("an open-end sentinel interval joins exactly instead of exploding") {
    val p = Seq(1.0, 500.0, 2.0e9).toDF("pt")
    val iv = Seq((0.0, 10.0, "low"), (150.0, 1.0e9, "extreme")).toDF("lo", "hi", "b")
    val got = BinnedRangeJoin(p, iv, $"pt", $"lo", $"hi", 10.0,
      $"pt" >= $"lo" && $"pt" < $"hi")
      .select($"pt", $"b").collect().map(r => (r.getDouble(0), r.getString(1))).toSet
    // 1e9/10 bins would have been ~1e8 elements without the fallback
    assert(got == Set((1.0, "low"), (500.0, "extreme")))
  }

  test("duplicate rows join once per qualifying pair, like the naive join") {
    val p = Seq(1.0, 1.0, 1.0).toDF("pt")
    val iv = Seq((0.0, 2.0), (0.0, 2.0)).toDF("lo", "hi")
    val n = BinnedRangeJoin(p, iv, $"pt", $"lo", $"hi", 1.0,
      $"pt" >= $"lo" && $"pt" <= $"hi").count()
    assert(n == 6L) // 3 points x 2 intervals
  }

  test("binned branch is an equi join; only the wide-tail fallback nests") {
    val plan = BinnedRangeJoin(points, intervals,
      $"pt", $"lo", $"hi", 10.0, $"pt" >= $"lo" && $"pt" < $"hi")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the main branch must be hash-joinable on the bin id; the exact
    // fallback branch may nest over its (filtered, provably small) side
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("optimizer rule rewrites a plain range join when the conf is set") {
    val rule = new RangeBinJoinRule
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    try {
      val q = () => points.join(intervals, $"pt" >= $"lo" && $"pt" < $"hi")
        .select($"pid", $"ivid")
      val baseline = q().collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      spark.conf.set(rule.ConfKey, "10.0")
      val rewritten = q()
      val physical = rewritten.queryExecution.executedPlan.toString
      assert(!physical.contains("CartesianProduct"), physical)
      assert(!physical.contains("BroadcastNestedLoopJoin"), physical)
      assert(physical.contains("Generate"), physical) // the interval expansion
      val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == baseline)
    } finally {
      spark.conf.unset(rule.ConfKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq rule)
    }
  }

  test("rule fails loudly, not with an OOM-sized array, on over-wide intervals") {
    val rule = new RangeBinJoinRule
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    try {
      spark.conf.set(rule.ConfKey, "10.0")
      spark.conf.set(rule.MaxBinsKey, "100")
      val p = Seq(1.0, 500.0).toDF("pt")
      val iv = Seq((0.0, 10.0), (150.0, 1.0e9)).toDF("lo", "hi")
      val e = intercept[Exception] {
        p.join(iv, $"pt" >= $"lo" && $"pt" < $"hi").count()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("range-bin")), e.toString)
    } finally {
      spark.conf.unset(rule.ConfKey)
      spark.conf.unset(rule.MaxBinsKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq rule)
    }
  }

  test("rule raises on infinite bounds it cannot bin, instead of dropping them") {
    val rule = new RangeBinJoinRule
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    try {
      spark.conf.set(rule.ConfKey, "10.0")
      val p = Seq(1.0, 500.0).toDF("pt")
      // an open-start sentinel: the original join matches pt <= 5
      val iv = Seq((Double.NegativeInfinity, 5.0)).toDF("lo", "hi")
      val e = intercept[Exception] {
        p.join(iv, $"pt" >= $"lo" && $"pt" <= $"hi").count()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("range-bin")), e.toString)
    } finally {
      spark.conf.unset(rule.ConfKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq rule)
    }
  }

  test("onlyTables allowlist scopes the rewrite to matching relations") {
    val rule = new RangeBinJoinRule
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    try {
      spark.conf.set(rule.ConfKey, "10.0")
      // a parquet-backed point side, so the leaf carries a file path
      val ev = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
        .select($"value".as("pt"))
      val q = () => ev.join(intervals, $"pt" >= $"lo" && $"pt" < $"hi")

      // non-matching allowlist: the join must stay un-rewritten
      spark.conf.set(rule.OnlyTablesKey, "no_such_table, other")
      assert(!q().queryExecution.optimizedPlan.toString.contains("__graft_bin"))

      // matching (by path substring): rewrite fires again
      spark.conf.set(rule.OnlyTablesKey, "EVENTS.parquet")
      assert(q().queryExecution.optimizedPlan.toString.contains("__graft_bin"))

      // unset = unscoped, the pre-advice behavior
      spark.conf.unset(rule.OnlyTablesKey)
      assert(q().queryExecution.optimizedPlan.toString.contains("__graft_bin"))
    } finally {
      spark.conf.unset(rule.ConfKey)
      spark.conf.unset(rule.OnlyTablesKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq rule)
    }
  }

  test("rule leaves equi joins and sub-range conditions alone") {
    val rule = new RangeBinJoinRule
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    try {
      spark.conf.set(rule.ConfKey, "10.0")
      // equi conjunct present -> hash-joinable already, no rewrite
      val equi = points.withColumn("k", $"pid" % 3)
        .join(intervals.withColumn("k", $"ivid" % 3), Seq("k"))
      assert(!equi.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      // only a lower bound -> not an interval, no rewrite
      val half = points.join(intervals, $"pt" >= $"lo")
      assert(!half.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
    } finally {
      spark.conf.unset(rule.ConfKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq rule)
    }
  }

  test("q_range_join_binned equals the naive range join on testdata") {
    val dir = "/root/testdata/sf0.001"
    val binned = graft.ext.AsofJoin.qRangeJoinBinned(spark, dir).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n"), r.getAs[Double]("total_value")))
    assert(binned.nonEmpty)
    val iv = spark.range(0, 40).select(
      $"id".as("iv_id"), ($"id" * 5.0d).as("lo"), ($"id" * 5.0d + 10.0d).as("hi"))
    val expected = graft.core.Tables.load(spark, dir, "events").select($"value")
      .join(iv, $"value" >= $"lo" && $"value" < $"hi")
      .groupBy($"iv_id")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy($"iv_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n"), r.getAs[Double]("total_value")))
    assert(binned.toSeq == expected.toSeq)
  }
}
