package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables

class ScaleOpsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("approx sketches stay within bounds of exact values (the flags the oracle pins)") {
    val rows = ScaleOps.qApproxStats(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tpe = r.getString(0)
      assert(r.getAs[Long]("hll_ok") == 1L, s"$tpe: HLL estimate outside 3-sigma bound")
      assert(r.getAs[Long]("p50_ok") == 1L, s"$tpe: p50 sketch rank outside bound")
      assert(r.getAs[Long]("p99_ok") == 1L, s"$tpe: p99 sketch rank outside bound")
      assert(r.getAs[Long]("exact_users") > 0 && r.getAs[Long]("n") > 0)
    }
  }

  test("bloom dedup keeps exactly the genuinely-new keys") {
    import spark.implicits._
    val existing = (0L until 500L).map(i => (i, s"old$i")).toDF("id", "payload")
    val incoming = (250L until 750L).map(i => (i, s"new$i")).toDF("id", "payload")
    val out = ScaleOps.bloomDedup(incoming, existing, "id", expectedKeys = 1000)
    val ids = out.select("id").collect().map(_.getLong(0)).toSet
    assert(ids == (500L until 750L).toSet)

    // empty corpus: Spark's zero-row bloom filter NPEs on mightContain;
    // the guard must pass everything through
    val none = existing.where(org.apache.spark.sql.functions.lit(false))
    assert(ScaleOps.bloomDedup(incoming, none, "id", expectedKeys = 10).count() == 500)
  }

  test("Misra-Gries heavy hitters: every token with freq > n/k survives, estimates bounded") {
    import org.apache.spark.sql.functions._
    val toks = Tables.load(spark, dir, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
    val n = toks.count()
    val k = 16
    val exact = toks.groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sketch = ScaleOps.qHeavyHitters(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.filter(_._2 > n / k).foreach { case (t, c) =>
      assert(sketch.contains(t), s"missed heavy hitter $t ($c > ${n / k})")
    }
    sketch.foreach { case (t, est) =>
      val true_ = exact(t)
      assert(est <= true_ && est >= true_ - n / k, s"$t est=$est true=$true_")
    }
  }

  test("salted aggregation equals direct aggregation") {
    val ev = Tables.load(spark, dir, "events")
    val direct = ev.groupBy(col("event_type"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("total"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet
    val salted = ScaleOps.saltedSumCount(ev, "event_type",
        col("value").cast("decimal(18,2)"), saltFactor = 8)
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("tx data skipping: the clustered scan reads a strict file subset, same answer") {
    val t = ScaleOps.clusteredOrdersTable(spark, dir)
    val st = t.state()
    val pred = col("o_datekey") >= ScaleOps.TxSkipLo &&
      col("o_datekey") <= ScaleOps.TxSkipHi
    val kept = t.prunedFiles(st, pred)
    assert(st.files.size > 1, "fixture must produce multiple range-clustered files")
    assert(kept.size < st.files.size,
      s"manifest stats must prune files (kept ${kept.size} of ${st.files.size})")
    info(s"data skipping kept ${kept.size} of ${st.files.size} files")
    assert(kept.nonEmpty, "the probe window overlaps the data: something must survive")
    // the skipped scan and the flat scan agree exactly
    val flat = ScaleOps.qTxFlat(spark, dir).collect().toSeq
    val skip = ScaleOps.qTxSkip(spark, dir).collect().toSeq
    assert(flat == skip)
    assert(flat.nonEmpty)
    // the DISJUNCTIVE probe prunes per-branch: strictly fewer files
    // than the table, strictly more rows than one window alone
    val orPred = (col("o_datekey") >= ScaleOps.TxSkipLo &&
      col("o_datekey") <= ScaleOps.TxSkipHi) ||
      (col("o_datekey") >= ScaleOps.TxSkipLo2 &&
        col("o_datekey") <= ScaleOps.TxSkipHi2)
    val keptOr = t.prunedFiles(st, orPred)
    assert(keptOr.size < st.files.size,
      s"OR pruning must drop files (kept ${keptOr.size} of ${st.files.size})")
    assert(keptOr.size >= kept.size, "the OR covers a superset of the rows")
    info(s"disjunctive skipping kept ${keptOr.size} of ${st.files.size} files")
    val both = ScaleOps.qTxSkipOr(spark, dir).collect().toSeq
    assert(both.map(_.getLong(1)).sum > skip.map(_.getLong(1)).sum,
      "the second window must contribute rows")
  }

  test("tx time travel and restore both land on the unmutated base aggregate") {
    // ground truth: the plain orders aggregate, straight off parquet
    val base = Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy(col("o_orderpriority")).collect().toSeq
    val pinned = ScaleOps.qTxTimetravel(spark, dir).collect().toSeq
    val restored = ScaleOps.qTxRestore(spark, dir).collect().toSeq
    assert(pinned == base, "versionAsOf=0 must see the pre-merge snapshot")
    assert(restored == base, "restore(0) must re-point the full v0 file set")
    // the pin has to MATTER: the same table's head includes the merge
    val head = ScaleOps.qTxMerge(spark, dir).collect().toSeq
    assert(head != pinned, "head and v0 must differ or the pin proves nothing")
    // restore is metadata-only and classified in the commit history
    val ops = ScaleOps.restoredOrdersTable(spark, dir).history().map(_.operation)
    assert(ops == Seq("APPEND", "OVERWRITE/RESTORE", "OVERWRITE/RESTORE"), ops)
  }

  test("tx merge-on-read delete matches the key-complement reconstruction") {
    val expected = Tables.load(spark, dir, "orders")
      .where(col("o_orderkey") % 5 =!= 1)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy(col("o_orderpriority")).collect().toSeq
    assert(ScaleOps.qTxDv(spark, dir).collect().toSeq == expected)
    // physical story: every file masked, none rewritten, one DV commit
    val t = ScaleOps.dvDeletedOrdersTable(spark, dir)
    val st = t.state()
    assert(st.files.size == 8 && st.dvs.size == 8)
    assert(t.history().map(_.operation) == Seq("APPEND", "UPDATE/DELETE (DV)"))
  }

  test("tx update matches the CASE-projection reconstruction") {
    val expected = Tables.load(spark, dir, "orders")
      .select(
        when(col("o_orderkey") % 7 === 0, lit("9-UPDATED"))
          .otherwise(col("o_orderpriority")).as("o_orderpriority"),
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 5000.0d)
          .otherwise(col("o_totalprice")).as("o_totalprice"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy(col("o_orderpriority")).collect().toSeq
    assert(ScaleOps.qTxUpdate(spark, dir).collect().toSeq == expected)
    // the sentinel priority group exists — the update demonstrably ran
    assert(expected.exists(_.getString(0) == "9-UPDATED"))
  }

  test("open-intervals two-level prefix sum equals the naive global cumsum") {
    import org.apache.spark.sql.expressions.Window
    val out = ScaleOps.qOpenIntervals(spark, dir).cache()
    // reference: plain unpartitioned running total over the same nets
    val naive = out.select(col("d"), col("net"))
      .withColumn("open_ref", sum(col("net")).over(Window.orderBy(col("d"))).cast("long"))
    val joined = out.join(naive.select(col("d"), col("open_ref")), "d")
    assert(joined.where(col("open") =!= col("open_ref")).isEmpty,
      "distributed prefix sum diverged from the naive cumsum")
    // every +1 has a matching -1: concurrency closes at zero and never dips below
    val rows = out.orderBy(col("d")).collect()
    assert(rows.last.getAs[Long]("open") == 0L, "intervals did not all close")
    assert(rows.forall(_.getAs[Long]("open") >= 0L), "negative concurrency")
    out.unpersist()
  }
}
