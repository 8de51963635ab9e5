package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.TxTable

/** Optimizer-time file skipping over TxTable snapshot relations: every
  * DECLARATIVE read path (DataFrame `.where`, the batch format, SQL)
  * must plan a range probe over only the stat-overlapping files — the
  * behavior [[graft.core.TxTable.scan]] provides explicitly, made
  * automatic by [[TxSkipRule]].
  */
class TxSkipRuleSpec extends SparkTestBase {

  import spark.implicits._

  /** Files the optimized plan will actually scan. */
  private def plannedFiles(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location.inputFiles.length
        case _ => 0 // the empty-snapshot TableScan relation
      }
    }.sum

  private def clustered(): TxTable = {
    val t = new TxTable(spark, tmpDir("txskip-rule"))
    // four key-clustered files: [0,24], [25,49], [50,74], [75,99]
    (0 until 4).foreach { b =>
      t.append((b * 25 until b * 25 + 25).map(i => (i.toLong, s"v$i"))
        .toDF("k", "v").coalesce(1))
    }
    t
  }

  test("a .where over read() plans a scan of only the overlapping files") {
    val t = clustered()
    val probe = t.read().where(col("k") >= 30L && col("k") <= 40L)
    assert(plannedFiles(t.read()) == 4)
    assert(plannedFiles(probe) == 1, probe.queryExecution.optimizedPlan)
    // the answer is still exact — pruning only removed provably-empty files
    assert(probe.collect().map(_.getLong(0)).sorted.toSeq == (30L to 40L))
    // an opaque predicate prunes nothing and stays correct
    val opaque = t.read().where(length(col("v")) === lit(3))
    assert(plannedFiles(opaque) == 4)
    assert(opaque.count() == 90) // v10..v99
    // a DISJUNCTION skips per-branch: two point probes touch two files
    val orProbe = t.read().where(col("k") === 10L || col("k") === 90L)
    assert(plannedFiles(orProbe) == 2, orProbe.queryExecution.optimizedPlan)
    assert(orProbe.collect().map(_.getLong(0)).sorted.toSeq == Seq(10L, 90L))
    // an OR with an unprovable branch keeps everything and stays exact
    val orOpaque = t.read().where(col("k") === 10L || length(col("v")) === lit(2))
    assert(plannedFiles(orOpaque) == 4)
    assert(orOpaque.count() == 11) // v0..v9 plus k=10
    // LIKE 'v6%' reaches the scan as StartsWith and prunes on string
    // ranges: [v25,v49] and [v75,v99] provably can't hold a v6-prefix
    val like = t.read().where(col("v").like("v6%"))
    assert(plannedFiles(like) == 2, like.queryExecution.optimizedPlan)
    assert(like.collect().map(_.getLong(0)).sorted.toSeq == (6L +: (60L to 69L)))
  }

  test("the batch format and SQL name surface are skip-enabled too") {
    val t = clustered()
    val viaFormat = spark.read.format("graft-txtable")
      .option("path", t.tablePath).load()
      .where(col("k") === 60L)
    assert(plannedFiles(viaFormat) == 1, viaFormat.queryExecution.optimizedPlan)
    assert(viaFormat.collect().map(_.getString(1)).toSeq == Seq("v60"))

    t.registerSql("skiprule_t")
    // the shared test session lacks the analyzer extension, but the
    // optimizer rule is live-attached — drive SQL through a view of
    // the registered read path instead
    t.read().createOrReplaceTempView("skiprule_v")
    val viaSql = spark.sql("SELECT v FROM skiprule_v WHERE k BETWEEN 75 AND 80")
    assert(plannedFiles(viaSql) == 1, viaSql.queryExecution.optimizedPlan)
    assert(viaSql.collect().map(_.getString(0)).sorted.toSeq ==
      (75L to 80L).map(i => s"v$i"))
  }

  test("skipping composes with row-mutations and honors the snapshot") {
    val t = clustered()
    t.delete(col("k").between(25L, 49L)) // drops one whole file
    val probe = t.read().where(col("k") <= 30L)
    // post-delete live set: [0,24] + the other two files; <=30 touches 1
    assert(plannedFiles(probe) == 1, probe.queryExecution.optimizedPlan)
    assert(probe.count() == 25)
    // time travel reads the OLD snapshot and prunes within it
    val old = t.readAt(3L).where(col("k").between(30L, 40L))
    assert(plannedFiles(old) == 1)
    assert(old.count() == 11)
  }

  test("partition predicates over a partitioned write prune declaratively") {
    val t = new TxTable(spark, tmpDir("txskip-part"))
    t.append((1L to 90L).map(i => (i, s"t${i % 3}")).toDF("id", "type"),
      partitionBy = Seq("type"))
    // one value-pure file per type; a declarative .where on the
    // partition column plans a single-file scan — partition pruning
    // through the optimizer rule, no scan() call needed
    assert(plannedFiles(t.read()) == 3)
    val probe = t.read().where(col("type") === "t1")
    assert(plannedFiles(probe) == 1, probe.queryExecution.optimizedPlan)
    assert(probe.count() == 30L)
    // composes with non-partition conjuncts
    val mixed = t.read().where(col("type") === "t2" && col("id") > 10L)
    assert(plannedFiles(mixed) == 1)
    assert(mixed.count() == (1L to 90L).count(i => i % 3 == 2 && i > 10))
  }
}
