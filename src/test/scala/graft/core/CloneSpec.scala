package graft.core

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Zero-copy clone ([[TxTable.cloneTo]]): snapshot equality without
  * byte copies (hard links), full metadata carry-over (schema, stats,
  * constraints, bloom configs, deletion vectors), independent
  * divergence in both directions, vacuum safety across the share, and
  * the deliberate non-carry of writer-idempotence markers.
  */
class CloneSpec extends SparkTestBase {

  import spark.implicits._

  private def ids(t: TxTable): Set[Long] =
    t.read().select("id").as[Long].collect().toSet

  test("clone reads the source snapshot; bytes are shared, not copied") {
    val t = new TxTable(spark, tmpDir("clone-src"))
    t.append((1L to 100L).map(i => (i, s"r$i")).toDF("id", "v"))
    val c = t.cloneTo(tmpDir("clone-dst") + "/t")
    assert(ids(c) == (1L to 100L).toSet)
    assert(c.read().schema == t.read().schema)
    // every shared data file is the SAME inode (a link, not a copy)
    val f = t.state().files.head
    def ino(dir: String) =
      Files.getAttribute(Paths.get(dir, f), "unix:ino")
    assert(ino(t.tablePath) == ino(c.tablePath),
      "clone must hard-link data files, not copy them")
    // stats carried: the clone's scan prunes like the source's
    assert(c.state().stats.nonEmpty && c.state().stats == t.state().stats)
  }

  test("clone and source diverge independently") {
    val t = new TxTable(spark, tmpDir("clone-div"))
    t.append((1L to 10L).map(i => (i, s"r$i")).toDF("id", "v"))
    val c = t.cloneTo(tmpDir("clone-div-dst") + "/t")
    c.append(Seq((11L, "clone-only")).toDF("id", "v"))
    t.delete(col("id") <= 5L)
    assert(ids(t) == (6L to 10L).toSet, "clone append must not leak to source")
    assert(ids(c) == (1L to 11L).toSet, "source delete must not leak to clone")
  }

  test("source vacuum after overwrite cannot dangle the clone") {
    val t = new TxTable(spark, tmpDir("clone-vac"))
    t.append((1L to 50L).map(i => (i, s"r$i")).toDF("id", "v"))
    val c = t.cloneTo(tmpDir("clone-vac-dst") + "/t")
    t.overwrite(Seq((99L, "new")).toDF("id", "v"))
    t.vacuum(retainVersions = 0, olderThanMs = 0L)
    // the source's old files are swept from ITS root; the clone's
    // links keep the shared bytes alive under its own root
    assert(ids(t) == Set(99L))
    assert(ids(c) == (1L to 50L).toSet,
      "clone must survive the source's vacuum")
  }

  test("constraints, bloom configs and deletion vectors carry over") {
    val t = new TxTable(spark, tmpDir("clone-meta"))
    t.append((1L to 40L).map(i => (i, s"r$i")).toDF("id", "v")
      .repartition(4, col("id")))
    t.addConstraint("pos_id", "id > 0")
    t.addBloomIndex("id", expectedItems = 100L)
    t.deleteMergeOnRead(col("id") % 10 === 0, rewriteAtFraction = 1.0)
    val c = t.cloneTo(tmpDir("clone-meta-dst") + "/t")
    // DV mask carried: masked rows stay dead in the clone
    assert(ids(c) == (1L to 40L).filterNot(_ % 10 == 0).toSet)
    // constraint carried and live
    val e = intercept[IllegalArgumentException](
      c.append(Seq((-1L, "bad")).toDF("id", "v")))
    assert(e.getMessage.contains("pos_id"), e.getMessage)
    // bloom config carried
    assert(c.state().blooms.keySet == Set("id"))
  }

  test("rejects a target that already has commits") {
    val t = new TxTable(spark, tmpDir("clone-tgt"))
    t.append(Seq((1L, "a")).toDF("id", "v"))
    val busyPath = tmpDir("clone-busy") + "/t"
    new TxTable(spark, busyPath).append(Seq((9L, "x")).toDF("id", "v"))
    val e = intercept[IllegalArgumentException](t.cloneTo(busyPath))
    assert(e.getMessage.contains("already has commits"), e.getMessage)
  }

  test("writer-idempotence markers do not carry: the clone accepts batch 0") {
    val t = new TxTable(spark, tmpDir("clone-txn"))
    t.appendBatch(Seq((1L, "a")).toDF("id", "v"), writerId = "w", batchId = 0L)
    val c = t.cloneTo(tmpDir("clone-txn-dst") + "/t")
    // on the SOURCE this redelivery is swallowed; the clone is a new
    // table and must commit it
    c.appendBatch(Seq((2L, "b")).toDF("id", "v"), writerId = "w", batchId = 0L)
    assert(ids(c) == Set(1L, 2L))
    assert(ids(t) == Set(1L))
  }
}
