package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Table properties (TBLPROPERTIES role) and the DESCRIBE DETAIL
  * operational summary.
  */
class TableDetailSpec extends SparkTestBase {

  import spark.implicits._

  test("properties set, replace, unset, and ride checkpoints") {
    val t = new TxTable(spark, tmpDir("txdetail"), checkpointInterval = 2)
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.setProperty("owner", "pipelines-team")
    t.setProperty("owner", "pipelines-team") // idempotent: no commit
    val v = t.version
    assert(t.properties == Map("owner" -> "pipelines-team") && t.version == v)
    t.setProperty("retention.hours", "168")
    assertThrows[IllegalArgumentException](t.unsetProperty("nope"))
    t.unsetProperty("owner")
    (0 until 2).foreach(_ => t.append(Seq((2L, "b")).toDF("id", "v")))
    t.truncateLog()
    assert(new TxTable(spark, t.tablePath, checkpointInterval = 2).properties
      == Map("retention.hours" -> "168"))
  }

  test("detail() reports the operational summary of the snapshot") {
    val t = new TxTable(spark, tmpDir("txdetail"))
    t.append(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("id", "v", "amount").coalesce(1))
    t.addConstraint("pos", "amount > 0")
    t.addBloomIndex("id", expectedItems = 100L, fpp = 0.01)
    t.renameColumn("v", "name")
    t.deleteMergeOnRead(col("id") === 2L)
    t.setProperty("owner", "me")
    val d = t.detail()
    assert(d.version == t.version)
    assert(d.numFiles == t.state().files.size && d.sizeBytes > 0)
    assert(d.numRows.contains(3L), s"manifest row stats: ${d.numRows}")
    assert(d.maskedRows == 1L)
    assert(d.numColumns == 3)
    assert(d.protocol == (2, 2)) // rename + DV bumped it
    assert(d.constraints == Set("pos") && d.bloomIndexes == Set("id"))
    assert(d.renamedColumns == 1 && d.droppedColumns == 0)
    assert(d.properties == Map("owner" -> "me"))
    assert(d.lastCommitTs > 0L)
  }
}
