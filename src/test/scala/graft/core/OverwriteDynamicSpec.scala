package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Dynamic partition overwrite ([[TxTable.overwriteDynamic]]):
  * replaces exactly the partitions present in the frame, leaves the
  * rest byte-identical, stages value-pure, and rides replaceWhere's
  * atomic swap + change record.
  */
class OverwriteDynamicSpec extends SparkTestBase {

  import spark.implicits._

  private def table(): TxTable = new TxTable(spark, tmpDir("dynpart"))

  private def seed(t: TxTable): Unit =
    t.append(Seq(
      ("2024-01-01", 1L, 10.0), ("2024-01-01", 2L, 20.0),
      ("2024-01-02", 3L, 30.0), ("2024-01-03", 4L, 40.0))
      .toDF("day", "id", "amt"), partitionBy = Seq("day"))

  test("replaces exactly the partitions present in the frame") {
    val t = table(); seed(t)
    val before = t.state().files.toSet
    t.overwriteDynamic(Seq(
      ("2024-01-01", 9L, 90.0), ("2024-01-03", 8L, 80.0))
      .toDF("day", "id", "amt"), Seq("day"))
    val got = t.read().select("day", "id", "amt")
      .as[(String, Long, Double)].collect().toSet
    assert(got == Set(
      ("2024-01-01", 9L, 90.0), ("2024-01-02", 3L, 30.0),
      ("2024-01-03", 8L, 80.0)))
    // the 01-02 partition's file survived untouched
    val survivors = t.state().files.filter(before.contains)
    assert(survivors.nonEmpty, "untouched partition must not rewrite")
    // and the replacement staged value-pure: a day-probe scan prunes
    // to that day's files only
    val pruned = t.prunedFiles(t.state(), col("day") === "2024-01-03")
    assert(pruned.nonEmpty && pruned.size < t.state().files.size,
      s"expected partition pruning, read ${pruned.size}/${t.state().files.size}")
  }

  test("change record: replaced rows delete, replacement rows insert") {
    val t = table(); seed(t)
    val v0 = t.version
    t.overwriteDynamic(Seq(("2024-01-02", 7L, 70.0)).toDF("day", "id", "amt"),
      Seq("day"))
    val feed = t.readChangeFeed(v0, t.version)
      .select("id", TxTable.ChangeTypeCol).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(feed == Set((3L, "delete"), (7L, "insert")))
  }

  test("null partition values replace; empty frame is a no-op") {
    val t = table()
    t.append(Seq((Some("d1"), 1L), (None, 2L)).toDF("day", "id"))
    t.overwriteDynamic(Seq((None: Option[String], 9L)).toDF("day", "id"), Seq("day"))
    val got = t.read().select("day", "id")
      .as[(Option[String], Long)].collect().toSet
    assert(got == Set((Some("d1"), 1L), (None, 9L)))
    val v = t.version
    t.overwriteDynamic(spark.emptyDataset[(String, Long)].toDF("day", "id"),
      Seq("day"))
    assert(t.version == v, "empty dynamic overwrite must not commit")
  }

  test("partition-count cap rejects loudly before any commit") {
    val t = table(); seed(t)
    val v = t.version
    val big = (0 until 20).map(i => (s"2024-02-$i", i.toLong, 0.0))
      .toDF("day", "id", "amt")
    val e = intercept[IllegalArgumentException] {
      t.overwriteDynamic(big, Seq("day"), maxPartitions = 10)
    }
    assert(e.getMessage.contains("maxPartitions"))
    assert(t.version == v)
  }

  test("multi-column partitioning replaces exact tuples") {
    val t = table()
    t.append(Seq(("a", 1, 1L), ("a", 2, 2L), ("b", 1, 3L))
      .toDF("region", "bucket", "id"))
    t.overwriteDynamic(Seq(("a", 1, 9L)).toDF("region", "bucket", "id"),
      Seq("region", "bucket"))
    val got = t.read().select("region", "bucket", "id")
      .as[(String, Int, Long)].collect().toSet
    assert(got == Set(("a", 1, 9L), ("a", 2, 2L), ("b", 1, 3L)))
  }
}
