package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** COLUMN MAPPING ([[TxTable.renameColumn]]): metadata-only renames —
  * data files keep their immutable physical names; the surface
  * projects the mapping on read and maps back on write.
  */
class ColumnMappingSpec extends SparkTestBase {

  import spark.implicits._

  private def table(): TxTable = new TxTable(spark, tmpDir("txmap"))

  private def seeded(): TxTable = {
    val t = table()
    t.append(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "v", "amount"))
    t
  }

  test("rename is metadata-only: same files, new surface name, old data") {
    val t = seeded()
    val filesBefore = t.state().files.toSet
    t.renameColumn("amount", "price")
    assert(t.state().files.toSet == filesBefore, "no data file moved")
    val out = t.read().orderBy("id").collect()
    assert(t.read().columns.toSeq == Seq("id", "v", "price"))
    assert(out.map(_.getDouble(2)).toSeq == Seq(10.0, 20.0, 30.0))
    // the physical parquet column is untouched
    assert(spark.read.parquet(
      filesBefore.map(f => t.tablePath + "/" + f).toSeq: _*).columns.contains("amount"))
  }

  test("time travel keeps temporal naming: pre-rename versions show the old name") {
    val t = seeded()
    t.renameColumn("amount", "price")
    assert(t.readAt(0L).columns.contains("amount"))
    assert(!t.readAt(0L).columns.contains("price"))
    assert(t.readAt(1L).columns.contains("price"))
  }

  test("scan prunes on the NEW name against the physically-keyed stats") {
    val t = table()
    // two range-disjoint files on the stat column
    t.append(Seq((1L, 5.0), (2L, 6.0)).toDF("id", "amount").coalesce(1))
    t.append(Seq((3L, 100.0), (4L, 101.0)).toDF("id", "amount").coalesce(1))
    t.renameColumn("amount", "price")
    val kept = t.prunedFiles(t.state(), col("price") > 50.0)
    assert(kept.size == 1, s"stat skip must survive the rename, kept $kept")
    assert(t.scan(col("price") > 50.0).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(3L, 4L))
  }

  test("appends after a rename use the new name and land in the same column") {
    val t = seeded()
    t.renameColumn("amount", "price")
    t.append(Seq((4L, "d", 40.0)).toDF("id", "v", "price"))
    val out = t.read().orderBy("id").collect()
    assert(out.length == 4 && out.last.getDouble(2) == 40.0)
    // physical consistency: all four rows live in physical `amount`
    val phys = spark.read.parquet(
      t.state().files.map(f => t.tablePath + "/" + f): _*)
    assert(phys.columns.contains("amount") && !phys.columns.contains("price"))
  }

  test("a NEW column under the retired physical name is rejected loudly") {
    val t = seeded()
    t.renameColumn("amount", "price")
    val e = intercept[IllegalArgumentException] {
      t.append(Seq((5L, "e", 1.0, 9.9)).toDF("id", "v", "price", "amount"))
    }
    assert(e.getMessage.contains("renamed"))
  }

  test("rename validations: unknown, collision, no-op") {
    val t = seeded()
    assertThrows[IllegalArgumentException](t.renameColumn("nope", "x"))
    assertThrows[IllegalArgumentException](t.renameColumn("amount", "id"))
    assertThrows[IllegalArgumentException](t.renameColumn("amount", "amount"))
  }

  test("chained renames collapse to one mapping and renaming back clears it") {
    val t = seeded()
    t.renameColumn("amount", "price")
    t.renameColumn("price", "cost")
    assert(t.state().renames == Map("amount" -> "cost"))
    assert(t.read().columns.toSeq == Seq("id", "v", "cost"))
    t.renameColumn("cost", "amount") // back to the physical name
    assert(t.state().renames.isEmpty, "identity mapping is dropped")
  }

  test("delete / update / merge all speak the new name") {
    val t = seeded()
    t.renameColumn("amount", "price")
    t.update(col("price") > 25.0, Map("price" -> (col("price") + 1.0)))
    assert(t.read().where(col("id") === 3).head().getDouble(2) == 31.0)
    t.merge(Seq((2L, "b2", 22.0)).toDF("id", "v", "price"), Seq("id"))
    assert(t.read().where(col("id") === 2).head().getString(1) == "b2")
    t.delete(col("price") < 15.0)
    assert(t.read().collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
  }

  test("the change feed reports surface names") {
    val t = seeded()
    t.renameColumn("amount", "price")
    val v0 = t.version
    t.update(col("price") === 10.0, Map("price" -> lit(11.0)))
    val feed = t.readChangeFeed(v0, t.version)
    assert(feed.columns.contains("price") && !feed.columns.contains("amount"))
    assert(feed.where(col("_change_type") === "update_postimage")
      .head().getDouble(feed.columns.indexOf("price")) == 11.0)
  }

  test("renames survive checkpoint replay and log truncation") {
    val t = new TxTable(spark, tmpDir("txmap"), checkpointInterval = 2)
    t.append(Seq((1L, 10.0)).toDF("id", "amount"))
    t.renameColumn("amount", "price")
    (0 until 3).foreach(i => t.append(Seq((10L + i, 1.0)).toDF("id", "price")))
    t.truncateLog()
    val fresh = new TxTable(spark, t.tablePath, checkpointInterval = 2)
    assert(fresh.read().columns.contains("price"))
    assert(fresh.state().renames == Map("amount" -> "price"))
  }

  test("constraints bind to physical names across renames, both directions") {
    val t = seeded()
    // added BEFORE the rename: still enforced after
    t.addConstraint("pos", "amount > 0")
    t.renameColumn("amount", "price")
    assertThrows[IllegalArgumentException] {
      t.append(Seq((9L, "z", -5.0)).toDF("id", "v", "price"))
    }
    // added AFTER the rename using the NEW name: translated, enforced
    t.addConstraint("cap", "price < 1000")
    assertThrows[IllegalArgumentException] {
      t.append(Seq((9L, "z", 5000.0)).toDF("id", "v", "price"))
    }
    t.append(Seq((9L, "z", 500.0)).toDF("id", "v", "price")) // in-bounds passes
    assert(t.read().count() == 4)
  }

  test("SQL and batch-format reads show the surface schema") {
    val t = seeded()
    t.renameColumn("amount", "price")
    val viaFormat = spark.read.format("graft-txtable")
      .option("path", t.tablePath).load()
    assert(viaFormat.columns.toSeq == Seq("id", "v", "price"))
    assert(viaFormat.where(col("price") > 25.0).collect().map(_.getLong(0)).toSeq
      == Seq(3L))
    assert(t.schemaOption.get.fieldNames.toSeq == Seq("id", "v", "price"))
  }

  test("dropColumn is metadata-only: files untouched, surface hidden, time travel intact") {
    val t = seeded()
    val filesBefore = t.state().files.toSet
    t.dropColumn("v")
    assert(t.state().files.toSet == filesBefore, "no data file moved")
    assert(t.read().columns.toSeq == Seq("id", "amount"))
    assert(t.schemaOption.get.fieldNames.toSeq == Seq("id", "amount"))
    assertThrows[org.apache.spark.sql.AnalysisException](
      t.read().select("v").collect())
    // the version below the drop still reads the column
    assert(t.readAt(0L).select("v").collect().map(_.getString(0)).sorted.toSeq
      == Seq("a", "b", "c"))
  }

  test("rewrites stop carrying a dropped column; re-add starts a fresh slot") {
    val t = seeded()
    t.dropColumn("v")
    // a copy-on-write delete rewrites its touched files WITHOUT v
    t.delete(col("id") === 1L)
    assert(t.read().count() == 2)
    // re-add the name: fresh physical slot, old values DEAD (null)
    t.append(Seq((4L, 40.0, "fresh")).toDF("id", "amount", "v"))
    val out = t.read().orderBy("id").collect()
    assert(t.read().columns.sorted.toSeq == Seq("amount", "id", "v"))
    assert(out.length == 3)
    assert(out.last.getString(out.head.fieldIndex("v")) == "fresh")
    assert(out.take(2).forall(_.isNullAt(out.head.fieldIndex("v"))),
      "pre-re-add rows must read the NEW slot as null, not the dead values")
    // and the mapping is to a fresh physical name, not the dropped one
    val m = t.state().renames.find(_._2 == "v")
    assert(m.exists(_._1 != "v"), s"expected fresh physical slot, got $m")
    assert(t.state().dropped == Set("v"))
  }

  test("dropColumn validations: unknown, last column, constraint references") {
    val t = seeded()
    assertThrows[IllegalArgumentException](t.dropColumn("nope"))
    t.addConstraint("pos", "amount > 0")
    assertThrows[IllegalArgumentException](t.dropColumn("amount"))
    t.dropConstraint("pos")
    t.dropColumn("amount")
    t.dropColumn("v")
    // id is now the last column
    assertThrows[IllegalArgumentException](t.dropColumn("id"))
    // constraints on a dropped column are refused at DDL time
    assertThrows[IllegalArgumentException](t.addConstraint("dead", "amount > 0"))
  }

  test("drop composes with rename: mapping bookkeeping stays consistent") {
    val t = seeded()
    t.renameColumn("amount", "price")
    t.dropColumn("price") // drops the RENAMED column by surface name
    assert(t.state().dropped == Set("amount"), "drop records the physical slot")
    assert(t.state().renames.isEmpty, "the dropped slot keeps no surface name")
    assert(t.read().columns.toSeq == Seq("id", "v"))
    t.renameColumn("v", "text") // later renames unaffected
    assert(t.read().columns.toSeq == Seq("id", "text"))
  }

  test("dropped set survives checkpoint replay") {
    val t = new TxTable(spark, tmpDir("txmap"), checkpointInterval = 2)
    t.append(Seq((1L, "a", 10.0)).toDF("id", "v", "amount"))
    t.dropColumn("v")
    (0 until 3).foreach(i => t.append(Seq((10L + i, 1.0)).toDF("id", "amount")))
    t.truncateLog()
    val fresh = new TxTable(spark, t.tablePath, checkpointInterval = 2)
    assert(fresh.state().dropped == Set("v"))
    assert(fresh.read().columns.toSeq == Seq("id", "amount"))
  }

  test("streaming from a renamed table surfaces the new name") {
    val t = seeded()
    t.renameColumn("amount", "price")
    val ckpt = tmpDir("txmap-ckpt")
    val outDir = tmpDir("txmap-out")
    spark.readStream.format("graft-txtable").option("path", t.tablePath).load()
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination(60000)
    val got = spark.read.parquet(outDir)
    assert(got.columns.contains("price") && !got.columns.contains("amount"))
    assert(got.count() == 3)
  }
}
