package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** IDENTITY columns: log-owned auto-increment — appends get assigned
  * values from the high-water mark, explicit-id paths sync it, gaps
  * are legal.
  */
class IdentityColumnsSpec extends SparkTestBase {

  import spark.implicits._

  private def table(): TxTable = new TxTable(spark, tmpDir("txid"))

  test("appends assign dense ascending ids across commits") {
    val t = table()
    t.addIdentityColumn("row_id", start = 100L, step = 1L)
    t.append(Seq(("a"), ("b"), ("c")).toDF("v"))
    t.append(Seq(("d"), ("e")).toDF("v"))
    val out = t.read().orderBy("row_id").collect()
    assert(out.map(_.getLong(out.head.fieldIndex("row_id"))).toSeq
      == Seq(100L, 101L, 102L, 103L, 104L))
    assert(out.map(_.getString(out.head.fieldIndex("v"))).toSet
      == Set("a", "b", "c", "d", "e"))
    assert(t.identityColumns("row_id") == ((100L, 1L, 104L)))
  }

  test("supplying the identity column on append is refused; ids are unique under retries") {
    val t = table()
    t.addIdentityColumn("row_id")
    t.append(Seq(("a")).toDF("v"))
    val e = intercept[IllegalArgumentException] {
      t.append(Seq(("x", 999L)).toDF("v", "row_id"))
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"))
    // a concurrent identity append lands AFTER this writer read the
    // high-water mark and assigned its ids, BEFORE its claim: the
    // claim loses, the attempt's files are deleted, and the retry
    // re-assigns against the new mark — ids never collide
    val t2 = new TxTable(spark, t.tablePath)
    t2.beforeCommitHook = () => t.append(Seq(("race1"), ("race2")).toDF("v"))
    t2.append(Seq(("b"), ("c")).toDF("v"))
    val ids = t.read().select("row_id").collect().map(_.getLong(0)).toSeq
    assert(ids.distinct.size == ids.size, s"identity ids must be unique: $ids")
    assert(ids.size == 5, s"all five rows landed: $ids")
  }

  test("negative step descends; overwrite with explicit ids syncs the mark") {
    val t = table()
    t.addIdentityColumn("row_id", start = 0L, step = -2L)
    t.append(Seq(("a"), ("b")).toDF("v"))
    assert(t.read().select("row_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(-2L, 0L))
    // explicit backfill beyond the mark: the overwrite syncs hw
    t.overwrite(Seq(("z", -50L)).toDF("v", "row_id"))
    t.append(Seq(("w")).toDF("v"))
    val ids = t.read().select("row_id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(-50L) && ids.contains(-52L),
      s"append after sync continues past the explicit minimum: $ids")
  }

  test("merge with explicit ids syncs; later appends never collide") {
    val t = table()
    t.addIdentityColumn("row_id")
    t.append(Seq(("a"), ("b")).toDF("v")) // ids 1, 2
    t.merge(Seq((10L, "upserted")).toDF("row_id", "v"), Seq("row_id"))
    t.append(Seq(("c")).toDF("v")) // must jump past 10
    val ids = t.read().select("row_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(ids == Seq(1L, 2L, 10L, 11L), s"got $ids")
  }

  test("identity appends stay exactly-once under foreachBatch redelivery") {
    val t = table()
    t.addIdentityColumn("row_id")
    t.appendBatch(Seq(("a"), ("b")).toDF("v"), "writer-1", 7L)
    t.appendBatch(Seq(("a"), ("b")).toDF("v"), "writer-1", 7L) // redelivery
    val rows = t.read().collect()
    assert(rows.length == 2, "redelivered batch must not re-append")
    val ids = rows.map(_.getLong(rows.head.fieldIndex("row_id"))).sorted.toSeq
    assert(ids == Seq(1L, 2L))
    assert(t.identityColumns("row_id")._3 == 2L,
      "the skipped redelivery must not burn a range")
  }

  test("dropping the COLUMN is refused while declared; dropping the declaration frees it") {
    val t = table()
    t.addIdentityColumn("row_id")
    t.append(Seq(("a")).toDF("v"))
    // the column drop must not orphan a live allocator
    val e = intercept[IllegalArgumentException](t.dropColumn("row_id"))
    assert(e.getMessage.contains("identity"))
    assertThrows[IllegalArgumentException](t.dropIdentityColumn("nope"))
    t.dropIdentityColumn("row_id")
    assert(t.identityColumns.isEmpty)
    // now an ordinary column: writers may supply it...
    t.append(Seq(("b", 500L)).toDF("v", "row_id"))
    assert(t.read().where(col("row_id") === 500L).count() == 1)
    // ...and the column drop goes through
    t.dropColumn("row_id")
    assert(t.read().columns.toSeq == Seq("v"))
  }

  test("identity allocation survives renaming the identity column") {
    val t = table()
    t.addIdentityColumn("row_id")
    t.append(Seq(("a")).toDF("v"))
    t.renameColumn("row_id", "seq_no")
    t.append(Seq(("b")).toDF("v"))
    val out = t.read().orderBy("seq_no").collect()
    assert(t.read().columns.toSeq == Seq("v", "seq_no"))
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L),
      "allocation continues under the new surface name")
    assert(t.identityColumns.keySet == Set("seq_no"),
      "the declaration reports the surface name")
    // GENERATED ALWAYS still enforced under the new name
    assertThrows[IllegalArgumentException] {
      t.append(Seq(("x", 99L)).toDF("v", "seq_no"))
    }
  }

  test("two JVMs allocating identity ids concurrently never collide") {
    val t = table()
    t.addIdentityColumn("row_id")
    t.append(Seq(("seed")).toDF("v")) // schema exists for both writers
    val n = 5
    // a second JVM with its own SparkSession races this one on the
    // same log: allocation is arbitrated by the cross-process claim
    // primitive, and every loser re-stages against the new mark
    val helperCp = System.getProperty("java.class.path")
    val pb = new ProcessBuilder(
      new java.io.File(new java.io.File(
        System.getProperty("java.home"), "bin"), "java").getAbsolutePath,
      "-cp", helperCp, "graft.core.TxTableRaceHelper",
      t.tablePath, n.toString, "child", "identity")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new java.io.ByteArrayOutputStream()
    val drain = new Thread(() =>
      org.apache.hadoop.io.IOUtils.copyBytes(proc.getInputStream, out, 8192, false))
    drain.setDaemon(true); drain.start()
    try (0 until n).foreach(i => t.append(Seq((s"local-$i")).toDF("v")))
    finally {
      assert(proc.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
        { proc.destroyForcibly(); "helper JVM timed out" })
      drain.join(10000)
      assert(proc.exitValue() == 0,
        s"helper JVM failed:\n${out.toString("UTF-8").takeRight(4000)}")
    }
    val ids = t.read().select("row_id").collect().map(_.getLong(0)).toSeq
    assert(ids.length == 2 * n + 1)
    assert(ids.distinct.length == ids.length,
      s"cross-process identity ids must be unique: ${ids.sorted}")
    assert(t.identityColumns("row_id")._3 == ids.max,
      "the high-water mark equals the largest issued id")
  }

  test("a retired physical name cannot become an identity column") {
    val t = table()
    t.append(Seq(("x", 1L)).toDF("a", "n"))
    t.renameColumn("a", "b")
    // "a" is no surface column, but it IS b's physical slot on disk —
    // an identity column named "a" would write into b's files
    val e = intercept[IllegalArgumentException](t.addIdentityColumn("a"))
    assert(e.getMessage.contains("renamed"))
    // a name that was never used stays fine
    t.addIdentityColumn("c")
    t.append(Seq(("y", 2L)).toDF("b", "n"))
    assert(t.read().where(col("c") === 1L).count() == 1)
  }

  test("plain append racing a concurrent addIdentityColumn aborts loudly") {
    val t = table()
    t.append(Seq(("seed")).toDF("v"))
    val t2 = new TxTable(spark, t.tablePath)
    // the declaration lands AFTER t2 routed itself down the plain
    // (no-identity) append path, BEFORE its claim: committing would
    // permanently surface null ids in a GENERATED ALWAYS column
    t2.beforeCommitHook = () => t.addIdentityColumn("row_id")
    val e = intercept[java.util.ConcurrentModificationException](
      t2.append(Seq(("b")).toDF("v")))
    assert(e.getMessage.contains("identity"))
    // the rerun re-routes through identity assignment
    t2.append(Seq(("b")).toDF("v"))
    val ids = t2.read().where(col("row_id").isNotNull)
      .select("row_id").collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(1L), s"rerun must assign ids: $ids")
  }

  test("a nondeterministic source frame gets ids consistent with the high-water") {
    val t = table()
    t.addIdentityColumn("row_id")
    // each evaluation of this frame keeps a DIFFERENT subset: without
    // a single materialization, the hw advance (count) and the written
    // ids (zipWithIndex) and the staged rows would each see different
    // row sets — ids on disk could exceed the recorded high-water
    val nondet = spark.range(0, 400, 1, 8).toDF("n")
      .where(rand() < 0.5).selectExpr("cast(n as string) as v")
    t.append(nondet)
    val ids = t.read().select("row_id").collect().map(_.getLong(0)).toSeq
    assert(ids.distinct.size == ids.size, "ids unique")
    assert(ids.max == t.identityColumns("row_id")._3,
      s"max written id ${ids.max} must equal the recorded high-water " +
        s"${t.identityColumns("row_id")._3}")
    assert(ids.size.toLong == t.read().count())
    // and the next append continues safely past it
    t.append(Seq(("z")).toDF("v"))
    val ids2 = t.read().select("row_id").collect().map(_.getLong(0)).toSeq
    assert(ids2.distinct.size == ids2.size)
  }

  test("identity append re-adds a dropped column under a fresh slot") {
    // the identity path must mirror plain append's re-add mapping — a
    // randomized model-test sequence (drop value column, declare
    // identity, violating probe) caught the missing remap in round 7
    val t = table()
    t.addIdentityColumn("row_id")
    t.append(Seq(("a", 1L)).toDF("v", "n"))
    t.dropColumn("n")
    t.append(Seq(("b", 9L)).toDF("v", "n"))
    val out = t.read().orderBy("row_id").collect()
    assert(out.map(_.getString(out.head.fieldIndex("v"))).toSeq == Seq("a", "b"))
    assert(out(0).isNullAt(out(0).fieldIndex("n")), "old rows read null in the re-added slot")
    assert(out(1).getLong(out(1).fieldIndex("n")) == 9L)
    assert(out.map(_.getLong(out.head.fieldIndex("row_id"))).toSeq == Seq(1L, 2L),
      "identity allocation continues across the re-add")
  }

  test("declaration validations and checkpoint survival") {
    val t = new TxTable(spark, tmpDir("txid"), checkpointInterval = 2)
    t.append(Seq(("a", 1.0)).toDF("v", "amount"))
    assertThrows[IllegalArgumentException](t.addIdentityColumn("v"))
    assertThrows[IllegalArgumentException](t.addIdentityColumn("id", step = 0L))
    t.addIdentityColumn("row_id")
    assertThrows[IllegalArgumentException](t.addIdentityColumn("row_id"))
    (0 until 3).foreach(_ => t.append(Seq(("x", 2.0)).toDF("v", "amount")))
    t.truncateLog()
    val fresh = new TxTable(spark, t.tablePath, checkpointInterval = 2)
    assert(fresh.identityColumns.contains("row_id"))
    fresh.append(Seq(("y", 3.0)).toDF("v", "amount"))
    val ids = fresh.read().where(col("row_id").isNotNull)
      .select("row_id").collect().map(_.getLong(0)).toSeq
    assert(ids.distinct.size == ids.size)
    assert(ids.max == fresh.identityColumns("row_id")._3)
  }
}
