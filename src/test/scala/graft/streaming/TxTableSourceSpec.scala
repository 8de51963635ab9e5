package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.SparkTestBase
import graft.core.TxTable

class TxTableSourceSpec extends SparkTestBase {

  import spark.implicits._

  // memory-sink queries cannot recover from a checkpoint, so the
  // restart tests drain through foreachBatch (which can) into a
  // driver-side buffer of ids
  private def drainIds(dir: String, ckpt: String): Seq[Long] = {
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("graft-txtable").option("path", dir).load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select("id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
          .collect().foreach(got.add)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    got.asScala.toSeq.sorted
  }

  test("micro-batches read exactly the commits added since the checkpointed version") {
    val dir = tmpDir("txsrc-inc")
    val ckpt = tmpDir("txsrc-inc-ckpt")
    val t = new TxTable(spark, dir)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))

    assert(drainIds(dir, ckpt) == Seq(1L, 2L))

    // two more commits; the restarted stream (same checkpoint) must
    // read ONLY the delta — offset replay is the table version, not a
    // table rescan
    t.append(Seq((3L, "c")).toDF("id", "v"))
    t.append(Seq((4L, "d")).toDF("id", "v"))
    assert(drainIds(dir, ckpt) == Seq(3L, 4L))

    // no new commits: a rerun moves nothing
    assert(drainIds(dir, ckpt) == Seq.empty)
  }

  test("compaction commits are invisible; an overwrite in range fails loudly") {
    val dir = tmpDir("txsrc-rw")
    val ckpt = tmpDir("txsrc-rw-ckpt")
    val t = new TxTable(spark, dir)
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.append(Seq((2L, "b")).toDF("id", "v"))
    assert(drainIds(dir, ckpt) == Seq(1L, 2L))

    // compaction rewrites existing rows into new files — an
    // incremental consumer must NOT see them again
    t.compact()
    assert(drainIds(dir, ckpt) == Seq.empty,
      "compaction must not be re-read as new data")

    // an overwrite breaks append-only: the stream must fail loudly
    // (the re-sync contract), never silently double-count
    t.overwrite(Seq((9L, "z")).toDF("id", "v"))
    val e = intercept[StreamingQueryException](drainIds(dir, ckpt))
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null)
      && causes(e).exists(c => Option(c.getMessage).exists(_.contains("re-sync"))),
      s"expected the append-only violation to surface, got: $e")
  }

  test("filters and projections push into the per-batch parquet scan") {
    val dir = tmpDir("txsrc-push")
    val ckpt = tmpDir("txsrc-push-ckpt")
    val t = new TxTable(spark, dir)
    t.append((1L to 100L).map(i => (i, s"v$i", i * 2.0)).toDF("id", "v", "x"))
    val q = spark.readStream.format("graft-txtable").option("path", dir).load()
      .where(col("id") > 90).select("id")
      .writeStream.format("memory").queryName("txsrc_push")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table("txsrc_push").as[Long].collect().sorted.toSeq
      == (91L to 100L))
    // the executed batch plan reads a real file relation (pushdown
    // applies); cheap structural check: last progress reports rows in,
    // and the query completed without a full-table collect
    assert(q.lastProgress.sources.nonEmpty)
  }

  test("maxVersionsPerTrigger caps each micro-batch at n commits (admission control)") {
    val dir = tmpDir("txsrc-rate")
    val ckpt = tmpDir("txsrc-rate-ckpt")
    val t = new TxTable(spark, dir)
    (1 to 6).foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("id", "v")))
    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("graft-txtable")
      .option("path", dir)
      .option("maxVersionsPerTrigger", "2")
      .load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes.add(batch.count()); ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val sizes = batchSizes.asScala.toSeq
    // 6 single-row commits at 2 versions per trigger: 3 batches of 2,
    // and AvailableNow still drains the whole backlog
    assert(sizes.sum == 6, sizes.toString)
    assert(sizes.forall(_ <= 2), s"a batch exceeded the version cap: $sizes")
    assert(sizes.size >= 3, sizes.toString)
  }

  test("readChangeFeed mode: the stream survives upstream merges and deletes") {
    val dir = tmpDir("txsrc-cdf")
    val ckpt = tmpDir("txsrc-cdf-ckpt")
    val t = new TxTable(spark, dir)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, String)]()
    def drain(): Unit = {
      val q = spark.readStream.format("graft-txtable")
        .option("path", dir)
        .option("readChangeFeed", "true")
        .load()
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("k", "v", TxTable.ChangeTypeCol).collect()
            .foreach(r => got.add((r.getLong(0), r.getString(1), r.getString(2))))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSet == Set((1L, "a", "insert"), (2L, "b", "insert")))
    got.clear()

    // an upstream MERGE would kill the file-level stream; the feed
    // stream keeps going with row-level semantics
    t.merge(Seq((2L, "B2"), (3L, "c")).toDF("k", "v"), Seq("k"))
    t.delete(col("k") === 1L)
    drain()
    assert(got.asScala.toSet == Set(
      (2L, "b", "update_preimage"), (2L, "B2", "update_postimage"),
      (3L, "c", "insert"), (1L, "a", "delete")))
  }

  test("format sink: append mode is exactly-once across restarts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("txsink-append")
    val ckpt = tmpDir("txsink-append-ckpt")
    val stream = MemoryStream[Long]
    def runOnce(): Unit = {
      val q = stream.toDF().toDF("id")
        .writeStream
        .format("graft-txtable")
        .option("path", dir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    stream.addData(1L, 2L)
    runOnce()
    runOnce() // restart, no new data: the (queryId, batchId) key dedupes
    stream.addData(3L)
    runOnce()
    val t = new TxTable(spark, dir)
    assert(t.read().select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("format sink: complete mode lands each emission as one atomic overwrite") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("txsink-complete")
    val ckpt = tmpDir("txsink-complete-ckpt")
    val stream = MemoryStream[Long]
    def runOnce(): Unit = {
      val q = stream.toDF().toDF("id")
        .groupBy(col("id") % 2 === 0).agg(count(lit(1)).as("n"))
        .toDF("even", "n")
        .writeStream
        .format("graft-txtable")
        .option("path", dir)
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    stream.addData(1L, 2L, 3L)
    runOnce()
    val t = new TxTable(spark, dir)
    assert(t.read().collect().map(r => (r.getBoolean(0), r.getLong(1))).toSet
      == Set((true, 1L), (false, 2L)))
    stream.addData(4L)
    runOnce()
    assert(t.read().collect().map(r => (r.getBoolean(0), r.getLong(1))).toSet
      == Set((true, 2L), (false, 2L)))
    // history preserved: the previous aggregate is one time travel away
    assert(t.version >= 1L)
  }

  test("batch read: spark.read.format with versionAsOf time travel") {
    val dir = tmpDir("txsrc-batch")
    val t = new TxTable(spark, dir)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v")) // v0
    t.append(Seq((3L, "c")).toDF("id", "v")) // v1
    t.merge(Seq((2L, "B2")).toDF("id", "v"), Seq("id")) // v2

    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").as[Long].collect().sorted.toSeq

    val head = spark.read.format("graft-txtable").option("path", dir).load()
    assert(ids(head) == Seq(1L, 2L, 3L))
    assert(head.where(col("v") === "B2").count() == 1)
    // time travel to before the merge and before the second append
    assert(ids(spark.read.format("graft-txtable").option("path", dir)
      .option("versionAsOf", "1").load()) == Seq(1L, 2L, 3L))
    val v1 = spark.read.format("graft-txtable").option("path", dir)
      .option("versionAsOf", "1").load()
    assert(v1.where(col("v") === "B2").count() == 0, "v1 predates the merge")
    assert(ids(spark.read.format("graft-txtable").option("path", dir)
      .option("versionAsOf", "0").load()) == Seq(1L, 2L))
    // pushdown: a filtered count over the relation plans a parquet scan
    // with the predicate pushed (smoke: executes and is correct)
    assert(head.where(col("id") > 2L).count() == 1)
  }

  test("batch read: timestampAsOf resolves the newest commit at or before the clock") {
    val dir = tmpDir("txsrc-tsasof")
    val t = new TxTable(spark, dir)
    val before = System.currentTimeMillis() - 5
    t.append(Seq((1L, "a")).toDF("id", "v")) // v0
    Thread.sleep(50) // separate the manifests' mtimes
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(50)
    t.append(Seq((2L, "b")).toDF("id", "v")) // v1

    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").as[Long].collect().sorted.toSeq
    // epoch-ms form pins to v0; ISO form to the same instant agrees
    assert(ids(spark.read.format("graft-txtable").option("path", dir)
      .option("timestampAsOf", betweenMs.toString).load()) == Seq(1L))
    assert(ids(spark.read.format("graft-txtable").option("path", dir)
      .option("timestampAsOf",
        java.time.Instant.ofEpochMilli(betweenMs).toString).load()) == Seq(1L))
    // now (or later) sees the head
    assert(ids(spark.read.format("graft-txtable").option("path", dir)
      .option("timestampAsOf",
        (System.currentTimeMillis() + 1000).toString).load()) == Seq(1L, 2L))
    // before the first commit: loud, not silently empty
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-txtable").option("path", dir)
        .option("timestampAsOf", before.toString).load()
    }
    assert(e.getMessage.contains("no commit"), e.getMessage)
    // both time-travel options at once is ambiguous: rejected
    intercept[IllegalArgumentException] {
      spark.read.format("graft-txtable").option("path", dir)
        .option("timestampAsOf", betweenMs.toString)
        .option("versionAsOf", "0").load()
    }
  }

  test("batch write: every DataFrameWriter save mode maps to its ACID verb") {
    val dir = tmpDir("txwrite")
    def w(rows: Seq[(Long, String)]) =
      rows.toDF("id", "v").write.format("graft-txtable").option("path", dir)
    val t = new TxTable(spark, dir)

    w(Seq((1L, "a"))).mode("errorifexists").save() // v0: table was empty
    assert(t.read().count() == 1)
    val e = intercept[Exception](w(Seq((9L, "x"))).mode("errorifexists").save())
    assert(e.getMessage.contains("already has commits"), e.getMessage)

    w(Seq((2L, "b"))).mode("append").save() // v1
    assert(t.version == 1L && t.read().count() == 2)

    w(Seq((9L, "x"))).mode("ignore").save() // non-empty table: no-op
    assert(t.version == 1L && t.read().count() == 2)

    w(Seq((7L, "z"))).mode("overwrite").save() // v2: atomic replace
    assert(t.version == 2L &&
      t.read().collect().map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((7L, "z")))
    // history intact through the writer surface
    assert(t.readAt(1L).count() == 2)
    // CHECK constraints bind the writer path too
    t.addConstraint("id_pos", "id > 0")
    intercept[IllegalArgumentException](w(Seq((-1L, "bad"))).mode("append").save())
    assert(t.read().count() == 1)
  }

  test("streaming from an empty table without a schema fails loudly") {
    val dir = tmpDir("txsrc-empty")
    val e = intercept[IllegalStateException] {
      spark.readStream.format("graft-txtable").option("path", dir).load()
    }
    assert(e.getMessage.contains("no commits"), e.getMessage)
  }

  test("startingVersion: a fresh stream begins mid-log, 'latest' sees only new commits") {
    val dir = tmpDir("txsrc-startv")
    val t = new TxTable(spark, dir)
    t.append(Seq((1L, "a")).toDF("id", "v")) // v0
    t.append(Seq((2L, "b")).toDF("id", "v")) // v1
    t.append(Seq((3L, "c")).toDF("id", "v")) // v2

    def drainFrom(sv: String, ckpt: String): Seq[Long] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val q = spark.readStream.format("graft-txtable")
        .option("path", dir).option("startingVersion", sv).load()
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
            .collect().foreach(got.add)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      got.asScala.toSeq.sorted
    }

    // numeric: commits from version 1 INCLUSIVE (the Delta semantics)
    assert(drainFrom("1", tmpDir("txsrc-startv-ckpt1")) == Seq(2L, 3L))
    // latest: nothing yet — the head is pinned at stream start...
    val latestCkpt = tmpDir("txsrc-startv-ckpt2")
    assert(drainFrom("latest", latestCkpt) == Seq.empty)
    // ...and only commits made AFTER it flow on the next run (the
    // checkpointed offset takes over from startingVersion)
    t.append(Seq((4L, "d")).toDF("id", "v")) // v3
    assert(drainFrom("latest", latestCkpt) == Seq(4L))
    // beyond the head: the stream waits (empty), never crashes, and
    // picks up the commit once the log reaches it
    val aheadCkpt = tmpDir("txsrc-startv-ckpt3")
    assert(drainFrom("5", aheadCkpt) == Seq.empty)
    t.append(Seq((5L, "e")).toDF("id", "v")) // v4
    t.append(Seq((6L, "f")).toDF("id", "v")) // v5
    assert(drainFrom("5", aheadCkpt) == Seq(6L))
    // a malformed value fails loudly at load time
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("graft-txtable")
        .option("path", dir).option("startingVersion", "nope").load()
    }
    assert(e.getMessage.contains("startingVersion"), e.getMessage)
  }

  test("batch writer: partitionBy clusters into value-pure files") {
    val dir = tmpDir("txwrite-part")
    (1L to 40L).map(i => (i, s"t${i % 2}")).toDF("id", "type")
      .write.format("graft-txtable").option("path", dir)
      .partitionBy("type").mode("append").save()
    val t = new TxTable(spark, dir)
    val s = t.state()
    assert(s.files.size == 2, s.files.toString)
    assert(t.prunedFiles(s, col("type") === "t0").size == 1)
    assert(t.scan(col("type") === "t0").count() == 20L)
    assert(t.read().count() == 40L)
  }

  test("format sink: partitionBy clusters each micro-batch into value-pure files") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("txsink-part")
    val ckpt = tmpDir("txsink-part-ckpt")
    val stream = MemoryStream[Long]
    stream.addData(1L to 40L: _*)
    val q = stream.toDF().toDF("id")
      .withColumn("type", concat(lit("t"), col("id") % 2))
      .writeStream
      .format("graft-txtable")
      .option("path", dir)
      .option("checkpointLocation", ckpt)
      .partitionBy("type")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val t = new TxTable(spark, dir)
    val s = t.state()
    assert(s.files.size == 2, s.files.toString)
    assert(t.prunedFiles(s, col("type") === "t1").size == 1)
    assert(t.scan(col("type") === "t1").count() == 20L)
  }
}
