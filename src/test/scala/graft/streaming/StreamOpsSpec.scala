package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

case class TsEvent(id: String, ts: Timestamp, v: Long)
case class TsDoc(doc_id: Long, ts: Timestamp, text: String)

class StreamOpsSpec extends SparkTestBase {

  private def t(s: String) = Timestamp.valueOf(s)

  test("upsertBatch merges by key with latest-version-wins, crash-safe layout") {
    import spark.implicits._
    val target = tmpDir("upsert")
    // batch 1: initial load (target does not exist yet)
    StreamOps.upsertBatch(spark,
      Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("k", "v", "ver"),
      target, "k", "ver")
    // batch 2: update k=2 (two in-batch versions; 30 must win), insert k=3
    StreamOps.upsertBatch(spark,
      Seq((2L, "b2", 20L), (2L, "b3", 30L), (3L, "c", 20L)).toDF("k", "v", "ver"),
      target, "k", "ver")
    val got = spark.read.parquet(target)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got == Map(1L -> ("a", 10L), 2L -> ("b3", 30L), 3L -> ("c", 20L)))
    assert(!new java.io.File(target + "._staging").exists())
    assert(!new java.io.File(target + "._backup").exists())
  }

  test("streaming fingerprint dedup drops token-identical docs within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[TsDoc]
    val out = StreamOps.dedupNearDupStream(stream.toDF(), "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("neardup")
      .outputMode(OutputMode.Append()).start()
    stream.addData(
      TsDoc(1L, t("2024-01-01 00:00:00"), "the quick brown fox"),
      TsDoc(2L, t("2024-01-01 00:00:05"), "the quick brown fox"), // exact dup
      TsDoc(3L, t("2024-01-01 00:00:06"), "  "),                  // token-less: filtered
      TsDoc(4L, t("2024-01-01 00:00:10"), "a different document entirely"))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("neardup").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 4L))
  }

  test("upsertBatch as a writeStream.foreachBatch sink merges across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val target = tmpDir("upsert-stream")
    val ckpt = tmpDir("upsert-stream-ckpt") // shared: batch 2 must be incremental
    val stream = MemoryStream[(Long, String, Long)]
    def runOnce(): Unit = {
      val q = stream.toDF().toDF("k", "v", "ver")
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
          StreamOps.upsertBatch(spark, b, target, "k", "ver"))
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    stream.addData((1L, "a", 1L), (2L, "b", 1L))
    runOnce()
    stream.addData((2L, "b2", 2L), (3L, "c", 1L))
    runOnce()
    val got = spark.read.parquet(target)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
  }

  test("upsertBatch equal-version ties resolve identically on replay (sink idempotence)") {
    import spark.implicits._
    def run(): Map[Long, String] = {
      val target = tmpDir("upsert-tie")
      StreamOps.upsertBatch(spark,
        Seq((1L, "x", 10L), (1L, "y", 10L), (1L, "z", 10L)).toDF("k", "v", "ver"),
        target, "k", "ver")
      spark.read.parquet(target).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    val a = run()
    assert(a.size == 1)
    assert(run() == a) // content-hash tie-break, not partition order
  }

  test("watermarked dedup removes in-horizon duplicates across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[TsEvent]
    val out = StreamOps.dedupWithinWatermark(stream.toDF(), "ts", "id", "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_wm")
      .outputMode(OutputMode.Append()).start()
    stream.addData(
      TsEvent("a", t("2024-01-01 00:00:00"), 1),
      TsEvent("a", t("2024-01-01 00:00:05"), 2), // dup within horizon
      TsEvent("b", t("2024-01-01 00:01:00"), 3))
    q.processAllAvailable()
    stream.addData(TsEvent("a", t("2024-01-01 00:02:00"), 4)) // still within horizon
    q.processAllAvailable()
    val n = spark.table("dedup_wm").count()
    q.stop()
    assert(n == 2) // one "a", one "b"
  }

  test("tumbling window counts with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[TsEvent]
    val out = StreamOps.windowedCounts(stream.toDF(), "ts", "5 minutes", "1 minute", Seq("id"))
    val q = out.writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Complete()).start()
    stream.addData(
      TsEvent("a", t("2024-01-01 00:00:10"), 1),
      TsEvent("a", t("2024-01-01 00:01:10"), 2),
      TsEvent("a", t("2024-01-01 00:06:10"), 3),
      TsEvent("b", t("2024-01-01 00:02:10"), 4))
    q.processAllAvailable()
    val rows = spark.table("win_counts")
      .select(col("window.start").cast("string"), col("id"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(rows.contains(("2024-01-01 00:00:00", "a", 2L)))
    assert(rows.contains(("2024-01-01 00:05:00", "a", 1L)))
    assert(rows.contains(("2024-01-01 00:00:00", "b", 1L)))
  }

  test("left-outer stream-stream join finalizes organic purchases on watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[TsEvent]
    val purchases = MemoryStream[TsEvent]
    val out = StreamOps.clickAttributionOuter(
      clicks.toDF().toDF("c_user_id", "click_time", "c_v"),
      purchases.toDF().toDF("p_user_id", "purchase_time", "p_v"),
      delay = "1 minute", horizon = "10 minutes")
    val q = out.writeStream.format("memory").queryName("attrib_outer")
      .outputMode(OutputMode.Append()).start()
    clicks.addData(TsEvent("7", t("2024-01-01 00:00:00"), 1))
    purchases.addData(
      TsEvent("7", t("2024-01-01 00:05:00"), 10),  // attributed
      TsEvent("9", t("2024-01-01 00:06:00"), 11))  // organic: no click
    q.processAllAvailable()
    // advance both watermarks far past the horizon so the engine can
    // PROVE no click for user 9 can still arrive
    clicks.addData(TsEvent("z", t("2024-01-01 01:00:00"), 99))
    purchases.addData(TsEvent("z2", t("2024-01-01 01:00:00"), 99))
    q.processAllAvailable()
    clicks.addData(TsEvent("z", t("2024-01-01 02:00:00"), 99))
    purchases.addData(TsEvent("z2", t("2024-01-01 02:00:00"), 99))
    q.processAllAvailable()
    val rows = spark.table("attrib_outer")
      .select(col("p_user_id"), col("c_v")).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    q.stop()
    assert(rows.contains(("7", 1L)), "attributed purchase joins its click")
    assert(rows.contains(("9", -1L)), "organic purchase emits with null click")
  }

  test("stream-stream interval join attributes purchases to in-horizon clicks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[TsEvent]
    val purchases = MemoryStream[TsEvent]
    val out = StreamOps.clickAttribution(
      clicks.toDF().toDF("c_user_id", "click_time", "c_v"),
      purchases.toDF().toDF("p_user_id", "purchase_time", "p_v"),
      delay = "1 minute", horizon = "10 minutes")
    val q = out.writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()
    clicks.addData(
      TsEvent("7", t("2024-01-01 00:00:00"), 1),  // within horizon
      TsEvent("7", t("2024-01-01 00:20:00"), 2),  // after the purchase
      TsEvent("8", t("2024-01-01 00:01:00"), 3))  // other user
    purchases.addData(TsEvent("7", t("2024-01-01 00:05:00"), 10))
    q.processAllAvailable()
    val rows = spark.table("attrib")
      .select(col("p_user_id"), col("c_v")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    q.stop()
    assert(rows == Set(("7", 1L)))
  }

  test("asofJoinStream matches each left to the latest in-horizon right, final on watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lefts = MemoryStream[(Long, Timestamp, Double)]
    val rights = MemoryStream[(Long, Timestamp, Double)]
    val out = StreamOps.asofJoinStream(
      lefts.toDF().toDF("key", "eventTime", "v"),
      rights.toDF().toDF("key", "eventTime", "rv"),
      horizonMs = 60000L, watermarkDelay = "10 seconds")
    val q = out.toDF().writeStream.format("memory").queryName("asof_stream")
      .outputMode(OutputMode.Append()).start()
    // right arrives AFTER the left that must match it — the watermark
    // hold is what makes this correct
    lefts.addData(
      (1L, t("2024-01-01 00:00:05"), 1.0),
      (1L, t("2024-01-01 00:00:12"), 2.0),
      (1L, t("2024-01-01 00:02:00"), 3.0)) // no right within 60 s -> None
    rights.addData(
      (1L, t("2024-01-01 00:00:00"), 10.0),
      (1L, t("2024-01-01 00:00:10"), 20.0))
    q.processAllAvailable()
    // the watermark after batch 1 (00:02:00 - 10 s) finalizes the
    // first two lefts in the follow-up batch processAllAvailable
    // drains; the 00:02:00 left is still held as pending
    assert(spark.table("asof_stream").count() == 2)
    // push the watermark past the third left (03:00 - 10 s): it
    // flushes via the event-time timeout path with NO match
    rights.addData((99L, t("2024-01-01 00:03:00"), 0.0))
    q.processAllAvailable()
    val rows = spark.table("asof_stream")
      .select(col("key"), col("ts").cast("string"), col("v"), col("rts").cast("string"), col("rv"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        Option(r.getString(3)), Option(r.get(4)).map(_.asInstanceOf[Double]))).toSet
    q.stop()
    assert(rows == Set(
      (1L, "2024-01-01 00:00:05", 1.0, Some("2024-01-01 00:00:00"), Some(10.0)),
      (1L, "2024-01-01 00:00:12", 2.0, Some("2024-01-01 00:00:10"), Some(20.0)),
      (1L, "2024-01-01 00:02:00", 3.0, None, None)), rows.toString)
  }

  test("sessionize merges events within the gap and closes idle sessions on watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamOps.SessionEvent]
    val out = StreamOps.sessionize(stream.toDS(), gapMs = 60000L)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Update()).start()
    stream.addData(
      StreamOps.SessionEvent(1L, t("2024-01-01 00:00:00")),
      StreamOps.SessionEvent(1L, t("2024-01-01 00:00:30")),
      StreamOps.SessionEvent(2L, t("2024-01-01 00:00:00")))
    q.processAllAvailable()
    val s1 = spark.table("sessions").where(col("userId") === 1)
      .orderBy(desc("sessionEnd")).first()
    assert(s1.getAs[Long]("nEvents") == 2)
    assert(!s1.getAs[Boolean]("closed"))

    // a much later event advances the watermark past user 1's
    // sessionEnd + gap -> event-time timeout closes the session
    stream.addData(StreamOps.SessionEvent(3L, t("2024-01-01 01:00:00")))
    q.processAllAvailable()
    stream.addData(StreamOps.SessionEvent(3L, t("2024-01-01 01:00:01")))
    q.processAllAvailable()
    val closed = spark.table("sessions")
      .where(col("userId") === 1 && col("closed")).count()
    q.stop()
    assert(closed == 1)
  }

  test("sessionize splits on intra-batch gaps and emits superseded sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamOps.SessionEvent]
    val out = StreamOps.sessionize(stream.toDS(), gapMs = 60000L)
    val q = out.writeStream.format("memory").queryName("sessions_split")
      .outputMode(OutputMode.Update()).start()
    // one batch, two sessions for user 5 separated by > gap
    stream.addData(
      StreamOps.SessionEvent(5L, t("2024-01-01 00:00:00")),
      StreamOps.SessionEvent(5L, t("2024-01-01 00:00:20")),
      StreamOps.SessionEvent(5L, t("2024-01-01 01:00:00")))
    q.processAllAvailable()
    val rows = spark.table("sessions_split").where(col("userId") === 5)
      .select("sessionStart", "nEvents", "closed").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getBoolean(2))).toSet
    assert(rows.contains(("2024-01-01 00:00:00.0", 2L, true)))  // intra-batch split, closed
    assert(rows.contains(("2024-01-01 01:00:00.0", 1L, false))) // still open

    // a later-than-gap event in a NEW batch must close+emit the open session
    stream.addData(StreamOps.SessionEvent(5L, t("2024-01-01 02:00:00")))
    q.processAllAvailable()
    val closedLater = spark.table("sessions_split")
      .where(col("userId") === 5 && col("closed") &&
        col("sessionStart") === t("2024-01-01 01:00:00")).count()
    q.stop()
    assert(closedLater == 1)
  }

  test("sessionize holds 1M+ keys in the RocksDB state store and evicts them at the watermark") {
    // round-3 advice: the bounded-state claims were only exercised on
    // toy state with the default in-memory provider. This runs the
    // richest state operator under the provider a production cluster
    // would use (RocksDB — state spills off-heap/to disk instead of
    // living on the executor heap) at >1M keys, and asserts the two
    // halves of the claim from the reported state-store metrics:
    // the store really holds the million sessions, and the event-time
    // timeout path really removes them once the watermark passes.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = MemoryStream[StreamOps.SessionEvent]
    val out = StreamOps.sessionize(stream.toDS(), gapMs = 60000L)
    val q = out.writeStream.format("noop")
      .option("checkpointLocation", tmpDir("rocksdb-load-ckpt"))
      .outputMode(OutputMode.Update()).start()
    try {
      val nKeys = 1050000
      val base = t("2024-01-01 00:00:00").getTime
      // one open session per key, spread over 30s so the load is not a
      // single degenerate timestamp
      stream.addData((0 until nKeys).map(k =>
        StreamOps.SessionEvent(k.toLong, new Timestamp(base + k % 30000))))
      q.processAllAvailable()

      def lastState = q.recentProgress.reverse
        .find(_.stateOperators.nonEmpty).get.stateOperators.head
      val loaded = lastState
      assert(loaded.numRowsTotal >= nKeys,
        s"expected >= $nKeys state rows, got ${loaded.numRowsTotal}")
      val metricKeys = loaded.customMetrics.keySet()
      assert(metricKeys.stream.anyMatch(_.startsWith("rocksdb")),
        s"expected RocksDB provider metrics, got $metricKeys")

      // two far-future events: the first advances the watermark past
      // every sessionEnd + gap, the next batch fires the event-time
      // timeouts — all 1M+ sessions close and their state is removed
      stream.addData(StreamOps.SessionEvent(-1L, t("2024-01-01 02:00:00")))
      q.processAllAvailable()
      stream.addData(StreamOps.SessionEvent(-1L, t("2024-01-01 02:00:01")))
      q.processAllAvailable()
      val after = lastState
      assert(after.numRowsTotal <= 1,
        s"watermark passed every session; expected <= 1 state row " +
          s"(the far-future key), got ${after.numRowsTotal}")
    } finally {
      q.stop()
      prev.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
    }
  }

  test("native session_window aggregate merges gap-adjacent events and closes on watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[TsEvent]
    val out = StreamOps.sessionWindowAgg(stream.toDF(), "ts",
      gap = "1 minute", delay = "10 seconds", keys = Seq("id"))
    val q = out.writeStream.format("memory").queryName("native_sessions")
      .outputMode(OutputMode.Append()).start()
    // user a: two events 30 s apart (one session); user b: one event
    stream.addData(
      TsEvent("a", t("2024-01-01 00:00:00"), 1),
      TsEvent("a", t("2024-01-01 00:00:30"), 2),
      TsEvent("b", t("2024-01-01 00:00:00"), 3))
    q.processAllAvailable()
    // far-future event pushes the watermark past every session end +
    // gap; Append emits the closed sessions
    stream.addData(TsEvent("z", t("2024-01-01 01:00:00"), 4))
    q.processAllAvailable()
    stream.addData(TsEvent("z", t("2024-01-01 01:00:01"), 5))
    q.processAllAvailable()
    val rows = spark.table("native_sessions")
      .select(col("id"), col("session_start").cast("string"),
        col("session_end").cast("string"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    q.stop()
    // session end = last event + gap (the builtin's definition)
    assert(rows.contains(("a", "2024-01-01 00:00:00", "2024-01-01 00:01:30", 2L)), rows.toString)
    assert(rows.contains(("b", "2024-01-01 00:00:00", "2024-01-01 00:01:00", 1L)), rows.toString)
  }

  test("transformWithState running counts carry across batches and respect TTL-less state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // provider: transformWithState requires RocksDB. Changelog
    // checkpointing + no per-file checksums: the defaults (full
    // RocksDB snapshot per commit through the checksum file manager)
    // cost ~minutes per micro-batch on a local FS — the production
    // deployment enables changelog checkpointing anyway
    val overrides = Seq(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true",
      "spark.sql.streaming.checkpoint.fileChecksum.enabled" -> "false")
    val prev = overrides.map { case (k, _) => k -> spark.conf.getOption(k) }
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    val stream = MemoryStream[StreamOps.SeenEvent]
    val out = StreamOps.runningCounts(stream.toDS())
    val q = out.toDF().writeStream.format("memory").queryName("running_counts")
      .option("checkpointLocation", tmpDir("tws-ckpt"))
      .outputMode(OutputMode.Update()).start()
    try {
      stream.addData(
        StreamOps.SeenEvent(1L, t("2024-01-01 00:00:10")),
        StreamOps.SeenEvent(1L, t("2024-01-01 00:00:05")),
        StreamOps.SeenEvent(2L, t("2024-01-01 00:00:20")))
      q.processAllAvailable()
      stream.addData(StreamOps.SeenEvent(1L, t("2024-01-01 00:01:00")))
      q.processAllAvailable()
      // memory sink appends per batch in order; last row per user is
      // the running total
      def latest(u: Long) = spark.table("running_counts")
        .where(col("userId") === u).collect().last
      val u1 = latest(1L)
      assert(u1.getAs[Long]("n") == 3L)
      // firstSeen kept the earliest event time across both batches
      assert(u1.getAs[Long]("firstSeenMs") ==
        t("2024-01-01 00:00:05").getTime)
      assert(latest(2L).getAs[Long]("n") == 1L)
    } finally {
      q.stop()
      prev.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(old => spark.conf.set(k, old))
      }
    }
  }

  test("hostCapStream admits at most cap docs per host across batches and a restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val overrides = Seq(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true",
      "spark.sql.streaming.checkpoint.fileChecksum.enabled" -> "false")
    val prev = overrides.map { case (k, _) => k -> spark.conf.getOption(k) }
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    val ckpt = tmpDir("hostcap-ckpt")
    val outDir = tmpDir("hostcap-out")
    val stream = MemoryStream[StreamOps.CapDoc]
    // foreachBatch parquet append: the memory sink cannot recover
    // from a checkpoint, and the restart IS the point of this test
    def run(): Unit = {
      val q = StreamOps.hostCapStream(stream.toDS(), cap = 3)
        .toDF().writeStream
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(outDir); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    try {
      // wave 1: host a gets 2 (under cap), b gets 4 in one batch — the
      // smallest 3 ids win the within-batch election
      stream.addData(
        StreamOps.CapDoc("a", 10L), StreamOps.CapDoc("a", 11L),
        StreamOps.CapDoc("b", 20L), StreamOps.CapDoc("b", 23L),
        StreamOps.CapDoc("b", 21L), StreamOps.CapDoc("b", 22L))
      run()
      // wave 2 ACROSS A RESTART: a gets 3 more — only 1 admitted (the
      // smallest of the batch; earlier batches already hold 2); b is
      // full and admits nothing
      stream.addData(
        StreamOps.CapDoc("a", 5L), StreamOps.CapDoc("a", 6L),
        StreamOps.CapDoc("a", 7L), StreamOps.CapDoc("b", 19L))
      run()
      val got = spark.read.parquet(outDir).collect()
        .map(r => (r.getAs[String]("host"), r.getAs[Long]("docId"))).toSet
      assert(got == Set(("a", 10L), ("a", 11L), ("b", 20L), ("b", 21L),
        ("b", 22L), ("a", 5L)),
        s"cap election wrong: $got")
      // the boundary semantics are deliberate: FIRST-BATCH wins (b
      // admitted 20,21,22 — 19 arrived a batch too late), where the
      // batch operator's global election would keep 19,20,21 — the
      // standard live-vs-backfill split. The cap law itself is exact:
      val perHost = got.groupBy(_._1).view.mapValues(_.size).toMap
      assert(perHost == Map("a" -> 3, "b" -> 3), s"per-host counts: $perHost")
    } finally {
      prev.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(old => spark.conf.set(k, old))
      }
    }
  }

  test("funnelStages advances the per-user view->click->purchase machine across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamOps.FunnelEvent]
    val out = StreamOps.funnelStages(stream.toDS())
    val q = out.writeStream.format("memory").queryName("funnel")
      .outputMode(OutputMode.Update()).start()

    // memory sink appends one row per (user, batch) in batch order —
    // the last collected row is the user's current stage
    def latest(userId: Long) = spark.table("funnel")
      .where(col("userId") === userId).collect().lastOption

    // batch 1: user 1 views then clicks; user 2 clicks with NO view
    // (must not advance); user 3's click at the SAME instant as its
    // view must not count (strict ordering)
    stream.addData(
      StreamOps.FunnelEvent(1L, t("2024-01-01 00:00:10"), "view"),
      StreamOps.FunnelEvent(1L, t("2024-01-01 00:00:20"), "click"),
      StreamOps.FunnelEvent(2L, t("2024-01-01 00:00:05"), "click"),
      StreamOps.FunnelEvent(3L, t("2024-01-01 00:00:10"), "view"),
      StreamOps.FunnelEvent(3L, t("2024-01-01 00:00:10"), "click"))
    q.processAllAvailable()
    val u1 = latest(1L).get
    assert(u1.getAs[Boolean]("reachedView") && u1.getAs[Boolean]("reachedClick"))
    assert(!u1.getAs[Boolean]("reachedPurchase"))
    val u2 = latest(2L).get
    assert(!u2.getAs[Boolean]("reachedView") && !u2.getAs[Boolean]("reachedClick"))
    val u3 = latest(3L).get
    assert(u3.getAs[Boolean]("reachedView") && !u3.getAs[Boolean]("reachedClick"))

    // batch 2: user 1 purchases (full funnel, state carried across
    // batches); user 2 now views — its old click must stay spent
    stream.addData(
      StreamOps.FunnelEvent(1L, t("2024-01-01 00:00:30"), "purchase"),
      StreamOps.FunnelEvent(2L, t("2024-01-01 00:00:40"), "view"))
    q.processAllAvailable()
    val u1b = latest(1L).get
    assert(u1b.getAs[Boolean]("reachedPurchase"))
    val u2b = latest(2L).get
    q.stop()
    assert(u2b.getAs[Boolean]("reachedView") && !u2b.getAs[Boolean]("reachedClick"))
  }
}
