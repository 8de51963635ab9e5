package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming operators beyond the reference's surface (the reference
  * uses no watermarks, no windows, no custom state — SURVEY.md
  * §2.8 ST4/ST5): the production-correct variants the 100 TB design
  * needs, all on public Structured Streaming APIs.
  */
object StreamOps {

  /** Bounded-state streaming dedup: watermark + eventId-first-wins
    * within the watermark horizon — the production fix for silver's
    * unbounded dropDuplicates state (hazard SURVEY.md §7.5.3).
    */
  def dedupWithinWatermark(events: DataFrame, eventTimeCol: String, idCol: String,
                           delay: String): DataFrame =
    events
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(idCol)

  /** Tumbling-window streaming aggregate — the sound version of
    * gold's "daily" static predicate (ST5): per (window, keys) counts
    * that late data within the watermark still updates.
    */
  def windowedCounts(events: DataFrame, eventTimeCol: String, windowLen: String,
                     delay: String, keys: Seq[String]): DataFrame =
    events
      .withWatermark(eventTimeCol, delay)
      .groupBy(window(col(eventTimeCol), windowLen) +: keys.map(col): _*)
      .agg(count(lit(1)).as("n"))

  /** Stream-stream interval join: each purchase joined to the same
    * user's clicks within `horizon` before it. Both sides carry
    * watermarks so the join state is bounded (Spark retains each side
    * only up to watermark + interval — the production-safe form).
    */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame, delay: String,
                       horizon: String): DataFrame = {
    val c = clicks.withWatermark("click_time", delay)
    val p = purchases.withWatermark("purchase_time", delay)
    p.join(c,
      expr(s"""
        |p_user_id = c_user_id AND
        |purchase_time >= click_time AND
        |purchase_time <= click_time + INTERVAL $horizon
      """.stripMargin))
  }

  /** LEFT OUTER stream-stream join: every purchase emits — attributed
    * to an in-horizon click when one exists, with null click columns
    * once the watermark PROVES none can still arrive (the engine holds
    * the unmatched row in state until click_time's watermark passes
    * the interval bound, then finalizes it — the "organic vs
    * attributed conversion" split a marketing pipeline needs, which
    * the inner form silently drops).
    */
  def clickAttributionOuter(clicks: DataFrame, purchases: DataFrame, delay: String,
                            horizon: String): DataFrame = {
    val c = clicks.withWatermark("click_time", delay)
    val p = purchases.withWatermark("purchase_time", delay)
    p.join(c,
      expr(s"""
        |p_user_id = c_user_id AND
        |purchase_time >= click_time AND
        |purchase_time <= click_time + INTERVAL $horizon
      """.stripMargin),
      "leftOuter")
  }

  case class SessionEvent(userId: Long, eventTime: Timestamp)
  case class SessionState(start: Long, end: Long, n: Long)
  case class SessionOut(userId: Long, sessionStart: Timestamp, sessionEnd: Timestamp,
                        nEvents: Long, closed: Boolean)

  /** Session windows via flatMapGroupsWithState (the custom-state
    * axis): events within `gapMs` of each other merge into one
    * session. Gaps INSIDE a batch split sessions (essential under
    * AvailableNow, where a backfill arrives in few large batches),
    * and every closed session is emitted — whether closed by a
    * later-than-gap event in the same key or by the event-time
    * timeout (watermark-driven — deterministic, unlike
    * processing-time timeouts) once the watermark passes
    * sessionEnd + gap.
    */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long,
                 watermarkDelay: String = "10 seconds"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF()
      .withWatermark("eventTime", watermarkDelay)
      .as[SessionEvent]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, new Timestamp(s.start), new Timestamp(s.end),
              s.n, closed = true))
          } else {
            val times = rows.map(_.eventTime.getTime).toSeq.sorted
            if (times.isEmpty) Iterator.empty
            else {
              // fold times into sessions, starting from carried state
              var open = state.getOption
              val closed = scala.collection.mutable.ArrayBuffer.empty[SessionState]
              times.foreach { t =>
                open match {
                  case Some(s) if t - s.end <= gapMs =>
                    open = Some(SessionState(s.start, math.max(s.end, t), s.n + 1))
                  case Some(s) =>
                    closed += s
                    open = Some(SessionState(t, t, 1L))
                  case None =>
                    open = Some(SessionState(t, t, 1L))
                }
              }
              val last = open.get
              state.update(last)
              state.setTimeoutTimestamp(last.end + gapMs)
              closed.iterator.map(s =>
                SessionOut(userId, new Timestamp(s.start), new Timestamp(s.end), s.n,
                  closed = true)) ++
                Iterator(SessionOut(userId, new Timestamp(last.start),
                  new Timestamp(last.end), last.n, closed = false))
            }
          }
      }
  }

  /** Session windows via the NATIVE `session_window` builtin — the
    * declarative twin of the custom-state [[sessionize]]: Spark's
    * streaming session aggregation merges gap-adjacent windows in the
    * state store and emits each session once the watermark closes it
    * (Append mode). Prefer THIS form whenever the per-session payload
    * is an aggregate the builtin can express — it gets state
    * merge/eviction, RocksDB layout and AQE-sized shuffles for free —
    * and reach for flatMapGroupsWithState only when the session logic
    * needs arbitrary state (the [[sessionize]] variant exists to show
    * that axis, and emits open sessions too, which Append-mode
    * session_window cannot).
    */
  def sessionWindowAgg(events: DataFrame, eventTimeCol: String, gap: String,
                       delay: String, keys: Seq[String]): DataFrame =
    events
      .withWatermark(eventTimeCol, delay)
      .groupBy(session_window(col(eventTimeCol), gap) +: keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"))
      .select(keys.map(col) ++ Seq(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events")): _*)

  case class SeenEvent(userId: Long, eventTime: Timestamp)
  case class SeenOut(userId: Long, n: Long, firstSeenMs: Long)

  /** Per-user lifetime event counter on `transformWithState` — the
    * Spark 4 arbitrary-state API (SPARK-45939, successor of
    * mapGroupsWithState): typed `ValueState` handles with native TTL
    * instead of a single monolithic state object and hand-rolled
    * timeouts. The processor keeps (count, firstSeen) as two
    * independently-evolvable states and emits the running total each
    * batch (Update mode; sink keeps the latest row per user). State
    * TTL (`ttl`) retires idle users inside the state store — at
    * 100 TB the TTL is the knob that keeps an unbounded user universe
    * from accreting unbounded state, with no timer bookkeeping in
    * user code. Requires the RocksDB state store provider.
    */
  class RunningCountProcessor(ttl: java.time.Duration)
    extends StatefulProcessor[Long, SeenEvent, SeenOut] {
    @transient private var count: ValueState[Long] = _
    @transient private var firstSeen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val cfg = if (ttl == null) TTLConfig.NONE else TTLConfig(ttl)
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, cfg)
      firstSeen = getHandle.getValueState[Long]("firstSeen", Encoders.scalaLong, cfg)
    }

    override def handleInputRows(key: Long, rows: Iterator[SeenEvent],
                                 timerValues: TimerValues): Iterator[SeenOut] = {
      var n = if (count.exists()) count.get() else 0L
      var first = if (firstSeen.exists()) firstSeen.get() else Long.MaxValue
      rows.foreach { e =>
        n += 1
        first = math.min(first, e.eventTime.getTime)
      }
      count.update(n)
      firstSeen.update(first)
      Iterator(SeenOut(key, n, first))
    }
  }

  /** [[RunningCountProcessor]] wired to a stream (Update mode; the
    * count is arrival-order by construction, so event-time finality
    * buys nothing here). TimeMode is `None` unless a TTL is set:
    * state TTL needs the processing-time clock, but a clocked time
    * mode makes MicroBatchExecution schedule CONTINUOUS empty batches
    * to advance timers — pure overhead (and an unbounded busy loop
    * under the default 0-interval trigger) for a processor that
    * registers none.
    */
  def runningCounts(events: Dataset[SeenEvent],
                    ttl: java.time.Duration = null): Dataset[SeenOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val mode = if (ttl == null) TimeMode.None() else TimeMode.ProcessingTime()
    events
      .groupByKey(_.userId)
      .transformWithState(new RunningCountProcessor(ttl), mode, OutputMode.Update())
  }

  case class CapDoc(host: String, docId: Long, payload: String = "")

  /** STREAMING PER-HOST CAP — the live twin of the batch
    * [[graft.ext.UrlOps.qHostCap]] (FineWeb-style URL-level balance):
    * admit at most `cap` documents per canonical host ACROSS
    * micro-batches — first batches win; within a batch the smallest
    * doc ids win (deterministic election, matching the batch
    * operator when arrival follows doc_id order). State is ONE
    * counter per host (`ValueState[Long]` on `transformWithState` —
    * fixed-size, RocksDB-backed), so a crawl feed's host universe
    * costs 8 bytes of state per host, and the engine's per-batch
    * state versioning makes replays exactly repeatable. Append mode:
    * admitted docs emit once, capped hosts simply stop emitting.
    */
  class HostCapProcessor(cap: Int)
    extends StatefulProcessor[String, CapDoc, CapDoc] {
    @transient private var admitted: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      admitted = getHandle.getValueState[Long]("admitted",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[CapDoc],
                                 timerValues: TimerValues): Iterator[CapDoc] = {
      val n = if (admitted.exists()) admitted.get() else 0L
      val room = math.max(0L, cap - n).toInt
      // bound the in-memory sort to the admissible prefix + overflow
      // detection: a hot host's batch rows beyond `room` only need
      // counting, not keeping — but the ELECTION needs the smallest
      // ids, so sort the batch's rows for this key (one host's rows
      // in one batch: bounded by the micro-batch, not the corpus)
      val sorted = rows.toArray.sortBy(_.docId)
      val admit = sorted.take(room)
      admitted.update(n + admit.length)
      admit.iterator
    }
  }

  /** [[HostCapProcessor]] wired to a stream of (host, docId) rows. */
  def hostCapStream(docs: Dataset[CapDoc], cap: Int): Dataset[CapDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .groupByKey(_.host)
      .transformWithState(new HostCapProcessor(cap), TimeMode.None(),
        OutputMode.Append())
  }

  case class FunnelEvent(userId: Long, eventTime: Timestamp, eventType: String)
  case class FunnelState(firstView: Long, firstClick: Long, firstPurchase: Long)
  case class FunnelOut(userId: Long, reachedView: Boolean, reachedClick: Boolean,
                       reachedPurchase: Boolean)

  /** Streaming conversion funnel — the live counterpart of the batch
    * [[graft.ext.EventQueries.qFunnel]]: a per-user state machine
    * (view → click-after-view → purchase-after-click) advanced by
    * mapGroupsWithState, emitting the user's current funnel stage
    * every batch (Update mode; sink keeps the latest row per user).
    * Events are replayed in event-time order WITHIN a batch; ACROSS
    * batches the machine sees arrival order, so a view arriving after
    * its click (late data beyond batch boundaries) does not
    * retroactively unlock the click stage — the deterministic batch
    * query is the backfill/repair path, the stream is the live
    * counter (the standard lambda split). State is one fixed-size
    * record per user; production adds an event-time timeout to retire
    * inactive users ([[sessionize]] shows the mechanism).
    */
  def funnelStages(events: Dataset[FunnelEvent],
                   watermarkDelay: String = "10 seconds"): Dataset[FunnelOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val Unset = -1L
    events.toDF()
      .withWatermark("eventTime", watermarkDelay)
      .as[FunnelEvent]
      .groupByKey(_.userId)
      .mapGroupsWithState[FunnelState, FunnelOut](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(Unset, Unset, Unset))
          rows.toSeq.sortBy(e => (e.eventTime.getTime, e.eventType)).foreach { e =>
            val t = e.eventTime.getTime
            e.eventType match {
              case "view" if s.firstView == Unset =>
                s = s.copy(firstView = t)
              case "click" if s.firstClick == Unset &&
                s.firstView != Unset && t > s.firstView =>
                s = s.copy(firstClick = t)
              case "purchase" if s.firstPurchase == Unset &&
                s.firstClick != Unset && t > s.firstClick =>
                s = s.copy(firstPurchase = t)
              case _ =>
            }
          }
          state.update(s)
          FunnelOut(userId, s.firstView != Unset, s.firstClick != Unset,
            s.firstPurchase != Unset)
      }
  }

  case class AsofEvent(key: Long, eventTime: Timestamp, isLeft: Boolean, v: Double)
  case class AsofBuf(lefts: Seq[(Long, Double)], rights: Seq[(Long, Double)])
  case class AsofMatch(key: Long, ts: Timestamp, v: Double,
                       rts: Option[Timestamp], rv: Option[Double])

  /** Streaming AS-OF join — the live counterpart of the batch
    * [[graft.ext.AsofJoin]]: each left row joins the LATEST right row
    * of its key with `rts <= ts` and `ts - rts <= horizonMs`
    * (carry-forward with bounded staleness; no match within the
    * horizon emits None, never a stale value).
    *
    * Correctness under micro-batch disorder: a left row is emitted
    * only once the WATERMARK has passed its event time — by the
    * watermark contract every right row that could precede it has
    * arrived, so the answer is final (Append output, no retractions).
    * Both sides ride one union-tagged stream into a per-key
    * `flatMapGroupsWithState` (the same union-and-carry-forward idea
    * as the batch operator, with GroupState as the frontier): state
    * holds the not-yet-ripe lefts plus only the rights still inside
    * some future left's horizon — rights older than
    * `watermark - horizonMs` can never match again and
    * are pruned every invocation, so state is bounded by the horizon
    * × arrival rate per key, not the stream length. An event-time
    * timeout flushes ripe lefts (and eventually removes idle keys)
    * even when the key receives no further input.
    */
  def asofJoinStream(left: DataFrame, right: DataFrame, horizonMs: Long,
                     watermarkDelay: String = "10 seconds"): Dataset[AsofMatch] = {
    val spark = left.sparkSession
    import spark.implicits._
    val tagged = left.select(col("key"), col("eventTime"), lit(true).as("isLeft"),
        col("v").cast("double").as("v"))
      .unionByName(right.select(col("key"), col("eventTime"), lit(false).as("isLeft"),
        col("rv").cast("double").as("v")))
      .withWatermark("eventTime", watermarkDelay)
      .as[AsofEvent]
    tagged.groupByKey(_.key)
      .flatMapGroupsWithState[AsofBuf, AsofMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[AsofEvent], state: GroupState[AsofBuf]) =>
          val wm = state.getCurrentWatermarkMs()
          val prev = state.getOption.getOrElse(AsofBuf(Nil, Nil))
          var lefts = prev.lefts
          var rights = prev.rights
          rows.foreach { e =>
            if (e.isLeft) lefts +:= ((e.eventTime.getTime, e.v))
            else rights +:= ((e.eventTime.getTime, e.v))
          }
          // STRICTLY below the watermark: Spark's late filter drops
          // only eventTime < watermark, so a right with rts == wm can
          // still arrive in a later batch — a left at ts == wm is not
          // final yet (it flushes once the watermark passes it)
          val (ripe, pending) = lefts.partition(_._1 < wm)
          // deterministic emission order within the batch
          val out = ripe.sortBy(identity).map { case (ts, v) =>
            val candidates = rights.filter(r => r._1 <= ts && ts - r._1 <= horizonMs)
            val best = if (candidates.isEmpty) None else Some(candidates.maxBy(identity))
            AsofMatch(key, new Timestamp(ts), v,
              best.map(b => new Timestamp(b._1)), best.map(_._2))
          }
          // every future left — pending or later-arriving — has
          // ts >= wm (rows below the watermark are dropped by the
          // late filter), so rights below wm - horizon never match again
          val keptRights = rights.filter(_._1 >= wm - horizonMs)
          if (pending.isEmpty && keptRights.isEmpty) state.remove()
          else {
            state.update(AsofBuf(pending, keptRights))
            val flushAt =
              if (pending.nonEmpty) pending.map(_._1).min
              else keptRights.map(_._1).max + horizonMs
            state.setTimeoutTimestamp(math.max(flushAt, wm + 1))
          }
          out.iterator
      }
  }

  /** Streaming fingerprint-level dedup of a document stream: map-side
    * SimHash ([[graft.ext.MinHashDedup.simhashCol]] — zero extra
    * shuffles) + watermarked one-per-fingerprint dedup. Catches exact
    * and token-multiset-identical duplicates in flight with bounded
    * state; true NEAR-dup pairs (hamming ≤ k) need the banded batch
    * path (`qSimhashPairs`) — banding is a self-join, which streaming
    * state cannot express cheaply, so the stream filter removes the
    * exact-fingerprint mass and the periodic batch job sweeps the
    * rest (the standard split at 100 TB).
    *
    * Semantics: exactly ONE doc per fingerprint per watermark horizon
    * survives; WHICH doc is batch-internal arrival order, so a
    * micro-batch replay may emit a different representative — key
    * downstream sinks on the fingerprint, not the doc id, if replay
    * identity matters. The watermark is set BEFORE the token filter:
    * token-less docs still advance event time, otherwise a run of
    * blank documents would stall state eviction.
    */
  def dedupNearDupStream(docs: DataFrame, eventTimeCol: String, delay: String,
                         textCol: String = "text"): DataFrame =
    docs
      .withWatermark(eventTimeCol, delay)
      .withColumn("toks", graft.ext.TextAnalysis.tokens(col(textCol)))
      .where(size(col("toks")) > 0)
      .withColumn("simhash", graft.ext.MinHashDedup.simhashCol(col("toks")))
      .drop("toks")
      .dropDuplicatesWithinWatermark("simhash")

  /** SCD1 upsert into a parquet target from inside foreachBatch — the
    * MERGE emulation an append-only-format medallion needs for
    * mutable dims. Latest-per-key within the batch by `versionCol`
    * descending; EQUAL versions tie-break on a content hash of the
    * full row, so a foreachBatch retry of the same data always picks
    * the same winner (sink idempotence) — batch/partition order never
    * decides. Survivor rows anti-join in, and the rewrite goes through
    * [[graft.core.Layout.replaceDir]]'s backup-swap, so no crash +
    * retry interleaving can lose the target. At scale the full
    * rewrite is the known cost of upserts on immutable files —
    * partition the target and restrict the rewrite to touched
    * partitions, or move to a table format with a transaction log.
    */
  def upsertBatch(spark: SparkSession, batch: DataFrame, targetPath: String,
                  keyCol: String, versionCol: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    if (batch.isEmpty) return // nothing to merge: skip the full rewrite
    val contentHash = xxhash64(batch.columns.map(col).toIndexedSeq: _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(versionCol).desc, contentHash.asc)
    // NULL keys cannot be merged (the anti-join's null-unsafe equality
    // would append a fresh copy every batch) — FAIL the batch on the
    // first one rather than filter it out: a silent drop would commit
    // the checkpoint with the record lost forever, violating the same
    // at-least-once principle RawIngest.demux upholds. raise_error
    // rides the existing scan, no extra pass. Upstream owns keying
    // its records (or dead-lettering the unkeyed ones before here).
    val keyChecked = batch.withColumn(keyCol,
      when(col(keyCol).isNull, raise_error(lit(
        s"upsertBatch: null $keyCol in micro-batch — key or dead-letter " +
          "records upstream; refusing to silently drop")))
        .otherwise(col(keyCol)))
    val latest = keyChecked
      .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
    graft.core.Layout.recoverDir(spark, targetPath) // heal interrupted swaps
    val tp = new org.apache.hadoop.fs.Path(targetPath)
    val fs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // an empty pre-created directory is an initial load too
    val hasData = fs.exists(tp) && fs.listStatus(tp).nonEmpty
    val merged =
      if (!hasData) latest
      else spark.read.parquet(targetPath)
        .join(latest.select(col(keyCol)), Seq(keyCol), "left_anti")
        .unionByName(latest)
    graft.core.Layout.replaceDir(spark, targetPath) { staging =>
      merged.write.mode("overwrite").parquet(staging)
    }
  }
}
