package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkTestBase

/** [[IvmAgg]]: a keyed COUNT/SUM view maintained purely from the
  * change feed must equal the full recompute after ANY op sequence,
  * each advance must be replay-safe (atomic cursor), and net-no-op
  * ranges must still move the cursor.
  */
class IvmAggSpec extends SparkTestBase {

  import spark.implicits._

  private def freshPair(tag: String): (TxTable, TxTable) =
    (new TxTable(spark, tmpDir(s"ivm-src-$tag")),
      new TxTable(spark, tmpDir(s"ivm-view-$tag")))

  /** The O(table) recompute the view must always equal. */
  private def recompute(src: TxTable): DataFrame =
    src.read().groupBy($"grp")
      .agg(count(lit(1)).as("n_rows"),
        sum($"v".cast(DecimalType(28, 6))).as("sum_v"))

  private def assertInSync(src: TxTable, view: TxTable): Unit = {
    val want = recompute(src).collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.getDecimal(2)).map(_.doubleValue())))
      .toSet
    // surfaced read: exact SQL semantics (NULL when no non-null value)
    val got = IvmAgg.readView(view, Seq("v"))
      .select($"grp", $"n_rows", $"sum_v").collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.getDecimal(2)).map(_.doubleValue())))
      .toSet
    assert(got == want, s"view diverged from recompute:\n got=$got\nwant=$want")
  }

  test("append/update/delete histories fold to the exact recompute") {
    val (src, view) = freshPair("basic")
    src.append(Seq((1L, "a", 10.0), (2L, "a", 5.0), (3L, "b", 7.0))
      .toDF("id", "grp", "v"))
    IvmAgg.advance(src, view, Seq("grp"), Seq("v"))
    assertInSync(src, view)

    // update moves value mass between rows of a group
    src.update(col("id") === 1L, Map("v" -> (col("v") + lit(90.0))))
    // delete drops b entirely — its view row must vanish
    src.delete(col("grp") === "b")
    src.append(Seq((4L, "c", 1.5), (5L, "c", 2.5)).toDF("id", "grp", "v"))
    IvmAgg.advance(src, view, Seq("grp"), Seq("v"))
    assertInSync(src, view)
    assert(view.read().where($"grp" === "b").count() == 0L,
      "a group with zero live rows must leave the view")
  }

  test("advance is idempotent and the cursor rides the same commit") {
    val (src, view) = freshPair("replay")
    src.append(Seq((1L, "a", 2.0)).toDF("id", "grp", "v"))
    val to = IvmAgg.advance(src, view, Seq("grp"), Seq("v"))
    val vAfter = view.version
    // replay of the SAME advance (crash between commit and ack): no-op
    assert(IvmAgg.advance(src, view, Seq("grp"), Seq("v")) == to)
    assert(view.version == vAfter, "replayed advance must not commit")
    assertInSync(src, view)
    assert(view.state().txns("ivm") == src.version,
      "cursor must reflect the folded source version")
  }

  test("a rows-unchanged range still advances the cursor (no re-reads)") {
    val (src, view) = freshPair("noop")
    src.append(Seq((1L, "a", 2.0), (2L, "a", 3.0)).toDF("id", "grp", "v"))
    IvmAgg.advance(src, view, Seq("grp"), Seq("v"))
    val viewV = view.version
    src.compact() // rewrite-marker commit: feed yields no rows
    IvmAgg.advance(src, view, Seq("grp"), Seq("v"))
    assert(view.state().txns("ivm") == src.version,
      "cursor must cover the compaction version")
    assert(view.version == viewV + 1, "cursor-only commit expected")
    assertInSync(src, view)
    // and replaying the cursor-only range is also a no-op
    IvmAgg.advance(src, view, Seq("grp"), Seq("v"))
    assert(view.version == viewV + 1)
  }

  test("append-only MAX folds via greatest; a retracting range is rejected") {
    val (src, view) = freshPair("max")
    src.append(Seq((1L, "a", 10.0), (2L, "a", 5.0), (3L, "b", 7.0))
      .toDF("id", "grp", "v"))
    IvmAgg.advance(src, view, Seq("grp"), Seq("v"), maxs = Seq("v"))
    src.append(Seq((4L, "a", 3.0), (5L, "b", 99.0)).toDF("id", "grp", "v"))
    IvmAgg.advance(src, view, Seq("grp"), Seq("v"), maxs = Seq("v"))
    val got = view.read().select($"grp", $"max_v").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got == Map("a" -> 10.0, "b" -> 99.0),
      s"max must survive a smaller later append: $got")
    // a delete in the unfolded range must be rejected loudly, and the
    // failed advance must not move the cursor or the view
    src.delete(col("id") === 5L)
    val cur = view.state().txns("ivm")
    val e = intercept[IllegalStateException](
      IvmAgg.advance(src, view, Seq("grp"), Seq("v"), maxs = Seq("v")))
    assert(e.getMessage.contains("retract"))
    assert(view.state().txns("ivm") == cur)
    // a COUNT/SUM-only view has no trouble with the same history
    val view2 = new TxTable(spark, tmpDir("ivm-view-max2"))
    IvmAgg.advance(src, view2, Seq("grp"), Seq("v"))
    assertInSync(src, view2)
  }

  test("NULL measure values never poison the sum: fold matches SQL SUM exactly") {
    val (src, view) = freshPair("nulls")
    // a fresh group first seen with ONLY null values: SQL SUM = NULL
    src.append(Seq((1L, "a", Some(10.0)), (2L, "b", None), (3L, "b", None))
      .toDF("id", "grp", "v"))
    IvmAgg.advance(src, view, Seq("grp"), Seq("v"))
    def surfaced: Map[String, (Long, Option[Double], Option[Double])] =
      IvmAgg.readView(view, Seq("v"))
        .select($"grp", $"n_rows", $"sum_v", $"avg_v").collect()
        .map(r => r.getString(0) -> ((r.getLong(1),
          Option(r.getDecimal(2)).map(_.doubleValue()),
          Option(r.getDecimal(3)).map(_.doubleValue())))).toMap
    assert(surfaced == Map(
      "a" -> ((1L, Some(10.0), Some(10.0))),
      "b" -> ((2L, None, None))),
      s"all-NULL group must surface SUM/AVG = NULL: $surfaced")
    // a null row landing on an EXISTING keyed sum must not null it out
    src.append(Seq((4L, "a", Option.empty[Double]), (5L, "b", Some(6.0)))
      .toDF("id", "grp", "v"))
    IvmAgg.advance(src, view, Seq("grp"), Seq("v"))
    assert(surfaced == Map(
      "a" -> ((2L, Some(10.0), Some(10.0))),
      "b" -> ((3L, Some(6.0), Some(6.0)))),
      s"null arrivals must leave sums intact, non-null must revive b: $surfaced")
    // retracting the only non-null value returns the group to SUM=NULL
    src.delete(col("id") === 5L)
    IvmAgg.advance(src, view, Seq("grp"), Seq("v"))
    assert(surfaced("b") == ((2L, None, None)),
      s"retracting the last non-null value must surface NULL again: $surfaced")
  }

  test("a feed slice that predates the measure column folds as all-NULL") {
    val (src, view) = freshPair("evolve")
    // the measure column v does not exist yet in the first commit —
    // upstream declares it later (schema evolution)
    src.append(Seq((1L, "a"), (2L, "b")).toDF("id", "grp"))
    src.append(Seq((3L, "a", 5.0)).toDF("id", "grp", "v"))
    // chunked catch-up whose first window covers ONLY the
    // pre-evolution history: the fold must read v as all-NULL there,
    // exactly what a recompute over those rows would see
    IvmAgg.advance(src, view, Seq("grp"), Seq("v"), upTo = Some(0L))
    val s0 = IvmAgg.readView(view, Seq("v"))
      .select($"grp", $"n_rows", $"sum_v").collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        Option(r.getDecimal(2)).map(_.doubleValue())))).toMap
    assert(s0 == Map("a" -> ((1L, None)), "b" -> ((1L, None))), s"got $s0")
    IvmAgg.advance(src, view, Seq("grp"), Seq("v"))
    assertInSync(src, view)
    // MIN/MAX across the evolution point: the feed's merge-on-read
    // schema surfaces the evolved column as a TYPED all-null in the
    // pre-evolution window, so the bootstrap folds NULL extrema (never
    // an untyped void column) and later values lift them via greatest
    val mm = new TxTable(spark, tmpDir("ivm-view-evolve-mm"))
    IvmAgg.advance(src, mm, Seq("grp"), Seq("v"),
      maxs = Seq("v"), upTo = Some(0L))
    def maxes: Map[String, Option[Double]] =
      mm.read().select($"grp", $"max_v").collect()
        .map(r => r.getString(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(maxes == Map("a" -> None, "b" -> None),
      s"pre-evolution extrema must be typed NULLs: $maxes")
    IvmAgg.advance(src, mm, Seq("grp"), Seq("v"), maxs = Seq("v"))
    assert(maxes == Map("a" -> Some(5.0), "b" -> None), s"got $maxes")
  }

  test("onRetract=recompute repairs MIN/MAX for the retracting groups only") {
    val (src, view) = freshPair("retract")
    src.append(Seq((1L, "a", 10.0), (2L, "a", 5.0), (3L, "b", 7.0), (4L, "b", 2.0))
      .toDF("id", "grp", "v"))
    IvmAgg.advance(src, view, Seq("grp"), Seq("v"),
      maxs = Seq("v"), mins = Seq("v"))
    // delete a's current max AND b's current min in one range
    src.delete(col("id").isin(1L, 4L))
    src.append(Seq((5L, "c", 4.0)).toDF("id", "grp", "v"))
    IvmAgg.advance(src, view, Seq("grp"), Seq("v"),
      maxs = Seq("v"), mins = Seq("v"), onRetract = "recompute")
    val got = view.read().select($"grp", $"max_v", $"min_v").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got == Map("a" -> ((5.0, 5.0)), "b" -> ((7.0, 7.0)),
      "c" -> ((4.0, 4.0))),
      s"retracted extrema must be recomputed, untouched groups folded: $got")
    // a group retracted to zero live rows leaves the view entirely
    src.delete(col("grp") === "c")
    IvmAgg.advance(src, view, Seq("grp"), Seq("v"),
      maxs = Seq("v"), mins = Seq("v"), onRetract = "recompute")
    assert(view.read().where($"grp" === "c").count() == 0L)
    assertInSync(src, view)
  }

  test("a concurrent advance folding an overlapping range aborts, never double-applies") {
    val (src, view) = freshPair("race")
    src.append(Seq((1L, "a", 10.0)).toDF("id", "grp", "v")) // v0
    src.append(Seq((2L, "a", 5.0)).toDF("id", "grp", "v"))  // v1
    // the outer advance folds (-1, 1]; right before its commit a
    // competing maintainer (fresh handles, same paths) folds the
    // OVERLAPPING (-1, 0] and lands first — without the cursor CAS the
    // outer commit would pass the replay gate (1 > 0) and double-count
    // version 0's rows
    view.beforeCommitHook = () =>
      IvmAgg.advance(new TxTable(spark, src.tablePath),
        new TxTable(spark, view.tablePath), Seq("grp"), Seq("v"),
        upTo = Some(0L))
    intercept[java.util.ConcurrentModificationException](
      IvmAgg.advance(src, view, Seq("grp"), Seq("v")))
    assert(view.state().txns("ivm") == 0L, "the inner advance's cursor holds")
    // recovery: recompute from the NEW cursor converges exactly
    IvmAgg.advance(src, view, Seq("grp"), Seq("v"))
    assertInSync(src, view)
    assert(view.read().agg(sum($"n_rows")).head.getLong(0) == 2L,
      "version 0 must be counted exactly once")
  }

  test("streamInto maintains the view continuously: incremental, restart-safe, exactly-once") {
    val (src, view) = freshPair("stream")
    val ck = tmpDir("ivm-stream-ck")
    src.append(Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "grp", "v"))
    IvmAgg.streamInto(spark, src.tablePath, view, Seq("grp"), Seq("v"), ck)
      .awaitTermination()
    assertInSync(src, view)
    val vAfter = view.version
    // drained: re-running with nothing new commits nothing
    IvmAgg.streamInto(spark, src.tablePath, view, Seq("grp"), Seq("v"), ck)
      .awaitTermination()
    assert(view.version == vAfter, "an empty drain must not commit")
    // mutations across several commits fold incrementally on rerun
    src.update(col("id") === 1L, Map("v" -> (col("v") + lit(5.0))))
    src.delete(col("grp") === "b")
    src.append(Seq((3L, "c", Some(7.0)), (4L, "c", Option.empty[Double]))
      .toDF("id", "grp", "v"))
    IvmAgg.streamInto(spark, src.tablePath, view, Seq("grp"), Seq("v"), ck)
      .awaitTermination()
    assertInSync(src, view)
    assert(view.read().where($"grp" === "b").count() == 0L)
  }

  test("streaming IVM absorbs LATE retractions a watermarked aggregate would have dropped") {
    // the watermark-expired shape: key "a" goes quiet for many drains
    // (a watermarked streaming agg would have evicted its state), then
    // a late commit RETRACTS part of it and rewrites one of its oldest
    // rows. The commit-log feed carries those as signed delete/update
    // records, so the view must land exactly on the batch recompute —
    // the capability that distinguishes log-driven IVM from a
    // watermark-bounded streaming aggregate.
    val (src, view) = freshPair("late")
    val ck = tmpDir("ivm-late-ck")
    def drain(): Unit =
      IvmAgg.streamInto(spark, src.tablePath, view, Seq("grp"), Seq("v"), ck)
        .awaitTermination()
    src.append(Seq((1L, "a", 10.0), (2L, "a", 30.0), (3L, "b", 5.0))
      .toDF("id", "grp", "v"))
    drain()
    assertInSync(src, view)
    // key "a" goes quiet: several drains of unrelated traffic
    (0 until 3).foreach { i =>
      src.append(Seq((100L + i, "b", 1.0 * i)).toDF("id", "grp", "v"))
      drain()
    }
    assertInSync(src, view)
    // the LATE commit: retract one old "a" row, rewrite the other,
    // bundled with fresh inserts in the same drain (out-of-order mix)
    src.delete(col("id") === 2L)
    src.update(col("id") === 1L, Map("v" -> (col("v") - lit(100.0))))
    src.append(Seq((200L, "c", 2.5)).toDF("id", "grp", "v"))
    drain()
    assertInSync(src, view)
    // the view row reflects the late math exactly: 10 - 100 = -90
    val a = IvmAgg.readView(view, Seq("v")).where($"grp" === "a").collect()
    assert(a.length == 1 && a.head.getLong(1) == 1L &&
      a.head.getDecimal(2).doubleValue() == -90.0)
    // a late retraction that empties a key removes its row entirely
    src.delete(col("grp") === "a")
    drain()
    assert(view.read().where($"grp" === "a").count() == 0L)
    assertInSync(src, view)
  }

  test("randomized op sequences with interleaved advances stay in sync") {
    for (seed <- Seq(7, 19)) {
      val rnd = new scala.util.Random(seed)
      val (src, view) = freshPair(s"fuzz$seed")
      var nextId = 0L
      def batch(n: Int): Seq[(Long, String, Option[Double])] =
        Seq.fill(n) {
          nextId += 1
          // ~1 in 5 measures NULL: the fold must match SQL SUM's
          // null-skipping under every interleaving
          val v = if (rnd.nextInt(5) == 0) None
            else Some((rnd.nextInt(2000) - 1000) / 100.0)
          (nextId, s"g${rnd.nextInt(5)}", v)
        }
      src.append(batch(8).toDF("id", "grp", "v"))
      IvmAgg.advance(src, view, Seq("grp"), Seq("v"))
      (0 until 12).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 => src.append(batch(1 + rnd.nextInt(4)).toDF("id", "grp", "v"))
          case 1 => src.update(col("id") % (2 + rnd.nextInt(3)) === 0,
            Map("v" -> (col("v") * lit(-1.0) + lit(1.0))))
          case 2 => src.delete(col("id") % (3 + rnd.nextInt(4)) === 1)
          case 3 =>
            // merge: upsert half-new keys through the same feed path
            val upd = batch(2)
            src.merge(upd.toDF("id", "grp", "v"), Seq("id"))
        }
        if (rnd.nextBoolean()) {
          IvmAgg.advance(src, view, Seq("grp"), Seq("v"))
          assertInSync(src, view)
        }
      }
      IvmAgg.advance(src, view, Seq("grp"), Seq("v"))
      assertInSync(src, view)
    }
  }

  test("legacy sum-only view layout fails with an explicit rebuild message") {
    val (src, view) = freshPair("legacy")
    src.append(Seq((1L, "a", 10.0)).toDF("id", "grp", "v"))
    // persist a view in the PRE-pair layout: sum_v without nn_v
    view.append(Seq(("a", 1L, BigDecimal(10.0)))
      .toDF("grp", "n_rows", "sum_v")
      .select($"grp", $"n_rows", $"sum_v".cast(DecimalType(28, 6))))
    val e = intercept[IllegalStateException] {
      IvmAgg.advance(src, view, Seq("grp"), Seq("v"))
    }
    assert(e.getMessage.contains("legacy sum-only IVM layout"))
    assert(e.getMessage.contains("rebuild"))
  }

  test("a view is owned by exactly one maintenance cursor: a second ivm marker is rejected") {
    val (src, view) = freshPair("owner")
    src.append(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "grp", "v"))
    IvmAgg.advance(src, view, Seq("grp"), Seq("v")) // cursor "ivm"
    // batch mode under a DIFFERENT cursor id would re-fold versions the
    // first cursor already applied — rejected up front
    val e1 = intercept[IllegalStateException] {
      IvmAgg.advance(src, view, Seq("grp"), Seq("v"), cursorId = "ivm-other")
    }
    assert(e1.getMessage.contains("double-apply"))
    // streaming mode against the same batch-maintained view: same guard
    // (foldBatch is streamInto's per-batch body)
    val e2 = intercept[IllegalStateException] {
      IvmAgg.foldBatch(view, Seq("grp"), Seq("v"),
        src.readChangeFeed(-1L, src.version),
        TxTable.TxnId("ivm-stream", 0L, expectPrev = Some(-1L)))
    }
    assert(e2.getMessage.contains("double-apply"))
    // the owning cursor keeps advancing fine
    src.append(Seq((3L, "a", 4.0)).toDF("id", "grp", "v"))
    IvmAgg.advance(src, view, Seq("grp"), Seq("v"))
    assertInSync(src, view)
  }
}
