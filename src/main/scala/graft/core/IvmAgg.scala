package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental view maintenance for keyed COUNT/SUM/AVG/MIN/MAX
  * aggregates: keeps a small aggregate table exactly in sync with a
  * large source table by folding the source's row-level change feed
  * ([[TxTable.readChangeFeed]]) — O(changed rows) per advance instead
  * of the O(table) recompute a full refresh pays. That difference is
  * the economics that keep a 100 TB source's gold rollups fresh: a
  * commit touching 0.01% of rows costs 0.01% of a refresh.
  *
  * The view holds `keys..., n_rows BIGINT`, and per sum column `c`
  * the pair `sum_<c> DECIMAL, nn_<c> BIGINT` — the signed decimal
  * mass AND the signed count of non-null values. The pair is what
  * makes the fold null-safe: SQL SUM ignores NULLs and yields NULL
  * only when no non-null value exists, which a bare `sum + delta`
  * fold cannot represent (one all-NULL delta would poison the
  * accumulator to NULL forever). The stored `sum_<c>` coalesces
  * NULL values to 0 so the accumulator itself never goes NULL;
  * [[readView]] surfaces the exact SQL answer — `sum_<c>` as NULL
  * when `nn_<c> = 0`, and `avg_<c> = sum_<c> / nn_<c>` (AVG rides
  * the same pair for free). COUNT and SUM are the self-maintainable
  * aggregates under the signed fold (insert / update_postimage add,
  * delete / update_preimage subtract). Decimal accumulation keeps
  * the fold engine-exact — an IEEE double fold would drift with
  * application order.
  *
  * MIN/MAX (`mins`/`maxs`) fold `least`/`greatest` while the range
  * only inserts. A range that retracts rows is handled per
  * `onRetract`:
  *  - `"reject"` (default): abort loudly — rebuild-or-opt-in is the
  *    caller's decision, never a silently stale extremum.
  *  - `"recompute"`: the affected GROUPS ONLY are re-aggregated from
  *    the source snapshot at the fold's upper version
  *    ([[TxTable.readAt]]) and their extrema replace the fold value
  *    absolutely. Cost is O(rows of retracting groups) — the price
  *    MIN/MAX fundamentally costs under deletes, paid only by the
  *    groups that retracted, never the whole view.
  *
  * Exactly-once: each advance lands as ONE atomic commit on the view —
  * the delta merge AND the source-version cursor ride the same
  * manifest ([[TxTable.TxnId]] on the conditional merge), so a crash
  * between commit and ack replays as a no-op and a torn advance
  * (delta applied, cursor not) cannot exist. A version range whose
  * net delta is empty (e.g. compactions only) still advances the
  * cursor via a cursor-only commit. Keys whose live count reaches
  * zero are deleted from the view.
  */
object IvmAgg {

  private val Dec = DecimalType(28, 6)

  /** Advance `view` to reflect `src`'s state at its current head (or
    * at `upTo`, for CHUNKED catch-up — a view bootstrapping against a
    * deep 100 TB history advances in bounded version windows, each its
    * own restart point, instead of one unboundedly large fold).
    * `sums` name source columns to maintain decimal sums for (the
    * view columns are `sum_<name>` + `nn_<name>`); every advance call
    * is idempotent and restart-safe. Returns the source version the
    * view now reflects.
    */
  def advance(src: TxTable, view: TxTable, keys: Seq[String],
              sums: Seq[String], cursorId: String = "ivm",
              upTo: Option[Long] = None, maxs: Seq[String] = Nil,
              mins: Seq[String] = Nil,
              onRetract: String = "reject"): Long = {
    require(keys.nonEmpty, "IVM needs at least one key column")
    require(Set("reject", "recompute").contains(onRetract),
      s"onRetract must be 'reject' or 'recompute', got '$onRetract'")
    val viewState = view.state()
    requireCurrentLayout(view, sums)
    requireSoleMaintainer(viewState.txns.keySet, cursorId, view)
    val from = viewState.txns.getOrElse(cursorId, -1L)
    val to = upTo.map(math.min(_, src.version)).getOrElse(src.version)
    if (to <= from) return from
    val extrema = maxs.map(("max", _)) ++ mins.map(("min", _))
    // ONE evaluation of the feed window: with extrema it otherwise
    // re-reads for the retraction probe, the retracting-key set and
    // the grouped fold (the mergeConditional source-pinning pattern)
    val ch = src.readChangeFeed(from, to)
    if (extrema.nonEmpty) ch.persist()
    try {
      val sign = when(col(TxTable.ChangeTypeCol).isin("insert", "update_postimage"),
        lit(1L)).otherwise(lit(-1L))
      val retracts = extrema.nonEmpty && ch.where(sign < 0).limit(1).count() > 0
      if (retracts && onRetract == "reject")
        throw new IllegalStateException(
          s"source versions ($from, $to] of ${src.tablePath} retract rows — a " +
            "MIN/MAX view cannot fold retractions; rebuild the view from a full " +
            "read, or opt into onRetract=\"recompute\" (re-aggregates the " +
            "retracting groups only)")
      val folded = buildDelta(view, ch, keys, sums, extrema)
      // retraction repair: the retracting GROUPS get absolute extrema
      // recomputed from the `to` snapshot; every other group keeps the
      // cheap insert-only fold. `__abs` rides the delta so the SET
      // clause can tell the two apart — it is never inserted (explicit
      // insert values in mergeDelta).
      val delta =
        if (!retracts) folded
        else {
          val retrKeys = ch.where(sign < 0)
            .select(keys.map(k => col(s"`$k`")): _*).distinct()
          def kc(l: String, r: String) =
            keys.map(k => col(s"$l.`$k`") <=> col(s"$r.`$k`")).reduce(_ && _)
          val snapAt = src.readAt(to)
          val absAggs = extrema.map { case (k, c) =>
            val v = typedCol(snapAt.columns.toSeq, view, k, c)
            (if (k == "max") max(v) else min(v)).as(s"__abs_${k}_$c")
          }
          // no forced broadcast: the retracting-key set is O(changed
          // groups), unbounded in principle — AQE promotes when small
          val recomputed = snapAt.as("r")
            .join(retrKeys.as("rk"), kc("r", "rk"), "left_semi")
            .groupBy(keys.map(k => col(s"`$k`")): _*)
            .agg(absAggs.head, absAggs.tail: _*)
          // left join: a retracting group with ZERO live rows at `to`
          // has no recomputed row — its extrema are NULL, and its view
          // row leaves via the n_rows=0 delete clause anyway
          folded.drop("__abs").as("f")
            .join(retrKeys.withColumn("__r", lit(true)).as("rk"),
              kc("f", "rk"), "left_outer")
            .join(recomputed.as("rc"), kc("f", "rc"), "left_outer")
            .select(
              (keys.map(k => col(s"f.`$k`")) :+ col("f.n_rows")) ++
                sums.flatMap(c => Seq(col(s"f.`sum_$c`"), col(s"f.`nn_$c`"))) ++
                extrema.map { case (k, c) =>
                  when(coalesce(col("__r"), lit(false)),
                    col(s"rc.`__abs_${k}_$c`"))
                    .otherwise(col(s"f.`${k}_$c`")).as(s"${k}_$c")
                } :+ coalesce(col("__r"), lit(false)).as("__abs"): _*)
        }
      // the CAS expectation (expectPrev = from) makes a concurrent
      // advance folding an overlapping range abort instead of
      // double-applying the overlap; replays of THIS range stay no-ops
      mergeDelta(view, keys, sums, extrema, delta,
        TxTable.TxnId(cursorId, to, expectPrev = Some(from)))
      to
    } finally if (extrema.nonEmpty) ch.unpersist()
  }

  /** A view persisted by the pre-pair layout (has `sum_<c>` but no
    * `nn_<c>`) cannot be advanced — the null-safe fold needs the
    * non-null-count column. Without this check the failure surfaces as
    * a generic merge error ("SET targets unknown column(s) nn_...")
    * that misleads rather than explaining the format change.
    */
  private def requireCurrentLayout(view: TxTable, sums: Seq[String]): Unit =
    view.schemaOption.foreach { sch =>
      val cols = sch.fields.map(_.name).toSet
      val legacy = sums.filter(c => cols.contains(s"sum_$c") && !cols.contains(s"nn_$c"))
      if (legacy.nonEmpty) throw new IllegalStateException(
        s"view ${view.tablePath} uses the legacy sum-only IVM layout for " +
          s"column(s) ${legacy.mkString(", ")} — the layout changed to " +
          "sum+non-null-count pairs (sum_<c>, nn_<c>); rebuild the view " +
          "from an empty table")
    }

  /** A view is owned by exactly ONE maintenance mode: the batch
    * [[advance]] cursor and the streaming [[streamInto]] writer track
    * independent positions, so pointing both (or two differently-named
    * cursors) at the same view double-applies the change feed. Both
    * entry points assert no OTHER `ivm`-prefixed marker exists before
    * folding. (A custom id not starting with "ivm" bypasses the guard —
    * keep the default prefix unless you are deliberately multi-homing.)
    */
  private def requireSoleMaintainer(txnKeys: Set[String], mine: String,
      view: TxTable): Unit = {
    val others = (txnKeys - mine).filter(_.startsWith("ivm"))
    if (others.nonEmpty) throw new IllegalStateException(
      s"view ${view.tablePath} is already maintained by '${others.head}' — " +
        s"folding under '$mine' as well would double-apply the change feed; " +
        "a view is owned by exactly one maintenance cursor/writer")
  }

  /** A maintained column as a TYPED column of `frame`: present →
    * itself; absent (the slice/snapshot predates its declaration) →
    * a null of the VIEW's stored type, so the fold reads all-NULL
    * exactly like a recompute would. For sums the downstream decimal
    * cast types a bare null anyway; extrema have no such cast, and an
    * untyped NullType column would poison the view schema (parquet
    * cannot write void) — with no view type to borrow either, fail
    * loudly: there is nothing sound to fold yet.
    */
  private def typedCol(frameCols: Seq[String], view: TxTable,
      kind: String, c: String): Column =
    if (frameCols.contains(c)) col(s"`$c`")
    else view.schemaOption.flatMap(_.fields.find(_.name == s"${kind}_$c"))
      .map(f => lit(null).cast(f.dataType))
      .getOrElse(throw new IllegalStateException(
        s"column $c does not exist in this feed window and the view has no " +
          s"${kind}_$c yet — start the MIN/MAX view at a window where the " +
          "column exists (its type cannot be inferred from nothing)"))

  /** The one signed-fold construction, shared by the batch [[advance]]
    * and the streaming [[foldBatch]]: null-safe pair fold — mass
    * coalesced to 0 (never NULL), non-null count signed alongside, so
    * SQL's NULL-when-all-null surfaces at read time from nn = 0, not
    * from a poisoned accumulator. A maintained column the feed slice
    * PREDATES (declared on the source after these commits — upstream
    * schema evolution) reads as all-NULL, exactly what those rows'
    * recompute would see.
    */
  private def buildDelta(view: TxTable, feed: org.apache.spark.sql.DataFrame,
      keys: Seq[String], sums: Seq[String],
      extrema: Seq[(String, String)]): org.apache.spark.sql.DataFrame = {
    val sign = when(col(TxTable.ChangeTypeCol).isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    def m(c: String): Column =
      if (feed.columns.contains(c)) col(s"`$c`") else lit(null)
    val aggs = sum(sign).as("n_rows") +:
      (sums.flatMap(c => Seq(
        sum(coalesce(m(c).cast(Dec), lit(0).cast(Dec)) * sign).as(s"sum_$c"),
        sum(when(m(c).isNotNull, sign).otherwise(lit(0L))).as(s"nn_$c"))) ++
        extrema.map { case (k, c) =>
          val v = typedCol(feed.columns.toSeq, view, k, c)
          (if (k == "max") max(v) else min(v)).as(s"${k}_$c")
        })
    feed.groupBy(keys.map(k => col(s"`$k`")): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("__abs", lit(false))
  }

  /** The one delta-application path, shared by the batch [[advance]]
    * and the streaming [[foldBatch]]: merge a grouped signed delta
    * into the view atomically with its cursor/batch txn.
    */
  private def mergeDelta(view: TxTable, keys: Seq[String], sums: Seq[String],
      extrema: Seq[(String, String)], delta: org.apache.spark.sql.DataFrame,
      txn: TxTable.TxnId): Unit = {
    val set = (("n_rows" -> "t.n_rows + s.n_rows") +:
      (sums.flatMap(c => Seq(
        s"sum_$c" -> s"coalesce(t.`sum_$c`, cast(0 as decimal(28,6))) + coalesce(s.`sum_$c`, cast(0 as decimal(28,6)))",
        s"nn_$c" -> s"coalesce(t.`nn_$c`, 0L) + coalesce(s.`nn_$c`, 0L)")) ++
        extrema.map { case (k, c) =>
          val fold = if (k == "max") "greatest" else "least"
          s"${k}_$c" ->
            s"CASE WHEN s.__abs THEN s.`${k}_$c` ELSE $fold(t.`${k}_$c`, s.`${k}_$c`) END"
        })).toMap
    val viewCols: Seq[String] = (keys :+ "n_rows") ++
      sums.flatMap(c => Seq(s"sum_$c", s"nn_$c")) ++
      extrema.map { case (k, c) => s"${k}_$c" }
    // clause order matters: a group whose live count hits zero leaves
    // the view entirely (first applicable matched clause wins)
    view.mergeBuilder(delta, keys)
      .whenMatchedDelete("t.n_rows + s.n_rows = 0")
      .whenMatchedUpdate(set)
      .whenNotMatchedInsert(
        viewCols.map(c => c -> s"s.`$c`").toMap, "s.n_rows <> 0")
      .run(Some(txn))
  }

  /** STREAMING maintenance, one micro-batch: fold `feed` (change-feed
    * rows — [[graft.streaming.TxTableSource]]'s `readChangeFeed`
    * output, or any frame with the same `_change_type` column) into
    * the view under `txn`. Exactly-once under foreachBatch
    * redelivery: the (writer, batchId) txn gates the replay, and the
    * batch's delta and its progress marker ride one commit.
    * COUNT/SUM/AVG only — MIN/MAX retraction repair needs a versioned
    * snapshot to recompute from, which a micro-batch does not carry;
    * use the batch [[advance]] for extrema views.
    */
  def foldBatch(view: TxTable, keys: Seq[String], sums: Seq[String],
      feed: org.apache.spark.sql.DataFrame, txn: TxTable.TxnId): Unit = {
    require(keys.nonEmpty, "IVM needs at least one key column")
    requireCurrentLayout(view, sums)
    requireSoleMaintainer(view.state().txns.keySet, txn.writerId, view)
    mergeDelta(view, keys, sums, Nil,
      buildDelta(view, feed, keys, sums, Nil), txn)
  }

  /** The CONTINUOUSLY-maintained view: a streaming query over the
    * source's commit log in row-level mode drives [[foldBatch]] per
    * micro-batch. Progress lives in BOTH the streaming checkpoint
    * (which commits were consumed) and the view's txn marker (which
    * batch was applied) — a crash between sink and checkpoint
    * redelivers the batch and the txn gate makes the replay a no-op,
    * so the view is exactly-once end to end. AvailableNow drains
    * exactly the unconsumed commits; schedule it like any incremental
    * job.
    *
    * The checkpoint and the view are a PAIR: batch ids are only
    * meaningful against the checkpoint that numbered them, so
    * pointing a fresh checkpoint at a view that already carries this
    * `writerId`'s marker would replay-gate real data — rebuild the
    * view (or pick a new writerId + empty view) when discarding a
    * checkpoint.
    */
  def streamInto(spark: org.apache.spark.sql.SparkSession, srcPath: String,
      view: TxTable, keys: Seq[String], sums: Seq[String],
      checkpoint: String, writerId: String = "ivm-stream",
      startingVersion: Long = 0L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("graft-txtable")
      .option("path", srcPath)
      .option("readChangeFeed", "true")
      .option("startingVersion", startingVersion)
      .load()
      .writeStream
      .queryName(s"graftIvm-$writerId")
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        foldBatch(view, keys, sums, b,
          TxTable.TxnId(writerId, id, expectPrev = Some(id - 1))))
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** The view with exact SQL aggregate semantics surfaced: per sum
    * column `c`, `sum_<c>` becomes NULL when no non-null value is
    * live (`nn_<c> = 0`, SQL's SUM-over-all-NULL answer) and
    * `avg_<c>` = sum/non-null-count appears alongside. The internal
    * `nn_<c>` pair columns are dropped. MIN/MAX columns pass through
    * (`least`/`greatest` folds already skip NULLs, matching SQL).
    */
  def readView(view: TxTable, sums: Seq[String]): DataFrame = {
    val df = view.read()
    val out = df.columns.toSeq.filterNot(c => sums.exists(s => c == s"nn_$s"))
      .map { c =>
        sums.find(s => c == s"sum_$s") match {
          case Some(s) =>
            when(col(s"`nn_$s`") === 0L, lit(null).cast(Dec))
              .otherwise(col(s"`sum_$s`")).as(s"sum_$s")
          case None => col(s"`$c`")
        }
      } ++ sums.map(s =>
      when(col(s"`nn_$s`") === 0L, lit(null).cast(Dec))
        .otherwise(col(s"`sum_$s`") / col(s"`nn_$s`")).as(s"avg_$s"))
    df.select(out: _*)
  }
}
