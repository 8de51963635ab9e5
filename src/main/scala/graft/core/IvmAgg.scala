package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental view maintenance for keyed COUNT/SUM aggregates: keeps
  * a small aggregate table exactly in sync with a large source table
  * by folding the source's row-level change feed
  * ([[TxTable.readChangeFeed]]) — O(changed rows) per advance instead
  * of the O(table) recompute a full refresh pays. That difference is
  * the economics that keep a 100 TB source's gold rollups fresh: a
  * commit touching 0.01% of rows costs 0.01% of a refresh.
  *
  * The view holds `keys..., n_rows BIGINT, sum_<c> DECIMAL` per sum
  * column (and `max_<c>` per max column); derived measures (averages,
  * shares) divide at read time. COUNT and SUM are the
  * self-maintainable aggregates under the signed fold (insert /
  * update_postimage add, delete / update_preimage subtract). MAX is
  * maintainable ONLY while the source range retracts nothing — the
  * append-only event-table case — so `maxs` folds `greatest` and the
  * advance REJECTS a range carrying any delete/update record rather
  * than silently serving a stale maximum (rebuild the view after a
  * retraction; re-reading the group is the price MAX fundamentally
  * costs under deletes). Decimal accumulation keeps the sum fold
  * engine-exact — an IEEE double fold would drift with application
  * order.
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

  /** Advance `view` to reflect `src`'s state at its current head (or
    * at `upTo`, for CHUNKED catch-up — a view bootstrapping against a
    * deep 100 TB history advances in bounded version windows, each its
    * own restart point, instead of one unboundedly large fold).
    * `sums` name source columns to maintain decimal sums for (the
    * view columns are `sum_<name>`); every advance call is idempotent
    * and restart-safe. Returns the source version the view now
    * reflects.
    */
  def advance(src: TxTable, view: TxTable, keys: Seq[String],
              sums: Seq[String], cursorId: String = "ivm",
              upTo: Option[Long] = None, maxs: Seq[String] = Nil): Long = {
    require(keys.nonEmpty, "IVM needs at least one key column")
    val from = view.state().txns.getOrElse(cursorId, -1L)
    val to = upTo.map(math.min(_, src.version)).getOrElse(src.version)
    if (to <= from) return from
    val ch = src.readChangeFeed(from, to)
    val sign = when(col(TxTable.ChangeTypeCol).isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    if (maxs.nonEmpty && ch.where(sign < 0).limit(1).count() > 0)
      throw new IllegalStateException(
        s"source versions ($from, $to] of ${src.tablePath} retract rows — a MAX " +
          "view cannot fold retractions; rebuild the view from a full read")
    val aggs = sum(sign).as("n_rows") +:
      (sums.map(c => sum(col(s"`$c`").cast(DecimalType(28, 6)) * sign)
        .as(s"sum_$c")) ++
        maxs.map(c => max(col(s"`$c`")).as(s"max_$c")))
    val delta = ch.groupBy(keys.map(k => col(s"`$k`")): _*)
      .agg(aggs.head, aggs.tail: _*)
    val set = (("n_rows" -> "t.n_rows + s.n_rows") +:
      (sums.map(c => s"sum_$c" -> s"t.`sum_$c` + s.`sum_$c`") ++
        maxs.map(c => s"max_$c" -> s"greatest(t.`max_$c`, s.`max_$c`)"))).toMap
    // clause order matters: a group whose live count hits zero leaves
    // the view entirely (first applicable matched clause wins)
    // the CAS expectation (expectPrev = from) makes a concurrent
    // advance folding an overlapping range abort instead of
    // double-applying the overlap; replays of THIS range stay no-ops
    view.mergeBuilder(delta, keys)
      .whenMatchedDelete("t.n_rows + s.n_rows = 0")
      .whenMatchedUpdate(set)
      .whenNotMatchedInsertAll("s.n_rows <> 0")
      .run(Some(TxTable.TxnId(cursorId, to, expectPrev = Some(from))))
    to
  }
}
