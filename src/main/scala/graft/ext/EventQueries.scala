package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.{EventTime, Tables}

/** Batch-expressible analogs of the reference pipeline's operators,
  * phrased over the driver's `events` table (event_type ≙ `type`,
  * event_id ≙ `eventId`, ts ≙ `timestamp` — FIXTURES.md §2).
  *
  * Reference citations (SURVEY.md §2): struct flatten P2
  * (bronze.py:18), day filter P6 (gold.py:24-27), dedup A4
  * (silver.py:23), gold agg A1 (gold.py:26-33), distinct P7
  * (ingest_raw.scala:133), time format F8 (silver.py:24-27),
  * mergeSchema union ST9 (ingest.scala:165-170).
  *
  * events.ts has shipped as BOTH parquet TIMESTAMP(NANOS) (surfacing
  * as LongType epoch-nanos under nanosAsLong) and TIMESTAMP_MICROS
  * (surfacing as TIMESTAMP_NTZ) across testdata regenerations, so all
  * time access goes through the type-adaptive [[graft.core.EventTime]]
  * accessors. Every derivation truncates to whole seconds (exact and
  * monotone in each encoding, so max/order agree with the oracle), and
  * no query ever outputs a sub-second value.
  */
object EventQueries {

  private def dsum2(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Epoch seconds from ts, adaptive to the loaded encoding. */
  private def tsSec(e: DataFrame): Column = EventTime.sec(e)

  private def tsTimestamp(e: DataFrame): Column = timestamp_seconds(tsSec(e))

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "events")

  /** P1/P2/P3: pack into a struct then flatten `parsedValue.*` with a
    * derived column — the bronze stage's shape (bronze.py:18).
    */
  def qFlattenProject(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = ev(s, dir)
    e
      .select(struct($"event_id", $"event_type", $"user_id", to_date(tsTimestamp(e)).as("day"))
        .as("parsedValue"), $"value")
      .select($"parsedValue.*", ($"value" * lit(2.0d)).as("value2"))
      .orderBy($"event_id")
  }

  /** P6 intent ("events since day X") — the reference compares
    * dd-MM-yyyy strings lexicographically (gold.py:24-27, hazard
    * SURVEY.md §7.5.1); we compare the raw ts against a same-typed
    * literal so the predicate pushes down to the parquet scan.
    */
  def qFilterDay(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = ev(s, dir)
    e
      .where($"ts" >= EventTime.atUtc(e, "2024-01-15T00:00:00Z"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), dsum2($"value").as("total_value"))
      .orderBy($"event_type")
  }

  /** A4 as a deterministic batch dedup: first event per (user_id,
    * event_type) by arrival. `dropDuplicates` itself is
    * order-nondeterministic, so the oracle-checked form is the
    * row_number()=1 window (same semantics the streaming dedup has
    * when fed in order).
    */
  def qDedupFirstEvent(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = ev(s, dir)
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy(tsSec(e), $"event_id")
    e
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type", $"event_id".as("first_event_id"))
      .orderBy($"user_id", $"event_type")
  }

  /** A1: the gold aggregate — counts + latest-activity per group, with
    * the reference's non-deterministic last(timestamp) (gold.py:29)
    * expressed as max over second-truncated time (SURVEY.md §7.5.2).
    */
  def qGoldAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = ev(s, dir)
    e
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"),
        max(tsSec(e)).as("last_ts_sec"),
        dsum2($"value").as("total_value"))
      .orderBy($"event_type")
  }

  /** P7: distinct event types (HashAggregate, no sort needed). */
  def qDistinctTypes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ev(s, dir).select($"event_type").distinct().orderBy($"event_type")
  }

  /** A3: count(*) validation query (bronze.py:31). */
  def qCountEvents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ev(s, dir).agg(count(lit(1)).as("n"))
  }

  /** F8: epoch→formatted-string bucketing, silver's timestamp
    * normalization shape (silver.py:24-27) — here grouped per hour.
    */
  def qEventHourMix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = ev(s, dir)
    e
      .groupBy(date_format(tsTimestamp(e), "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"hour")
  }

  /** ST9: schema-evolution union — a "v1" projection (no value column)
    * unioned by name with a "v2" projection, missing columns
    * null-padded, mirroring mergeSchema on append
    * (ingest.scala:165-170 → unionByName(allowMissingColumns)).
    */
  def qMergeUnion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = ev(s, dir)
    val v1 = e.filter($"event_id" % 3 === 0).select($"event_id", $"event_type")
    val v2 = e.filter($"event_id" % 3 =!= 0).select($"event_id", $"event_type", $"value")
    v1.unionByName(v2, allowMissingColumns = true).orderBy($"event_id")
  }

  /** Extension (SURVEY.md §7.3): JSON props → typed column
    * (from_json/get_json_object over the props string).
    */
  def qPropsJson(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ev(s, dir)
      .select(get_json_object($"props", "$.k").cast("long").as("k"), $"value")
      .groupBy($"k")
      .agg(count(lit(1)).as("n"), dsum2($"value").as("total_value"))
      .orderBy($"k")
  }

  /** Batch sessionization: split each user's event stream at >30-min
    * gaps — lag to flag session starts, running sum for the session
    * number, then one aggregate per session. Two window passes over
    * the same (user_id, sec, event_id) sort order, so Spark plans ONE
    * shuffle+sort and reuses it for both; all outputs are integer
    * seconds (exact ns division), keeping the oracle byte-stable.
    * The streaming analog (arbitrary state, event-time timeout) is
    * `streaming/StreamOps.sessionize`; this is the backfill form.
    */
  def qSessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"sec", $"event_id")
    val e = ev(s, dir)
    e
      .select($"user_id", $"event_id", tsSec(e).as("sec"))
      .withColumn("new_sess",
        when(lag($"sec", 1).over(w).isNull ||
          ($"sec" - lag($"sec", 1).over(w)) > 1800, 1L).otherwise(0L))
      .withColumn("sess_no",
        sum($"new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sess_no")
      .agg(min($"sec").as("session_start_sec"), max($"sec").as("session_end_sec"),
        count(lit(1)).as("n_events"))
      .orderBy($"user_id", $"sess_no")
  }

  /** Cohort retention — the canonical product-analytics rollup: users
    * are cohorted by their FIRST event's epoch-day, and each later
    * active day counts them under (cohort_day, day_offset). All
    * arithmetic is integer (second-truncated time, `div`), so the
    * matrix is engine-exact. One data shuffle: the per-user first-day
    * window partitions on user_id, the (cohort, offset) distinct-user
    * aggregate is over the already-bounded (cohort × offset × user)
    * projection, and the output sort rides on top. At 100 TB the
    * cohort table is computed once at ingest and the offset aggregate
    * is the only recurring job.
    */
  def qCohortRetention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = ev(s, dir)
    val w = Window.partitionBy($"user_id")
    e
      .select($"user_id", tsSec(e).as("sec"))
      .select($"user_id", expr("sec div 86400").as("day"))
      .withColumn("cohort_day", min($"day").over(w))
      .select($"cohort_day", ($"day" - $"cohort_day").as("day_offset"), $"user_id")
      .distinct()
      .groupBy($"cohort_day", $"day_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy($"cohort_day", $"day_offset")
  }

  /** BEHAVIORAL TRANSITION MATRIX — the first-order Markov view of
    * the event stream: consecutive event-type pairs per user under
    * the total (sec, event_id) order, counted corpus-wide. The
    * session-flow / next-action-model input. One shuffle: the lag
    * window partitions on user_id and the pair aggregate + output
    * sort ride on top. Integer counts only.
    */
  def qTransitions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"sec", $"event_id")
    val e = ev(s, dir)
    e
      .select($"user_id", $"event_id", $"event_type", tsSec(e).as("sec"))
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .where($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type".as("next_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"prev_type", $"next_type")
  }

  /** CALENDAR GAP-FILL (resample-to-daily): every user's complete
    * day-by-day series from their first to last event, missing days
    * ZERO-FILLED — the densification every time-series consumer
    * (forecasting features, retention curves, SLA dashboards) needs
    * before windowed math, and the op SQL engines hand-roll with a
    * calendar table. Shape: one (user, day) aggregate; the calendar
    * EXPLODES from the |users|-row span table (`sequence(d0, d1)` is
    * map-side, bounded by span days — never a cross join against a
    * global calendar); the left join back densifies. At 100 TB the
    * daily rollup is the stored artifact and only the span explode +
    * join recur. Counts are integers; the value sum is DECIMAL (the
    * [[qRfm]] convention) so zero-fill and order are engine-exact.
    */
  def qGapFill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    gapFilled(s, dir)
      .select($"user_id", $"day", $"n_events",
        $"sum_value".cast("double").as("sum_value"))
      .orderBy($"user_id", $"day")
  }

  /** The densified per-(user, day) frame [[qGapFill]] emits, kept in
    * DECIMAL for exact downstream folds ([[qMovingAvg]]).
    */
  private def gapFilled(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = ev(s, dir)
    val daily = e
      .select($"user_id", tsSec(e).as("sec"), $"value")
      .select($"user_id", expr("sec div 86400").as("day"), $"value")
      .groupBy($"user_id", $"day")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast(DecimalType(18, 2))).as("sum_value"))
      .localCheckpoint(eager = false) // shared: span aggregate + join back
    val cal = daily.groupBy($"user_id")
      .agg(min($"day").as("d0"), max($"day").as("d1"))
      .select($"user_id", explode(sequence($"d0", $"d1")).as("day"))
    cal.join(daily, Seq("user_id", "day"), "left")
      .select($"user_id", $"day",
        coalesce($"n_events", lit(0L)).as("n_events"),
        coalesce($"sum_value", lit(0).cast(DecimalType(28, 2))).as("sum_value"))
  }

  /** 7-DAY TRAILING MOVING AVERAGE over the gap-filled series — THE
    * reason densification precedes windowed math: on the sparse
    * (event-days-only) frame the same window silently averages over
    * present days and overstates quiet users. Exact arithmetic:
    * integer event counts and decimal value sums fold in the frame;
    * each mean is ONE double divide of exact window sums (never AVG's
    * engine-specific accumulation). One shuffle: the user partition
    * serves both window frames and the output sort rides it.
    */
  def qMovingAvg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"day").rowsBetween(-6, 0)
    gapFilled(s, dir)
      .select($"user_id", $"day", $"n_events",
        (sum($"n_events").over(w).cast("double") /
          count(lit(1)).over(w).cast("double")).as("mavg_events"),
        (sum($"sum_value").over(w).cast("double") /
          count(lit(1)).over(w).cast("double")).as("mavg_value"))
      .orderBy($"user_id", $"day")
  }

  /** LAST-TOUCH ATTRIBUTION — the batch twin of the streaming
    * interval-join attribution ([[graft.streaming.StreamOps
    * .clickAttribution]]): each purchase is credited to the same
    * user's most recent PRIOR marketing touch (click or view) under
    * the total (sec, event_id) order; purchases with no prior touch
    * are organic. One shuffle: the running last-touch is a window over
    * the user_id partition, and the credit rollup aggregates a
    * |touch types|-row frame on top. Revenue is a decimal sum —
    * engine-exact.
    */
  def qAttribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"sec", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val e = ev(s, dir)
    e
      .select($"user_id", $"event_id", $"event_type", tsSec(e).as("sec"), $"value")
      .where($"event_type".isin("click", "view", "purchase"))
      .withColumn("touch",
        last(when($"event_type" =!= "purchase", $"event_type"), ignoreNulls = true)
          .over(w))
      .where($"event_type" === "purchase")
      .groupBy(coalesce($"touch", lit("organic")).as("touch"))
      .agg(count(lit(1)).as("purchases"), dsum2($"value").as("revenue"))
      .orderBy($"touch")
  }

  /** RFM SEGMENTATION — the classic customer-value rollup: per user,
    * Recency (days between their last event and the corpus's last
    * day), Frequency (event count) and Monetary (decimal value sum),
    * each bucketed 1–3 by FIXED thresholds (not ntile — rank-based
    * buckets tie-break arbitrarily across engines; fixed cutoffs are
    * portable and what a production scorecard pins anyway), then
    * rolled up to segment sizes. All arithmetic is integer / decimal:
    * engine-exact. One data shuffle (the per-user aggregate); the
    * corpus max-day is a broadcast 1-row scalar; the segment rollup
    * runs over |users| rows.
    */
  def qRfm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = ev(s, dir)
    val perUser = e
      .select($"user_id", tsSec(e).as("sec"), $"value")
      .groupBy($"user_id")
      .agg(max($"sec").as("last_sec"),
        count(lit(1)).as("f"),
        sum($"value".cast(DecimalType(18, 2))).as("m"))
    val corpus = perUser.agg(max($"last_sec").as("corpus_sec"),
      count(lit(1)).as("n_users"), sum($"f").as("total_f"),
      sum($"m").as("total_m"))
    // F/M buckets compare each user to the corpus MEAN by
    // cross-multiplication (2·f·n ≥ 3·Σf ⇔ f ≥ 1.5·mean): integer and
    // decimal products only, so buckets are scale-adaptive AND exact
    perUser.crossJoin(broadcast(corpus))
      .select(
        when(expr("(corpus_sec - last_sec) div 3600") <= 2, 3L)
          .when(expr("(corpus_sec - last_sec) div 3600") <= 12, 2L)
          .otherwise(1L).as("r_score"),
        when($"f" * $"n_users" * 2 >= $"total_f" * 3, 3L)
          .when($"f" * $"n_users" >= $"total_f", 2L)
          .otherwise(1L).as("f_score"),
        when($"m" * $"n_users" * 2 >= $"total_m" * 3, 3L)
          .when($"m" * $"n_users" >= $"total_m", 2L)
          .otherwise(1L).as("m_score"))
      .groupBy($"r_score", $"f_score", $"m_score")
      .agg(count(lit(1)).as("n_users"))
      .orderBy($"r_score", $"f_score", $"m_score")
  }

  /** MARKET-BASKET association mining — support / confidence / lift
    * over per-user item baskets (item ≙ the JSON `props.k` attribute;
    * in a retail log, the product id): the A-priori first pass that
    * drives "users who did X also did Y". Pair counting is a
    * self-join of the DISTINCT (user, item) basket table on user with
    * k1 < k2 — O(Σ basket²), bounded by basket size, never an
    * all-pairs over items — and the scalar metrics follow the
    * engine-exact convention: integer counts, one IEEE divide
    * quantized to DECIMAL(18,8) ([[graft.ext.Curation.qDsirWeights]]).
    * Output: the top item pairs with conf(k1→k2) and lift.
    *
    * CONTRACT (shared with every [[graft.functions.PairExpand]] call
    * site): one user's DISTINCT-item basket must stay under
    * [[graft.functions.PairExpand.MaxPairs]] pairs (~11,586 distinct
    * items) — a larger basket fails LOUDLY with the offending size,
    * never silently. A log where one "user" legitimately holds more
    * distinct items than that is a bot/default-id artifact to filter
    * upstream, not a basket.
    */
  def qBasketPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    import graft.functions.PairExpand
    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 8))
    // ONE pass builds the per-user basket: the JSON parse + the
    // (user, item) distinct collapse into a single groupBy(user) with
    // collect_set — and the pair expansion is the codegen'd
    // [[PairExpand]] kernel over each user's sorted item set instead
    // of a basket⋈basket self-join (which re-parsed and re-shuffled
    // the basket table on both sides). Same O(Σ basket²) pair work,
    // one exchange and one scan instead of four. The materialized
    // basket frame (lazy local checkpoint, per evaluation) then feeds
    // the user count, the item counts and the pair counts without
    // recomputing the parse.
    val baskets = ev(s, dir)
      .select($"user_id", get_json_object($"props", "$.k").cast("long").as("item"))
      .where($"item".isNotNull)
      .groupBy($"user_id").agg(array_sort(collect_set($"item")).as("items"))
      .localCheckpoint(eager = false)
    val nUsers = baskets.agg(count(lit(1)).as("n_users"))
    val itemCounts = baskets.select(explode($"items").as("item"))
      .groupBy($"item").agg(count(lit(1)).as("n_item"))
    val pairs = baskets.select(explode(PairExpand($"items")).as("p"))
      .groupBy($"p.a".as("k1"), $"p.b".as("k2"))
      .agg(count(lit(1)).as("n_pair"))
    pairs
      .join(broadcast(itemCounts.select($"item".as("k1"), $"n_item".as("n_k1"))), "k1")
      .join(broadcast(itemCounts.select($"item".as("k2"), $"n_item".as("n_k2"))), "k2")
      .crossJoin(broadcast(nUsers))
      .select($"k1", $"k2", $"n_pair",
        dec($"n_pair".cast("double") / $"n_k1".cast("double"))
          .cast("double").as("confidence"),
        dec(($"n_pair" * $"n_users").cast("double") /
          ($"n_k1" * $"n_k2").cast("double")).cast("double").as("lift"))
      .orderBy($"n_pair".desc, $"k1", $"k2")
      .limit(30)
  }

  /** Fixed-width histogram of `value` per event type: bucket =
    * floor(value / 50) — one IEEE division + floor on binary-identical
    * doubles, so the bucketing is engine-exact (no percentile
    * interpolation, no round()). Plans as a single hash aggregate.
    */
  def qHistogram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ev(s, dir)
      .groupBy($"event_type", floor($"value" / lit(50.0d)).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"event_type", $"bucket")
  }

  /** Exact median by sort position: the ⌈n/2⌉-th value per event type
    * under the total order (value, event_id). Selects an EXISTING
    * value — no interpolation arithmetic — so the result is
    * bit-identical in any engine; the deterministic tie-break makes
    * the chosen row unique. One shuffle: the aggregate reuses the
    * window's partitioning.
    */
  def qMedianValue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"event_type").orderBy($"value", $"event_id")
    ev(s, dir)
      .select($"event_type", $"value", $"event_id")
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"event_type")))
      .where($"rn" === expr("(n + 1) div 2"))
      .select($"event_type", $"value".as("median_value"), $"n")
      .orderBy($"event_type")
  }

  /** Exact per-group quartiles by SORT POSITION (generalizing
    * [[qMedianValue]]): the rows at rank ⌈k·n/4⌉, k ∈ {1,2,3}, under
    * a total (value, event_id) order — no interpolation, so the
    * result is an actual data point and engine-independent. One
    * shuffle (the per-group rank window; the count piggybacks on the
    * same partitioning). When positions coincide (tiny groups) the
    * row reports its SMALLEST quartile index — mirrored by the
    * oracle's CASE chain. The approximate counterpart at 100 TB is
    * `approx_percentile` ([[graft.ext.ScaleOps.qApproxStats]]); this
    * is the exact backfill/audit path.
    */
  def qGroupQuartiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"event_type").orderBy($"value", $"event_id")
    ev(s, dir)
      .select($"event_type", $"value", $"event_id")
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"event_type")))
      .withColumn("q",
        when($"rn" === expr("(n + 3) div 4"), 1L)
          .when($"rn" === expr("(n + 1) div 2"), 2L)
          .when($"rn" === expr("(3 * n + 3) div 4"), 3L))
      .where($"q".isNotNull)
      .select($"event_type", $"q", $"value".as("q_value"), $"n")
      .orderBy($"event_type", $"q")
  }

  /** Funnel / sequence analytics: per user, did a click follow the
    * FIRST view, and a purchase follow that first qualifying click
    * (strict event-time ordering)? The canonical conversion-funnel
    * query, done in ONE shuffle: three stacked Window operators over
    * the same user_id partitioning (each stage's "first qualifying
    * ts" feeds the next stage's predicate), then the per-user
    * aggregate piggybacks on the window's partitioning — same
    * exchange-reuse trick as [[qSessionize]]. The join-chain
    * formulation (stage tables re-joined on user) would shuffle the
    * event log once per stage.
    */
  def qFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id")
    ev(s, dir)
      .select($"user_id", $"ts", $"event_type")
      .withColumn("first_view",
        min(when($"event_type" === "view", $"ts")).over(w))
      .withColumn("first_click",
        min(when($"event_type" === "click" && $"ts" > $"first_view", $"ts")).over(w))
      .withColumn("first_purchase",
        min(when($"event_type" === "purchase" && $"ts" > $"first_click", $"ts")).over(w))
      .groupBy($"user_id")
      .agg(
        max(when($"first_view".isNotNull, 1L).otherwise(0L)).as("reached_view"),
        max(when($"first_click".isNotNull, 1L).otherwise(0L)).as("reached_click"),
        max(when($"first_purchase".isNotNull, 1L).otherwise(0L)).as("reached_purchase"))
      .orderBy($"user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel" -> (qFunnel _),
    "q_sessionize" -> (qSessionize _),
    "q_histogram" -> (qHistogram _),
    "q_median_value" -> (qMedianValue _),
    "q_group_quartiles" -> (qGroupQuartiles _),
    "q_flatten_project" -> (qFlattenProject _),
    "q_filter_day" -> (qFilterDay _),
    "q_dedup_first_event" -> (qDedupFirstEvent _),
    "q_gold_agg" -> (qGoldAgg _),
    "q_distinct_types" -> (qDistinctTypes _),
    "q_count_events" -> (qCountEvents _),
    "q_event_hour_mix" -> (qEventHourMix _),
    "q_merge_union" -> (qMergeUnion _),
    "q_props_json" -> (qPropsJson _),
    "q_cohort_retention" -> (qCohortRetention _),
    "q_basket_pairs" -> (qBasketPairs _),
    "q_rfm" -> (qRfm _),
    "q_transitions" -> (qTransitions _),
    "q_gap_fill" -> (qGapFill _),
    "q_moving_avg" -> (qMovingAvg _),
    "q_attribution" -> (qAttribution _),
  )

  val oracle: Map[String, String] = Map(
    "q_funnel" ->
      """WITH t1 AS (
        |  SELECT user_id, ts, event_type,
        |    MIN(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id) AS first_view
        |  FROM events),
        |t2 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > first_view THEN ts END)
        |    OVER (PARTITION BY user_id) AS first_click
        |  FROM t1),
        |t3 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > first_click THEN ts END)
        |    OVER (PARTITION BY user_id) AS first_purchase
        |  FROM t2)
        |SELECT user_id,
        |  CAST(MAX(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS reached_view,
        |  CAST(MAX(CASE WHEN first_click IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS reached_click,
        |  CAST(MAX(CASE WHEN first_purchase IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS reached_purchase
        |FROM t3 GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_histogram" ->
      """SELECT event_type, CAST(floor(value / 50.0) AS BIGINT) AS bucket, COUNT(*) AS n
        |FROM events GROUP BY event_type, bucket
        |ORDER BY event_type, bucket""".stripMargin,
    "q_median_value" ->
      """WITH r AS (
        |  SELECT event_type, value, event_id,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM events)
        |SELECT event_type, value AS median_value, CAST(n AS BIGINT) AS n
        |FROM r WHERE rn = (n + 1) // 2
        |ORDER BY event_type""".stripMargin,
    "q_group_quartiles" ->
      """WITH r AS (
        |  SELECT event_type, value, event_id,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM events)
        |SELECT event_type,
        |  CAST(CASE WHEN rn = (n + 3) // 4 THEN 1
        |            WHEN rn = (n + 1) // 2 THEN 2
        |            ELSE 3 END AS BIGINT) AS q,
        |  value AS q_value, n
        |FROM r
        |WHERE rn = (n + 3) // 4 OR rn = (n + 1) // 2 OR rn = (3 * n + 3) // 4
        |ORDER BY event_type, q""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ms(ts) // 1000 AS sec FROM events),
        |f AS (
        |  SELECT user_id, event_id, sec,
        |    CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
        |g AS (
        |  SELECT user_id, sec,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sess_no
        |  FROM f)
        |SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no,
        |  MIN(sec) AS session_start_sec, MAX(sec) AS session_end_sec,
        |  COUNT(*) AS n_events
        |FROM g GROUP BY user_id, sess_no
        |ORDER BY user_id, sess_no""".stripMargin,
    "q_flatten_project" ->
      """SELECT event_id, event_type, user_id, CAST(ts AS DATE) AS day, value * 2.0 AS value2
        |FROM events ORDER BY event_id""".stripMargin,
    "q_filter_day" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_dedup_first_event" ->
      """SELECT user_id, event_type, event_id AS first_event_id FROM (
        |  SELECT user_id, event_type, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |      ORDER BY epoch_ms(ts) // 1000, event_id) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "q_gold_agg" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  MAX(epoch_ms(ts) // 1000) AS last_ts_sec,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_distinct_types" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    "q_count_events" ->
      "SELECT COUNT(*) AS n FROM events",
    "q_event_hour_mix" ->
      """SELECT strftime(ts, '%Y-%m-%d %H') AS hour, COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY hour""".stripMargin,
    "q_merge_union" ->
      """SELECT event_id, event_type, CAST(NULL AS DOUBLE) AS value
        |FROM events WHERE event_id % 3 = 0
        |UNION ALL
        |SELECT event_id, event_type, value FROM events WHERE event_id % 3 <> 0
        |ORDER BY event_id""".stripMargin,
    "q_transitions" ->
      """WITH o AS (
        |  SELECT user_id, event_id, event_type, epoch_ms(ts) // 1000 AS sec
        |  FROM events),
        |l AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY sec, event_id)
        |      AS prev_type
        |  FROM o)
        |SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        |FROM l WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, next_type
        |ORDER BY prev_type, next_type""".stripMargin,
    // last-touch runs under the same whole-second total order as the
    // Spark window (epoch_ms // 1000), so both engines credit the
    // same touch when events share a second
    "q_attribution" ->
      """WITH o AS (
        |  SELECT user_id, event_id, event_type, value,
        |    epoch_ms(ts) // 1000 AS sec
        |  FROM events
        |  WHERE event_type IN ('click', 'view', 'purchase')),
        |t AS (
        |  SELECT event_type, value,
        |    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
        |               IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY sec, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM o)
        |SELECT COALESCE(touch, 'organic') AS touch, COUNT(*) AS purchases,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY touch ORDER BY touch""".stripMargin,
    // fixed-threshold buckets over integer/decimal per-user facts —
    // engine-exact (ntile would tie-break arbitrarily across engines)
    "q_rfm" ->
      """WITH pu AS (
        |  SELECT user_id, MAX(epoch_ms(ts) // 1000) AS last_sec,
        |    COUNT(*) AS f, SUM(CAST(value AS DECIMAL(18,2))) AS m
        |  FROM events GROUP BY user_id),
        |cx AS (SELECT MAX(last_sec) AS corpus_sec, COUNT(*) AS n_users,
        |  SUM(f) AS total_f, SUM(m) AS total_m FROM pu),
        |sc AS (
        |  SELECT
        |    CASE WHEN (corpus_sec - last_sec) // 3600 <= 2 THEN 3
        |         WHEN (corpus_sec - last_sec) // 3600 <= 12 THEN 2 ELSE 1 END AS r_score,
        |    CASE WHEN f * n_users * 2 >= total_f * 3 THEN 3
        |         WHEN f * n_users >= total_f THEN 2 ELSE 1 END AS f_score,
        |    CASE WHEN m * n_users * 2 >= total_m * 3 THEN 3
        |         WHEN m * n_users >= total_m THEN 2 ELSE 1 END AS m_score
        |  FROM pu CROSS JOIN cx)
        |SELECT CAST(r_score AS BIGINT) AS r_score,
        |  CAST(f_score AS BIGINT) AS f_score,
        |  CAST(m_score AS BIGINT) AS m_score, COUNT(*) AS n_users
        |FROM sc GROUP BY r_score, f_score, m_score
        |ORDER BY r_score, f_score, m_score""".stripMargin,
    // integer counts; confidence/lift are ONE IEEE divide quantized
    // to decimal then widened — engine-exact (the DSIR convention)
    "q_basket_pairs" ->
      """WITH basket AS (
        |  SELECT DISTINCT user_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
        |  FROM events
        |  WHERE json_extract_string(props, '$.k') IS NOT NULL),
        |nu AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM basket),
        |ic AS (SELECT item, COUNT(*) AS n_item FROM basket GROUP BY item),
        |p AS (
        |  SELECT a.item AS k1, b.item AS k2, COUNT(*) AS n_pair
        |  FROM basket a JOIN basket b
        |    ON a.user_id = b.user_id AND a.item < b.item
        |  GROUP BY a.item, b.item)
        |SELECT p.k1, p.k2, p.n_pair,
        |  CAST(CAST(CAST(p.n_pair AS DOUBLE) / CAST(c1.n_item AS DOUBLE)
        |       AS DECIMAL(18,8)) AS DOUBLE) AS confidence,
        |  CAST(CAST(CAST(p.n_pair * nu.n_users AS DOUBLE) /
        |            CAST(c1.n_item * c2.n_item AS DOUBLE)
        |       AS DECIMAL(18,8)) AS DOUBLE) AS lift
        |FROM p JOIN ic c1 ON p.k1 = c1.item
        |       JOIN ic c2 ON p.k2 = c2.item
        |       CROSS JOIN nu
        |ORDER BY p.n_pair DESC, p.k1, p.k2 LIMIT 30""".stripMargin,
    "q_cohort_retention" ->
      """WITH d AS (
        |  SELECT user_id, epoch_ms(ts) // 1000 // 86400 AS day FROM events),
        |c AS (
        |  SELECT user_id, day,
        |    MIN(day) OVER (PARTITION BY user_id) AS cohort_day
        |  FROM d),
        |u AS (SELECT DISTINCT cohort_day, day - cohort_day AS day_offset, user_id FROM c)
        |SELECT cohort_day, day_offset, COUNT(*) AS n_users
        |FROM u GROUP BY cohort_day, day_offset
        |ORDER BY cohort_day, day_offset""".stripMargin,
    "q_gap_fill" ->
      """WITH daily AS (
        |  SELECT user_id, epoch_ms(ts) // 1000 // 86400 AS day,
        |    COUNT(*) AS n_events,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS sum_value
        |  FROM events GROUP BY 1, 2),
        |cal AS (
        |  SELECT user_id, unnest(range(MIN(day), MAX(day) + 1)) AS day
        |  FROM daily GROUP BY user_id)
        |SELECT c.user_id, c.day,
        |  COALESCE(d.n_events, 0) AS n_events,
        |  CAST(COALESCE(d.sum_value, 0) AS DOUBLE) AS sum_value
        |FROM cal c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day
        |ORDER BY c.user_id, c.day""".stripMargin,
    "q_moving_avg" ->
      """WITH daily AS (
        |  SELECT user_id, epoch_ms(ts) // 1000 // 86400 AS day,
        |    COUNT(*) AS n_events,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS sum_value
        |  FROM events GROUP BY 1, 2),
        |cal AS (
        |  SELECT user_id, unnest(range(MIN(day), MAX(day) + 1)) AS day
        |  FROM daily GROUP BY user_id),
        |filled AS (
        |  SELECT c.user_id, c.day,
        |    COALESCE(d.n_events, 0) AS n_events,
        |    COALESCE(d.sum_value, 0) AS sum_value
        |  FROM cal c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day)
        |SELECT user_id, day, n_events,
        |  CAST(SUM(n_events) OVER w AS DOUBLE) /
        |    CAST(COUNT(*) OVER w AS DOUBLE) AS mavg_events,
        |  CAST(SUM(sum_value) OVER w AS DOUBLE) /
        |    CAST(COUNT(*) OVER w AS DOUBLE) AS mavg_value
        |FROM filled
        |WINDOW w AS (PARTITION BY user_id ORDER BY day
        |  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, day""".stripMargin,
    "q_props_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY k ORDER BY k""".stripMargin,
  )
}
