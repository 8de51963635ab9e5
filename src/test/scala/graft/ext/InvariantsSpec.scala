package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.{EventTime, Tables}

/** Spark-level invariance properties (SURVEY.md §5.2): dedup
  * idempotence, aggregation invariance under partitioning/row order.
  */
class InvariantsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("dedup is idempotent: dedup(xs ++ xs) == dedup(xs)") {
    val ev = Tables.load(spark, dir, "events")
    val once = ev.dropDuplicates("user_id", "event_type")
    val doubled = ev.unionAll(ev).dropDuplicates("user_id", "event_type")
    assert(once.count() == doubled.count())
    val a = once.select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val b = doubled.select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
  }

  test("aggregation results are invariant under repartition/row order") {
    val base = EventQueries.qGoldAgg(spark, dir).collect().map(_.toSeq).toSeq
    Seq(1, 7, 64).foreach { n =>
      val ev = Tables.load(spark, dir, "events").repartition(n)
      ev.createOrReplaceTempView("events_shuffled")
      // recompute the same aggregate over the shuffled layout
      val again = ev
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          max(EventTime.sec(ev)).as("last_ts_sec"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .orderBy(col("event_type"))
        .collect().map(_.toSeq).toSeq
      assert(again == base, s"mismatch at repartition($n)")
    }
  }

  test("unionByName is order-insensitive on the merged schema") {
    val ev = Tables.load(spark, dir, "events")
    val v1 = ev.select(col("event_id"), col("event_type"))
    val v2 = ev.select(col("event_id"), col("event_type"), col("value"))
    val ab = v1.unionByName(v2, allowMissingColumns = true)
    val ba = v2.unionByName(v1, allowMissingColumns = true)
    assert(ab.columns.sorted.sameElements(ba.columns.sorted))
    assert(ab.count() == ba.count())
    assert(ab.where(col("value").isNull).count() == ba.where(col("value").isNull).count())
  }

  test("token packing is a partition of each source's token stream") {
    val rows = TextAnalysis.qTokenPacking(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // per source: pack ids are non-decreasing, and the total token
    // count of packs 0..p-1 is exactly p * budget at every boundary
    // crossing (offset packing never leaves gaps or overlaps)
    rows.groupBy(_._1).foreach { case (_, docs) =>
      var cum = 0L
      var lastPack = 0L
      docs.foreach { case (_, n, pack, spans) =>
        assert(pack >= lastPack)
        assert(pack == cum / 256, s"pack $pack != offset ${cum}/256")
        assert((spans == 1) == ((cum + n - 1) / 256 != pack))
        cum += n
        lastPack = pack
      }
    }
  }

  test("source-mix sampling hits its weight tiers and keeps full-weight sources intact") {
    val out = TextAnalysis.qSourceMix(spark, dir).cache()
    val total = Tables.load(spark, dir, "documents")
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = out.groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def idx(src: String) = src.drop(3).toInt
    // tier 1.0: every doc of src0..src4 survives
    total.keys.filter(idx(_) < 5).foreach(srcName =>
      assert(kept.getOrElse(srcName, 0L) == total(srcName), s"$srcName lost docs at weight 1.0"))
    // tier 0.5 / 0.25: aggregate keep-rate near the weight (hash-rate
    // filter is binomial; bounds are generous for 25-doc sources)
    def rate(p: String => Boolean): Double = {
      val t = total.filter { case (k, _) => p(k) }.values.sum
      val k = kept.filter { case (k2, _) => p(k2) }.values.sum
      k.toDouble / t
    }
    val half = rate(s => idx(s) >= 5 && idx(s) < 10)
    val quarter = rate(s => idx(s) >= 10)
    assert(half > 0.3 && half < 0.7, s"0.5-tier keep rate $half")
    assert(quarter > 0.1 && quarter < 0.4, s"0.25-tier keep rate $quarter")
    out.unpersist()
  }

  test("doc chunks cover every token with the configured overlap") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .where(col("n") >= 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunks = TextAnalysis.qDocChunks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(chunks.keySet == docs.keySet)
    chunks.foreach { case (docId, cs) =>
      val n = docs(docId)
      // chunk count and lengths follow from n alone
      assert(cs.length == (n - 1) / 16 + 1)
      cs.sortBy(_._2).foreach { case (_, k, len) =>
        assert(len == math.min(32L, n - k * 16), s"doc $docId chunk $k")
      }
    }
  }

  test("gap-fill densifies every user's span exactly, zero-filling only eventless days") {
    val out = EventQueries.qGapFill(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val ev = Tables.load(spark, dir, "events")
    val days = ev.select(col("user_id"), EventTime.sec(ev).as("sec"))
      .select(col("user_id"), expr("sec div 86400").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byUser = days.groupBy(_._1)
    // per user: exactly (max-min+1) contiguous rows, no more or fewer
    out.groupBy(_._1).foreach { case (u, rows) =>
      val uDays = byUser(u).map(_._2)
      val (d0, d1) = (uDays.min, uDays.max)
      assert(rows.length == (d1 - d0 + 1).toInt, s"user $u span not dense")
      assert(rows.map(_._2).sorted.toSeq == (d0 to d1).toSeq)
    }
    // zero rows are exactly the days the user had no events
    val eventDays = days.toSet
    out.foreach { case (u, d, n, sv) =>
      if (n == 0L) {
        assert(!eventDays((u, d)), s"user $u day $d zero-filled but has events")
        assert(sv == 0.0)
      } else assert(eventDays((u, d)))
    }
    // total event mass is conserved
    assert(out.map(_._3).sum == ev.count())
  }

  test("encode-ids round-trips: decoding through the vocab reproduces every in-vocab token") {
    val enc = TextAnalysis.qEncodeIds(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val vocab = TextAnalysis.qVocab(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty)).toMap
    // every token position appears exactly once (mass conservation)
    assert(enc.length == docs.values.map(_.length).sum)
    val terms = vocab.values.toSet
    enc.foreach { case (doc, pos, id) =>
      val tok = docs(doc)(pos.toInt)
      if (id >= 0) assert(vocab(id) == tok, s"doc $doc pos $pos decodes wrong")
      else assert(!terms(tok), s"in-vocab token $tok got UNK")
    }
    // UNK appears iff the corpus actually has sub-cutoff terms (it
    // does at sf0.01+; the sf0.001 synthetic vocab can be all-common)
    val counts = docs.values.flatten.groupBy(identity).map(_._2.size)
    assert(enc.exists(_._3 == -1L) == counts.exists(_ < 10))
    assert(enc.exists(_._3 >= 0L))
  }

  test("qVocab enforces the vocabulary bound loudly and is unchanged under a passing bound") {
    val dir = "/root/testdata/sf0.001"
    val base = TextAnalysis.qVocab(spark, dir).collect()
    assert(base.nonEmpty)
    // a bound the corpus fits under changes nothing
    spark.conf.set(TextAnalysis.VocabMaxKey, (base.length + 10).toString)
    try {
      val bounded = TextAnalysis.qVocab(spark, dir).collect()
      assert(bounded.toSeq.map(_.toString) == base.toSeq.map(_.toString))
      // a bound the corpus exceeds fails loudly BEFORE the window
      spark.conf.set(TextAnalysis.VocabMaxKey, (base.length - 1).toString)
      val e = intercept[IllegalStateException] { TextAnalysis.qVocab(spark, dir) }
      assert(e.getMessage.contains(TextAnalysis.VocabMaxKey))
    } finally spark.conf.unset(TextAnalysis.VocabMaxKey)
  }
}
