package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CurationSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q_curation agrees with its standalone stages") {
    val out = Curation.qCuration(spark, dir).cache()
    // (a) every curated doc is its fingerprint group's keeper, and
    //     n_dupes matches q_dedup_exact's group size
    val keepers = TextAnalysis.qDedupExact(spark, dir)
      .collect().map(r => r.getLong(2) -> r.getLong(1)).toMap // keeper -> n_dupes
    out.select("doc_id", "n_dupes").collect().foreach { r =>
      assert(keepers.get(r.getLong(0)).contains(r.getLong(1)),
        s"doc ${r.getLong(0)} not a keeper or wrong dup count")
    }
    // (b) counters match q_text_quality and satisfy the gates
    val quality = TextAnalysis.qTextQuality(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    out.collect().foreach { r =>
      val (nTok, nStop) = quality(r.getLong(0))
      assert(r.getLong(2) == nTok && r.getLong(3) == nStop)
      assert(nTok >= 20 && nTok <= 80 && nStop >= 1)
    }
    // (c) predicted language matches q_lang_id
    val langs = LangTools.qLangId(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.select("doc_id", "lang_pred").collect().foreach { r =>
      assert(langs(r.getLong(0)) == r.getString(1))
    }
    // (d) the gates actually exclude something but not everything
    val total = graft.core.Tables.load(spark, dir, "documents").count()
    assert(out.count() > 0 && out.count() < total)
    out.unpersist()
  }

  test("q_classify covers every scored test doc exactly once and only emits trained classes") {
    import spark.implicits._
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val isTrain = substring(md5($"doc_id".cast("string").cast("binary")), 1, 1) < "8"
    val trainLangs = docs.where(isTrain).select($"lang").distinct()
      .collect().map(_.getString(0)).toSet
    // docs whose tokens all miss the train vocabulary drop out of
    // scoring (documented); everything else must appear exactly once
    val trainVocab = docs.where(isTrain)
      .select(explode(TextAnalysis.tokens($"text")).as("tk"))
      .distinct().collect().map(_.getString(0)).toSet
    val scoredTestDocs = docs.where(!isTrain)
      .select($"doc_id", explode(TextAnalysis.tokens($"text")).as("tk"))
      .where($"tk".isin(trainVocab.toSeq: _*))
      .select($"doc_id").distinct().count()
    val cm = Curation.qClassify(spark, dir).collect()
    assert(cm.map(_.getLong(2)).sum == scoredTestDocs,
      "confusion-matrix mass equals the scored test docs")
    assert(cm.map(_.getString(1)).toSet.subsetOf(trainLangs),
      "predictions only from classes seen in training")
  }

  test("classify separates a corpus whose labels follow the text") {
    import spark.implicits._
    // two token dialects with a shared filler vocabulary: class-pure
    // content words decide, shared words carry no signal. The testdata
    // can't prove this (its lang label is independent of its tokens —
    // see qClassify's scaladoc), so the separability proof runs here.
    val mk = (id: Long, cls: String, content: String) =>
      (id, cls, s"filler common stuff $content $content filler")
    val docs = ((0L until 40L).map { i =>
      if (i % 2 == 0) mk(i, "tech", "kernel compiler tensor")
      else mk(i, "cooking", "butter saffron skillet")
    }).toDF("doc_id", "label", "text")
    val cm = Curation.classify(docs, "label").collect()
    val byLabel = cm.groupBy(_.getString(0))
    assert(byLabel.nonEmpty)
    byLabel.foreach { case (label, rows) =>
      val total = rows.map(_.getLong(2)).sum
      val diag = rows.filter(_.getString(1) == label).map(_.getLong(2)).sum
      assert(diag == total, s"$label: $diag of $total on the diagonal")
    }
    // both classes actually reached evaluation (the md5 split leaves
    // test docs on each side for this id range)
    assert(byLabel.keySet == Set("tech", "cooking"))
  }

  test("classify's weight broadcast is size-gated; the shuffle branch matches") {
    val base = Curation.qClassify(spark, dir).collect().map(_.toSeq).toSet
    assert(base.nonEmpty)
    // force the over-threshold branch: scoring takes the shuffle join
    // (the 100 TB plan) and must produce the identical confusion matrix
    spark.conf.set(Curation.ClassifyBroadcastMaxWeightsKey, "0")
    try {
      val gated = Curation.qClassify(spark, dir).collect().map(_.toSeq).toSet
      assert(gated == base, "over-threshold branch must match the broadcast branch")
    } finally spark.conf.unset(Curation.ClassifyBroadcastMaxWeightsKey)
  }

  test("dsir's weight broadcast is size-gated; the shuffle branch matches") {
    val base = Curation.qDsirWeights(spark, dir).collect().map(_.toSeq).toSet
    assert(base.nonEmpty)
    spark.conf.set(Curation.DsirBroadcastMaxWeightsKey, "0")
    try {
      val gated = Curation.qDsirWeights(spark, dir).collect().map(_.toSeq).toSet
      assert(gated == base, "over-threshold branch must match the broadcast branch")
    } finally spark.conf.unset(Curation.DsirBroadcastMaxWeightsKey)
  }

  test("curation pays a single data shuffle (both window aggregates share it)") {
    val df = Curation.qCuration(spark, dir)
    val (sh, _) = graft.PlanDump.counts(df.queryExecution.executedPlan)
    // fingerprint window + output sort only
    assert(sh <= 2, s"curation grew beyond window+sort shuffles: $sh")
  }
}
