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

  test("curation pays a single data shuffle (both window aggregates share it)") {
    val df = Curation.qCuration(spark, dir)
    val (sh, _) = graft.PlanDump.counts(df.queryExecution.executedPlan)
    // fingerprint window + output sort only
    assert(sh <= 2, s"curation grew beyond window+sort shuffles: $sh")
  }
}
