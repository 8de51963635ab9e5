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

  test("q_lm_quality: smoothed bigram LM semantics hold on a hand corpus") {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val out = Curation.qLmQuality(spark, dir).cache()
    // (a) coverage: exactly the test-half docs with >= 2 tokens
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val expected = docs
      .where(substring(md5($"doc_id".cast("string").cast("binary")), 1, 1) >= "8")
      .where(size(TextAnalysis.tokens($"text")) >= 2)
      .count()
    assert(out.count() == expected, "every scored doc appears exactly once")
    // (b) scores are valid smoothed means: 0 < score < 1, and a doc of
    //     n tokens has n-1 bigrams
    val nTok = docs
      .select($"doc_id", size(TextAnalysis.tokens($"text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.collect().foreach { r =>
      val score = r.getDouble(2)
      assert(score > 0.0 && score < 1.0, s"doc ${r.getLong(0)}: score $score")
      assert(r.getLong(1) == nTok(r.getLong(0)) - 1, "n_bigrams = n_tokens - 1")
    }
    // (c) the above-average flag splits the corpus non-trivially and
    //     agrees with the recomputed corpus mean
    val rows = out.collect()
    val above = rows.filter(_.getLong(3) == 1L)
    assert(above.nonEmpty && above.length < rows.length, "flag is non-trivial")
    out.unpersist()
    // (d) semantics on a hand corpus: train = "a b a b", "a c"; the
    //     model is c(a,b)=2, c(b,a)=1, c(a,c)=1; contexts c(a)=3,
    //     c(b)=1; V=2. A fluent test doc "a b" must outscore a
    //     disfluent "b c" (unseen bigram under a seen context) and an
    //     out-of-vocabulary "x y" (unseen context backoff 1/V).
    //     doc_ids picked so the md5 split puts 6, 9 in train and
    //     1, 2, 3 in test (first hex of md5("6")='1', md5("9")='4';
    //     md5("1"/"2"/"3") = 'c'/'c'/'e') — asserted, not assumed.
    val hand = Seq(
      (6L, "a b a b"), (9L, "a c"), // intended train
      (1L, "a b"), (2L, "b c"), (3L, "x y")).toDF("doc_id", "text")
    val split = hand.select($"doc_id",
      (substring(md5($"doc_id".cast("string").cast("binary")), 1, 1) < "8")
        .as("is_train")).collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(split(6L) && split(9L) && !split(1L) && !split(2L) && !split(3L),
      s"md5 split moved: $split")
    // run the same pipeline against the hand corpus via a temp dir
    val tmp = java.nio.file.Files.createTempDirectory("lmq").toString
    hand.withColumn("source", lit("src0")).withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val scores = Curation.qLmQuality(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // exact expected weights: w(a,b)=(2+1)/(3+2)=0.6; w(b,c)=(0+1)/(1+2)
    //  =0.33333333 (quantized); w(x,y)=1/2=0.5
    assert(math.abs(scores(1L) - 0.6) < 1e-9)
    assert(math.abs(scores(2L) - 0.33333333) < 1e-9)
    assert(math.abs(scores(3L) - 0.5) < 1e-9)
    assert(scores(1L) > scores(2L), "fluent doc outscores disfluent doc")
  }

  test("q_lm_quality's model broadcast is size-gated; the shuffle branch matches") {
    val base = Curation.qLmQuality(spark, dir).collect().map(_.toSeq).toSet
    val baseBuckets = Curation.qLmBuckets(spark, dir).collect().map(_.toSeq).toSet
    assert(base.nonEmpty && baseBuckets.nonEmpty)
    spark.conf.set(Curation.LmBroadcastMaxWeightsKey, "0")
    try {
      val gated = Curation.qLmQuality(spark, dir).collect().map(_.toSeq).toSet
      assert(gated == base, "over-threshold branch must match the broadcast branch")
      val gatedBuckets = Curation.qLmBuckets(spark, dir).collect().map(_.toSeq).toSet
      assert(gatedBuckets == baseBuckets,
        "q_lm_buckets must hash-match on the shuffle branch too")
    } finally spark.conf.unset(Curation.LmBroadcastMaxWeightsKey)
  }

  test("q_gopher_repetition: each planted repetition class trips its own rule; clean docs pass") {
    val rows = Curation.qGopherRepetition(spark, dir).collect()
    assert(rows.nonEmpty)
    var (dup, chars, bigram, clean) = (0, 0, 0, 0)
    rows.foreach { r =>
      val d = r.getLong(0)
      // own-rule trips on PURE classes (composed classes pile noise
      // into each other's ratio denominators — the oracle mirrors
      // whatever happens there; this pins each intended trigger)
      val (m5, m7, m11) = (d % 5 == 0, d % 7 == 0, d % 11 == 0)
      if (m5 && !m7 && !m11) { assert(r.getAs[Long]("r_dup_lines") == 1L, s"doc $d"); dup += 1 }
      if (m7 && !m5 && !m11) { assert(r.getAs[Long]("r_dup_line_chars") == 1L, s"doc $d"); chars += 1 }
      if (m11 && !m5 && !m7) { assert(r.getAs[Long]("r_top_bigram") == 1L, s"doc $d"); bigram += 1 }
      if (!m5 && !m7 && !m11) {
        assert(r.getAs[Long]("passes") == 1L,
          s"clean doc $d rejected: ${r.mkString(",")}")
        clean += 1
      }
    }
    assert(dup > 0 && chars > 0 && bigram > 0 && clean > 0,
      s"every class must occur: $dup/$chars/$bigram/$clean")
  }

  test("topBigramMass map-side run-walk equals the keyed-aggregate reference") {
    import spark.implicits._
    // the optimization that made the bigram rule map-side must be
    // value-exact against the (doc_id, bigram) groupBy form it replaced
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        TextAnalysis.tokens(regexp_replace(col("text"), "\n", " ")).as("ws"))
    val mapSide = docs
      .select(col("doc_id"), Curation.topBigramMass(col("ws")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bigrams = when(size(col("ws")) >= 2,
      zip_with(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    val keyed = docs.select(col("doc_id"), explode(bigrams).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= 2)
      .groupBy(col("doc_id"))
      .agg(max(col("cnt") * length(col("bg")).cast("long")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mapSide.nonEmpty)
    mapSide.foreach { case (d, m) =>
      assert(m == keyed.getOrElse(d, 0L), s"doc $d: map-side $m != keyed ${keyed.get(d)}")
    }
    // and on a crafted edge row: ties, singleton runs, empty arrays
    val edge = Seq(
      (1L, "a b a b a b"),        // "a b"×3 (mass 9), "b a"×2 (mass 6)
      (2L, "x y z"),              // no repeats -> 0
      (3L, ""),                   // no tokens -> 0
      (4L, "w w w w")             // "w w"×3 -> 9
    ).toDF("doc_id", "text")
      .select(col("doc_id"), Curation.topBigramMass(
        TextAnalysis.tokens(col("text"))).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(edge == Map(1L -> 9L, 2L -> 0L, 3L -> 0L, 4L -> 9L), edge.toString)
  }

  test("q_gopher_rules: each planted noise class trips exactly its own rule") {
    val rows = Curation.qGopherRules(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (id, r) =>
      val (nSym, nLines, nBul, nEll) = (
        r.getAs[Long]("n_symbol_words"), r.getAs[Long]("n_lines"),
        r.getAs[Long]("n_bullet_lines"), r.getAs[Long]("n_ellipsis_lines"))
      // symbol words appear iff planted
      assert((nSym == 3L) == (id % 5 == 0), s"doc $id nSym=$nSym")
      // bullet lines appear iff planted, and trip the <1/2 rule
      assert((nBul == 3L) == (id % 7 == 0), s"doc $id nBul=$nBul")
      // ellipsis lines appear iff planted
      assert((nEll == 2L) == (id % 11 == 0), s"doc $id nEll=$nEll")
      // unplanted docs are a single clean line
      if (id % 5 != 0 && id % 7 != 0 && id % 11 != 0)
        assert(nLines == 1L, s"doc $id nLines=$nLines")
      // the conjunction is exactly the integer cross-multiplied flags
      // (recomputed here in Scala — a third engine for the flag math)
      val (nW, sumL, nStop, passes) = (r.getAs[Long]("n_words"),
        r.getAs[Long]("sum_word_len"), r.getAs[Long]("n_stopwords"),
        r.getAs[Long]("passes"))
      val expected = nW >= 20L && nW <= 100000L &&
        sumL >= 3L * nW && sumL <= 10L * nW &&
        10L * nSym <= nW && 2L * nBul < nLines &&
        10L * nEll <= 3L * nLines && nStop >= 1L
      assert((passes == 1L) == expected, s"doc $id flags")
      // the structural rules ALWAYS trip their planted class (bullets:
      // 2·3 ≥ L ≤ 6; ellipses: 20 > 3·L ≤ 18); the symbol rule trips
      // exactly the short docs (10·3 > n_words)
      if (id % 7 == 0 || id % 11 == 0) assert(passes == 0L, s"doc $id")
    }
    // the filter is discriminating, not degenerate
    assert(rows.values.count(_.getAs[Long]("passes") == 1L) > 0)
    assert(rows.exists { case (id, r) =>
      id % 5 == 0 && id % 7 != 0 && id % 11 != 0 && r.getAs[Long]("passes") == 0L &&
        r.getAs[Long]("n_words") < 30L },
      "no short symbol-planted doc tripped the symbol rule")
  }

  test("q_lm_buckets: banded rank equals the naive per-language tercile") {
    val out = Curation.qLmBuckets(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(3), r.getString(4)))
    assert(out.nonEmpty)
    // the scored population is exactly q_lm_quality's held-out docs
    val scores = Curation.qLmQuality(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.map(_._1).toSet == scores.keySet)
    out.foreach { case (id, (_, sc, _)) => assert(sc == scores(id)) }
    // recompute the naive rank on the driver: sort each language by
    // (score desc, doc_id), cut at 3·rank ≤ n and 3·rank ≤ 2n —
    // banding must change nothing
    out.groupBy(_._2._1).foreach { case (_, docs) =>
      val sorted = docs.sortBy { case (id, (_, sc, _)) => (-sc, id) }
      val n = sorted.length
      sorted.zipWithIndex.foreach { case ((id, (_, _, bucket)), i) =>
        val rk = i + 1L
        val expect = if (rk * 3 <= n) "head"
          else if (rk * 3 <= 2L * n) "middle" else "tail"
        assert(bucket == expect, s"doc $id rank $rk/$n: $bucket != $expect")
      }
      // tercile masses: head = ⌊n/3⌋, tail = n − ⌊2n/3⌋
      val byBucket = docs.groupBy(_._2._3).view.mapValues(_.length).toMap
      assert(byBucket.getOrElse("head", 0) == n / 3)
      assert(byBucket.getOrElse("tail", 0) == n - 2 * n / 3)
    }
  }

  test("q_mix_temperature: α=0.5 shares flatten the mix toward small sources") {
    val rows = Curation.qMixTemperature(spark, dir).collect()
    assert(rows.length > 1, "needs at least two sources to mix")
    val tempSum = rows.map(_.getDouble(4)).sum
    val rawSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(tempSum - 1.0) < 1e-9 && math.abs(rawSum - 1.0) < 1e-9)
    // temperature scaling upsamples below-average sources, downsamples
    // above-average ones: upsample factor > 1 iff raw share < temp share
    rows.foreach { r =>
      val (raw, temp, up) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(math.abs(up - temp / raw) < 1e-12)
      if (raw < temp) assert(up > 1.0) else if (raw > temp) assert(up < 1.0)
    }
    // sqrt-compression: the byte masses are non-uniform at every SF
    // (asserted, so the shrink check below can never go vacuous) and
    // the max/min share ratio strictly shrinks under the temperature
    val rawShares = rows.map(_.getDouble(3))
    val tempShares = rows.map(_.getDouble(4))
    assert(rawShares.max - rawShares.min > 1e-12, "testdata masses are non-uniform")
    assert(tempShares.max / tempShares.min < rawShares.max / rawShares.min)
  }

  test("curation pays a single data shuffle (both window aggregates share it)") {
    val df = Curation.qCuration(spark, dir)
    val (sh, _) = graft.PlanDump.counts(df.queryExecution.executedPlan)
    // fingerprint window + output sort only
    assert(sh <= 2, s"curation grew beyond window+sort shuffles: $sh")
  }
}
