package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DedupSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("MinHash-LSH output EQUALS the exact Jaccard>=0.5 pair set (recall 1.0) at both gate SFs") {
    // precision is exact by construction (candidates are re-verified);
    // recall 1.0 on this corpus is what licenses the shared DuckDB
    // oracle (a j>=0.5 pair escapes b=16,r=2 w.p. <= (1-0.25)^16 ~ 1%
    // per pair — zero escapes here, and the pipeline is deterministic,
    // so equality observed at these SFs holds at the driver's gate too)
    for (d <- Seq(dir, "/root/testdata/sf0.01")) {
      val exact = TextAnalysis.qNgramJaccard(spark, d).collect().map(_.toSeq).toSet
      val lsh = MinHashDedup.qMinhashPairs(spark, d).collect().map(_.toSeq).toSet
      assert(exact.nonEmpty)
      assert(lsh == exact, s"LSH vs exact diverged at $d: ${lsh.size} vs ${exact.size} pairs")
    }
  }

  test("SimHash banded pairs EQUAL the all-pairs hamming<=3 filter (structural recall)") {
    import spark.implicits._
    for (d <- Seq(dir, "/root/testdata/sf0.01")) {
      val fp = MinHashDedup.simhash(graft.core.Tables.load(spark, d, "documents"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
      val brute = (for {
        (a, fa) <- fp; (b, fb) <- fp if a < b
        h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
      } yield Seq(a, b, h.toLong)).toSet
      val banded = MinHashDedup.qSimhashPairs(spark, d).collect().map(_.toSeq).toSet
      assert(banded == brute, s"banded vs brute diverged at $d: ${banded.size} vs ${brute.size}")
    }
  }

  test("prefix-filtered Jaccard join returns exactly the plain inverted-index result") {
    val plain = TextAnalysis.qNgramJaccard(spark, dir).collect().map(_.toSeq).toSet
    val pref = TextAnalysis.qNgramJaccardPrefix(spark, dir).collect().map(_.toSeq).toSet
    assert(plain.nonEmpty)
    assert(pref == plain)
    // over the broadcast gate: the shuffle-join branch (the 100 TB
    // plan) must produce the identical pair set
    // the gate drops the planner-forced broadcast HINT above the
    // bound (the planner/AQE may still pick broadcast for a genuinely
    // small side from its own estimates — the gate removes the FORCE)
    def hintCount(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }.size
    val hinted = hintCount(TextAnalysis.qNgramJaccardPrefix(spark, dir))
    spark.conf.set(TextAnalysis.PrefixBroadcastMaxRefsKey, "0")
    try {
      val shuffled = TextAnalysis.qNgramJaccardPrefix(spark, dir)
      assert(hintCount(shuffled) < hinted,
        "gate must drop the dfreq broadcast hint above the bound")
      assert(shuffled.collect().map(_.toSeq).toSet == plain,
        "the over-threshold (shuffle-join) branch must match")
    } finally spark.conf.unset(TextAnalysis.PrefixBroadcastMaxRefsKey)
  }

  test("a pathological all-identical corpus trips the LSH bucket cap: stars, not cliques") {
    import spark.implicits._
    val n = 200
    val docs = (0L until n.toLong)
      .map(i => (i, "the same boilerplate license header text repeated verbatim " +
        "across every file of the corpus word for word sixteen tokens and more"))
      .toDF("doc_id", "text")
    spark.conf.set(MinHashDedup.MaxBucketKey, "8")
    try {
      val ds = MinHashDedup.shingleSets(docs)
      val sig = MinHashDedup.signatures(ds, k = 32)
      val cand = MinHashDedup.candidatePairs(sig, bands = 16, rowsPerBand = 2)
      val verified = MinHashDedup.verifiedPairs(ds, cand)
      val pairs = verified.collect().map(r => (r.getLong(0), r.getLong(1)))
      // star, not clique: O(n) pairs instead of n(n-1)/2 ≈ 20k — and
      // every doc still reachable from doc 0 for component dedup
      assert(pairs.length == n - 1, s"expected ${n - 1} star pairs, got ${pairs.length}")
      assert(pairs.forall(_._1 == 0L) && pairs.map(_._2).toSet == (1L until n.toLong).toSet)
      // the cap is accounted loudly via observed metrics
      val m = verified.queryExecution.observedMetrics("minhash_lsh")
      assert(m.getAs[Long]("capped_buckets") == 16L, m.toString)
      assert(m.getAs[Int]("max_bucket") == n, m.toString)
      assert(m.getAs[Long]("truncated_pairs") == 16L * (n.toLong * (n - 1) / 2 - (n - 1)),
        m.toString)

      // the SimHash chunk buckets and dup-span windows cap identically
      // (identical fingerprints / shared spans are the same pathology)
      val d = tmpDir("lsh-cap-docs")
      docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
      val sp = MinHashDedup.qSimhashPairs(spark, d)
      val spRows = sp.collect()
      assert(spRows.length == n - 1, s"simhash star pairs: ${spRows.length}")
      assert(spRows.forall(_.getLong(2) == 0L), "identical docs: hamming 0")
      val sm = sp.queryExecution.observedMetrics("simhash_lsh")
      assert(sm.getAs[Long]("capped_buckets") == 4L, sm.toString)
      val ds0 = TextAnalysis.qDupSpans(spark, d)
      assert(ds0.collect().length == n - 1, "dup-span star pairs")
      assert(ds0.queryExecution.observedMetrics("dupspan_buckets")
        .getAs[Long]("capped_buckets") > 0L)
    } finally spark.conf.unset(MinHashDedup.MaxBucketKey)
  }

  test("paragraph dedup drops exactly the cross-doc duplicated blocks") {
    import spark.implicits._
    val boiler = "this license header is identical across both documents here" // 10 tokens
    val pad8 = "one two three four five six" // pads to block alignment
    val docs = Seq(
      // docs 1 and 2 share their FIRST 8-token block verbatim; the
      // second block of each differs
      (1L, s"$boiler unique tail of doc one a b"),
      (2L, s"$boiler different ending for doc two x y"),
      // doc 3 shares nothing 8-aligned: 15 tokens = 1 full block + a
      // partial tail outside the contract
      (3L, s"completely unrelated content with its own words $pad8 seven eight")
    ).toDF("doc_id", "text")
    val d = tmpDir("para-dedup")
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = TextAnalysis.qParagraphDedup(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 1L, 0L)),
      s"exactly the shared first block drops: $out")
  }

  test("SimHash: identical docs collide with hamming 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words about spark query engines and shuffles")
    ).toDF("doc_id", "text")
    val fp = MinHashDedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("winnowing fingerprints are deterministic and position-robust") {
    import spark.implicits._
    val a = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    // same content with a prefix shifted in — most fingerprints survive
    val b = Seq((2L, "prefix alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    // fp is a 16-byte binary digest; compare as hex so Set equality is by value
    def hexSet(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select("fp").collect()
        .map(_.getAs[Array[Byte]](0).map("%02x".format(_)).mkString).toSet
    val fa = hexSet(LangTools.winnowFingerprints(a))
    val fb = hexSet(LangTools.winnowFingerprints(b))
    assert(fa.nonEmpty)
    assert((fa intersect fb).size >= fa.size / 2)
  }
}
