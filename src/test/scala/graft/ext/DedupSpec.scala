package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DedupSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("MinHash-LSH pairs are a subset of exact Jaccard>=0.5 pairs with high recall") {
    val exact = TextAnalysis.qNgramJaccard(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = MinHashDedup.qMinhashPairs(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision is exact by construction (candidates are re-verified)
    assert(lsh.subsetOf(exact))
    // recall: with k=32, b=16, r=2 a j>=0.5 pair is missed w.p. <= (1-0.25)^16 ~ 1%
    if (exact.nonEmpty) assert(lsh.size >= (exact.size * 0.8).toInt, s"recall too low: ${lsh.size}/${exact.size}")
  }

  test("prefix-filtered Jaccard join returns exactly the plain inverted-index result") {
    val plain = TextAnalysis.qNgramJaccard(spark, dir).collect().map(_.toSeq).toSet
    val pref = TextAnalysis.qNgramJaccardPrefix(spark, dir).collect().map(_.toSeq).toSet
    assert(plain.nonEmpty)
    assert(pref == plain)
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
