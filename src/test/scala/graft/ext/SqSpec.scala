package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SqSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("SQ8 codes are bytes in [0,255], deterministic, and the query encoder matches the column encoder") {
    import spark.implicits._
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val (mins, scales) = SqIndex.trainedParams(emb, dir)
    assert(mins.length == 64 && scales.length == 64)
    val codes = emb.select($"vec_id", SqIndex.encodeExpr($"embedding", mins, scales).as("code"))
    val c1 = codes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(c1.values.forall(c => c.length == 64 && c.forall(x => x >= 0 && x <= 255)))
    assert(c1 == codes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap)
    // the driver-side encoder is the bit-identical twin of the column
    // expression — a query vector must land on the same codes its
    // stored copy got
    val vecs = emb.select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    vecs.foreach { case (id, v) =>
      assert(SqIndex.encode(v, mins, scales).toSeq == c1(id),
        s"driver/column encoder mismatch for vec $id")
    }
  }

  test("exact-mode SQ8 registry entry EQUALS the brute-force quantized-cosine top-10") {
    val exact = Similarity.qCosineTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val sq = SqIndex.qAnnSq8(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sq == exact, s"full-shortlist SQ8 diverged from exact:\n$sq\nvs\n$exact")
  }

  test("tight-shortlist SQ8 keeps usable recall vs exact top-10") {
    val exact = Similarity.qCosineTopK(spark, dir).collect().map(_.getLong(0)).toSet
    val sq = SqIndex.annSq(spark, dir, shortlistN = 30)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(sq.size == 10)
    val recall = (exact intersect sq).size.toDouble / exact.size
    // deterministic: 8-bit reconstruction error is tiny relative to
    // the cosine gaps of isotropic random vectors, so a 30-deep
    // shortlist recovers most of the true top-10
    assert(recall >= 0.7, s"SQ8 recall too low: $recall")
  }
}
