package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class IvfSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("IVF assignment is a total deterministic partition of the vectors") {
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val centroids = IvfIndex.train(emb, "embedding", "vec_id", nCells = 8, dim = 64)
    val assigned = emb.withColumn("cell", IvfIndex.assignCell(col("embedding"), centroids))
    assert(assigned.where(col("cell").isNull).count() == 0)
    assert(assigned.count() == emb.count())
    val again = emb.withColumn("cell", IvfIndex.assignCell(col("embedding"), centroids))
      .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val first = assigned.select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(first == again)
    // multiple cells actually used
    assert(assigned.select("cell").distinct().count() > 1)
  }

  test("IVF top-10 has decent recall vs brute force at nProbe=4/16") {
    val brute = Similarity.qCosineTopK(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ivf = IvfIndex.qAnnIvf(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }
}
