package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.codec.AvroBinary
import graft.schema.ProductSchemas

class FunctionsSpec extends SparkTestBase {

  test("CosineSimilarity matches the fold-based formulation bit-for-bit") {
    import spark.implicits._
    val df = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = df.limit(1).select($"embedding".as("qvec"))
    val both = df.crossJoin(broadcast(q))
      .select(
        CosineSimilarity($"embedding", $"qvec").as("native"),
        (aggregate(zip_with($"embedding", $"qvec",
            (x, y) => x.cast("double") * y.cast("double")), lit(0.0d), (a, v) => a + v) /
          (sqrt(aggregate(zip_with($"embedding", $"embedding",
            (x, y) => x.cast("double") * y.cast("double")), lit(0.0d), (a, v) => a + v)) *
           sqrt(aggregate(zip_with($"qvec", $"qvec",
            (x, y) => x.cast("double") * y.cast("double")), lit(0.0d), (a, v) => a + v))))
          .as("folded"))
    assert(both.where($"native" =!= $"folded").count() == 0)
  }

  test("CosineSimilarity basic values and null handling") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 1.0f), Array(-1.0f, -1.0f))
    ).toDF("a", "b")
    val out = df.select(CosineSimilarity($"a", $"b").as("c")).collect().map(_.getDouble(0))
    assert(math.abs(out(0) - 1.0) < 1e-12)
    assert(math.abs(out(1)) < 1e-12)
    assert(math.abs(out(2) + 1.0) < 1e-12)
    val withNull = df.select(CosineSimilarity(lit(null).cast("array<float>"), $"b").as("c"))
    assert(withNull.collect().forall(_.isNullAt(0)))
  }

  test("graft_cosine and graft_from_avro callable from SQL after registerAll") {
    GraftFunctions.registerAll(spark)
    val c = spark.sql(
      "SELECT graft_cosine(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(1.0 as float), cast(2.0 as float))) AS c").first().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)

    import spark.implicits._
    val rec = new org.apache.avro.generic.GenericData.Record(ProductSchemas.v1)
    rec.put("productId", "p"); rec.put("eventId", "e")
    rec.put("type", "shirt"); rec.put("timestamp", 1L)
    val payload = AvroBinary.encode(rec, ProductSchemas.v1)
    val json = ProductSchemas.v1Json.replace("'", "")
    val row = Seq(payload).toDF("payload")
      .selectExpr(s"graft_from_avro(payload, '$json').type AS t").first()
    assert(row.getString(0) == "shirt")
  }

  test("graft_shingle_hashes and graft_simhash callable from SQL") {
    GraftFunctions.registerAll(spark)
    val n = spark.sql(
      "SELECT size(graft_shingle_hashes(array('a','b','c','a','b','c'), 3)) AS n")
      .first().getInt(0)
    assert(n == 3) // 4 windows, 3 distinct shingles: abc, bca, cab
    val fp = spark.sql(
      "SELECT graft_simhash(array(struct(1234567890123456789L AS th, 2L AS tf))) AS fp")
      .first().getLong(0)
    assert(fp == 1234567890123456789L) // single positive-weight hash -> its own bits
  }

  test("graft_shingle_hashes accepts BIGINT/foldable w, rejects non-foldable") {
    GraftFunctions.registerAll(spark)
    // BIGINT literal (3L) and a foldable cast both resolve to w=3
    val viaLong = spark.sql(
      "SELECT size(graft_shingle_hashes(array('a','b','c','a','b','c'), 3L)) AS n")
      .first().getInt(0)
    assert(viaLong == 3)
    val viaCast = spark.sql(
      "SELECT size(graft_shingle_hashes(array('a','b','c','a','b','c'), CAST(3 AS BIGINT))) AS n")
      .first().getInt(0)
    assert(viaCast == 3)
    // a non-foldable w fails at analysis time with a typed message
    val err = intercept[Exception] {
      spark.sql("SELECT graft_shingle_hashes(array('a'), length('xyz') + rand()::int) AS x")
        .first()
    }
    assert(err.getMessage.contains("foldable") || err.getMessage.contains("integral"))
  }

  test("PairExpand emits all ordered pairs, matching the HOF allPairs form") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(Seq(3L, 7L, 9L, 12L), Seq(1L, 2L), Seq(5L), Seq.empty[Long])
      .toDF("xs")
    val got = df.select(PairExpand($"xs").as("ps"))
      .select(explode($"ps").as("p")).select($"p.a", $"p.b")
      .as[(Long, Long)].collect().toSet
    val expected = Seq(Seq(3L, 7L, 9L, 12L), Seq(1L, 2L)).flatMap(xs =>
      for (i <- xs.indices; j <- i + 1 until xs.size) yield (xs(i), xs(j))).toSet
    assert(got == expected)
    // equivalence with the interpreted HOF form it replaces
    val viaHof = df.select(explode(graft.ext.TextAnalysis.allPairs(
        transform($"xs", x => struct(x.as("a"), x.as("b"))))).as("p"))
      .select($"p.a.a", $"p.b.a").as[(Long, Long)].collect().toSet
    assert(got == viaHof)
  }

  test("NearestCell rejects dimension-mismatched vectors in both directions") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val cs = Array(Array(0.0, 0.0), Array(1.0, 1.0))
    def arr(xs: Float*) = ArrayData.toArrayData(xs.toArray)
    assert(NearestCell.compute(arr(0.1f, 0.1f), cs) == 0)
    assert(NearestCell.compute(arr(0.9f, 0.9f), cs) == 1)
    assert(NearestCell.compute(arr(0.1f), cs) == -1)             // too short
    assert(NearestCell.compute(arr(0.1f, 0.1f, 0.1f), cs) == -1) // too long
  }

  test("CentroidAggregator computes per-label centroids under shuffle") {
    import spark.implicits._
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"label", $"embedding").as[(Int, Array[Float])]
    val agg = new CentroidAggregator(64).toColumn
    val result = emb.groupByKey(_._1).mapValues(_._2).agg(agg).collect().toMap

    // independent oracle: the integer-scaled centroid query
    val expected = graft.ext.Similarity.qEmbeddingCentroid(spark, "/root/testdata/sf0.001")
      .collect()
      .groupBy(_.getAs[Int]("label"))
      .view.mapValues(_.sortBy(_.getAs[Long]("dim"))
        .map(r => r.getAs[Long]("sum_scaled").toDouble / 1048576.0 / r.getAs[Long]("n")))
      .toMap
    for ((label, centroid) <- result) {
      val exp = expected(label)
      centroid.zip(exp).foreach { case (a, b) => assert(math.abs(a - b) < 1e-4) }
    }
  }
}
