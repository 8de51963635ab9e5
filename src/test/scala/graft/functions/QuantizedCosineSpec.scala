package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class QuantizedCosineSpec extends SparkTestBase {

  test("QuantizedCosine matches the scala reference recipe bit-for-bit") {
    import spark.implicits._
    val rows = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val q = rows.find(_._1 == 0L).get._2

    def ref(a: Array[Float], b: Array[Float]): Long = {
      var dot = 0L; var na = 0L; var nb = 0L
      a.indices.foreach { i =>
        val x = math.floor(a(i).toDouble * 1048576.0).toLong
        val y = math.floor(b(i).toDouble * 1048576.0).toLong
        dot += x * y; na += x * x; nb += y * y
      }
      if (na == 0L || nb == 0L) 0L
      else math.floor(dot.toDouble / math.sqrt(na.toDouble * nb.toDouble) * 10000.0).toLong
    }

    val df = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qdf = df.filter($"vec_id" === 0).select($"embedding".as("qvec"))
    val got = df.join(broadcast(qdf))
      .select($"vec_id", QuantizedCosine($"embedding", $"qvec").as("cosq"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, v) => assert(got(id) == ref(v, q), s"vec $id") }
    // self-similarity lands at the top of the quantized scale
    assert(got(0L) >= 9999L && got(0L) <= 10000L)
  }

  test("QuantizedCosine basic geometry and null handling") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),   // parallel
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),   // orthogonal
      (Array(1.0f, 1.0f), Array(-1.0f, -1.0f)), // antiparallel
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f))    // zero norm -> 0 by contract
    ).toDF("a", "b")
    val out = df.select(QuantizedCosine($"a", $"b").as("c")).collect().map(_.getLong(0))
    assert(out(0) == 10000L)
    assert(out(1) == 0L)
    assert(out(2) == -10000L)
    assert(out(3) == 0L)
    val withNull = df.select(QuantizedCosine(lit(null).cast("array<float>"), $"b").as("c"))
    assert(withNull.collect().forall(_.isNullAt(0)))
  }
}
