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

  test("QuantizedCosine ragged inputs: norms over full vectors (oracle shape)") {
    import spark.implicits._
    // a = (1,0,1), b = (1,0): dot over shared prefix = 1·1 = 2^40 in
    // quantized units; |a|² over ALL 3 elements = 2·2^40, |b|² = 2^40
    // → cos = 1/√2 → floor(7071.06…) = 7071. The truncate-both shape
    // would have returned 10000 (prefix-only norms see equal vectors).
    val df = Seq((Array(1.0f, 0.0f, 1.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    val both = df.select(
      QuantizedCosine($"a", $"b").as("ab"),
      QuantizedCosine($"b", $"a").as("ba")).head()
    assert(both.getLong(0) == 7071L)
    assert(both.getLong(1) == 7071L) // symmetric regardless of arg order
  }
}
