package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class KnnJoinSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q_knn_join: per-vector neighbor count, blocking, and rank contiguity") {
    val out = Similarity.qKnnJoin(spark, dir).cache()
    val e = graft.core.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"))
    // expected rows: every vector gets min(3, |label group| - 1) neighbors
    val expected = e.groupBy("label").count()
      .select(sum(col("count") * least(lit(3), col("count") - 1)))
      .head().getLong(0)
    assert(out.count() == expected, s"expected $expected kNN rows")
    // ranks are 1..k contiguous per vec_id
    val badRank = out.groupBy("vec_id")
      .agg(min("rk").as("lo"), max("rk").as("hi"), count(lit(1)).as("n"))
      .where(col("lo") =!= 1 || col("hi") =!= col("n"))
    assert(badRank.isEmpty, "ranks not contiguous from 1")
    // neighbors never cross the blocking key and never self-match
    val labeled = out.join(e.withColumnRenamed("label", "la"), "vec_id")
      .join(e.select(col("vec_id").as("nbr"), col("label").as("lb")), "nbr")
    assert(labeled.where(col("la") =!= col("lb")).isEmpty, "neighbor crossed label block")
    assert(out.where(col("vec_id") === col("nbr")).isEmpty, "self neighbor")
    out.unpersist()
  }

  test("q_knn_join: rank-1 neighbor agrees with a direct argmax for one probe") {
    val e = graft.core.Tables.load(spark, dir, "embeddings")
    val q = e.where(col("vec_id") === 0)
      .select(col("embedding").as("qvec"), col("label").as("qlabel"))
    val best = e.join(broadcast(q), col("label") === col("qlabel") && col("vec_id") =!= 0)
      .select(col("vec_id"),
        graft.functions.QuantizedCosine(col("embedding"), col("qvec")).as("cosq"))
      .orderBy(col("cosq").desc, col("vec_id")).head()
    val rk1 = Similarity.qKnnJoin(spark, dir)
      .where(col("vec_id") === 0 && col("rk") === 1).head()
    assert(rk1.getAs[Long]("nbr") == best.getAs[Long]("vec_id"))
    assert(rk1.getAs[Long]("cosq") == best.getAs[Long]("cosq"))
  }

  test("knnJoin matches a brute-force reference on seeded random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val n = 40; val dim = 6; val k = 2
    val data = (0L until n).map(i =>
      (i, (i % 3).toInt, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
    val df = data.toDF("vec_id", "label", "embedding")
    val got = Similarity.knnJoin(df, "label", "vec_id", "embedding", k)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> (r.getLong(1), r.getLong(2))).toMap

    // reference: same quantization arithmetic, plain Scala
    def cosq(a: Array[Float], b: Array[Float]): Long = {
      val qa = a.map(x => math.floor(x.toDouble * 1048576.0).toLong)
      val qb = b.map(x => math.floor(x.toDouble * 1048576.0).toLong)
      val dot = qa.zip(qb).map { case (x, y) => x * y }.sum
      val na = qa.map(x => x * x).sum; val nb = qb.map(y => y * y).sum
      if (na == 0L || nb == 0L) 0L
      else math.floor(dot.toDouble / math.sqrt(na.toDouble * nb.toDouble) * 10000.0).toLong
    }
    val expected = data.flatMap { case (id, lbl, v) =>
      data.filter(o => o._2 == lbl && o._1 != id)
        .map(o => (o._1, cosq(v, o._3)))
        .sortBy { case (nbr, c) => (-c, nbr) }
        .take(k).zipWithIndex
        .map { case ((nbr, c), i) => (id, i + 1L) -> (nbr, c) }
    }.toMap
    assert(got == expected)
  }

  test("knnJoin and curate degrade to empty output on empty input (no throw)") {
    import spark.implicits._
    val emptyVecs = Seq.empty[(Long, Int, Array[Float])].toDF("vec_id", "label", "embedding")
    assert(Similarity.knnJoin(emptyVecs, "label", "vec_id", "embedding", 3).isEmpty)
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Curation.curate(emptyDocs).isEmpty)
  }

  test("q_knn_join plans with two-phase WindowGroupLimit (map-side partial top-k)") {
    val plan = Similarity.qKnnJoin(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "rank<=k filter did not plan as WindowGroupLimit:\n" +
        plan.linesIterator.take(25).mkString("\n"))
  }
}
