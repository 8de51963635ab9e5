package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class GraphRankSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("pagerank conserves mass up to the documented floor loss") {
    // every node holds ≥ the teleport floor, and total mass stays in
    // (damped-teleport, 1]: each `div` floors away <1 unit per edge
    // and dangling mass is dropped, so the sum can only shrink
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val edges = spark.read.parquet(GraphRank.knnEdgesPath(spark, dir))
    // full vector, not the top-20 query slice
    val nodes = spark.read.parquet(s"$dir/embeddings.parquet").select(col("vec_id"))
    // the artifact's denormalized outdeg must agree with a fresh count
    val degCheck = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("n"), max(col("outdeg")).as("mx"), min(col("outdeg")).as("mn"))
      .where(col("n") =!= col("mx") || col("n") =!= col("mn")).count()
    assert(degCheck == 0, "outdeg column out of sync with the edge list")
    val full = {
      // re-run the public query but without the limit by reusing the
      // edge artifact: the invariant must hold for EVERY node
      var ranks = nodes.select(col("vec_id"), expr(s"100000000L div ${n}L").as("r"))
      for (_ <- 1 to 5) {
        val mass = edges
          .join(ranks.withColumnRenamed("vec_id", "src"), "src")
          .select(col("dst"), expr("r div outdeg").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
        ranks = nodes.join(mass, nodes("vec_id") === mass("dst"), "left")
          .select(col("vec_id"),
            (expr(s"15000000L div ${n}L") +
              expr("(85 * coalesce(in_mass, 0L)) div 100")).as("r"))
      }
      ranks
    }
    val teleport = 15000000L / n
    val stats = full.agg(min(col("r")).as("mn"), sum(col("r")).as("total")).head()
    assert(stats.getLong(0) >= teleport, "every node keeps the teleport floor")
    assert(stats.getLong(1) <= 100000000L, "mass never grows")
    assert(stats.getLong(1) > 15000000L, "more than the bare teleport mass survives")
  }

  test("the top-20 query is deterministic across runs and descending") {
    val a = GraphRank.qPagerank(spark, dir).collect()
    val b = GraphRank.qPagerank(spark, dir).collect()
    assert(a.toSeq == b.toSeq)
    val prs = a.map(_.getLong(1)).toSeq
    assert(prs == prs.sorted.reverse, "ranks ordered descending")
    assert(a.length == 20)
  }

  test("triangle count is exact on the data graph (brute-force cross-check)") {
    val edges = spark.read.parquet(GraphRank.knnEdgesPath(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    val nodes = und.map(_._1).toSeq.sorted
    val adj = und.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var brute = 0L
    for (a <- nodes; b <- adj(a) if b > a; c <- adj(b) if c > b)
      if (und.contains((a, c))) brute += 1
    val got = GraphRank.qTriangles(spark, dir).head().getLong(0)
    assert(got == brute, s"distributed $got vs brute $brute")
  }

  test("label propagation clamps seeds and only spreads reachable labels") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val seeded = docs
      .where(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1) < "8")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = GraphRank.qLabelProp(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // every seed keeps its own label
    seeded.foreach { case (id, lang) =>
      assert(out(id) == lang, s"seed $id must stay $lang, got ${out(id)}")
    }
    // propagation assigns only labels that exist among the seeds
    val legal = seeded.values.toSet + "unlabeled"
    assert(out.values.toSet.subsetOf(legal))
    // the graph is dense enough that SOME unlabeled doc gets a label
    val spread = out.filterNot { case (id, _) => seeded.contains(id) }
      .count(_._2 != "unlabeled")
    assert(spread > 0, "propagation reached no unlabeled node")
  }

  test("edge artifact is exactly the knn top-3 graph") {
    val edges = spark.read.parquet(GraphRank.knnEdgesPath(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val knn = Similarity.knnJoin(
        spark.read.parquet(s"$dir/embeddings.parquet"),
        "label", "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == knn)
  }
}
