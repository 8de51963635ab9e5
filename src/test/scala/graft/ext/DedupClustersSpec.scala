package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DedupClustersSpec extends SparkTestBase {

  test("connected components merge transitive chains and keep singletons (both paths)") {
    import spark.implicits._
    val vertices = (1L to 7L).toDF("id")
    // 1-2-3 chain, 5-6 pair, 4 and 7 singletons
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L, 7L -> 7L)
    val viaUf = DedupClusters.connectedComponents(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaUf == expected)
    val viaProp = DedupClusters.componentsViaPropagation(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaProp == expected)
  }

  test("unconverged propagation throws instead of returning partial labels") {
    import spark.implicits._
    val vertices = (1L to 5L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    // diameter 4 > maxIter 2: must fail loudly (ADVICE r1), not
    // silently return unconverged labels
    assertThrows[IllegalStateException] {
      DedupClusters.componentsViaPropagation(vertices, edges, maxIter = 2).collect()
    }
  }

  test("q_dedup_clusters components are consistent with the pair set") {
    val dir = "/root/testdata/sf0.001"
    val clusters = DedupClusters.qDedupClusters(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = TextAnalysis.qNgramJaccard(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // every matched pair must land in the same component
    pairs.foreach { case (a, b) => assert(clusters(a) == clusters(b), s"pair ($a,$b)") }
    // keepers: exactly one per component
    val keepers = clusters.groupBy(_._2).view.mapValues(_.keys.min).toMap
    keepers.foreach { case (comp, minId) => assert(comp == minId) }
  }

  test("leakage-safe split never separates a near-duplicate pair") {
    val dir = "/root/testdata/sf0.001"
    val split = DedupClusters.qLeakageSafeSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(split.nonEmpty)
    // every qualifying near-dup pair lands on ONE side — the property
    // a per-doc hash split cannot give (and the point of this query)
    val pairs = TextAnalysis.qNgramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(split(a)._2 == split(b)._2,
        s"near-dup pair ($a, $b) split across ${split(a)._2}/${split(b)._2}")
      assert(split(a)._1 == split(b)._1, "pair must share a component")
    }
    // and the split labels derive from the component, not the doc
    split.values.groupBy(_._1).foreach { case (comp, members) =>
      assert(members.map(_._2).toSet.size == 1,
        s"component $comp maps to multiple splits")
    }
  }

  test("q_semantic_dedup labels every vector and agrees with the cosine edge set") {
    val dir = "/root/testdata/sf0.001"
    val out = DedupClusters.qSemanticDedup(spark, dir)
    val n = graft.core.Tables.load(spark, dir, "embeddings").count()
    assert(out.count() == n, "every vector must be labeled exactly once")
    val labels = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // component is a reachable-min: never above the member's own id
    labels.foreach { case (id, comp) => assert(comp <= id, s"component $comp > id $id") }
    // both endpoints of every near-dup edge share a component
    Similarity.qCosineDups(spark, dir)
      .select("vec_a", "vec_b").collect()
      .foreach { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        assert(labels(a) == labels(b), s"edge ($a,$b) split across components")
      }
    // keeper flag is exactly component == id
    out.collect().foreach { r =>
      assert(r.getBoolean(2) == (r.getLong(0) == r.getLong(1)))
    }
  }

  test("star contraction converges on a diameter-99 chain where min-label propagation cannot") {
    import spark.implicits._
    // one chain of 120 nodes (diameter 119) plus a singleton
    val vertices = (0L to 120L).toDF("id")
    val edges = (0L until 119L).map(i => (i, i + 1)).toDF("a", "b")
    // propagation at its old default bound (20) provably cannot label
    // the far end: each round moves the min one hop
    assertThrows[IllegalStateException] {
      DedupClusters.componentsViaPropagation(vertices, edges, maxIter = 20).collect()
    }
    // star contraction handles any diameter in O(log n) rounds
    val got = DedupClusters.componentsViaStarContraction(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 119L).foreach(i => assert(got(i) == 0L, s"node $i"))
    assert(got(120L) == 120L, "the singleton labels itself")
  }

  test("star contraction agrees with union-find on random graphs (property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    (1 to 3).foreach { trial =>
      val n = 60 + trial * 20
      val edges = (1 to n).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val vertices = (0L until n.toLong).toDF("id")
      val edgeDF = edges.toDF("a", "b")
      val viaStar = DedupClusters.componentsViaStarContraction(vertices, edgeDF)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference labels by driver union-find (the proven small path)
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      (0L until n.toLong).foreach { i =>
        assert(viaStar(i) == find(i), s"trial $trial node $i")
      }
    }
  }

  test("q_dedup_giant labels every block chain with its minimum id") {
    val dir = "/root/testdata/sf0.001"
    val out = DedupClusters.qDedupGiant(spark, dir).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val (id, comp, keeper) = (r.getLong(0), r.getLong(1), r.getBoolean(2))
      assert(comp == (id / 100L) * 100L, s"doc $id")
      assert(keeper == (id == comp))
    }
  }
}
