package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{IndexCache, Tables}

/** Link-analysis ranking over a document-similarity graph: PageRank
  * (Brin & Page 1998) with a FIXED iteration count over the kNN graph
  * [[Similarity.knnJoin]] produces — the "centrality in the corpus
  * graph" signal a curation pipeline uses to pick representative
  * documents (or, inverted, to find isolated outliers), computed with
  * the same engine-exact arithmetic discipline as the rest of the
  * oracle surface.
  *
  * Determinism: ranks are FIXED-POINT BIGINTs in 10⁻⁸ units, and
  * every per-iteration op is integer arithmetic (`div`, `*`, SUM) —
  * exact and order-independent in any engine. (The first cut
  * quantized IEEE doubles to DECIMAL(18,8) per the
  * [[Curation.qDsirWeights]] convention and drifted by ~1e-8: Spark's
  * double→decimal cast rounds the SHORTEST DECIMAL form of the double
  * — BigDecimal.valueOf — where DuckDB rounds the true binary value,
  * and ~7.5k casts per run surface a handful of boundary cases.
  * Integer fixed-point has no cast to disagree on.) The floor in
  * `rank div outdeg` drops ≤10⁻⁸ of mass per edge — identically
  * mirrored in the oracle, and irrelevant to the ranking contract.
  * Dangling-node mass is dropped (not redistributed) on BOTH sides —
  * a convention choice, not an approximation mismatch.
  *
  * Scale shape: the edge list is built ONCE per (session, dir) and
  * materialized (the at-ingest index lifecycle, like the clustered
  * tx tables — 5 iterations over a parquet edge list, not 5
  * recomputes of the kNN join). Each iteration is ONE shuffle: the
  * rank vector joins the edge list on src (both O(k·N)), contributes
  * mass per dst, and the per-dst aggregate carries the iteration.
  * Out-degrees ride the same edge scan. At 100 TB the edge list is
  * partitioned by src and the rank vector co-partitions with it —
  * the standard distributed-PageRank layout; nothing here collects
  * to the driver.
  */
object GraphRank {

  private val Iterations = 5

  /** kNN edge list (top-3 per vector within its label block) with the
    * static out-degree DENORMALIZED onto every edge, materialized once
    * per (session, data dir) — outdeg never changes between
    * iterations, so joining a degree table inside the loop would pay
    * 5 needless joins for a value the edge artifact can carry.
    */
  private[ext] def knnEdgesPath(s: SparkSession, dir: String): String =
    IndexCache.memo(s"pagerank-edges:${s.sparkContext.applicationId}:$dir") {
      val tag = (dir + "_" + s.sparkContext.applicationId)
        .replaceAll("[^a-zA-Z0-9]+", "_")
      val p = s"${sys.props("java.io.tmpdir")}/graft_pr_edges_$tag"
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
      Similarity.knnJoin(Tables.load(s, dir, "embeddings"),
          "label", "vec_id", "embedding", k = 3)
        .select(col("vec_id").as("src"), col("nbr").as("dst"))
        .withColumn("outdeg", count(lit(1)).over(w))
        .write.parquet(p)
      p
    }

  /** One unit = 10⁻⁸ of total rank mass. */
  private val Unit = 100000000L

  /** Top-20 vectors by PageRank after [[Iterations]] synchronous
    * iterations on the kNN graph, in fixed-point 10⁻⁸ units:
    * r₀ = ⌊U/N⌋; rᵢ₊₁(v) = ⌊0.15·U/N⌋ + ⌊85·Σ_{u→v}⌊rᵢ(u)/outdeg(u)⌋/100⌋.
    */
  def qPagerank(s: SparkSession, dir: String): DataFrame = {
    val edges = s.read.parquet(knnEdgesPath(s, dir))
    val nodes = Tables.load(s, dir, "embeddings").select(col("vec_id"))
    // bounded collect: ONE scalar — inlining it as a literal keeps the
    // count subtree (2 exchanges) out of every iteration's lineage
    val n = nodes.count()
    val teleport = (15L * Unit / 100L) / n
    var ranks = nodes.select(col("vec_id"), lit(Unit / n).as("r"))
    for (_ <- 1 to Iterations) {
      val mass = edges
        .join(ranks.withColumnRenamed("vec_id", "src"), "src")
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
      ranks = nodes
        .join(mass, nodes("vec_id") === mass("dst"), "left")
        .select(col("vec_id"),
          (lit(teleport) +
            expr("(85 * coalesce(in_mass, 0L)) div 100")).as("r"))
    }
    ranks.select(col("vec_id"), col("r").as("pr_e8"))
      .orderBy(col("pr_e8").desc, col("vec_id")).limit(20)
  }

  /** TRIANGLE COUNT over the undirected kNN graph — the standard
    * local-clustering signal (tightly-knit near-duplicate
    * neighborhoods score high; loose chains score 0). The classic
    * distributed enumeration: canonicalize each edge to (lo, hi),
    * join wedges a<b<c on the shared middle vertex, then close each
    * wedge against the edge set — every triangle counted exactly
    * once. Edge set is O(k·N) (top-3 per vector), so the wedge join
    * is bounded by Σ deg² — never an all-pairs pass; at 100 TB the
    * joins co-partition on the wedge vertex.
    */
  def qTriangles(s: SparkSession, dir: String): DataFrame = {
    val und = s.read.parquet(knnEdgesPath(s, dir))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val wedges = und.as("e1").join(und.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    wedges.join(und, wedges("x") === und("a") && wedges("z") === und("b"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> (qPagerank _),
    "q_triangles" -> (qTriangles _),
  )

  /** Oracle: the identical fixed-point recurrence as chained CTEs —
    * the shared [[Similarity.knnRankCtes]] edge definition, then one
    * CTE per iteration. Every scalar op is BIGINT `//`, `*`, SUM —
    * exact in any engine, so the ranks match to the last unit.
    */
  val oracle: Map[String, String] = {
    val iters = (1 to Iterations).map { i =>
      s"""r$i AS (
         |  SELECT nodes.vec_id,
         |    (${15L * Unit / 100L} // nn.n) +
         |    ((85 * COALESCE(m.in_mass, 0)) // 100) AS r
         |  FROM nodes CROSS JOIN nn
         |  LEFT JOIN (
         |    SELECT e.dst, SUM(p.r // d.outdeg) AS in_mass
         |    FROM edges e JOIN deg d ON e.src = d.src
         |                 JOIN r${i - 1} p ON e.src = p.vec_id
         |    GROUP BY e.dst) m ON m.dst = nodes.vec_id)""".stripMargin
    }.mkString(",\n")
    Map(
      "q_pagerank" ->
        s"""WITH ${Similarity.quantCtes},
           |${Similarity.knnRankCtes},
           |edges AS (SELECT vec_id AS src, nbr AS dst FROM rk WHERE rk <= 3),
           |nodes AS (SELECT vec_id FROM embeddings),
           |nn AS (SELECT COUNT(*) AS n FROM nodes),
           |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
           |r0 AS (SELECT vec_id, $Unit // n AS r FROM nodes CROSS JOIN nn),
           |$iters
           |SELECT vec_id, CAST(r AS BIGINT) AS pr_e8 FROM r$Iterations
           |ORDER BY pr_e8 DESC, vec_id LIMIT 20""".stripMargin,
      "q_triangles" ->
        s"""WITH ${Similarity.quantCtes},
           |${Similarity.knnRankCtes},
           |und AS (
           |  SELECT DISTINCT least(vec_id, nbr) AS a, greatest(vec_id, nbr) AS b
           |  FROM rk WHERE rk <= 3)
           |SELECT COUNT(*) AS n_triangles
           |FROM und e1 JOIN und e2 ON e1.b = e2.a
           |            JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b""".stripMargin,
    )
  }
}
