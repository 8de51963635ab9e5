package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Near-duplicate CLUSTERS: the end state of a dedup pipeline.
  * Pairwise matches (from n-gram Jaccard / MinHash verification) are
  * edges; connected components give the duplicate clusters; the
  * minimum doc_id of each component is the canonical keeper.
  *
  * Components are computed by min-label propagation to fixpoint —
  * deterministic (so oracle-checkable), and each round is one
  * join+aggregate on the edge list: O(iters × |E|) shuffle, with
  * iters ≤ the component diameter. Dedup clusters are overwhelmingly
  * tiny (pairs/triples), so convergence is 2-3 rounds; for
  * pathological giant components swap in the alternating
  * small-star/large-star algorithm on the same edge DataFrame.
  */
object DedupClusters {

  /** (id, component) for every vertex; component = min id reachable.
    * Hybrid execution: below `driverEdgeThreshold` edges the
    * component labels are computed by driver-side union-find (the
    * edge set of a dedup run is tiny relative to the corpus — the
    * expensive part was finding the pairs) and broadcast-joined back;
    * above it, distributed min-label propagation. Results identical.
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 20,
                          driverEdgeThreshold: Int = 100000): DataFrame = {
    // one evaluation decides AND delivers: if limit(n+1) returns ≤ n
    // rows, that IS the complete edge set
    val sample = edges.select(col("a").cast("long"), col("b").cast("long"))
      .limit(driverEdgeThreshold + 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    if (sample.length <= driverEdgeThreshold)
      componentsViaUnionFind(vertices, sample)
    else
      componentsViaPropagation(vertices, edges, maxIter)
  }

  /** Driver union-find over a small collected edge list; labels join
    * back as a broadcast map (component = min id, matching the
    * distributed variant exactly).
    */
  private def componentsViaUnionFind(vertices: DataFrame,
                                     es: Array[(Long, Long)]): DataFrame = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb)); parent(hi) = lo }
    }
    val labels = parent.keys.map(x => x -> find(x)).toMap
    val bc = vertices.sparkSession.sparkContext.broadcast(labels)
    val componentOf = udf((id: Long) => bc.value.getOrElse(id, id))
    vertices.select(col("id"), componentOf(col("id")).as("component"))
  }

  /** Distributed min-label propagation (the >threshold path). */
  private[ext] def componentsViaPropagation(vertices: DataFrame, edges: DataFrame,
                                            maxIter: Int = 20): DataFrame = {
    val spark = vertices.sparkSession
    // symmetric edge list, reused every round
    val sym = edges.select(col("a").as("x"), col("b").as("y"))
      .unionAll(edges.select(col("b").as("x"), col("a").as("y")))
      .persist()
    try {
      var labels = vertices.select(col("id"), col("id").as("component")).persist()
      var converged = false
      var iter = 0
      while (!converged && iter < maxIter) {
        // each vertex adopts min(own label, neighbours' labels)
        val neighborMin = sym
          .join(labels.withColumnRenamed("id", "y2"), col("y") === col("y2"))
          .groupBy(col("x")).agg(min(col("component")).as("nmin"))
        val next = labels
          .join(neighborMin, col("id") === col("x"), "left")
          .select(col("id"),
            least(col("component"), coalesce(col("nmin"), col("component")))
              .as("component"))
          .persist()
        val changes = next.join(labels.withColumnRenamed("component", "old"), "id")
          .where(col("component") =!= col("old")).count()
        labels.unpersist()
        labels = next
        converged = changes == 0
        iter += 1
      }
      // partial labels are silently wrong (chain components with
      // diameter > maxIter) — fail loudly rather than return them
      // (releasing the cached labels first: no leak on the error path)
      if (!converged) {
        labels.unpersist()
        throw new IllegalStateException(
          s"connected components did not converge in $maxIter min-label rounds; " +
            "raise maxIter or use small-star/large-star for giant components")
      }
      // materialize before releasing the cached inputs
      val out = labels.localCheckpoint(eager = true)
      labels.unpersist()
      out
    } finally sym.unpersist()
  }

  /** Dedup clusters over exact-Jaccard≥0.5 pairs: every doc with its
    * component and keeper flag (keeper = min doc_id of the cluster).
    */
  def qDedupClusters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents").select($"doc_id".as("id"))
    val pairs = TextAnalysis.qNgramJaccard(s, dir)
      .select($"doc_a".as("a"), $"doc_b".as("b"))
    connectedComponents(docs, pairs)
      .select($"id".as("doc_id"), $"component",
        ($"id" === $"component").cast("boolean").as("is_keeper"))
      .orderBy($"doc_id")
  }

  /** SemDeDup-shaped semantic dedup (Abbas et al., 2023, arXiv:
    * 2303.09540): embedding near-duplicate pairs (label-blocked
    * engine-exact cosine ≥ 0.40, the [[Similarity.qCosineDups]]
    * edge set — blocking key ≙ k-means cluster in the paper / IVF
    * cell at 100 TB) → connected components → keeper = min vec_id.
    * The expensive stage is pair mining inside blocks; the component
    * pass rides the tiny edge set (union-find below the driver
    * threshold, min-label propagation above it).
    */
  def qSemanticDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vecs = Tables.load(s, dir, "embeddings").select($"vec_id".as("id"))
    val pairs = Similarity.qCosineDups(s, dir)
      .select($"vec_a".as("a"), $"vec_b".as("b"))
    connectedComponents(vecs, pairs)
      .select($"id".as("vec_id"), $"component",
        ($"id" === $"component").cast("boolean").as("is_keeper"))
      .orderBy($"vec_id")
  }

  /** Keep-BEST dedup: near-duplicate clusters electing the
    * HIGHEST-QUALITY member (longest token count, doc_id tie-break)
    * instead of the arbitrary min-id — the keeper election a real
    * curation pass runs, where among duplicates you keep the most
    * complete copy. One window over the component labels joined to a
    * map-side quality column; cluster size rides the same partition.
    */
  def qDedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(s, dir, "documents")
    val comp = connectedComponents(
      docs.select($"doc_id".as("id")),
      TextAnalysis.qNgramJaccard(s, dir).select($"doc_a".as("a"), $"doc_b".as("b")))
    val quality = docs.select($"doc_id",
      org.apache.spark.sql.functions.size(TextAnalysis.tokens($"text"))
        .cast("long").as("n_tokens"))
    val w = Window.partitionBy($"component")
      .orderBy($"n_tokens".desc, $"doc_id")
    comp.select($"id".as("doc_id"), $"component")
      .join(quality, "doc_id")
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(w))
      .withColumn("cluster_size",
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1))
          .over(Window.partitionBy($"component")).cast("long"))
      .where($"rk" === 1)
      .select($"component", $"doc_id".as("best_doc"),
        $"n_tokens".as("best_n_tokens"), $"cluster_size")
      .orderBy($"component")
  }

  /** LEAKAGE-SAFE train/val/test split: the
    * [[TextAnalysis.qHashSplit]] md5-range recipe keyed by each doc's
    * near-dup COMPONENT instead of its own id, so a duplicate cluster
    * always lands on ONE side — a test doc with a train-side
    * near-duplicate is contamination (the C4/Pile lesson), and a
    * per-doc hash split cannot prevent it. Same determinism and
    * growth-stability properties as the plain split; the only cost is
    * the component pass the dedup pipeline already ran.
    */
  def qLeakageSafeSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents").select($"doc_id".as("id"))
    val pairs = TextAnalysis.qNgramJaccard(s, dir)
      .select($"doc_a".as("a"), $"doc_b".as("b"))
    val h4 = substring(md5($"component".cast("string").cast("binary")), 1, 4)
    connectedComponents(docs, pairs)
      .select($"id".as("doc_id"), $"component")
      .withColumn("split",
        when(h4 < "cccc", "train").when(h4 < "e666", "val").otherwise("test"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_clusters" -> (qDedupClusters _),
    "q_semantic_dedup" -> (qSemanticDedup _),
    "q_dedup_keep_best" -> (qDedupKeepBest _),
    "q_leakage_safe_split" -> (qLeakageSafeSplit _),
  )

  /** Oracle: transitive closure by recursive CTE, component = min
    * reachable id (self-loops make singletons their own component).
    */
  /** The Jaccard-cluster CTE chain (pairs → symmetric edges →
    * recursive closure → `comp(doc_id, component)`): ONE definition
    * shared by the min-id and keep-best oracles — the Spark side
    * shares [[connectedComponents]], so the SQL mirror must not be
    * able to drift either.
    */
  private val clusterCtes: String =
    """pairs AS (
      |  SELECT doc_a, doc_b FROM (
      |    WITH toks AS (
      |      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      |      FROM documents),
      |    sh AS (
      |      SELECT DISTINCT doc_id, array_to_string(t[i + 1 : i + 3], ' ') AS shingle
      |      FROM (SELECT doc_id, t, unnest(range(len(t) - 2)) AS i FROM toks WHERE len(t) >= 3)),
      |    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
      |    common AS (
      |      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      |      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2)
      |    SELECT doc_a, doc_b FROM common
      |    JOIN sizes sa ON doc_a = sa.doc_id
      |    JOIN sizes sb ON doc_b = sb.doc_id
      |    WHERE 3 * c >= sa.sz + sb.sz)),
      |edges AS (
      |  SELECT doc_a AS x, doc_b AS y FROM pairs
      |  UNION SELECT doc_b, doc_a FROM pairs
      |  UNION SELECT doc_id, doc_id FROM documents),
      |reach(x, y) AS (
      |  SELECT x, y FROM edges
      |  UNION
      |  SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x),
      |comp AS (
      |  SELECT x AS doc_id, MIN(y) AS component FROM reach GROUP BY x)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE $clusterCtes
         |SELECT doc_id, component, (doc_id = component) AS is_keeper
         |FROM comp ORDER BY doc_id""".stripMargin,
    "q_dedup_keep_best" ->
      s"""WITH RECURSIVE $clusterCtes,
         |q AS (
         |  SELECT doc_id,
         |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
         |  FROM documents),
         |ranked AS (
         |  SELECT c.component, c.doc_id, q.n_tokens,
         |    row_number() OVER (PARTITION BY c.component
         |      ORDER BY q.n_tokens DESC, c.doc_id) AS rk,
         |    COUNT(*) OVER (PARTITION BY c.component) AS cluster_size
         |  FROM comp c JOIN q ON c.doc_id = q.doc_id)
         |SELECT component, doc_id AS best_doc,
         |  CAST(n_tokens AS BIGINT) AS best_n_tokens,
         |  CAST(cluster_size AS BIGINT) AS cluster_size
         |FROM ranked WHERE rk = 1 ORDER BY component""".stripMargin,
    "q_leakage_safe_split" ->
      s"""WITH RECURSIVE $clusterCtes
         |SELECT doc_id, component,
         |  CASE WHEN substring(md5(CAST(component AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
         |       WHEN substring(md5(CAST(component AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM comp ORDER BY doc_id""".stripMargin,
    "q_semantic_dedup" ->
      s"""WITH RECURSIVE ${Similarity.quantCtes},
         |${Similarity.dupPairsSql},
         |edges AS (
         |  SELECT vec_a AS x, vec_b AS y FROM dup
         |  UNION SELECT vec_b, vec_a FROM dup
         |  UNION SELECT vec_id, vec_id FROM embeddings),
         |reach(x, y) AS (
         |  SELECT x, y FROM edges
         |  UNION
         |  SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x)
         |SELECT x AS vec_id, MIN(y) AS component,
         |  (x = MIN(y)) AS is_keeper
         |FROM reach GROUP BY x ORDER BY vec_id""".stripMargin,
  )
}
