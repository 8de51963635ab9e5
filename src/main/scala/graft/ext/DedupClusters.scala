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
  * deterministic (so oracle-checkable). The distributed path is the
  * alternating small-star/large-star contraction (Kiveris et al.,
  * SoCC'14), which converges in O(log n) rounds INDEPENDENT of the
  * component diameter — a giant chain component that would need
  * diameter-many min-label rounds contracts in ~2·log₂ rounds.
  */
object DedupClusters {

  /** (id, component) for every vertex; component = min id reachable.
    * Hybrid execution: below `driverEdgeThreshold` edges the
    * component labels are computed by driver-side union-find (the
    * edge set of a dedup run is tiny relative to the corpus — the
    * expensive part was finding the pairs) and broadcast-joined back;
    * above it, distributed small-star/large-star contraction (round
    * count bounded by O(log n), never by component diameter).
    * Results identical.
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 50,
                          driverEdgeThreshold: Int = 100000): DataFrame = {
    // one evaluation decides AND delivers: if limit(n+1) returns ≤ n
    // rows, that IS the complete edge set
    val sample = edges.select(col("a").cast("long"), col("b").cast("long"))
      .limit(driverEdgeThreshold + 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    if (sample.length <= driverEdgeThreshold)
      componentsViaUnionFind(vertices, sample)
    else
      componentsViaStarContraction(vertices, edges, maxIter)
  }

  /** Distributed connected components by ALTERNATING
    * small-star/large-star contraction (Kiveris, Lattanzi, Mirrokni,
    * Rastogi, Vassilvitskii — "Connected Components in MapReduce and
    * Beyond", SoCC'14): each round every node hooks its neighbors
    * onto its minimum neighbor (large-star moves the larger
    * neighbors, small-star the smaller ones plus itself), which
    * at least halves the height of every tree per round — O(log n)
    * rounds for ANY graph, where min-label propagation needs
    * diameter-many. At the fixpoint the edge set is a star forest:
    * every non-minimum node holds exactly one edge, to its
    * component's minimum id. Deterministic (pure min arithmetic), so
    * the labels are oracle-checkable against a recursive-CTE closure.
    *
    * Each round is a bounded number of hash shuffles over the
    * CURRENT edge set (which only shrinks modulo dedup), with a
    * `localCheckpoint` lineage cut per round — the same iterative
    * hygiene as [[GraphRank]]. Convergence is verified EXACTLY via
    * the structural fixpoint characterization (the edge set is a
    * canonical star forest — see the in-loop proof note), not by a
    * heuristic metric; `maxIter` is a runaway bound that O(log n)
    * convergence never reaches on real data (2⁵⁰ nodes ≫ any corpus).
    */
  private[ext] def componentsViaStarContraction(vertices: DataFrame,
      edges: DataFrame, maxIter: Int = 50): DataFrame = {
    // canonical (lo, hi) pairs, self-loops and duplicates dropped.
    // LAZY checkpoints throughout the loop: the round's one action
    // (the fixpoint check) both computes and materializes the round —
    // one job per round instead of eager-checkpoint + count + except
    // (three passes over the same tiny-per-round edge set, pure fixed
    // cost × O(log n))
    var e = edges.select(
        least(col("a").cast("long"), col("b").cast("long")).as("lo"),
        greatest(col("a").cast("long"), col("b").cast("long")).as("hi"))
      .where(col("lo") =!= col("hi"))
      .distinct()
      .localCheckpoint(false)

    // Both star ops need each edge row joined with its center's
    // neighborhood minimum — expressed as ONE unbounded window
    // aggregate per op (a single hash-partition shuffle carrying the
    // min to every row) instead of the groupBy + self-join form,
    // which shuffles the same data twice more per round. At scale the
    // window's per-center sort is the same work a sort-merge join
    // would do, and rounds are O(log n), so the shape holds.
    import org.apache.spark.sql.expressions.Window

    // large-star: every node u hooks its LARGER neighbors onto
    // m(u) = min(Γ(u) ∪ {u}) — emitted edges (v, m) keep v > m.
    // NO dedup here: min-aggregates downstream are duplicate-blind
    // and the round's single distinct runs after small-star.
    // `obs` (when given) counts the rows the op MOVED — rows whose
    // emitted lo differs from their center u; zero moves ⟺ the op
    // was the row-wise identity on its input (for v > u rows
    // m ≤ u < v, so no lo = hi drop can hide a change).
    def largeStar(cur: DataFrame,
        obs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
      val sym = cur.select(col("lo").as("u"), col("hi").as("v"))
        .unionAll(cur.select(col("hi").as("u"), col("lo").as("v")))
      val m = least(col("u"), min(col("v")).over(Window.partitionBy(col("u"))))
      val kept = sym.select(m.as("lo"), col("v").as("hi"), col("u"))
        .where(col("hi") > col("u") && col("lo") =!= col("hi"))
      val watched = obs.map(o => kept.observe(o,
        sum(when(col("lo") =!= col("u"), 1L).otherwise(0L)).as("moved")))
        .getOrElse(kept)
      watched.drop("u")
    }

    // small-star: every node u hooks its SMALLER neighbors and
    // itself onto m(u) = min of those neighbors (all < u); the
    // (m, u) self-hook rides as a second projection of the same
    // windowed frame, deduped by the round's distinct
    // `dedup = false` for an inner step whose output feeds another
    // (duplicate-blind) window min — skips that step's distinct
    // exchange; the OUTER step always dedups so the convergence
    // check compares true sets.
    // `obs` counts the moved branch's rows: zero ⟺ every row had
    // lo = m, i.e. the self branch re-emitted the input unchanged.
    def smallStar(cur: DataFrame, dedup: Boolean = true,
        obs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
      val withM = cur.withColumn("m",
        min(col("lo")).over(Window.partitionBy(col("hi"))))
      val moved0 = withM.where(col("lo") =!= col("m"))
        .select(col("m").as("lo"), col("lo").as("hi"))
      val moved = obs.map(o =>
        moved0.observe(o, count(lit(1)).as("moved"))).getOrElse(moved0)
      val self = withM.select(col("m").as("lo"), col("hi"))
      val u = moved.unionAll(self)
      if (dedup) u.distinct() else u
    }

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // TWO star-pairs per materialized round: the checkpoint barrier
      // (and its job-scheduling fixed cost) amortizes over two
      // contraction steps — both ops converge monotonically to the one
      // star-forest fixpoint (Kiveris et al. §3), so fixpoint detection
      // across double-steps finds exactly the same forest.
      //
      // EXACT fixpoint test with NO check pass at all: the round's
      // one job is the EAGER checkpoint materialization, and two
      // Observation counters on the SECOND star-pair ride it for
      // free (map-side accumulators — no exchange, where the previous
      // node-keyed star-forest aggregate shuffled 2|E| rows per
      // round). Zero moves in large₂ AND small₂ means both ops were
      // the row-wise identity on e₁ (= small₁(large₁(e))): e₁ is
      // then invariant under BOTH ops ⟺ e₁ is the star forest (the
      // same characterization the aggregate checked — every emitted
      // edge points at a neighborhood min, so a non-forest always
      // moves some row), and `next` = distinct(e₁) = that forest.
      // Detection cost is unchanged in rounds: a forest formed by e₁
      // is seen this round; one formed only at small₂'s output is
      // seen next round after four identity steps over forest edges
      // (the same one-round lag the previous check had for forests
      // formed mid-round).
      val l2Obs = org.apache.spark.sql.Observation()
      val s2Obs = org.apache.spark.sql.Observation()
      val e1 = smallStar(largeStar(e), dedup = false)
      val next = smallStar(largeStar(e1, Some(l2Obs)), obs = Some(s2Obs))
        .localCheckpoint(true)
      def moves(o: org.apache.spark.sql.Observation): Long =
        o.get.get("moved").map(_.asInstanceOf[Long]).getOrElse(0L)
      converged = moves(l2Obs) == 0L && moves(s2Obs) == 0L
      e = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"star contraction did not converge in $maxIter rounds — " +
          "O(log n) convergence makes this unreachable for any real input; " +
          "the edge set is likely being mutated concurrently")
    // fixpoint = star forest: (hi → lo) IS the label map; roots and
    // isolated vertices label themselves
    vertices.select(col("id"))
      .join(e.select(col("hi").as("id"), col("lo").as("root")), Seq("id"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("component"))
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
      // per-round localCheckpoint, NOT persist: caching keeps the
      // logical plan, which nests one join deeper per round — past
      // ~15 rounds the planner/codegen blows up (observed OOM) long
      // before the maxIter guard can fire. The checkpoint cuts
      // lineage so round N plans against a leaf, whatever N is.
      var labels = vertices.select(col("id"), col("id").as("component"))
        .localCheckpoint(true)
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
          .localCheckpoint(true)
        val changes = next.join(labels.withColumnRenamed("component", "old"), "id")
          .where(col("component") =!= col("old")).count()
        labels = next
        converged = changes == 0
        iter += 1
      }
      // partial labels are silently wrong (chain components with
      // diameter > maxIter) — fail loudly rather than return them
      if (!converged)
        throw new IllegalStateException(
          s"connected components did not converge in $maxIter min-label rounds; " +
            "raise maxIter or use componentsViaStarContraction for giant components")
      labels
    } finally sym.unpersist()
  }

  /** Dedup clusters over exact-Jaccard≥0.5 pairs: every doc with its
    * component and keeper flag (keeper = min doc_id of the cluster).
    */
  def qDedupClusters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents").select($"doc_id".as("id"))
    val pairs = TextAnalysis.jaccardPairsTable(s, dir)
      .select($"doc_a".as("a"), $"doc_b".as("b"))
    connectedComponents(docs, pairs)
      .select($"id".as("doc_id"), $"component",
        ($"id" === $"component").cast("boolean").as("is_keeper"))
      .orderBy($"doc_id")
  }

  /** GIANT-component dedup clusters: the adversarial shape for
    * label-propagation CC — long CHAINS of pairwise near-duplicates
    * (the "slightly edited N times" lineage a crawl corpus really
    * contains: doc i+1 is a near-dup of doc i but not of doc i-5).
    * The fixture links consecutive doc_ids within blocks of 100, so
    * every component has diameter 99 — min-label propagation needs 99
    * rounds (and [[componentsViaPropagation]] at its default bound
    * throws); the graded path is [[componentsViaStarContraction]],
    * which contracts any diameter in O(log n) rounds. Called
    * DIRECTLY (not through the union-find shortcut) so the graded
    * artifact is the distributed algorithm itself.
    */
  def qDedupGiant(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents").select($"doc_id".as("id"))
    // consecutive-id chain edges within blocks of 100; the join keeps
    // the fixture honest (an edge exists only between PRESENT docs)
    val chain = docs.select($"id".as("a"), ($"id" + 1L).as("b"))
      .where($"a" % 100L =!= 99L)
      .join(docs.select($"id".as("b")), Seq("b"), "left_semi")
    componentsViaStarContraction(docs, chain)
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
    // cluster-level consumer reads the once-per-session pair artifact
    // (build eager + timed in artifact_builds); the mining query
    // q_cosine_dups keeps mining per evaluation
    val pairs = Similarity.cosinePairsTable(s, dir)
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
      TextAnalysis.jaccardPairsTable(s, dir).select($"doc_a".as("a"), $"doc_b".as("b")))
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
    val pairs = TextAnalysis.jaccardPairsTable(s, dir)
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
    "q_dedup_giant" -> (qDedupGiant _),
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
    "q_dedup_giant" ->
      """WITH RECURSIVE
        |chain AS (
        |  SELECT a.doc_id AS ca, b.doc_id AS cb
        |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |  WHERE a.doc_id % 100 <> 99),
        |edges AS (
        |  SELECT ca AS x, cb AS y FROM chain
        |  UNION SELECT cb, ca FROM chain
        |  UNION SELECT doc_id, doc_id FROM documents),
        |reach(x, y) AS (
        |  SELECT x, y FROM edges
        |  UNION
        |  SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x)
        |SELECT x AS doc_id, MIN(y) AS component, (x = MIN(y)) AS is_keeper
        |FROM reach GROUP BY x ORDER BY doc_id""".stripMargin,
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
