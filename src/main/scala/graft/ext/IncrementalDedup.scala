package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** INCREMENTAL near-duplicate detection — the shape a production
  * corpus actually runs: the existing corpus's shingle fingerprints
  * were computed AT INGEST and persist as an on-disk artifact; each
  * new batch (a fresh crawl slice) fingerprints only ITS OWN
  * documents and mines near-dup pairs (a) against the persisted index
  * and (b) within itself — O(new batch) work per increment, never a
  * recompute over the full corpus. Complements [[ScaleOps
  * .qBloomNewDocs]] (the EXACT-duplicate incremental gate) with the
  * near-dup (Jaccard ≥ 1/2) tier of the same pipeline.
  *
  * The persisted artifact is PREFIX-FILTERED (the AllPairs/PPJoin
  * principle, [[TextAnalysis.qNgramJaccardPrefix]]'s law): under the
  * global rarest-first order (old-corpus document frequency asc, hash
  * asc; unseen shingles order at df 0), two sets with Jaccard ≥ 1/2
  * must share a shingle inside BOTH prefixes of length ⌊sz/2⌋+1 — so
  * `prefix/` stores only each old doc's prefix postings, the new×old
  * candidate join drives new-prefix × old-prefix (at boilerplate-heavy
  * scale the high-df license/header shingles never enter the join),
  * and candidates exact-verify against the full fingerprint `sets/`.
  * Lossless: the output is the exact pair set, same oracle.
  *
  * 100 TB shape: the candidate join is bounded by PREFIX postings of
  * the new batch × matching old prefix postings (rare shingles by
  * construction); the verify join touches only candidate pairs; the
  * df lookup broadcasts under the [[TextAnalysis
  * .PrefixBroadcastMaxRefsKey]] gate and shuffle-joins above it.
  */
object IncrementalDedup {

  /** The corpus split convention shared with [[ScaleOps.qBloomNewDocs]]:
    * sources src0-9 are the EXISTING corpus, src10+ the NEW batch.
    */
  private def srcNum = substring(col("source"), 4, 10).cast("int")

  /** The persisted ingest-time artifact of the EXISTING corpus, built
    * once per (session, dir) ([[graft.core.IndexCache]], same
    * lifecycle as the ANN indexes): `sets/` = the per-doc fingerprint
    * sets (exact verification + full-postings consumers like the
    * crawl refresh), `df/` = the per-shingle document frequencies
    * that define the global prefix order, `prefix/` = the df-ordered
    * PREFIX postings (h, packed member) — only the first ⌊sz/2⌋+1
    * rarest shingles of each doc, the candidate-join side.
    */
  private[graft] def persistedIndexDir(s: SparkSession, dir: String): String =
    graft.core.IndexCache.memo(
      s"shingle-index-dir:${s.sparkContext.applicationId}:$dir") {
      import s.implicits._
      import graft.functions.PairExpand
      val tag = (dir + "_" + s.sparkContext.applicationId)
        .replaceAll("[^a-zA-Z0-9]+", "_")
      val p = s"${sys.props("java.io.tmpdir")}/graft_shingleidx_$tag"
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val existing = TextAnalysis.docShingleSets(
          Tables.load(s, dir, "documents").where(srcNum < 10))
        .localCheckpoint(eager = false)
      existing.write.parquet(s"$p/sets")
      val post = existing
        .select(TextAnalysis.packedMember.as("m"), explode($"hs").as("h"))
      val dfreq = post.groupBy($"h").agg(count(lit(1)).as("df"))
      dfreq.write.parquet(s"$p/df")
      // df-ordered prefix postings (same size-gated df-side broadcast
      // as qNgramJaccardPrefix — the full dfreq doesn't broadcast at
      // 100 TB, so past the bound the plan takes the shuffle join)
      post.join(dfSide(s, dir, dfreq), Seq("h"))
        .withColumn("rk", row_number().over(
          Window.partitionBy($"m").orderBy($"df", $"h")))
        .where($"rk" <= floor($"m".bitwiseAND(lit(PairExpand.SzMask)) / lit(2)) + 1)
        .select($"h", $"m")
        .write.parquet(s"$p/prefix")
      p
    }

  /** The df table, broadcast iff the corpus' shingle-reference count
    * fits the configured bound (shared gate with the batch prefix
    * join; the signal is Σ|hs| — an upper bound on distinct shingles
    * — off blocks the build materializes anyway).
    */
  private def dfSide(s: SparkSession, dir: String, dfreq: DataFrame): DataFrame = {
    import s.implicits._
    val refs = graft.core.IndexCache.memo[java.lang.Long](
      s"shingle-idx-refs:${s.sparkContext.applicationId}:$dir") {
      Long.box(TextAnalysis.docShingleSets(
          Tables.load(s, dir, "documents").where(srcNum < 10))
        .agg(sum(size($"hs"))).head.getLong(0))
    }.longValue
    val maxRefs = s.conf.get(TextAnalysis.PrefixBroadcastMaxRefsKey,
      TextAnalysis.PrefixBroadcastMaxRefsDefault.toString).toLong
    if (refs <= maxRefs) broadcast(dfreq) else dfreq
  }

  /** The new batch's fingerprint sets (memoized lazily per session —
    * both pair miners and the spec read one materialization).
    */
  private def newSets(s: SparkSession, dir: String): DataFrame =
    graft.core.IndexCache.memo(
      s"shingle-newsets:${s.sparkContext.applicationId}:$dir") {
      TextAnalysis.docShingleSets(
          Tables.load(s, dir, "documents").where(srcNum >= 10))
        .localCheckpoint(eager = false)
    }

  /** The new batch's df-ordered prefix postings under the SAME global
    * order as the persisted index: old-corpus df (0 for shingles the
    * old corpus never saw — rarest), hash. Memoized lazily — both
    * candidate miners read one materialization.
    */
  private def newPrefix(s: SparkSession, dir: String): DataFrame =
    graft.core.IndexCache.memo(
      s"shingle-newprefix:${s.sparkContext.applicationId}:$dir") {
      import s.implicits._
      import graft.functions.PairExpand
      val idxDir = persistedIndexDir(s, dir)
      newSets(s, dir)
        .select(TextAnalysis.packedMember.as("m"), explode($"hs").as("h"))
        .join(dfSide(s, dir, s.read.parquet(s"$idxDir/df")), Seq("h"), "left")
        .withColumn("df", coalesce($"df", lit(0L)))
        .withColumn("rk", row_number().over(
          Window.partitionBy($"m").orderBy($"df", $"h")))
        .where($"rk" <= floor($"m".bitwiseAND(lit(PairExpand.SzMask)) / lit(2)) + 1)
        .select($"h", $"m")
        .localCheckpoint(eager = false)
    }

  /** The new×old prefix×prefix candidate pairs (dn = new doc, do_ =
    * old doc) — exposed for the spec's shrink accounting: at
    * boilerplate-heavy scale this set is the point of the prefix
    * filter (high-df shingles never generate candidates).
    */
  private[ext] def candidatePairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.PairExpand
    val idxDir = persistedIndexDir(s, dir)
    newPrefix(s, dir).select($"h", $"m".as("mn"))
      .join(s.read.parquet(s"$idxDir/prefix").select($"h", $"m".as("mo")), "h")
      .select(shiftrightunsigned($"mn", PairExpand.SzBits).as("dn"),
        shiftrightunsigned($"mo", PairExpand.SzBits).as("do_"))
      .distinct()
  }

  /** Near-dup pairs (exact Jaccard ≥ 1/2, same threshold and output
    * layout as [[TextAnalysis.qNgramJaccard]]) involving at least one
    * NEW document: new×old candidates mined by joining the new
    * batch's PREFIX postings against the PERSISTED prefix index
    * (positional filter on BOTH sides — the documented plan), then
    * exact-verified against the full fingerprint sets; new×new
    * candidates by the same prefix-filtered pair expansion over the
    * new batch alone, verified identically (a boilerplate-heavy slice
    * must not pay O(df²) against itself either). Old×old pairs never
    * recompute — that work was done when those documents were new.
    */
  def qIncrementalNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.PairExpand
    val idxDir = persistedIndexDir(s, dir)
    val sets = newSets(s, dir)
    // new × old: prefix × prefix candidate join (both sides
    // positional-filtered), then exact verification on the full sets
    val cross = candidatePairs(s, dir)
      .join(sets.select($"doc_id".as("dn"), $"hs".as("ha"), $"sz".as("sza")), "dn")
      .join(s.read.parquet(s"$idxDir/sets")
        .select($"doc_id".as("do_"), $"hs".as("hb"), $"sz".as("szb")), "do_")
      .withColumn("common", size(array_intersect($"ha", $"hb")).cast("long"))
      .where(lit(3) * $"common" >= $"sza" + $"szb")
      .select(least($"dn", $"do_").as("doc_a"), greatest($"dn", $"do_").as("doc_b"),
        $"common", ($"sza" + $"szb" - $"common").as("union_sz"))
    // new × new: the SAME prefix filter applies within the batch (the
    // theorem needs only a shared total order, which both sides have)
    // — a boilerplate-heavy crawl slice would otherwise pay O(df²)
    // pair expansion against itself; candidates exact-verify on the
    // full sets exactly like the cross tier
    val withinCand = newPrefix(s, dir)
      .groupBy($"h").agg(array_sort(collect_list($"m")).as("ms"))
      .where(size($"ms") > 1)
      .select(explode(PairExpand($"ms")).as("p"))
      .select(shiftrightunsigned($"p.a", PairExpand.SzBits).as("da"),
        shiftrightunsigned($"p.b", PairExpand.SzBits).as("db"))
      .distinct()
    val within = withinCand
      .join(sets.select($"doc_id".as("da"), $"hs".as("ha"), $"sz".as("sza")), "da")
      .join(sets.select($"doc_id".as("db"), $"hs".as("hb"), $"sz".as("szb")), "db")
      .withColumn("common", size(array_intersect($"ha", $"hb")).cast("long"))
      .where(lit(3) * $"common" >= $"sza" + $"szb")
      .select($"da".as("doc_a"), $"db".as("doc_b"),
        $"common", ($"sza" + $"szb" - $"common").as("union_sz"))
    cross.unionAll(within).orderBy($"doc_a", $"doc_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_incremental_neardup" -> (qIncrementalNearDup _),
  )

  /** Oracle: the full-corpus exact pair set restricted to pairs with
    * at least one new-batch member — what the incremental miner must
    * equal without ever recomputing the old×old half.
    */
  val oracle: Map[String, String] = Map(
    "q_incremental_neardup" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(t[i + 1 : i + 3], ' ') AS shingle
        |  FROM (SELECT doc_id, t, unnest(range(len(t) - 2)) AS i FROM toks WHERE len(t) >= 3)),
        |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        |srcn AS (SELECT doc_id, CAST(substring(source, 4) AS INT) AS sn FROM documents),
        |common AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, c AS common, sa.sz + sb.sz - c AS union_sz
        |FROM common
        |JOIN sizes sa ON doc_a = sa.doc_id
        |JOIN sizes sb ON doc_b = sb.doc_id
        |JOIN srcn ra ON doc_a = ra.doc_id
        |JOIN srcn rb ON doc_b = rb.doc_id
        |WHERE 3 * c >= sa.sz + sb.sz AND (ra.sn >= 10 OR rb.sn >= 10)
        |ORDER BY doc_a, doc_b""".stripMargin,
  )
}
