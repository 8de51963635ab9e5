package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** INCREMENTAL near-duplicate detection — the shape a production
  * corpus actually runs: the existing corpus's shingle fingerprints
  * were computed AT INGEST and persist as an on-disk inverted index;
  * each new batch (a fresh crawl slice) fingerprints only ITS OWN
  * documents and mines near-dup pairs (a) against the persisted index
  * and (b) within itself — O(new batch) work per increment, never a
  * recompute over the full corpus. Complements [[ScaleOps
  * .qBloomNewDocs]] (the EXACT-duplicate incremental gate) with the
  * near-dup (Jaccard ≥ 1/2) tier of the same pipeline.
  *
  * Exactness: candidates come from the full inverted index (every
  * shared shingle is a candidate generator), and the pair count IS
  * the exact |A∩B| — no LSH recall gap, so the output carries a
  * DuckDB oracle. 100 TB shape: the new×old join drives the NEW
  * batch's postings against the persisted index (shuffle bounded by
  * the new batch's memberships + matching postings, never the corpus);
  * at boilerplate-heavy scale the prefix filter
  * ([[TextAnalysis.qNgramJaccardPrefix]]) applies to both sides
  * unchanged — the index stores df-ordered postings and only prefix
  * positions join.
  */
object IncrementalDedup {

  /** The corpus split convention shared with [[ScaleOps.qBloomNewDocs]]:
    * sources src0-9 are the EXISTING corpus, src10+ the NEW batch.
    */
  private def srcNum = substring(col("source"), 4, 10).cast("int")

  /** The persisted ingest-time artifact of the EXISTING corpus, built
    * once per (session, dir) ([[graft.core.IndexCache]], same
    * lifecycle as the ANN indexes): `index/` = the inverted shingle
    * postings (h, packed member), `sets/` = the per-doc fingerprint
    * sets feeding exact verification if a consumer needs them.
    */
  private[graft] def persistedIndexDir(s: SparkSession, dir: String): String =
    graft.core.IndexCache.memo(
      s"shingle-index-dir:${s.sparkContext.applicationId}:$dir") {
      val tag = (dir + "_" + s.sparkContext.applicationId)
        .replaceAll("[^a-zA-Z0-9]+", "_")
      val p = s"${sys.props("java.io.tmpdir")}/graft_shingleidx_$tag"
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val existing = TextAnalysis.docShingleSets(
        Tables.load(s, dir, "documents").where(srcNum < 10))
      existing.write.parquet(s"$p/sets")
      existing.select(TextAnalysis.packedMember.as("m"), explode(col("hs")).as("h"))
        .write.parquet(s"$p/index")
      p
    }

  /** Near-dup pairs (exact Jaccard ≥ 1/2, same threshold and output
    * layout as [[TextAnalysis.qNgramJaccard]]) involving at least one
    * NEW document: new×old pairs mined by joining the new batch's
    * postings against the PERSISTED index, new×new pairs by the
    * standard per-shingle pair expansion over the new batch alone.
    * Old×old pairs never recompute — that work was done when those
    * documents were new.
    */
  def qIncrementalNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.PairExpand
    val szMask = lit(PairExpand.SzMask)
    val idxDir = persistedIndexDir(s, dir)
    // the new batch fingerprints ONLY itself (the at-ingest step for
    // this increment); both pair miners read one materialization
    val newSets = TextAnalysis.docShingleSets(
        Tables.load(s, dir, "documents").where(srcNum >= 10))
      .localCheckpoint(eager = false)
    val newIdx = newSets
      .select(TextAnalysis.packedMember.as("m"), explode($"hs").as("h"))
    // new × old: drive the new postings against the persisted index;
    // the per-pair count IS |A∩B| (postings are distinct per doc)
    val cross = newIdx.select($"h", $"m".as("mn"))
      .join(s.read.parquet(s"$idxDir/index").select($"h", $"m".as("mo")), "h")
      .groupBy($"mo", $"mn").agg(count(lit(1)).as("common"))
      .select(least($"mo", $"mn").as("pa"), greatest($"mo", $"mn").as("pb"),
        $"common")
    // new × new: per-shingle sorted pair expansion, new batch only
    val within = newIdx
      .groupBy($"h").agg(array_sort(collect_list($"m")).as("ms"))
      .where(size($"ms") > 1)
      .select(explode(PairExpand($"ms")).as("p"))
      .groupBy($"p.a".as("pa"), $"p.b".as("pb"))
      .agg(count(lit(1)).as("common"))
    cross.unionAll(within)
      .where(lit(3) * $"common" >= $"pa".bitwiseAND(szMask) + $"pb".bitwiseAND(szMask))
      .select(
        shiftrightunsigned($"pa", PairExpand.SzBits).as("doc_a"),
        shiftrightunsigned($"pb", PairExpand.SzBits).as("doc_b"),
        $"common",
        ($"pa".bitwiseAND(szMask) + $"pb".bitwiseAND(szMask) - $"common").as("union_sz"))
      .orderBy($"doc_a", $"doc_b")
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
