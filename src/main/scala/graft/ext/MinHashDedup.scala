package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** MinHash + LSH near-duplicate detection over documents — the scale
  * path for fuzzy dedup (SURVEY.md §7.5.8): shingle → minhash
  * signature → banded bucket join → exact-Jaccard verify on the
  * candidate pairs only. At 100 TB the candidate join touches
  * O(near-dupes), never O(n²): per-band buckets are the join key, and
  * the final verify joins the inverted shingle index restricted to
  * candidates.
  *
  * Hash family: h_i(x) = xxhash64(seed_i, xxhash64(shingle)) —
  * re-hashing the per-doc shingle-hash array with k seeds, so
  * signature computation is k array_min/transform expressions in one
  * map-side projection (codegen'd builtins, no UDFs, no shuffle).
  */
object MinHashDedup {

  /** Per-doc sorted distinct shingle-hash sets — delegates to the
    * single definition in [[TextAnalysis.docShingleSets]].
    */
  def shingleSets(docs: DataFrame, textCol: String = "text", w: Int = 3): DataFrame =
    TextAnalysis.docShingleSets(docs, textCol, w)

  /** k-minhash signature per doc, one column per hash fn, computed
    * MAP-SIDE from the per-doc shingle-hash array — zero shuffles, vs
    * the explode→groupBy→k·min() aggregate shape which shuffles the
    * whole inverted index. All k minima come from ONE native loop
    * ([[graft.functions.MinHashSig]], bit-identical to the
    * `array_min(transform(hs, x -> xxhash64(lit(seed+i), x)))` tower
    * it replaces, which evaluated k·|set| interpreted lambdas per
    * row). The two Projects stay separate — element_at references a
    * non-cheap producer 32×, which CollapseProject refuses to inline —
    * so the signature computes once per row.
    */
  def signatures(ds: DataFrame, k: Int, seed: Long = 42L): DataFrame = {
    val withSig = ds.select(col("doc_id"),
      graft.functions.MinHashSig(col("hs"), k, seed).as("sig"))
    val sigs = (0 until k).map(i => element_at(col("sig"), i + 1).as(s"h$i"))
    withSig.select(col("doc_id") +: sigs: _*)
  }

  /** LSH candidate pairs: equal banded signature slice in ≥1 band.
    * Expressed as a per-bucket pair expansion (groupBy bucket →
    * collect members → emit pairs via the codegen'd
    * [[graft.functions.PairExpand]]) rather than a self-join — one
    * pass over the banded table instead of two recomputed join
    * branches, and the bucket aggregate is where a production job
    * would apply a skew cap (giant bucket = near-identical cluster).
    */
  def candidatePairs(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandStructs = (0 until bands).map { j =>
      val cols = (j * rowsPerBand until (j + 1) * rowsPerBand).map(i => col(s"h$i"))
      struct(lit(j).as("band"), hash(cols: _*).as("bh"))
    }
    sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("b"))
      .groupBy(col("b")).agg(array_sort(collect_list(col("doc_id"))).as("ds"))
      .where(size(col("ds")) > 1)
      .select(explode(graft.functions.PairExpand(col("ds"))).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()
  }

  /** Exact-Jaccard verification restricted to candidate pairs: two
    * joins against the per-doc hash arrays, intersection via
    * array_intersect on sorted long arrays — vs the previous
    * candidates×shingle-index double join + sizes join-backs (4 joins
    * and a shuffle of the whole index). The threshold test is
    * integer-only (j ≥ n/d ⇔ d·common ≥ n·union).
    */
  def verifiedPairs(ds: DataFrame, candidates: DataFrame,
                    thresholdNum: Int = 1, thresholdDen: Int = 2): DataFrame =
    candidates
      .join(ds.select(col("doc_id").as("doc_a"), col("hs").as("ha"), col("sz").as("sza")), "doc_a")
      .join(ds.select(col("doc_id").as("doc_b"), col("hs").as("hb"), col("sz").as("szb")), "doc_b")
      .withColumn("common", size(array_intersect(col("ha"), col("hb"))).cast("long"))
      .withColumn("union_sz", col("sza") + col("szb") - col("common"))
      .where(col("common") * lit(thresholdDen) >= col("union_sz") * lit(thresholdNum))
      .select(col("doc_a"), col("doc_b"), col("common"), col("union_sz"))

  /** End-to-end MinHash-LSH near-dup query (rows-only check — xxhash64
    * has no oracle-dialect equivalent; correctness is covered by the
    * MinHashSpec recall test against the exact q_ngram_jaccard).
    */
  def qMinhashPairs(s: SparkSession, dir: String): DataFrame = {
    // ds feeds the signature pass and both verify joins — checkpoint
    // the one tokenize+hash scan. LAZY (eager=false): plan-only
    // consumers pay nothing, the first action materializes the blocks
    // once, and the ContextCleaner releases them on GC (vs persist(),
    // whose CacheManager entry leaked per (session, dir) invocation)
    val ds = shingleSets(Tables.load(s, dir, "documents")).localCheckpoint(eager = false)
    val sig = signatures(ds, k = 32)
    val cand = candidatePairs(sig, bands = 16, rowsPerBand = 2)
    verifiedPairs(ds, cand).orderBy(col("doc_a"), col("doc_b"))
  }

  /** The SimHash fingerprint as a single Column over a token-array
    * column: 64-bit, bit j set iff Σ_tokens ±tf > 0 (sign of the j-th
    * bit of xxhash64(token), weighted by term frequency). Computed
    * entirely MAP-SIDE: summing ±1 per token OCCURRENCE equals
    * summing ±tf per distinct token, so no (doc, token) tf aggregate
    * is needed at all — hash each occurrence and fold to 64 bits with
    * the codegen'd [[graft.functions.SimHashFold]] in one projection,
    * zero shuffles. Shared by the batch pair-mining path and the
    * streaming dedup filter
    * ([[graft.streaming.StreamOps.dedupNearDupStream]]).
    */
  def simhashCol(toks: Column): Column =
    graft.functions.SimHashFold(
      transform(toks, t => struct(xxhash64(t).as("th"), lit(1L).as("tf"))))

  /** Per-doc fingerprints over a `text` column — see [[simhashCol]]. */
  def simhash(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(col("doc_id"), TextAnalysis.tokens(col(textCol)).as("toks"))
      // token-less docs have no fingerprint (SimHashFold of an empty
      // array would be 0L and every such doc would spuriously pair up
      // at hamming 0) — drop them, as the explode-based shape did
      .where(size(col("toks")) > 0)
      .select(col("doc_id"), simhashCol(col("toks")).as("simhash"))

  /** Near-dup pairs by SimHash: 4×16-bit band join, verify Hamming
    * distance ≤ maxHamming via bit_count(xor).
    */
  def qSimhashPairs(s: SparkSession, dir: String, maxHamming: Int = 8): DataFrame = {
    val fp = simhash(Tables.load(s, dir, "documents"))
    // band the 64-bit fingerprint into 4×16-bit chunks; per-chunk
    // bucket pair expansion (no self-join), then exact hamming verify
    fp.select(struct(col("doc_id"), col("simhash")).as("d"),
        explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("chunk", expr("(d.simhash >> (band * 16)) & 65535"))
      .groupBy(col("band"), col("chunk"))
      .agg(array_sort(collect_list(col("d"))).as("ds"))
      .where(size(col("ds")) > 1)
      .select(explode(TextAnalysis.allPairs(col("ds"))).as("p"))
      .select(col("p.a.doc_id").as("doc_a"), col("p.b.doc_id").as("doc_b"),
        col("p.a.simhash").as("fp_a"), col("p.b.simhash").as("fp_b"))
      .distinct()
      .where(expr(s"bit_count(fp_a ^ fp_b) <= $maxHamming"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(fp_a ^ fp_b)").cast("long").as("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_minhash_pairs" -> ((s, d) => qMinhashPairs(s, d)),
    "q_simhash_pairs" -> ((s, d) => qSimhashPairs(s, d)),
  )

  val oracle: Map[String, String] = Map.empty // rows-only by design
}
