package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Scalar quantization (SQ8) — the third standard ANN memory layout
  * beside product quantization ([[PqIndex]]) and sign-LSH bucketing
  * ([[Similarity]]): each vector component is affinely mapped to one
  * byte using per-dimension (min, scale) trained from the corpus, so
  * a 64-float vector becomes 64 bytes (4× smaller) with NO codebook
  * lookup at encode time — the cheap-encode/cheap-train point on the
  * compression curve, which is why serving systems default to it
  * until memory pressure forces PQ.
  *
  * 100 TB shape: the training statistic is one per-dimension min/max
  * aggregate (map-side partials, a `dim`-row result — bounded however
  * large the corpus is), cached process-wide like the IVF/PQ artifacts
  * ([[graft.core.IndexCache]]); encoding is a map-side `zip_with`
  * projection; queries score RECONSTRUCTED vectors (min + code/scale —
  * the asymmetric-distance form: the query stays full precision, only
  * the database side is quantized) and exact-re-rank a broadcast
  * shortlist, the same ADC+R tail as PQ.
  */
object SqIndex {

  /** Per-dimension (mins, scales) with scale = 255/(max−min); a
    * degenerate dimension (max = min) gets scale 0 and encodes to 0.
    * ONE distributed aggregate, `dim` output rows — training cost is
    * independent of corpus size. Cached per (dir, bits).
    */
  def trainedParams(emb: DataFrame, dir: String): (Array[Double], Array[Double]) =
    graft.core.IndexCache.memo(s"sq8:$dir:bits=8") {
      val s = emb.sparkSession
      import s.implicits._
      val rows = emb
        .select(posexplode(col("embedding")).as(Seq("dim", "e")))
        .groupBy($"dim")
        .agg(min($"e".cast("double")).as("mn"), max($"e".cast("double")).as("mx"))
        .orderBy($"dim")
        .as[(Int, Double, Double)].collect()
      val mins = rows.map(_._2)
      val scales = rows.map { case (_, mn, mx) => if (mx > mn) 255.0 / (mx - mn) else 0.0 }
      (mins, scales)
    }

  /** Byte codes as an int array column: clamp(floor((x − min)·scale),
    * 0, 255) per dimension — a pure map-side projection (nested
    * zip_with against the parameter literals; no shuffle, no lookup
    * table). At scale this column is materialized once and the ANN
    * scan reads ONLY it (64 B/vector instead of 256 B).
    */
  def encodeExpr(vec: Column, mins: Array[Double], scales: Array[Double]): Column = {
    val minLit = array(mins.map(lit(_)).toIndexedSeq: _*)
    val scaleLit = array(scales.map(lit(_)).toIndexedSeq: _*)
    zip_with(zip_with(vec, minLit, (x, m) => x.cast("double") - m), scaleLit,
      (d, sc) => greatest(lit(0L), least(lit(255L), floor(d * sc))).cast("int"))
  }

  /** Driver-side twin of [[encodeExpr]] (same IEEE operation order, so
    * a query vector encodes bit-identically to a stored one).
    */
  def encode(v: Array[Float], mins: Array[Double], scales: Array[Double]): Array[Int] =
    Array.tabulate(v.length) { i =>
      val c = math.floor((v(i).toDouble - mins(i)) * scales(i))
      math.max(0L, math.min(255L, c.toLong)).toInt
    }

  /** Asymmetric scan score: reconstruct each stored component as
    * min + code/scale and dot it with the FULL-precision query — the
    * standard SQ asymmetric distance (quantizing the query too would
    * throw away precision for no scan saving). Map-side fold over the
    * code column; the parameter and query vectors ride as plan
    * literals.
    */
  def reconDotScore(codes: Column, query: Array[Float],
                    mins: Array[Double], scales: Array[Double]): Column = {
    val minLit = array(mins.map(lit(_)).toIndexedSeq: _*)
    val invLit = array(scales.map(s => lit(if (s > 0) 1.0 / s else 0.0)).toIndexedSeq: _*)
    val qlit = array(query.map(x => lit(x.toDouble)).toIndexedSeq: _*)
    val recon = zip_with(zip_with(codes, invLit, (c, iv) => c.cast("double") * iv),
      minLit, (p, m) => p + m)
    aggregate(zip_with(recon, qlit, (r, q) => r * q), lit(0.0d), (acc, v) => acc + v)
  }

  /** SQ8 cosine top-10 of vec_id 0 in the two-stage ADC+R shape:
    *
    *   1. shortlist: encode on the fly (the materialized layout scans
    *      codes only), score by [[reconDotScore]], TakeOrdered
    *      top-`shortlist` — no shuffle;
    *   2. re-rank: exact [[graft.functions.QuantizedCosine]] on just
    *      the broadcast shortlist against the original vectors.
    *
    * The registry runs shortlist=512 ≥ corpus size at the gate SFs, so
    * the re-rank provably covers the exact top-k and the result
    * carries the same exact-cosine oracle as q_cosine_topk/q_ann_lsh;
    * the tight-shortlist approximate config is recall-asserted in
    * SqSpec.
    */
  def annSq(s: SparkSession, dir: String, shortlistN: Int): DataFrame = {
    import s.implicits._
    val emb = Tables.load(s, dir, "embeddings")
    val (mins, scales) = trainedParams(emb, dir)
    val query = emb.filter($"vec_id" === 0).select($"embedding").as[Array[Float]].head()
    val shortlist = emb.filter($"vec_id" =!= 0)
      .select($"vec_id",
        reconDotScore(encodeExpr($"embedding", mins, scales), query, mins, scales).as("score"))
      .orderBy($"score".desc, $"vec_id")
      .limit(shortlistN)
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("qvec"))
    emb.join(broadcast(shortlist.select($"vec_id")), "vec_id")
      .join(broadcast(q))
      .select($"vec_id",
        graft.functions.QuantizedCosine($"embedding", $"qvec").as("cosq"))
      .orderBy($"cosq".desc, $"vec_id")
      .limit(10)
  }

  /** Registry entry: full-shortlist exact mode (see [[annSq]]). */
  def qAnnSq8(s: SparkSession, dir: String): DataFrame = annSq(s, dir, shortlistN = 512)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_sq8" -> (qAnnSq8 _),
  )

  val oracle: Map[String, String] = Map(
    // exact configuration (shortlist ≥ corpus) ⇒ same exact
    // quantized-cosine top-10 as the brute-force and LSH paths
    "q_ann_sq8" -> Similarity.exactTopKCosineSql,
  )
}
