package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The k-function MinHash signature of a shingle-hash set in one
  * native loop: sig[i] = min over the set of h_i(x), where h_i is the
  * SAME hash family the SQL form used — Spark's two-argument
  * xxhash64(seed + i, x), i.e. XXH64 chained over both longs from the
  * fixed initial seed 42. Signatures are therefore bit-identical to
  * the `array_min(transform(hs, x -> xxhash64(lit(seed+i), x)))`
  * column tower this replaces; that tower evaluated interpreted
  * (k · |set| lambda dispatches per row — the minhash query's hottest
  * loop) and allocated k intermediate arrays per row. Here the k
  * per-seed prefixes are hashed once and the k×|set| body is two
  * XXH64 rounds per element in generated-code-callable Java.
  *
  * Returns array<long> of length k. An empty input set throws —
  * see [[MinHashSig.compute]] (callers filter empty sets upstream).
  */
case class MinHashSig(child: Expression, k: Int, seed: Long)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint> and k >= 1, got ${other.simpleString}, k=$k")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.MinHashSig.compute($arr, $k, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  /** Spark's XxHash64 expression seed — the chained hash starts here,
    * so xxhash64(a, b) = hashLong(b, hashLong(a, 42)).
    */
  private val SparkSqlSeed = 42L

  /** Static so generated code can call it directly. Null elements
    * contribute the bare per-seed prefix hash (matching xxhash64's
    * null-skip inside the transform lambda, which left the running
    * hash at the seed prefix — NOT skipped from the min). An EMPTY set
    * fails loudly: a sentinel signature would silently bucket every
    * empty-set row together in LSH banding (the replaced SQL form's
    * all-null signature had the same flood hazard) — callers must
    * filter empty sets upstream, and this makes that contract
    * self-enforcing.
    */
  def compute(hs: ArrayData, k: Int, seed: Long): ArrayData = {
    val n = hs.numElements()
    if (n == 0) throw new IllegalArgumentException(
      "minhash_sig of an empty set: filter size(hs) > 0 upstream " +
        "(an empty-set signature would spuriously match every other empty set)")
    val sig = new Array[Long](k)
    var i = 0
    while (i < k) {
      val prefix = XXH64.hashLong(seed + i, SparkSqlSeed)
      var best = Long.MaxValue
      var j = 0
      while (j < n) {
        val h = if (hs.isNullAt(j)) prefix else XXH64.hashLong(hs.getLong(j), prefix)
        if (h < best) best = h
        j += 1
      }
      sig(i) = best
      i += 1
    }
    new GenericArrayData(sig)
  }

  def apply(col: Column, k: Int, seed: Long): Column =
    GraftColumnBridge.column(
      MinHashSig(GraftColumnBridge.expression(col), k, seed))
}
