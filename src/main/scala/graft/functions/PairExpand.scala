package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** All ordered pairs (a, b) with a < b (array order) from a sorted
  * long array, as one native loop producing `array<struct<a,b>>`.
  *
  * This is the bucket-expansion kernel of every pair-mining query
  * (inverted-index Jaccard, MinHash-LSH candidates): per join-key
  * bucket of n members it emits the n(n-1)/2 candidate pairs. The
  * higher-order-function form it replaces — `flatten(transform(xs,
  * (x,i) -> transform(slice(...), y -> struct(x,y))))` — evaluates
  * interpreted: one expression-tree walk and several array
  * allocations PER PAIR, on the hottest path of the whole dedup
  * pipeline (O(Σ df²) pairs). This expression inlines into whole-stage
  * codegen and builds each pair as a bare two-long row.
  *
  * Members usually travel PACKED: (doc_id << SzBits) | set_size, so a
  * pair is two longs instead of two structs — see
  * [[graft.ext.TextAnalysis.qNgramJaccard]]. The quadratic output is
  * the caller's to bound (cap df / prefix-filter — the same contract
  * the HOF form had).
  */
case class PairExpand(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pair_expand expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(input: Any): Any =
    PairExpand.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.PairExpand.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): PairExpand =
    copy(child = newChild)
}

object PairExpand {

  /** Bits reserved for the packed set size (low bits); doc ids must
    * fit in the remaining 63 - SzBits (plenty: 2^43 ids, 1M-shingle
    * docs).
    */
  val SzBits = 20
  val SzMask = (1L << SzBits) - 1L

  /** Hard ceiling on pairs per bucket (2^26 ≈ 67M ≈ an 11,586-member
    * bucket). Beyond it the array itself is the problem — and without
    * the guard `n*(n-1)/2` overflows Int at n ≥ 65,537, turning a
    * boilerplate-shingle or giant-LSH-band bucket into a
    * NegativeArraySizeException (or worse, a wrapped-positive size
    * and silent index corruption).
    */
  val MaxPairs: Long = 1L << 26

  /** Static so generated code can call it directly. A null element is
    * treated as Long.MinValue (it cannot occur from collect_list,
    * which drops nulls — this is belt-and-braces for direct SQL use).
    */
  def compute(xs: ArrayData): ArrayData = {
    val n = xs.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val nPairs = n.toLong * (n - 1) / 2
    if (nPairs > MaxPairs) throw new IllegalStateException(
      s"pair_expand: bucket of $n members expands to $nPairs pairs " +
        s"(cap $MaxPairs) — cap the bucket's document frequency or use " +
        "the prefix-filtered path (TextAnalysis.qNgramJaccardPrefix)")
    val out = new Array[Any](nPairs.toInt)
    var k = 0
    var i = 0
    while (i < n) {
      val a = if (xs.isNullAt(i)) Long.MinValue else xs.getLong(i)
      var j = i + 1
      while (j < n) {
        val b = if (xs.isNullAt(j)) Long.MinValue else xs.getLong(j)
        out(k) = new GenericInternalRow(Array[Any](a, b)): InternalRow
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(col: Column): Column =
    GraftColumnBridge.column(PairExpand(GraftColumnBridge.expression(col)))
}
