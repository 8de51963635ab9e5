package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Sorted distinct 64-bit hashes of all w-token shingles of a token
  * array, in ONE native loop: per shingle, chain xxhash64 over the w
  * tokens' UTF-8 bytes (no intermediate shingle string is ever
  * materialized), then sort + dedupe the primitive long array
  * in place.
  *
  * This replaces a `transform(sequence(...), i ->
  * xxhash64(concat_ws(' ', slice(toks, i+1, w))))` +
  * `array_distinct` + `array_sort` tower: higher-order-function
  * lambdas evaluate interpreted (outside whole-stage codegen, one
  * expression-tree walk per element, a string allocation per
  * shingle), and because the tower never enters codegen, common-
  * subexpression elimination can't stop `size(hs)` in the same
  * projection from recomputing the whole thing. This expression
  * inlines into the generated code and CSE applies.
  *
  * Token-boundary note: chaining per-token hashes (seed→h1→h2→h3)
  * preserves token boundaries, so ("ab","c") and ("a","bc") hash
  * differently — strictly better separation than hashing the
  * space-joined string. Collisions are the usual ~|V|²/2⁻⁶⁴.
  */
case class ShingleHashes(child: Expression, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if w >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects array<string> and w >= 1, got ${other.simpleString}, w=$w")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($arr, $w);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  private val Seed = 42L

  /** Static so generated code can call it: shingle-hash + sort +
    * dedupe without leaving the JVM's hot loop. A null token
    * contributes a fixed sentinel hashing step (never a skip — a
    * skipped position would merge ("a", null) with (null, "a") and
    * lose the very token boundaries the chaining preserves).
    */
  def compute(toks: ArrayData, w: Int): ArrayData = {
    val n = toks.numElements()
    val m = n - w + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = Seed
      var j = 0
      while (j < w) {
        if (toks.isNullAt(i + j)) h = XXH64.hashLong(-1L, h)
        else {
          val s = toks.getUTF8String(i + j)
          h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, h)
        }
        j += 1
      }
      hs(i) = h
      i += 1
    }
    java.util.Arrays.sort(hs)
    var cnt = 1
    var k = 1
    while (k < m) {
      if (hs(k) != hs(k - 1)) { hs(cnt) = hs(k); cnt += 1 }
      k += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, cnt))
  }

  def apply(col: Column, w: Int): Column =
    GraftColumnBridge.column(ShingleHashes(GraftColumnBridge.expression(col), w))
}
