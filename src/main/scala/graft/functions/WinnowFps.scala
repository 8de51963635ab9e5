package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, StringType}

/** Winnowing fingerprints (Schleimer et al., SIGMOD'03) of a token
  * array, in ONE native loop: md5 every w-token shingle (the digest of
  * the space-joined shingle string, bit-identical to
  * `unhex(md5(concat_ws(' ', …)))`, so the recipe stays replicable in
  * the oracle dialect), take the minimum digest of every window of
  * `win` consecutive shingles (tail windows shrink, matching a
  * `rowsBetween(0, win-1)` frame), and return the SORTED DISTINCT
  * minima. Unsigned byte order equals hex-string order (hex is a
  * monotone nibble encoding), so the minima are the same shingles an
  * oracle's string `min` would pick.
  *
  * Why an expression and not `transform(sequence(...), i ->
  * array_min(slice(hashes, i+1, win)))`: higher-order-function
  * lambdas evaluate interpreted, and an aliased array inlined into a
  * lambda body is recomputed PER LAMBDA INVOCATION — the md5 tower
  * ends up O(n²) per document and the job never finishes at bench
  * scale. This expression inlines into generated code, hashes each
  * shingle exactly once, and keeps winnowing a pure map operation
  * (zero shuffles, vs the window-exchange + sort + distinct-exchange
  * of the first-cut `posexplode` + window-min form).
  */
case class WinnowFps(child: Expression, w: Int, win: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if w >= 1 && win >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps expects array<string> and w, win >= 1, got ${other.simpleString}, w=$w, win=$win")
  }

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WinnowFps.compute(input.asInstanceOf[ArrayData], w, win)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.WinnowFps.compute($arr, $w, $win);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {

  private val digestPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val cmp = new java.util.Comparator[Array[Byte]] {
    def compare(a: Array[Byte], b: Array[Byte]): Int =
      java.util.Arrays.compareUnsigned(a, b)
  }

  /** Static so generated code can call it. Null tokens are skipped
    * inside a shingle exactly like `concat_ws` skips nulls (the
    * string form this replaces).
    */
  def compute(toks: ArrayData, w: Int, win: Int): ArrayData = {
    val n = toks.numElements()
    val m = n - w + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val md = digestPool.get()
    val digests = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      md.reset()
      var first = true
      var j = 0
      while (j < w) {
        if (!toks.isNullAt(i + j)) {
          if (!first) md.update(' '.toByte)
          md.update(toks.getUTF8String(i + j).getBytes)
          first = false
        }
        j += 1
      }
      digests(i) = md.digest()
      i += 1
    }
    val mins = new Array[Array[Byte]](m)
    i = 0
    while (i < m) {
      var best = digests(i)
      var j = i + 1
      val end = math.min(i + win, m)
      while (j < end) {
        if (java.util.Arrays.compareUnsigned(digests(j), best) < 0) best = digests(j)
        j += 1
      }
      mins(i) = best
      i += 1
    }
    java.util.Arrays.sort(mins, cmp)
    val out = new Array[Any](m)
    var cnt = 0
    i = 0
    while (i < m) {
      if (i == 0 || (mins(i) ne mins(i - 1)) &&
          java.util.Arrays.compareUnsigned(mins(i), mins(i - 1)) != 0) {
        out(cnt) = mins(i)
        cnt += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOfRange(out.asInstanceOf[Array[AnyRef]], 0, cnt))
  }

  def apply(col: Column, w: Int, win: Int): Column =
    GraftColumnBridge.column(WinnowFps(GraftColumnBridge.expression(col), w, win))
}
