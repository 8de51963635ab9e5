package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Engine-independent quantized cosine similarity over two
  * float-vector columns: returns `floor(cos · 10⁴)` as a long,
  * computed from integer-quantized components so ANY engine that
  * follows the same recipe produces the bit-identical value.
  *
  * Recipe (the contract shared with the DuckDB oracle SQL in
  * [[graft.ext.Similarity]]):
  *   1. quantize each float element to `floor(x · 2²⁰)` as int64 —
  *      multiplying a float by a power of two is exact in double, and
  *      floor is unambiguous in every engine (unlike round(), whose
  *      half-way rule differs by engine AND by version);
  *   2. dot product and both squared norms in exact int64 arithmetic —
  *      order-independent, so partitioning can never change the
  *      result. Overflow-safe while 64·(|x|·2²⁰)² < 2⁶³, i.e.
  *      component magnitudes up to ~362 — two orders of magnitude
  *      beyond any normalized-embedding range (this corpus: |x|<0.6);
  *      callers with unnormalized vectors must rescale first;
  *   3. one double division `dot / sqrt(na · nb) · 10⁴` over exactly
  *      equal integer inputs — IEEE-754 ops are correctly rounded, so
  *      the double is bit-identical everywhere — then floor to long.
  *
  * Zero-norm inputs yield 0 (mirrored by a CASE arm in the oracle).
  * Same fused-loop codegen as [[CosineSimilarity]]; that expression
  * remains the raw-double variant for rows-only ANN paths.
  */
case class QuantizedCosine(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine_q expects two array<float> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    // dot over the shared prefix, each norm over its FULL vector —
    // exactly the oracle's shape (its nrm CTE unnests the whole array
    // while the dot joins on shared indices), so ragged inputs agree
    val nx = xs.numElements(); val ny = ys.numElements()
    val n = math.min(nx, ny)
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val x = math.floor(xs.getFloat(i).toDouble * 1048576.0).toLong
      val y = math.floor(ys.getFloat(i).toDouble * 1048576.0).toLong
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    while (i < nx) {
      val x = math.floor(xs.getFloat(i).toDouble * 1048576.0).toLong
      na += x * x; i += 1
    }
    var j = n
    while (j < ny) {
      val y = math.floor(ys.getFloat(j).toDouble * 1048576.0).toLong
      nb += y * y; j += 1
    }
    if (na == 0L || nb == 0L) 0L
    else math.floor(dot.toDouble / math.sqrt(na.toDouble * nb.toDouble) * 10000.0).toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $n = java.lang.Math.min($nx, $ny);
         |long $dot = 0L, $na = 0L, $nb = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = (long) java.lang.Math.floor((double) $a.getFloat($i) * 1048576.0);
         |  long $y = (long) java.lang.Math.floor((double) $b.getFloat($i) * 1048576.0);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |for (int $i = $n; $i < $nx; $i++) {
         |  long $x = (long) java.lang.Math.floor((double) $a.getFloat($i) * 1048576.0);
         |  $na += $x * $x;
         |}
         |for (int $i = $n; $i < $ny; $i++) {
         |  long $y = (long) java.lang.Math.floor((double) $b.getFloat($i) * 1048576.0);
         |  $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0L || $nb == 0L) ? 0L :
         |  (long) java.lang.Math.floor((double) $dot /
         |    java.lang.Math.sqrt((double) $na * (double) $nb) * 10000.0);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): QuantizedCosine =
    copy(left = newLeft, right = newRight)
}

object QuantizedCosine {
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      QuantizedCosine(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
