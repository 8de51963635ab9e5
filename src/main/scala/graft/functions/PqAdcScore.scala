package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Asymmetric-distance (ADC) scoring for product-quantized vectors:
  * score(code) = Σ_j table(j)(code(j)), where the table holds the
  * query's precomputed partial distances to every sub-centroid
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI'11). The per-query table is m×k doubles — tiny — and rides
  * into the plan as one reference object; scoring a code is m array
  * lookups + adds in generated Java, never touching the original
  * vector. This is what makes scanning billions of vectors feasible:
  * the scan reads m small codes (32× less than the float vector) and
  * does m adds per row.
  *
  * `table` is Seq-of-Seq for case-class value equality (see
  * [[NearestCell]]); the hot loop uses primitive arrays.
  */
case class PqAdcScore(child: Expression, table: Seq[Seq[Double]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (table.isEmpty)
      TypeCheckResult.TypeCheckFailure("pq_adc distance table is empty")
    else child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects an array<int> code, got ${other.simpleString}")
    }

  override def dataType: DataType = DoubleType

  @transient private lazy val matrix: Array[Array[Double]] =
    table.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    PqAdcScore.compute(input.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("adcTable", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.PqAdcScore.compute($arr, $tRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcScore =
    copy(child = newChild)
}

object PqAdcScore {

  /** Static so generated code calls it directly. Corrupt input —
    * wrong code length OR an id past the table width — scores +∞
    * rather than throwing mid-scan (a truncated sum would rank the
    * corrupt row spuriously HIGH in a distance shortlist).
    */
  def compute(code: ArrayData, table: Array[Array[Double]]): Double = {
    val m = table.length
    if (code.numElements() != m) return Double.PositiveInfinity
    var s = 0.0
    var j = 0
    while (j < m) {
      val c = code.getInt(j)
      if (c < 0 || c >= table(j).length) return Double.PositiveInfinity
      s += table(j)(c)
      j += 1
    }
    s
  }

  def apply(code: Column, table: Array[Array[Double]]): Column =
    GraftColumnBridge.column(PqAdcScore(GraftColumnBridge.expression(code),
      table.map(_.toSeq).toSeq))
}
