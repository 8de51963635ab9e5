package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Nearest-centroid assignment for the IVF coarse quantizer: argmin
  * over squared L2 distance to a small centroid matrix, ties to the
  * lower cell index (strict-`<` scan order). The matrix is carried as
  * a codegen reference object — ONE plan object, not nCells inlined
  * sub-expressions, and the distance loops run as generated Java
  * rather than interpreted higher-order-function lambdas (nCells×dim
  * lambda dispatches per row otherwise).
  *
  * Same argmin as `array_min(transform(centroids, (c,i) ->
  * struct(dist, i))).cell` — struct ordering minimizes (dist, cell) —
  * which this replaces in [[graft.ext.IvfIndex.assignCell]].
  */
case class NearestCell(child: Expression, centroids: Seq[Seq[Double]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (centroids.isEmpty)
      TypeCheckResult.TypeCheckFailure("nearest_cell centroid matrix is empty")
    else child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nearest_cell expects an array<float> input, got ${other.simpleString}")
    }

  override def dataType: DataType = IntegerType

  // Seq gives the case class value equality (Array fields compare by
  // reference, which would defeat semanticEquals/CSE/exchange reuse);
  // the hot loop still runs over primitive arrays
  @transient private lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    NearestCell.compute(input.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.NearestCell.compute($arr, $cRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

object NearestCell {

  /** Static so generated code can call it directly. A vector whose
    * length differs from the centroid dimension (shorter OR longer) is
    * corrupt input: returns -1 (an impossible cell) rather than a
    * confidently wrong argmin over a truncated prefix — IVF probing
    * never selects cell -1, and [[PqAdcScore.compute]] scores a -1
    * code +∞, so corrupt rows drop out of ANN results instead of
    * polluting them.
    */
  def compute(vec: ArrayData, cs: Array[Array[Double]]): Int = {
    var best = 0
    var bestDist = Double.PositiveInfinity
    var c = 0
    while (c < cs.length) {
      val cent = cs(c)
      if (vec.numElements() != cent.length) return -1
      var d = 0.0
      var i = 0
      while (i < cent.length) {
        val diff = vec.getFloat(i).toDouble - cent(i)
        d += diff * diff
        i += 1
      }
      if (d < bestDist) { bestDist = d; best = c }
      c += 1
    }
    best
  }

  def apply(vec: Column, centroids: Array[Array[Double]]): Column =
    GraftColumnBridge.column(NearestCell(GraftColumnBridge.expression(vec),
      centroids.map(_.toSeq).toSeq))
}
