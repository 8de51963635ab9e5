package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Folds an array of (hash, weight) pairs into a 64-bit SimHash
  * fingerprint: bit j is set iff Σ over pairs of (+tf if bit j of th
  * set, else −tf) is positive. Native replacement for the nested
  * higher-order-function formulation in
  * [[graft.ext.MinHashDedup.simhash]] — one generated loop with 64
  * local counters instead of 64·n interpreted lambda dispatches.
  */
case class SimHashFold(child: Expression) extends UnaryExpression {

  private val expected = ArrayType(StructType(Seq(
    StructField("th", LongType), StructField("tf", LongType))))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(a, b)), _)
      if a.dataType == LongType && b.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_fold expects array<struct<th:bigint,tf:bigint>>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Long](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val row = arr.getStruct(i, 2)
      val th = row.getLong(0)
      val tf = row.getLong(1)
      var j = 0
      while (j < 64) {
        if (((th >>> j) & 1L) == 1L) counts(j) += tf else counts(j) -= tf
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val row = ctx.freshName("row")
      val th = ctx.freshName("th")
      val tf = ctx.freshName("tf")
      val fp = ctx.freshName("fp")
      s"""
         |long[] $counts = new long[64];
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  org.apache.spark.sql.catalyst.InternalRow $row = $arr.getStruct($i, 2);
         |  long $th = $row.getLong(0);
         |  long $tf = $row.getLong(1);
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($th >>> $j) & 1L) == 1L) $counts[$j] += $tf; else $counts[$j] -= $tf;
         |  }
         |}
         |long $fp = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($counts[$j] > 0) $fp |= (1L << $j);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashFold =
    copy(child = newChild)
}

object SimHashFold {
  def apply(col: Column): Column =
    GraftColumnBridge.column(SimHashFold(GraftColumnBridge.expression(col)))
}
