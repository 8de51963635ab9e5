package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator (the UDAF axis, SURVEY.md §2.9 extension):
  * element-wise centroid of float vectors. Buffer is (running sums,
  * count) so the merge is associative/commutative — safe under
  * partial aggregation and any shuffle order at cluster scale.
  */
class CentroidAggregator(dim: Int)
  extends Aggregator[Array[Float], CentroidAggregator.Buf, Array[Double]] {

  import CentroidAggregator.Buf

  override def zero: Buf = Buf(new Array[Double](dim), 0L)

  override def reduce(b: Buf, v: Array[Float]): Buf = {
    val n = math.min(dim, v.length)
    var i = 0
    while (i < n) { b.sums(i) += v(i); i += 1 }
    Buf(b.sums, b.count + 1)
  }

  override def merge(a: Buf, b: Buf): Buf = {
    var i = 0
    while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
    Buf(a.sums, a.count + b.count)
  }

  override def finish(b: Buf): Array[Double] =
    if (b.count == 0) new Array[Double](dim)
    else b.sums.map(_ / b.count)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

object CentroidAggregator {
  case class Buf(sums: Array[Double], count: Long)
}
