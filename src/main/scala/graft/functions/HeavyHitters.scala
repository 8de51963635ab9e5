package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a TypedImperativeAggregate:
  * finds every value with frequency > n/k using O(k) space per
  * partial, with mergeable buffers (Agarwal et al., PODS'12 merge:
  * sum counters, then subtract the (k+1)-th largest so at most k
  * survive). The 100 TB use: token/domain/url heavy hitters over a
  * corpus without a full groupBy — one pass, k counters per task,
  * partial-aggregated map-side like any algebraic aggregate.
  *
  * Guarantees: any item with true count > n/k is in the output;
  * estimates are within n/k below the true count. Counts (and
  * therefore exact output order) depend on partition processing
  * order, as with any MG sketch — consumers rank by estimate.
  */
case class HeavyHitters(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType), StructField("est_count", LongType))))

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def add(buf: mutable.HashMap[String, Long], key: String, inc: Long): Unit = {
    buf.get(key) match {
      case Some(c) => buf.update(key, c + inc)
      case None if buf.size < k => buf.update(key, inc)
      case None =>
        // decrement-all by the classic MG step (bounded by inc)
        val dec = math.min(inc, buf.values.min)
        val dead = mutable.ArrayBuffer.empty[String]
        buf.keysIterator.foreach { kk =>
          val nc = buf(kk) - dec
          if (nc <= 0) dead += kk else buf.update(kk, nc)
        }
        dead.foreach(buf.remove)
        if (inc > dec && buf.size < k) buf.update(key, inc - dec)
    }
  }

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow):
      mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.toString, 1L)
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (kk, c) => buf.update(kk, buf.getOrElse(kk, 0L) + c) }
    if (buf.size > k) {
      val cut = buf.values.toSeq.sorted(Ordering[Long].reverse)(k) // (k+1)-th largest
      val dead = buf.collect { case (kk, c) if c - cut <= 0 => kk }.toSeq
      buf.keysIterator.toSeq.foreach { kk =>
        val nc = buf(kk) - cut
        if (nc > 0) buf.update(kk, nc)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toSeq.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), c))
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (kk, c) => out.writeUTF(kk); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach(_ => buf.update(in.readUTF(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren.head)
}

object HeavyHitters {
  def apply(col: Column, k: Int): Column =
    GraftColumnBridge.column(
      HeavyHitters(GraftColumnBridge.expression(col), k).toAggregateExpression())
}
