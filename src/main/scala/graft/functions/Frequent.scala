package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Misra–Gries frequent-items (heavy-hitter) aggregate: a bounded summary of
  * at most k counters whose partial states merge associatively. The point is
  * the SHUFFLE CONTRACT, as [[TopK]]: a full `groupBy(token)` over an N-token
  * corpus shuffles the whole token multiset; this summary exchanges at most
  * k·partitions counters regardless of N — the candidate-generation half of
  * the scalable two-pass heavy-hitter pattern (candidates here, then one
  * exact-count pass restricted to the ≤ k candidates).
  *
  * Guarantee (and why the two-pass result is EXACT): each counter
  * underestimates its item's true count by at most (decrements so far) ≤ n/(k+1),
  * and merging two summaries adds their error bounds — over any merge tree
  * the total error is ≤ n/(k+1) for n input rows. Hence every item with true
  * frequency > n/(k+1) survives with a positive counter: the candidate set
  * has NO false negatives above that bound. False positives are eliminated by
  * the exact second pass, so the final output is deterministic and exact for
  * any threshold θ > 1/(k+1) — with k = 1024 and θ = 1%, a 58× margin.
  *
  * Output order: counter VALUES are merge-order-dependent (only the bound is
  * deterministic), so eval emits the item set sorted lexicographically and
  * deliberately does NOT expose the estimates — callers must join back for
  * exact counts rather than being tempted to publish scheduling-dependent
  * numbers.
  */
object Frequent {

  case class MisraGries(child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StringType)
    override def prettyName: String = "graft_misra_gries"

    override def createAggregationBuffer(): mutable.HashMap[String, Long] =
      mutable.HashMap.empty[String, Long]

    override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
      val v = child.eval(input)
      if (v != null) {
        val s = v.asInstanceOf[UTF8String].toString
        buf.get(s) match {
          case Some(c) => buf.update(s, c + 1)
          case None if buf.size < k => buf.update(s, 1L)
          case None => // full: decrement every counter, dropping zeros
            buf.filterInPlace((_, c) => c > 1).mapValuesInPlace((_, c) => c - 1): Unit
        }
      }
      buf
    }

    /** Agarwal et al.'s mergeable-summaries rule: add counters pointwise,
      * then if more than k survive, subtract the (k+1)-th largest value from
      * all and drop the non-positive — at most k stay positive, and the
      * subtraction adds at most the other summary's error bound. */
    override def merge(buf: mutable.HashMap[String, Long], other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      other.foreach { case (s, c) =>
        buf.update(s, buf.getOrElse(s, 0L) + c)
      }
      if (buf.size > k) {
        val kth = buf.values.toArray.sorted(Ordering[Long].reverse).apply(k)
        buf.filterInPlace((_, c) => c > kth)
        buf.mapValuesInPlace((_, c) => c - kth)
      }
      buf
    }

    override def eval(buf: mutable.HashMap[String, Long]): Any =
      new GenericArrayData(
        buf.keysIterator.toArray.sorted.map(UTF8String.fromString))

    override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
      val items = buf.toArray
      val payload = items.map { case (s, _) => s.getBytes(StandardCharsets.UTF_8) }
      val bb = ByteBuffer.allocate(4 + payload.map(_.length + 12).sum)
      bb.putInt(items.length)
      items.zip(payload).foreach { case ((_, c), b) =>
        bb.putInt(b.length); bb.put(b); bb.putLong(c)
      }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = createAggregationBuffer()
      (0 until n).foreach { _ =>
        val b = new Array[Byte](bb.getInt)
        bb.get(b)
        buf.update(new String(b, StandardCharsets.UTF_8), bb.getLong)
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren(0))
  }

  /** Column form: lexicographically sorted array&lt;string&gt; of the ≤ k
    * candidate heavy hitters (superset of every item with freq > n/(k+1)). */
  def misraGries(item: Column, k: Int): Column =
    bridge.column(
      MisraGries(bridge.expression(item), k).toAggregateExpression())
}
