package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k best (score desc, id asc) pairs in a
  * size-k heap. The point is the SHUFFLE CONTRACT: partial aggregation
  * states are at most k entries, so a distributed top-k over an
  * N-row scored set exchanges k·groups·partitions rows — not N. A
  * row_number window would shuffle all N scored rows to rank them
  * (the difference between "top-10 of a billion cosines" being a k-sized
  * merge or a full-data exchange).
  *
  * Determinism: total order is (score desc, id asc); the heap keeps exactly
  * the first k of that order, so results match a rank-and-filter formulation
  * bit for bit.
  */
object TopK {

  /** (score, id) entry; `worst` ordering dequeues the lowest score (ties:
    * the larger id) — the element to evict when the heap exceeds k. */
  private type Entry = (Double, Long)
  private val worstFirst: Ordering[Entry] = new Ordering[Entry] {
    override def compare(a: Entry, b: Entry): Int = {
      val byScore = java.lang.Double.compare(b._1, a._1) // lower score = "greater"
      if (byScore != 0) byScore else java.lang.Long.compare(a._2, b._2) // larger id = "greater"
    }
  }

  /** `dedup = true` makes the aggregate a top-k over the DISTINCT (score,
    * id) tuples — the multi-probe IVF case, where a (query, cand) pair
    * meeting in two probed cells arrives twice with an IDENTICAL tuple
    * (grid scores are exact and rounded identically). Equality-skip inside
    * the bounded heap reproduces distinct-then-top-k bit for bit WITHOUT
    * the full-candidate-set exchange a `.distinct()` would add: a
    * duplicate of an in-heap entry is skipped by the containment check,
    * and a duplicate of an EVICTED entry compares worse than the current
    * worst (the heap minimum only ever rises), so the ordinary eviction
    * test already rejects it — in update and in merge alike. */
  case class ScoredTopK(score: Expression, id: Expression, k: Int,
      dedup: Boolean = false,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[mutable.PriorityQueue[Entry]] {

    override def children: Seq[Expression] = Seq(score, id)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("cand_id", LongType), StructField("cosine", DoubleType))))
    override def prettyName: String = "graft_topk"

    override def createAggregationBuffer(): mutable.PriorityQueue[Entry] =
      mutable.PriorityQueue.empty[Entry](worstFirst)

    private def add(buf: mutable.PriorityQueue[Entry], e: Entry): Unit = {
      if (buf.size < k) {
        // O(k) containment scan: k is single-digit here, and the check
        // only runs while the heap is still filling or on a would-replace
        if (!(dedup && buf.exists(x => x._1 == e._1 && x._2 == e._2)))
          buf.enqueue(e)
      } else if (worstFirst.compare(e, buf.head) < 0) { // e better than current worst
        if (!(dedup && buf.exists(x => x._1 == e._1 && x._2 == e._2))) {
          buf.dequeue(); buf.enqueue(e)
        }
      }
    }

    override def update(buf: mutable.PriorityQueue[Entry], input: InternalRow): mutable.PriorityQueue[Entry] = {
      val s = score.eval(input)
      val i = id.eval(input)
      if (s != null && i != null)
        add(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
      buf
    }

    override def merge(buf: mutable.PriorityQueue[Entry], other: mutable.PriorityQueue[Entry]): mutable.PriorityQueue[Entry] = {
      other.foreach(add(buf, _))
      buf
    }

    override def eval(buf: mutable.PriorityQueue[Entry]): Any = {
      val sorted = buf.toArray.sortWith(worstFirst.compare(_, _) < 0) // best first
      new GenericArrayData(sorted.map(e => InternalRow(e._2, e._1)))
    }

    override def serialize(buf: mutable.PriorityQueue[Entry]): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + buf.size * 16)
      bb.putInt(buf.size)
      buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Entry] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = createAggregationBuffer()
      (0 until n).foreach(_ => buf.enqueue((bb.getDouble, bb.getLong)))
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): ScoredTopK =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): ScoredTopK =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
      copy(score = newChildren(0), id = newChildren(1))
  }

  /** Column form: array<struct<cand_id, cosine>> of the k best, best first.
    * `dedup` = top-k over distinct (score, id) tuples (see [[ScoredTopK]]). */
  def scoredTopK(score: Column, id: Column, k: Int, dedup: Boolean = false): Column =
    bridge.column(
      ScoredTopK(bridge.expression(score), bridge.expression(id), k, dedup)
        .toAggregateExpression())
}
