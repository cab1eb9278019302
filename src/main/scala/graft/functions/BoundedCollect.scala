package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** BOUNDED collect for inverted-index building: gathers up to `cap` LONG
  * values per group; a group that would exceed the cap SATURATES — the
  * buffer is dropped and the aggregate evaluates to NULL.
  *
  * This is the scale-correct primitive behind stop-token-capped inverted
  * indexes (q100's rare-shingle dedup graph, the RefinedWeb/q43 candidate
  * shape): a plain `collect_list` + size filter buffers the FULL posting
  * list of every hot key before discarding it — one stop shingle shared by
  * a million documents is a million-element aggregation buffer, exactly
  * what OOMs at 100 TB. Here the state never holds more than `cap`
  * elements + a saturation flag, the partial→final combine ships O(cap)
  * longs per key, and hot keys cost the same as rare ones.
  *
  * Output lists are SORTED at eval, so downstream pair generation is
  * deterministic regardless of partition/merge order (the same reason the
  * sketch aggregates emit canonical forms). */
object BoundedCollect {
  final class State(val cap: Int) {
    var saturated: Boolean = false
    val buf = new scala.collection.mutable.ArrayBuffer[Long](math.min(cap, 16))

    def add(v: Long): Unit =
      if (!saturated) {
        if (buf.length >= cap) { saturated = true; buf.clear() }
        else buf += v
      }

    def mergeIn(o: State): Unit = {
      if (o.saturated) { saturated = true; buf.clear() }
      else if (!saturated) {
        buf ++= o.buf
        if (buf.length > cap) { saturated = true; buf.clear() }
      }
    }
  }

  def serialize(s: State): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 1 + 4 + 8 * s.buf.length)
    bb.putInt(s.cap).put(if (s.saturated) 1.toByte else 0.toByte)
    bb.putInt(s.buf.length)
    s.buf.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): State = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new State(bb.getInt())
    s.saturated = bb.get() == 1
    val n = bb.getInt()
    (0 until n).foreach(_ => s.buf += bb.getLong())
    s
  }

  import org.apache.spark.sql.graftglue.Bridge
  /** `BoundedCollect(col, cap)` in `.agg(...)` → sorted ARRAY<BIGINT>, or
    * NULL when the group exceeded `cap` values. */
  def apply(child: Column, cap: Int): Column =
    Bridge.column(BoundedCollectAgg(Bridge.expression(child), cap).toAggregateExpression())
}

case class BoundedCollectAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedCollect.State] {
  require(cap > 0, "bounded_collect cap must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true // NULL = saturated (over cap)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bounded_collect"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bounded_collect requires an integral input, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): BoundedCollect.State =
    new BoundedCollect.State(cap)

  override def update(buf: BoundedCollect.State, input: InternalRow): BoundedCollect.State = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(a: BoundedCollect.State, b: BoundedCollect.State): BoundedCollect.State = {
    a.mergeIn(b); a
  }

  override def eval(buf: BoundedCollect.State): Any =
    if (buf.saturated) null
    else new GenericArrayData(buf.buf.sorted.toArray)

  override def serialize(buf: BoundedCollect.State): Array[Byte] =
    BoundedCollect.serialize(buf)
  override def deserialize(bytes: Array[Byte]): BoundedCollect.State =
    BoundedCollect.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedCollectAgg =
    copy(child = newChildren.head)
}
