package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types._

/** `bounded_postings((doc, n), cap)`: the EXACT posting list of an inverted
  * index key — `array<struct<d, n>>` sorted by doc id — or NULL the moment
  * the key's document frequency exceeds `cap`.
  *
  * This is the aggregation-side half of the "group-and-expand" form of the
  * inverted-index pair join (q43/q82/q113/q100/q119 candidate generation):
  * instead of self-joining the (doc, shingle) relation on the shingle —
  * which pays the join machinery (either two sorts + merge or a per-
  * partition hash build) over the WIDEST relation in the plan — collect
  * each shingle's posting list in ONE aggregation riding the same
  * hash(shingle) exchange, drop capped keys, and emit candidate pairs
  * map-side with a nested `transform` + `explode` (guide §2.4: remove the
  * shuffle-consumer join outright; the pair stream itself never moves).
  *
  * The BOUND is what makes it 100 TB-safe where a bare `collect_list`
  * is not (the [[BoundedSetAgg]] rationale): a boilerplate shingle shared
  * by 10⁶ documents clears its buffer at cap+1 and ignores the rest, so
  * memory is O(cap) per key REGARDLESS of data skew — and since every
  * consumer filters `df <= cap` (stop-shingle rule), the dropped contents
  * were never observable: overflow → NULL → filtered, exactly the rows the
  * window/join form dropped. Overflow is sticky through merge, so the
  * map-side combine ships at most cap+1 postings per key.
  *
  * EXACTNESS: for keys with df <= cap no element is ever dropped (each
  * partial saw <= df <= cap postings, merges only truncate past cap), so
  * the emitted list is the complete posting list; (doc, key) inputs are
  * distinct by construction at every call site, so `size(list)` = df. */
case class BoundedPostingsAgg(
    doc: Expression,
    n: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedPostingsAgg.Buf] {

  require(cap > 0, s"bounded_postings needs a positive cap, got $cap")

  override def children: Seq[Expression] = Seq(doc, n)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("d", LongType, nullable = false),
      StructField("n", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "bounded_postings"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (doc.dataType == LongType && n.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bounded_postings takes (bigint, bigint), got " +
        s"(${doc.dataType.simpleString}, ${n.dataType.simpleString})")

  override def createAggregationBuffer(): BoundedPostingsAgg.Buf =
    new BoundedPostingsAgg.Buf()

  override def update(buf: BoundedPostingsAgg.Buf, input: InternalRow): BoundedPostingsAgg.Buf = {
    if (!buf.over) {
      val d = doc.eval(input)
      if (d != null) {
        val nv = n.eval(input)
        buf.ds += d.asInstanceOf[Long]
        buf.ns += (if (nv == null) 0L else nv.asInstanceOf[Long])
        if (buf.ds.length > cap) buf.overflow()
      }
    }
    buf
  }

  override def merge(a: BoundedPostingsAgg.Buf, b: BoundedPostingsAgg.Buf): BoundedPostingsAgg.Buf = {
    if (a.over || b.over) a.overflow()
    else {
      a.ds ++= b.ds; a.ns ++= b.ns
      if (a.ds.length > cap) a.overflow()
    }
    a
  }

  override def eval(buf: BoundedPostingsAgg.Buf): Any =
    if (buf.over) null
    else {
      // sort by doc id so downstream pair generation (i < j positions)
      // yields d1 < d2 directly — doc ids are unique per key (distinct
      // (doc, key) inputs), so the order is total and deterministic
      val idx = buf.ds.indices.sortBy(buf.ds(_))
      new GenericArrayData(idx.map { i =>
        InternalRow(buf.ds(i), buf.ns(i)): Any
      }.toArray)
    }

  override def serialize(buf: BoundedPostingsAgg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(buf.over)
    out.writeInt(buf.ds.length)
    var i = 0
    while (i < buf.ds.length) { out.writeLong(buf.ds(i)); out.writeLong(buf.ns(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedPostingsAgg.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new BoundedPostingsAgg.Buf()
    if (in.readBoolean()) buf.overflow()
    else {
      val sz = in.readInt()
      var i = 0
      while (i < sz) { buf.ds += in.readLong(); buf.ns += in.readLong(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedPostingsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedPostingsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedPostingsAgg =
    copy(doc = newChildren(0), n = newChildren(1))
}

object BoundedPostingsAgg {
  /** Overflow clears the buffers (the [[BoundedSetAgg.Buf]] rule): a
    * million overflowing stop-shingle keys must not each pin cap postings. */
  final class Buf {
    var over: Boolean = false
    val ds: ArrayBuffer[Long] = ArrayBuffer.empty
    val ns: ArrayBuffer[Long] = ArrayBuffer.empty
    def overflow(): Unit = { over = true; ds.clear(); ns.clear() }
  }

  /** Column-API entry: `BoundedPostingsAgg(col("doc_id"), col("n"), 100)`. */
  def apply(doc: Column, n: Column, cap: Int): Column =
    Bridge.column(BoundedPostingsAgg(Bridge.expression(doc), Bridge.expression(n), cap)
      .toAggregateExpression())
}
