package graft.functions

import java.nio.charset.StandardCharsets
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries HEAVY-HITTERS sketch (Misra & Gries 1982, "Finding repeated
  * elements"; the merge rule per Agarwal et al. 2013, "Mergeable
  * summaries") — the frequent-items counterpart of [[ThetaSketch]]
  * (distinct) and [[KllSketch]] (quantiles). State is at most k (item,
  * count) pairs; when a k+1-th distinct item arrives, ALL counts decrement
  * (the classic pigeonhole step).
  *
  * Unlike the other two sketches the guarantees here are DETERMINISTIC,
  * not probabilistic: after n insertions every stored count c satisfies
  * true − n/(k+1) ≤ c ≤ true, and ANY item with true frequency > n/(k+1)
  * is guaranteed present. Merge adds pairwise then decrements by the
  * (k+1)-th largest count — associative within the same bound, so the
  * aggregate plans partial→final and a 100 TB top-k-per-group query
  * shuffles ≤ k pairs per group instead of the value stream (the exact
  * q84-style top-k needs a full (group, value) aggregation first; this
  * needs one pass and bounded memory).
  */
object FreqSketch {
  val DefaultK = 64

  /** Mutable MG state: item → count, at most k entries. `n` = total
    * inserted weight (for the error bound). */
  final class State(val k: Int) {
    val counts = new java.util.HashMap[String, java.lang.Long]()
    var n: Long = 0L

    def update(item: String, w: Long = 1L): Unit = {
      n += w
      val cur = counts.get(item)
      if (cur != null) counts.put(item, cur.longValue() + w)
      else if (counts.size < k) counts.put(item, w)
      else {
        // weighted pigeonhole step: decrement all k counters (and the
        // incoming weight) by min(w, smallest counter), evicting zeros,
        // until the weight is absorbed or a slot frees up. Each pass
        // either zeroes the remainder (dec == rem) or evicts at least
        // one entry (dec == minC), so the loop terminates.
        var rem = w
        while (rem > 0 && counts.size >= k) {
          var minC = Long.MaxValue
          val it0 = counts.values().iterator()
          while (it0.hasNext) minC = math.min(minC, it0.next().longValue())
          val dec = math.min(rem, minC)
          val it = counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val nc = e.getValue.longValue() - dec
            if (nc <= 0) it.remove() else e.setValue(nc)
          }
          rem -= dec
        }
        if (rem > 0) counts.put(item, rem)
      }
    }

    def mergeIn(o: State): Unit = {
      n += o.n
      val it = o.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = counts.get(e.getKey)
        counts.put(e.getKey,
          (if (cur == null) 0L else cur.longValue()) + e.getValue.longValue())
      }
      if (counts.size > k) {
        // keep the k largest by subtracting the (k+1)-th largest count
        // (Agarwal et al. merge — preserves the n/(k+1) bound)
        val vals = new java.util.ArrayList[java.lang.Long](counts.values())
        java.util.Collections.sort(vals, java.util.Collections.reverseOrder())
        val cut = vals.get(k).longValue()
        val it2 = counts.entrySet().iterator()
        while (it2.hasNext) {
          val e = it2.next()
          val nc = e.getValue.longValue() - cut
          if (nc <= 0) it2.remove() else e.setValue(nc)
        }
      }
    }

    /** (item, lower-bound count) pairs, count desc then item asc. */
    def top: Seq[(String, Long)] = {
      import scala.jdk.CollectionConverters._
      counts.entrySet().asScala.iterator
        .map(e => (e.getKey, e.getValue.longValue())).toSeq
        .sortBy { case (item, c) => (-c, item) }
    }
  }

  def serialize(s: State): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(s.k); out.writeLong(s.n); out.writeInt(s.counts.size)
    val it = s.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(e.getValue.longValue())
    }
    out.flush(); bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): State = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new State(in.readInt())
    s.n = in.readLong()
    val m = in.readInt()
    (0 until m).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      s.counts.put(new String(b, StandardCharsets.UTF_8), in.readLong())
    }
    s
  }

  /** Column API: `FreqSketch(col)` in `.agg(...)` → serialized blob. */
  import org.apache.spark.sql.graftglue.Bridge
  def apply(child: Column, k: Int = DefaultK): Column =
    Bridge.column(FreqSketchAgg(Bridge.expression(child), k).toAggregateExpression())

  /** Top items of a serialized sketch as "item:count" strings (count desc,
    * item asc), capped at `limit`. */
  def topFrom(bytes: Array[Byte], limit: Int): Seq[String] =
    deserialize(bytes).top.take(limit).map { case (i, c) => s"$i:$c" }

  /** Column API: top items of a sketch blob as one comma-joined string. */
  def top(sketch: Column, limit: Int): Column =
    Bridge.column(FreqTop(Bridge.expression(sketch), limit))

  /** Column API: top items as an ARRAY of "item:count" strings — the
    * separator-safe form (an item containing ',' cannot corrupt the set;
    * ADVICE r13 on q108). */
  def topArray(sketch: Column, limit: Int): Column =
    Bridge.column(FreqTopArray(Bridge.expression(sketch), limit))
}

/** Scalar extractor: top `limit` items of a serialized MG blob as
  * "item:count" joined with commas. Aggregate-result grain (one row per
  * group), so eval-mode (CodegenFallback) costs nothing measurable. */
case class FreqTop(child: Expression, limit: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(limit > 0, "limit must be positive")
  override def dataType: DataType = StringType
  override def prettyName: String = "freq_top"
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      FreqSketch.topFrom(input.asInstanceOf[Array[Byte]], limit).mkString(","))
  override protected def withNewChildInternal(newChild: Expression): FreqTop =
    copy(child = newChild)
}

/** Array-typed extractor: top `limit` items of a serialized MG blob as an
  * array of "item:count" strings — no join separator, so items containing
  * ',' survive verbatim (the q108 verdict parses this set). */
case class FreqTopArray(child: Expression, limit: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(limit > 0, "limit must be positive")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "freq_top_array"
  override protected def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      FreqSketch.topFrom(input.asInstanceOf[Array[Byte]], limit)
        .map(UTF8String.fromString))
  override protected def withNewChildInternal(newChild: Expression): FreqTopArray =
    copy(child = newChild)
}

/** One-pass heavy-hitters aggregate producing the serialized MG blob;
  * map-side combinable — the shuffle carries ≤ k (item, count) pairs per
  * group, never the values. */
case class FreqSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketch.State] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "freq_sketch"
  // analysis-time type check (the ExpectsInputTypes convention; its
  // AbstractDataType signature is private[sql], so check directly) —
  // without it a non-string child would ClassCastException at execution
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"freq_sketch requires a STRING input, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): FreqSketch.State = new FreqSketch.State(k)

  override def update(buf: FreqSketch.State, input: InternalRow): FreqSketch.State = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(a: FreqSketch.State, b: FreqSketch.State): FreqSketch.State = {
    a.mergeIn(b); a
  }

  override def eval(buf: FreqSketch.State): Any = FreqSketch.serialize(buf)
  override def serialize(buf: FreqSketch.State): Array[Byte] = FreqSketch.serialize(buf)
  override def deserialize(bytes: Array[Byte]): FreqSketch.State =
    FreqSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketchAgg =
    copy(child = newChildren.head)
}
