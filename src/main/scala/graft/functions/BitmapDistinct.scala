package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, UnaryExpression}
import org.apache.spark.sql.types._
import org.roaringbitmap.longlong.Roaring64Bitmap

/** EXACT distinct-count summaries over integer keys: compressed 64-bit
  * Roaring bitmaps as a mergeable aggregate state — the exact twin of the
  * theta-sketch family (same blob-summary shape, zero error). The
  * ClickHouse/Doris `bitmap` pattern: one blob per (day, source) group
  * answers ANY rollup distinct-user question — month, global, overlap
  * between two sources — by blob algebra, never a rescan and never an
  * estimate. RoaringBitmap ships on Spark's own classpath (it tracks
  * shuffle-block state with it), so this is classpath-neutral.
  *
  * Exactness contract is structural: keys must be integral (long / int /
  * short / byte / date / timestamp — lossless in a 64-bit key space).
  * Strings would need a hash, which is what the theta family is for —
  * `bitmap_agg` REJECTS non-integral inputs at analysis time instead of
  * silently approximating.
  *
  * Scale: blob size is O(distinct keys) worst-case (~2 bytes/key dense,
  * 8 bytes/key sparse) — the trade against theta's fixed O(k): exact
  * overlap algebra for id spaces up to ~10^8 per group, sketches beyond.
  *
  * SQL surface (via GraftExtensions): `bitmap_agg(col)`,
  * `bitmap_union_agg(blob)`, `bitmap_count(blob)`, `bitmap_or(a,b)`,
  * `bitmap_and(a,b)`, `bitmap_andnot(a,b)`.
  */
object BitmapDistinct {

  def supports(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | DateType |
         TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** The integral value as the bitmap key (dates/timestamps by their
    * underlying epoch integer — the same value equality `count(distinct)`
    * uses). */
  def keyOf(dt: DataType, v: Any): Long = dt match {
    case LongType | TimestampType | TimestampNTZType => v.asInstanceOf[Long]
    case IntegerType | DateType => v.asInstanceOf[Int].toLong
    case ShortType => v.asInstanceOf[Short].toLong
    case ByteType => v.asInstanceOf[Byte].toLong
    case other => throw new IllegalStateException(s"unsupported bitmap key type $other")
  }

  def serialize(bm: Roaring64Bitmap): Array[Byte] = {
    bm.runOptimize()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    bm.serialize(out)
    out.flush(); bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Roaring64Bitmap = {
    val bm = new Roaring64Bitmap()
    bm.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    bm
  }

  import org.apache.spark.sql.graftglue.Bridge

  /** Column API: `BitmapDistinct(col)` in an `.agg(...)`. */
  def apply(child: Column): Column =
    Bridge.column(BitmapAgg(Bridge.expression(child)).toAggregateExpression())

  def unionAgg(child: Column): Column =
    Bridge.column(BitmapUnionAgg(Bridge.expression(child)).toAggregateExpression())

  def count(blob: Column): Column = Bridge.column(BitmapCount(Bridge.expression(blob)))

  def setOp(a: Column, b: Column, op: String): Column =
    Bridge.column(BitmapSetOp(Bridge.expression(a), Bridge.expression(b), op))
}

/** One-pass exact distinct bitmap aggregate over an integral key column;
  * map-side combinable, so the shuffle carries one compressed blob per
  * group per partition, never the rows. */
case class BitmapAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64Bitmap] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bitmap_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (BitmapDistinct.supports(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_agg is exact only for integral keys (long/int/short/byte/date/" +
        s"timestamp), got ${child.dataType} — hash-typed data wants theta_sketch")

  override def createAggregationBuffer(): Roaring64Bitmap = new Roaring64Bitmap()

  override def update(buf: Roaring64Bitmap, input: InternalRow): Roaring64Bitmap = {
    val v = child.eval(input)
    if (v != null) buf.addLong(BitmapDistinct.keyOf(child.dataType, v))
    buf
  }

  override def merge(a: Roaring64Bitmap, b: Roaring64Bitmap): Roaring64Bitmap = {
    a.or(b); a
  }

  override def eval(buf: Roaring64Bitmap): Any = BitmapDistinct.serialize(buf)
  override def serialize(buf: Roaring64Bitmap): Array[Byte] = BitmapDistinct.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Roaring64Bitmap =
    BitmapDistinct.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapAgg =
    copy(child = newChildren.head)
}

/** ROLLUP aggregate over PRE-BUILT bitmap blobs: ORs stored blobs across
  * rows — the summary-layer pattern, exact. Null inputs are skipped. */
case class BitmapUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64Bitmap] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bitmap_union_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_union_agg expects a serialized bitmap (BINARY) column, got ${child.dataType}")

  override def createAggregationBuffer(): Roaring64Bitmap = new Roaring64Bitmap()

  override def update(buf: Roaring64Bitmap, input: InternalRow): Roaring64Bitmap = {
    val v = child.eval(input)
    if (v != null) buf.or(BitmapDistinct.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(a: Roaring64Bitmap, b: Roaring64Bitmap): Roaring64Bitmap = {
    a.or(b); a
  }

  override def eval(buf: Roaring64Bitmap): Any = BitmapDistinct.serialize(buf)
  override def serialize(buf: Roaring64Bitmap): Array[Byte] = BitmapDistinct.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Roaring64Bitmap =
    BitmapDistinct.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapUnionAgg =
    copy(child = newChildren.head)
}

/** Exact cardinality of a serialized bitmap blob — aggregate-result grain. */
case class BitmapCount(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_count"
  override protected def nullSafeEval(input: Any): Any =
    BitmapDistinct.deserialize(input.asInstanceOf[Array[Byte]]).getLongCardinality
  override protected def withNewChildInternal(newChild: Expression): BitmapCount =
    copy(child = newChild)
}

/** Scalar set algebra over two serialized bitmap blobs (`or`, `and`,
  * `andnot`) — results are themselves valid blobs, so audience-overlap
  * chains (`bitmap_count(bitmap_and(a, b))`) run in plain SQL, exactly. */
case class BitmapSetOp(left: Expression, right: Expression, op: String)
  extends BinaryExpression with CodegenFallback {
  require(Seq("or", "and", "andnot").contains(op), s"bad bitmap op $op")
  override def dataType: DataType = BinaryType
  override def prettyName: String = s"bitmap_$op"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = BitmapDistinct.deserialize(a.asInstanceOf[Array[Byte]])
    val y = BitmapDistinct.deserialize(b.asInstanceOf[Array[Byte]])
    op match {
      case "or"     => x.or(y)
      case "and"    => x.and(y)
      case "andnot" => x.andNot(y)
    }
    BitmapDistinct.serialize(x)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapSetOp =
    copy(left = newLeft, right = newRight)
}
