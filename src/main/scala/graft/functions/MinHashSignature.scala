package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature sketch as a `TypedImperativeAggregate` —
  * SURVEY.md §2.10's "aggregate → TypedImperativeAggregate (for sketch
  * state like MinHash)".
  *
  * For k salted md5 families, keeps `min over group of md5("i|" + value)`
  * for every i in one traversal of the input: the aggregation buffer is the
  * k current minima, `update` folds one row into all k, `merge` is the
  * element-wise min of two sketches — associative + commutative, so Spark
  * plans it partial→final (map-side combine) like any built-in aggregate,
  * and at 100 TB the shuffle carries k digests per group, not the rows.
  *
  * The hash family is byte-identical to `md5(concat(i, '|', value))`, i.e.
  * the formula the DuckDB oracle (and the multi-query pipeline it replaces)
  * computes — swapping it into q41 changes the plan, not the answer.
  *
  * Hot-path discipline (this update() runs once per (doc, shingle) row, so
  * at corpus scale it IS the dedup pipeline's inner loop): one cached
  * MessageDigest per operator instance (a JCA provider lookup per row costs
  * more than the digest itself), salt prefixes pre-encoded once, the input
  * string encoded to UTF-8 once per row (not once per salt), minima kept as
  * RAW 16-byte digests compared unsigned-lexicographically — identical
  * ordering to the fixed-width hex rendering, which is only materialized at
  * eval() time, 16 table lookups instead of 16 format-interpolator calls.
  */
case class MinHashSignature(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Array[Byte]]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  // Per-task scratch (one operator instance per task thread, so no races):
  // the digest object and the pre-encoded "i|" salt prefixes.
  @transient private lazy val md: MessageDigest = MessageDigest.getInstance("MD5")
  @transient private lazy val saltPrefix: Array[Array[Byte]] =
    Array.tabulate(numHashes)(i => s"$i|".getBytes("UTF-8"))

  override def createAggregationBuffer(): Array[Array[Byte]] =
    Array.fill[Array[Byte]](numHashes)(null)

  /** Unsigned-lexicographic byte compare — the same order as comparing the
    * %02x hex strings (fixed-width hex is order-preserving per byte). */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  override def update(buf: Array[Array[Byte]], input: InternalRow): Array[Array[Byte]] = {
    val v = child.eval(input)
    if (v != null) {
      val sBytes = v match {
        case u: UTF8String => u.getBytes
        case other         => other.toString.getBytes("UTF-8")
      }
      var i = 0
      while (i < numHashes) {
        md.reset()
        md.update(saltPrefix(i))
        md.update(sBytes)
        val dig = md.digest()
        if (buf(i) == null || less(dig, buf(i))) buf(i) = dig
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Array[Byte]], b: Array[Array[Byte]]): Array[Array[Byte]] = {
    var i = 0
    while (i < numHashes) {
      if (a(i) == null || (b(i) != null && less(b(i), a(i)))) a(i) = b(i)
      i += 1
    }
    a
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = hexChars(b >>> 4)
      out(i * 2 + 1) = hexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }

  override def eval(buf: Array[Array[Byte]]): Any =
    new GenericArrayData(buf.map(d => if (d == null) null else UTF8String.fromString(toHex(d))))

  override def serialize(buf: Array[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { d =>
      out.writeBoolean(d != null)
      if (d != null) { out.writeInt(d.length); out.write(d) }
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Array[Byte]] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(in.readInt()) {
      if (in.readBoolean()) {
        val d = new Array[Byte](in.readInt()); in.readFully(d); d
      } else null
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashSignature {
  import org.apache.spark.sql.graftglue.Bridge
  /** Column-API entry: `MinHashSignature(col, k)` (an aggregate column). */
  def apply(c: Column, k: Int): Column =
    Bridge.column(
      MinHashSignature(Bridge.expression(c), k).toAggregateExpression())
}
