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
  * and at 100 TB the shuffle carries k strings per group, not the rows.
  *
  * The hash family is byte-identical to `md5(concat(i, '|', value))`, i.e.
  * the formula the DuckDB oracle (and the multi-query pipeline it replaces)
  * computes — swapping it into q41 changes the plan, not the answer.
  */
case class MinHashSignature(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[String]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override def createAggregationBuffer(): Array[String] =
    Array.fill[String](numHashes)(null)

  override def update(buf: Array[String], input: InternalRow): Array[String] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      val md = MessageDigest.getInstance("MD5")
      var i = 0
      while (i < numHashes) {
        val hex = toHex(md.digest(s"$i|$s".getBytes("UTF-8")))
        if (buf(i) == null || hex < buf(i)) buf(i) = hex
        md.reset()
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < numHashes) {
      if (a(i) == null || (b(i) != null && b(i) < a(i))) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[String]): Any =
    new GenericArrayData(buf.map(s => if (s == null) null else UTF8String.fromString(s)))

  override def serialize(buf: Array[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { s => out.writeBoolean(s != null); if (s != null) out.writeUTF(s) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(in.readInt())(if (in.readBoolean()) in.readUTF() else null)
  }

  private def toHex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(32)
    bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
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
