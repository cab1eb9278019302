package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-spec 32-bit bucket hash (Iceberg table spec, Appendix B: murmur3
  * x86 32-bit, seed 0, over type-specific byte encodings), exposed as the
  * `iceberg_bucket(n, col)` partition transform so graft tables bucketed
  * with it EXPORT a true Iceberg `bucket[N]` partition spec that foreign
  * readers (Trino/Spark-Iceberg — the reference stack's engines,
  * `main.tf:809-820`) prune with. Graft's own `bucket(n, col)` hashes
  * xxhash64-of-string and deliberately never exports (a false spec claim
  * would make foreign readers mis-prune); this transform is the opt-in
  * spec-compatible alternative.
  *
  * Encodings (per the spec appendix):
  *  - int/date   → hashed as the widened long (little-endian 8 bytes)
  *  - long/timestamp(μs) → little-endian 8 bytes
  *  - string     → UTF-8 bytes
  *  - decimal    → minimal big-endian two's-complement of the unscaled value
  *  - binary     → raw bytes
  * Bucket id = (hash & Int.MaxValue) % n.
  */
object IcebergMurmur3 {

  /** Murmur3 x86 32-bit, seed 0 — the public-domain algorithm as specified
    * (Austin Appleby's MurmurHash3_x86_32), required verbatim by the Iceberg
    * spec so every engine buckets identically. */
  def hashBytes(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = 0 // seed
    val len = data.length
    val rounded = len & 0xfffffffc
    var i = 0
    while (i < rounded) {
      var k1 = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
      i += 4
    }
    var k1 = 0
    (len & 3) match {
      case 3 =>
        k1 = (data(rounded + 2) & 0xff) << 16
        k1 |= (data(rounded + 1) & 0xff) << 8
        k1 |= data(rounded) & 0xff
      case 2 =>
        k1 = (data(rounded + 1) & 0xff) << 8
        k1 |= data(rounded) & 0xff
      case 1 =>
        k1 = data(rounded) & 0xff
      case _ =>
    }
    if ((len & 3) != 0) {
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1
    }
    h1 ^= len
    h1 ^= h1 >>> 16; h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13; h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** Long → little-endian 8 bytes → hash (ints widen: spec requires
    * hash(int x) == hash(long x) so int→long schema evolution keeps
    * buckets stable). */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    hashBytes(b)
  }

  def hashUtf8(s: UTF8String): Int = hashBytes(s.getBytes)

  def hashDecimal(d: org.apache.spark.sql.types.Decimal): Int =
    hashBytes(d.toJavaBigDecimal.unscaledValue.toByteArray)

  def bucketOf(hash: Int, n: Int): Int = (hash & Integer.MAX_VALUE) % n
}

/** `iceberg_bucket` as a native codegen'd expression (SURVEY.md §2.10
  * extension order: Expression with doGenCode over a UDF) — it runs per row
  * on every bucketed write, so it must stay inside whole-stage codegen. */
case class IcebergBucket(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType | ShortType | ByteType | DateType |
         TimestampType | TimestampNTZType | StringType | BinaryType |
         _: DecimalType =>
      if (n > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"bucket count must be > 0, got $n")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"iceberg_bucket cannot bucket a ${dt.simpleString} column")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "iceberg_bucket"

  override def nullSafeEval(v: Any): Any = {
    val h = child.dataType match {
      case IntegerType | ShortType | ByteType | DateType =>
        IcebergMurmur3.hashLong(v.asInstanceOf[Number].longValue)
      case LongType | TimestampType | TimestampNTZType =>
        IcebergMurmur3.hashLong(v.asInstanceOf[Long])
      case StringType => IcebergMurmur3.hashUtf8(v.asInstanceOf[UTF8String])
      case BinaryType => IcebergMurmur3.hashBytes(v.asInstanceOf[Array[Byte]])
      case _: DecimalType => IcebergMurmur3.hashDecimal(v.asInstanceOf[Decimal])
      case dt => throw new IllegalStateException(dt.simpleString)
    }
    IcebergMurmur3.bucketOf(h, n)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = "graft.functions.IcebergMurmur3$.MODULE$"
    nullSafeCodeGen(ctx, ev, v => {
      val hash = child.dataType match {
        case IntegerType | ShortType | ByteType | DateType =>
          s"$m.hashLong((long) $v)"
        case LongType | TimestampType | TimestampNTZType => s"$m.hashLong($v)"
        case StringType     => s"$m.hashUtf8($v)"
        case BinaryType     => s"$m.hashBytes($v)"
        case _: DecimalType => s"$m.hashDecimal($v)"
        case dt => throw new IllegalStateException(dt.simpleString)
      }
      s"${ev.value} = $m.bucketOf($hash, $n);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IcebergBucket {
  import org.apache.spark.sql.graftglue.Bridge
  /** Column-API entry: `IcebergBucket(col, 16)`. */
  def apply(c: Column, n: Int): Column =
    Bridge.column(IcebergBucket(Bridge.expression(c), n))
}
