package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MurmurHash3, x64 128-bit variant (Austin Appleby's public-domain
  * algorithm — the hash the Apache DataSketches theta family specifies,
  * default seed 9001). Implemented from the published reference; no
  * DataSketches code involved. */
object Murmur3x64 {
  private val C1 = 0x87c37b91114253d5L
  private val C2 = 0x4cf5ad432745937fL

  private def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33; k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33; k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33; k
  }

  /** 128-bit hash of `data`; returns (h1, h2). */
  def hash(data: Array[Byte], seed: Long): (Long, Long) = {
    var h1 = seed; var h2 = seed
    val nblocks = data.length / 16
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < nblocks) {
      var k1 = bb.getLong(i * 16)
      var k2 = bb.getLong(i * 16 + 8)
      k1 *= C1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= C2; h1 ^= k1
      h1 = java.lang.Long.rotateLeft(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= C2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= C1; h2 ^= k2
      h2 = java.lang.Long.rotateLeft(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }
    val tail = nblocks * 16
    val rem = data.length & 15
    var k1 = 0L; var k2 = 0L
    if (rem > 8) {
      var j = rem - 1
      while (j >= 8) { k2 ^= (data(tail + j) & 0xffL) << ((j - 8) * 8); j -= 1 }
      k2 *= C2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= C1; h2 ^= k2
    }
    if (rem > 0) {
      var j = math.min(rem, 8) - 1
      while (j >= 0) { k1 ^= (data(tail + j) & 0xffL) << (j * 8); j -= 1 }
      k1 *= C1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= C2; h1 ^= k1
    }
    h1 ^= data.length.toLong; h2 ^= data.length.toLong
    h1 += h2; h2 += h1
    h1 = fmix64(h1); h2 = fmix64(h2)
    h1 += h2; h2 += h1
    (h1, h2)
  }

  private def leLong(v: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array()

  /** DataSketches `Util.computeSeedHash`: low 16 bits of the murmur hash of
    * the seed itself (seed-of-the-hash = 0). Stamped into every serialized
    * sketch so readers detect a seed mismatch. */
  def computeSeedHash(seed: Long): Short = {
    val h = (hash(leLong(seed), 0L)._1 & 0xffffL).toShort
    require(h != 0, s"seed $seed hashes to 0 (disallowed by the format)")
    h
  }
}

/** Theta-family KMV (bottom-k) distinct sketch + the compact-ordered
  * serialized form (DataSketches serialization version 3) the Iceberg
  * Puffin `apache-datasketches-theta-v1` blob carries.
  *
  * The sketch state is the k smallest distinct 63-bit value hashes plus the
  * exclusion bound thetaLong: exact below k distinct values (estimate =
  * retained count), an unbiased retained/θ estimator beyond. Union (merge)
  * takes the smaller theta, prunes, and re-trims — associative and
  * commutative, so the aggregate plans partial→final like any built-in.
  *
  * Hash pipeline per the theta spec: value → Iceberg single-value binary
  * serialization → murmur3 x64 128 (seed 9001) → first long >>> 1; hash 0
  * is excluded. */
object ThetaSketch {
  val DefaultSeed = 9001L
  val DefaultK = 4096

  /** Iceberg single-value binary serialization for the types we sketch
    * (the same encodings the column bounds use): ints 4-byte LE, longs /
    * timestamps 8-byte LE, float/double IEEE bits LE, strings UTF-8,
    * dates 4-byte LE days, booleans 1 byte. Returns null for values of
    * unsupported types (caller skips the column entirely). */
  def serializeValue(dt: DataType, v: Any): Array[Byte] = dt match {
    case IntegerType | DateType =>
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(v.asInstanceOf[Int]).array()
    case ShortType =>
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(v.asInstanceOf[Short].toInt).array()
    case ByteType =>
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(v.asInstanceOf[Byte].toInt).array()
    case LongType | TimestampType | TimestampNTZType =>
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(v.asInstanceOf[Long]).array()
    case FloatType =>
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putFloat(v.asInstanceOf[Float]).array()
    case DoubleType =>
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putDouble(v.asInstanceOf[Double]).array()
    case StringType => v.asInstanceOf[UTF8String].getBytes
    case BooleanType => Array[Byte](if (v.asInstanceOf[Boolean]) 1 else 0)
    case _ => null
  }

  def supports(dt: DataType): Boolean = dt match {
    case IntegerType | DateType | ShortType | ByteType | LongType |
         TimestampType | TimestampNTZType | FloatType | DoubleType |
         StringType | BooleanType => true
    case _ => false
  }

  /** 63-bit value hash; 0 = "skip this value" (the format reserves it). */
  def valueHash(bytes: Array[Byte]): Long =
    Murmur3x64.hash(bytes, DefaultSeed)._1 >>> 1

  /** Mutable bottom-k state. Invariant: `hashes` holds the smallest
    * distinct hashes seen, all strictly below `thetaLong`, at most k. */
  final class Kmv(val k: Int) {
    val hashes = new java.util.TreeSet[java.lang.Long]()
    var thetaLong: Long = Long.MaxValue

    def offer(h: Long): Unit =
      if (h != 0L && h < thetaLong && hashes.add(h) && hashes.size > k)
        thetaLong = hashes.pollLast() // evicted (k+1)-th smallest = new bound

    def mergeIn(o: Kmv): Unit = {
      if (o.thetaLong < thetaLong) {
        thetaLong = o.thetaLong
        while (!hashes.isEmpty && hashes.last() >= thetaLong) hashes.pollLast()
      }
      val it = o.hashes.iterator()
      while (it.hasNext) offer(it.next())
    }

    def estimate: Double =
      if (thetaLong == Long.MaxValue) hashes.size.toDouble
      else hashes.size.toDouble * (Long.MaxValue.toDouble / thetaLong.toDouble)
  }

  // ---- compact-ordered serialization (DataSketches serVer 3) ----------
  // Long 0 preamble bytes: [preLongs, serVer=3, famID=3(COMPACT), 0, 0,
  // flags, seedHash(2, LE)]. Flags bits: 1=big-endian(off), 2=read-only,
  // 4=empty, 8=compact, 16=ordered. Then (preLongs>=2) long 1 = retained
  // count (4-byte LE int + 4 pad), (preLongs==3) long 2 = thetaLong, then
  // the retained hashes ascending.

  def serialize(s: Kmv): Array[Byte] = {
    val seedHash = Murmur3x64.computeSeedHash(DefaultSeed)
    val empty = s.hashes.isEmpty && s.thetaLong == Long.MaxValue
    val estimation = s.thetaLong != Long.MaxValue
    val preLongs = if (empty) 1 else if (estimation) 3 else 2
    val flags = (2 | 8 | 16 | (if (empty) 4 else 0)).toByte
    val bb = ByteBuffer.allocate(8 * (preLongs + s.hashes.size))
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(preLongs.toByte).put(3.toByte).put(3.toByte)
      .put(0.toByte).put(0.toByte).put(flags).putShort(seedHash)
    if (!empty) {
      bb.putInt(s.hashes.size).putInt(0)
      if (estimation) bb.putLong(s.thetaLong)
      val it = s.hashes.iterator()
      while (it.hasNext) bb.putLong(it.next())
    }
    bb.array()
  }

  /** Independent parse of a compact theta sketch: (retained, thetaLong,
    * hashes). Validates the preamble against the format so the round-trip
    * spec checks the BYTES, not just our own in-memory state. */
  def parse(bytes: Array[Byte]): (Int, Long, Seq[Long]) = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val preLongs = bb.get().toInt
    require(bb.get() == 3, "serialization version must be 3")
    require(bb.get() == 3, "family must be COMPACT (3)")
    bb.get(); bb.get()
    val flags = bb.get().toInt
    require((flags & 1) == 0, "big-endian sketches not produced")
    require((flags & 8) != 0 && (flags & 16) != 0, "must be compact+ordered")
    val seedHash = bb.getShort()
    require(seedHash == Murmur3x64.computeSeedHash(DefaultSeed), "seed-hash mismatch")
    if ((flags & 4) != 0) return (0, Long.MaxValue, Nil)
    val retained = bb.getInt(); bb.getInt()
    val theta = if (preLongs == 3) bb.getLong() else Long.MaxValue
    val hs = (0 until retained).map(_ => bb.getLong())
    require(hs == hs.sorted, "hashes must be ordered")
    (retained, theta, hs)
  }

  def estimateFrom(bytes: Array[Byte]): Double = {
    val (retained, theta, _) = parse(bytes)
    if (theta == Long.MaxValue) retained.toDouble
    else retained.toDouble * (Long.MaxValue.toDouble / theta.toDouble)
  }

  /** Serialize an explicit (theta, ascending hashes) pair — the set-
    * operation results, which have no Kmv state behind them. */
  private def serializeRaw(thetaLong: Long, hashes: Seq[Long]): Array[Byte] = {
    val s = new Kmv(math.max(hashes.size, 1))
    s.thetaLong = thetaLong
    hashes.foreach(h => if (h < thetaLong) s.hashes.add(h))
    serialize(s)
  }

  // ---- set operations (DataSketches theta algebra) --------------------
  // All three adopt theta' = min(theta_a, theta_b) and keep only hashes
  // below it — each surviving hash is an unbiased |result| / theta'-
  // fraction sample of the corresponding exact set, so estimates stay
  // unbiased and MERGEABLE blobs compose across 100 TB partitions:
  // estimate overlap of two corpora's url/content-hash sets from two
  // O(k)-byte blobs, no join, no rescan.

  /** Union blob: same result distribution as merging the source streams
    * (uncapped — the result may retain more than either input's k). */
  def unionBlobs(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val (_, ta, ha) = parse(a); val (_, tb, hb) = parse(b)
    val t = math.min(ta, tb)
    serializeRaw(t, (ha ++ hb).distinct.filter(_ < t).sorted)
  }

  /** Intersection blob: hashes below min-theta present in BOTH. */
  def intersectBlobs(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val (_, ta, ha) = parse(a); val (_, tb, hb) = parse(b)
    val t = math.min(ta, tb)
    val inB = hb.toSet
    serializeRaw(t, ha.filter(h => h < t && inB(h)))
  }

  /** A-not-B blob: hashes below min-theta in A and NOT in B. */
  def aNotBBlobs(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val (_, ta, ha) = parse(a); val (_, tb, hb) = parse(b)
    val t = math.min(ta, tb)
    val inB = hb.toSet
    serializeRaw(t, ha.filter(h => h < t && !inB(h)))
  }

  /** Column API: `ThetaSketch(col)` in an `.agg(...)`. */
  import org.apache.spark.sql.graftglue.Bridge
  def apply(child: Column, k: Int = DefaultK): Column =
    Bridge.column(ThetaSketchAgg(Bridge.expression(child), k).toAggregateExpression())
}

/** One-pass distinct sketch aggregate producing the serialized compact
  * theta blob ([[ThetaSketch.serialize]]); map-side combinable, so at
  * 100 TB the shuffle carries ≤ k longs per column, never the rows. */
case class ThetaSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ThetaSketch.Kmv] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch"

  override def createAggregationBuffer(): ThetaSketch.Kmv = new ThetaSketch.Kmv(k)

  override def update(buf: ThetaSketch.Kmv, input: InternalRow): ThetaSketch.Kmv = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = ThetaSketch.serializeValue(child.dataType, v)
      if (bytes != null) buf.offer(ThetaSketch.valueHash(bytes))
    }
    buf
  }

  override def merge(a: ThetaSketch.Kmv, b: ThetaSketch.Kmv): ThetaSketch.Kmv = {
    a.mergeIn(b); a
  }

  override def eval(buf: ThetaSketch.Kmv): Any = ThetaSketch.serialize(buf)

  override def serialize(buf: ThetaSketch.Kmv): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeLong(buf.thetaLong)
    out.writeInt(buf.hashes.size)
    val it = buf.hashes.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ThetaSketch.Kmv = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new ThetaSketch.Kmv(in.readInt())
    buf.thetaLong = in.readLong()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.hashes.add(in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
}

/** Scalar NDV estimate of a serialized theta blob — aggregate-result
  * grain, so eval mode costs nothing measurable. */
case class ThetaEstimate(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"
  override protected def nullSafeEval(input: Any): Any =
    ThetaSketch.estimateFrom(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** Scalar set operation over two serialized theta blobs (`union`,
  * `intersect`, `a_not_b`) — the result is itself a valid compact blob,
  * so the operations chain and re-estimate in plain SQL. */
case class ThetaSetOp(left: Expression, right: Expression, op: String)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(Seq("union", "intersect", "a_not_b").contains(op), s"bad theta op $op")
  override def dataType: DataType = BinaryType
  override def prettyName: String = s"theta_$op"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    op match {
      case "union"     => ThetaSketch.unionBlobs(x, y)
      case "intersect" => ThetaSketch.intersectBlobs(x, y)
      case "a_not_b"   => ThetaSketch.aNotBBlobs(x, y)
    }
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaSetOp =
    copy(left = newLeft, right = newRight)
}

/** ROLLUP aggregate over PRE-BUILT theta sketches: unions serialized blobs
  * (the `theta_sketch` output) across rows — the distinct-count summary-
  * layer pattern: one O(k) blob per (day, source) answers any month/global
  * distinct question by blob union, never a rescan. The union adopts
  * θ = min over inputs ([[ThetaSketch.unionBlobs]], uncapped), so each
  * retained hash stays an unbiased θ-fraction sample — the estimate is in
  * the same error class as a single pass (and usually tighter: min-θ
  * retains ≥ k samples), and because min/∪ are commutative-associative the
  * aggregate is bit-identical to ANY fold order of the binary
  * `theta_union` (asserted in KllSketchSpec's rollup test). Null inputs
  * are skipped. */
case class ThetaUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_union_agg"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"theta_union_agg expects a serialized sketch (BINARY) column, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Byte] =
    ThetaSketch.serialize(new ThetaSketch.Kmv(ThetaSketch.DefaultK))

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf
    else ThetaSketch.unionBlobs(buf, v.asInstanceOf[Array[Byte]])
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    ThetaSketch.unionBlobs(a, b)

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaUnionAgg =
    copy(child = newChildren.head)
}
