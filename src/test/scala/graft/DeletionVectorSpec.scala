package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.table.DeletionVector

/** Deletion-vector byte layout pinned against HAND-COMPUTED vectors from
  * the published RoaringFormatSpec + Iceberg Puffin `deletion-vector-v1`
  * framing — serializer and parser are both own code, so only external
  * vectors can catch a shared bug. */
class DeletionVectorSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("portable bitmap bytes match the hand-computed RoaringFormatSpec layout") {
    // positions {0, 1, 100000}: one 64-bit bucket (high=0); within it two
    // 16-bit containers: key 0 -> [0, 1], key 1 -> [0x86A0] (100000 =
    // 0x186A0). Standard no-run layout:
    //   cookie 12346 LE          3a 30 00 00
    //   container count 2 LE     02 00 00 00
    //   headers (key, card-1)    00 00 01 00 | 01 00 00 00
    //   offsets from bitmap start: header = 8 + 2*4 + 2*4 = 24 (0x18)
    //                            18 00 00 00 | 1c 00 00 00
    //   container payloads       00 00 01 00 | a0 86
    // portable 64-bit wrapper: bucket count u64 LE + high key u32 LE
    val expected =
      "0100000000000000" + // 1 bucket
      "00000000" +         // high key 0
      "3a300000" + "02000000" +
      "0000" + "0100" + "0100" + "0000" +
      "18000000" + "1c000000" +
      "0000" + "0100" + "a086"
    assert(hex(DeletionVector.portableBitmap(Seq(0L, 1L, 100000L))) == expected)
  }

  test("blob framing: BE length, D1 33 39 64 magic, BE CRC-32 over magic+bitmap") {
    val blob = DeletionVector.serialize(Seq(0L, 1L, 100000L))
    val bitmapLen = blob.length - 12
    // length prefix = magic + bitmap
    assert(java.nio.ByteBuffer.wrap(blob, 0, 4).getInt == bitmapLen + 4)
    assert(blob.slice(4, 8).toSeq == Seq(0xD1, 0x33, 0x39, 0x64).map(_.toByte))
    val crc = new java.util.zip.CRC32()
    crc.update(blob, 4, blob.length - 8)
    assert(java.nio.ByteBuffer.wrap(blob, blob.length - 4, 4).getInt == crc.getValue.toInt)
  }

  test("round-trip: sparse, dense (bitmap container), multi-bucket 64-bit keys") {
    val cases: Seq[Seq[Long]] = Seq(
      Seq.empty,
      Seq(0L),
      Seq(7L, 3L, 3L, 7L, 65535L, 65536L), // dups + container boundary
      (0L until 5000L),                    // > 4096 -> bitmap container
      (0L until 5000L).map(_ * 2),         // sparse even positions
      Seq(1L, (1L << 32) + 5L, (3L << 32) + 7L, (1L << 33)), // high buckets
      (0L until 200L).map(i => i * 1000001L))
    for (ps <- cases) {
      val got = DeletionVector.deserialize(DeletionVector.serialize(ps))
      assert(got == ps.distinct.sorted, s"case ${ps.take(5)}...")
    }
  }

  test("parser accepts run containers (cookie 12347) a foreign writer may emit") {
    // hand-build: one bucket (high 0), one RUN container key 0 with runs
    // [5..9] and [100..100]; run cookie stores (count-1) in the upper 16
    // bits and appends the run-flag bitset; offsets omitted below the
    // 4-container threshold
    val b = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putLong(1L)           // bucket count
    b.putInt(0)             // high key
    b.putInt(12347)         // run cookie, containers-1 = 0 in upper bits
    b.put(1.toByte)         // run flag bitset: container 0 is runs
    b.putShort(0)           // key
    b.putShort(5)           // cardinality-1 (6 values)
    b.putShort(2)           // number of runs
    b.putShort(5); b.putShort(4)    // run 5..5+4
    b.putShort(100); b.putShort(0)  // run 100..100
    val bitmap = java.util.Arrays.copyOf(b.array(), b.position())
    val body = new java.io.ByteArrayOutputStream()
    body.write(DeletionVector.Magic); body.write(bitmap)
    val crc = new java.util.zip.CRC32(); crc.update(body.toByteArray)
    val out = new java.io.ByteArrayOutputStream()
    out.write(java.nio.ByteBuffer.allocate(4).putInt(body.size()).array())
    body.writeTo(out)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    assert(DeletionVector.deserialize(out.toByteArray) == Seq(5L, 6L, 7L, 8L, 9L, 100L))
  }

  test("corrupt framing fails loudly: bad magic, bad CRC, bad length") {
    val good = DeletionVector.serialize(Seq(1L, 2L))
    def mutate(i: Int): Array[Byte] = { val c = good.clone(); c(i) = (c(i) ^ 0x5A).toByte; c }
    intercept[IllegalArgumentException](DeletionVector.deserialize(mutate(4)))  // magic
    intercept[IllegalArgumentException](DeletionVector.deserialize(mutate(good.length - 1))) // crc
    intercept[IllegalArgumentException](DeletionVector.deserialize(mutate(0)))  // length
    intercept[IllegalArgumentException](DeletionVector.deserialize(Array[Byte](1, 2, 3)))
  }

  test("positional-delete parquet round-trips through the Spark-free reader/writer") {
    val conf = new org.apache.hadoop.conf.Configuration()
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "dv-pq-")
    val p = dir.resolve("d.parquet").toString
    val rows = Seq(("file:/a.parquet", 3L), ("file:/a.parquet", 1L), ("file:/b.parquet", 0L))
    DeletionVector.writeDeleteParquet(p, rows, conf)
    assert(DeletionVector.readDeleteParquet(p, conf) ==
      Seq(("file:/a.parquet", 1L), ("file:/a.parquet", 3L), ("file:/b.parquet", 0L)))
    // the reserved Iceberg field ids ride in the footer schema
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      conf, new org.apache.hadoop.fs.Path(p))
    val fields = footer.getFileMetaData.getSchema.getFields
    assert(fields.get(0).getId.intValue() == 2147483546)
    assert(fields.get(1).getId.intValue() == 2147483545)
  }
}
