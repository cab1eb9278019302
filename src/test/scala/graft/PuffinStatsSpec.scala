package graft

import org.apache.spark.sql.functions._
import graft.functions.{Murmur3x64, ThetaSketch}
import graft.table.{GraftTable, Puffin}

/** Puffin statistics files (Iceberg's ANALYZE vehicle in the declared
  * stack): theta-family KMV sketches, the compact serialization, the
  * container format, and the export surface (`statistics` field). All
  * format assertions run through independent parsers of the PUBLISHED
  * formats, not through the writer's own state. */
class PuffinStatsSpec extends SparkSpec {
  import spark.implicits._

  test("murmur3 x64/128: deterministic, length-sensitive, block+tail paths") {
    val a = Murmur3x64.hash("hello".getBytes("UTF-8"), 0L)
    assert(a == Murmur3x64.hash("hello".getBytes("UTF-8"), 0L))
    assert(a != Murmur3x64.hash("hellp".getBytes("UTF-8"), 0L))
    assert(a != Murmur3x64.hash("hello".getBytes("UTF-8"), 1L))
    // >16 bytes exercises the block loop + tail; all tail lengths parse
    (0 to 33).foreach { n =>
      val h = Murmur3x64.hash(Array.fill(n)(7.toByte), 9001L)
      assert(h == Murmur3x64.hash(Array.fill(n)(7.toByte), 9001L))
    }
    // seed-hash is stable and nonzero (stamped into every sketch)
    assert(Murmur3x64.computeSeedHash(9001L) != 0)
  }

  test("murmur3 x64/128 matches Guava's independent implementation bit-for-bit") {
    // Guava ships the same published x64_128 algorithm (int seeds — the
    // sketch seed 9001 fits); agreement across implementations pins our
    // port to the spec, not to itself
    val rnd = new scala.util.Random(42)
    val cases = Seq(Array.emptyByteArray, "a".getBytes("UTF-8"),
      "hello world".getBytes("UTF-8")) ++
      (1 to 40).map(i => Array.fill(rnd.nextInt(100) + i)(rnd.nextInt().toByte))
    for (data <- cases; seed <- Seq(0, 1, 9001)) {
      val g = com.google.common.hash.Hashing.murmur3_128(seed)
        .hashBytes(data).asBytes() // 16 bytes: h1 LE then h2 LE
      val bb = java.nio.ByteBuffer.wrap(g).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val (h1, h2) = Murmur3x64.hash(data, seed.toLong)
      assert(h1 == bb.getLong(0) && h2 == bb.getLong(8),
        s"mismatch for ${data.length} bytes, seed $seed")
    }
  }

  test("KMV sketch: exact below k, within 5% beyond k, merge == single-pass") {
    val exact = new ThetaSketch.Kmv(64)
    (1 to 50).foreach(i => exact.offer(ThetaSketch.valueHash(
      ThetaSketch.serializeValue(org.apache.spark.sql.types.LongType, i.toLong))))
    assert(exact.estimate == 50.0) // exact mode: estimate IS the count
    // duplicates don't move it
    (1 to 50).foreach(i => exact.offer(ThetaSketch.valueHash(
      ThetaSketch.serializeValue(org.apache.spark.sql.types.LongType, i.toLong))))
    assert(exact.estimate == 50.0)

    val n = 50000
    def hashOf(i: Int): Long = ThetaSketch.valueHash(
      ThetaSketch.serializeValue(org.apache.spark.sql.types.LongType, i.toLong))
    val big = new ThetaSketch.Kmv(4096)
    (1 to n).foreach(i => big.offer(hashOf(i)))
    assert(math.abs(big.estimate - n) / n < 0.05, s"estimate ${big.estimate} vs $n")

    // merge of disjoint halves estimates like the single pass
    val a = new ThetaSketch.Kmv(4096); val b = new ThetaSketch.Kmv(4096)
    (1 to n / 2).foreach(i => a.offer(hashOf(i)))
    (n / 2 + 1 to n).foreach(i => b.offer(hashOf(i)))
    a.mergeIn(b)
    assert(math.abs(a.estimate - big.estimate) / n < 0.01)
  }

  test("theta set algebra: union/intersect/a-not-b estimates bounded, exact below k") {
    def hashOf(i: Int): Long = ThetaSketch.valueHash(
      ThetaSketch.serializeValue(org.apache.spark.sql.types.LongType, i.toLong))
    def sketchOf(r: Range, k: Int = 4096): Array[Byte] = {
      val s = new ThetaSketch.Kmv(k); r.foreach(i => s.offer(hashOf(i))); ThetaSketch.serialize(s)
    }
    // EXACT below k: small disjoint + overlapping sets
    val sa = sketchOf(1 to 100); val sb = sketchOf(51 to 180)
    assert(ThetaSketch.estimateFrom(ThetaSketch.unionBlobs(sa, sb)) == 180.0)
    assert(ThetaSketch.estimateFrom(ThetaSketch.intersectBlobs(sa, sb)) == 50.0)
    assert(ThetaSketch.estimateFrom(ThetaSketch.aNotBBlobs(sa, sb)) == 50.0)
    // results are valid compact blobs (independent parse accepts them)
    ThetaSketch.parse(ThetaSketch.intersectBlobs(sa, sb))

    // estimation mode: |A| = 100k, |B| = 100k, |A∩B| = 50k
    val n = 100000
    val bigA = sketchOf(1 to n)
    val bigB = sketchOf(n / 2 + 1 to n + n / 2)
    def rel(est: Double, truth: Double) = math.abs(est - truth) / truth
    val u = ThetaSketch.estimateFrom(ThetaSketch.unionBlobs(bigA, bigB))
    val i = ThetaSketch.estimateFrom(ThetaSketch.intersectBlobs(bigA, bigB))
    val d = ThetaSketch.estimateFrom(ThetaSketch.aNotBBlobs(bigA, bigB))
    assert(rel(u, 1.5 * n) < 0.05, s"union $u")
    // intersection/difference error compounds (~2/sqrt(k) at k=4096)
    assert(rel(i, 0.5 * n) < 0.10, s"intersect $i")
    assert(rel(d, 0.5 * n) < 0.10, s"a-not-b $d")
    // inclusion-exclusion closes: |A| + |B| ≈ |A∪B| + |A∩B|
    val ea = ThetaSketch.estimateFrom(bigA); val eb = ThetaSketch.estimateFrom(bigB)
    assert(math.abs((ea + eb) - (u + i)) / (ea + eb) < 0.05)
    // disjoint sets: intersection estimates (near) zero
    val disjoint = ThetaSketch.estimateFrom(
      ThetaSketch.intersectBlobs(sketchOf(1 to n), sketchOf(n * 2 to n * 3)))
    assert(disjoint < n * 0.01, s"disjoint intersect $disjoint")
  }

  test("compact theta serialization: independent parse validates the format") {
    // empty
    val (r0, t0, h0) = ThetaSketch.parse(ThetaSketch.serialize(new ThetaSketch.Kmv(16)))
    assert(r0 == 0 && t0 == Long.MaxValue && h0.isEmpty)
    // exact mode: preamble 2 longs, all hashes present and ordered
    val ex = new ThetaSketch.Kmv(1024)
    (1 to 100).foreach(i => ex.offer(ThetaSketch.valueHash(
      ThetaSketch.serializeValue(org.apache.spark.sql.types.LongType, i.toLong))))
    val exBytes = ThetaSketch.serialize(ex)
    assert(exBytes.length == 8 * (2 + 100))
    val (r1, t1, h1) = ThetaSketch.parse(exBytes)
    assert(r1 == 100 && t1 == Long.MaxValue && h1.size == 100)
    assert(ThetaSketch.estimateFrom(exBytes) == 100.0)
    // estimation mode: theta long present, retained == k
    val est = new ThetaSketch.Kmv(128)
    (1 to 10000).foreach(i => est.offer(ThetaSketch.valueHash(
      ThetaSketch.serializeValue(org.apache.spark.sql.types.LongType, i.toLong))))
    val estBytes = ThetaSketch.serialize(est)
    assert(estBytes.length == 8 * (3 + 128))
    val (r2, t2, _) = ThetaSketch.parse(estBytes)
    assert(r2 == 128 && t2 < Long.MaxValue)
    assert(math.abs(ThetaSketch.estimateFrom(estBytes) - 10000) / 10000.0 < 0.25)
  }

  test("puffin container: write + independent read round-trip") {
    val blobs = Seq(
      Puffin.Blob(Puffin.ThetaBlobType, Seq(1), 7L, 7L,
        Array[Byte](1, 2, 3, 4), Map("ndv" -> "3")),
      Puffin.Blob(Puffin.ThetaBlobType, Seq(2), 7L, 7L,
        Array[Byte](9, 8), Map("ndv" -> "2")))
    val (bytes, footerSize) = Puffin.write(blobs, Map("created-by" -> "graft-test"))
    assert(bytes.slice(0, 4).sameElements(Puffin.Magic))
    val (metas, props, payloadOf) = Puffin.read(bytes)
    assert(props("created-by") == "graft-test")
    assert(metas.map(_.fields) == Seq(Seq(1), Seq(2)))
    assert(payloadOf(metas.head).toSeq == Seq[Byte](1, 2, 3, 4))
    assert(payloadOf(metas(1)).toSeq == Seq[Byte](9, 8))
    // the recorded footer size covers magic+payload+size+flags+magic
    assert(footerSize == bytes.length - (4 + 4 + 2))
  }

  test("analyze writes a puffin file; sketch NDV matches exact distinct; export serves it") {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "puffin-t-").toString
    val df = spark.range(1000).select(
      $"id", ($"id" % 37).as("cat"), concat(lit("u"), $"id" % 250).as("name"))
    val t = GraftTable.create(spark, s"$dir/t", df)
    t.computeColumnStats()
    val props = t.log.current.properties
    val rel = props("stats.puffin.path")
    val bytes = t.log.io.readBytes(s"$dir/t/$rel")
    val (metas, _, payloadOf) = Puffin.read(bytes)
    assert(metas.nonEmpty && metas.forall(_.blobType == Puffin.ThetaBlobType))
    // per-column NDV from the sketch payloads: exact at this cardinality
    val stamped = t.log.current
    val byField = metas.map(m => m.fields.head -> m).toMap
    // field ids are graft.id + 1 in schema order: id=1, cat=2, name=3
    assert(math.round(ThetaSketch.estimateFrom(payloadOf(byField(1)))) == 1000L)
    assert(math.round(ThetaSketch.estimateFrom(payloadOf(byField(2)))) == 37L)
    assert(math.round(ThetaSketch.estimateFrom(payloadOf(byField(3)))) == 250L)
    assert(metas.forall(m => m.properties("ndv").toLong > 0))

    // exported metadata carries the statistics entry
    val out = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "puffin-x-").toString
    val metaPath = graft.table.IcebergExport.export(t, out)
    val meta = org.json4s.jackson.JsonMethods.parse(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(metaPath)), "UTF-8"))
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val stats = (meta \ "statistics").children
    assert(stats.size == 1)
    val entry = stats.head
    assert((entry \ "file-size-in-bytes").extract[Long] == bytes.length.toLong)
    val blobMeta = (entry \ "blob-metadata").children
    assert(blobMeta.size == metas.size)
    assert(blobMeta.forall(b =>
      (b \ "type").extract[String] == Puffin.ThetaBlobType))
    // the statistics path resolves and re-reads as a valid puffin file
    val statPath = (entry \ "statistics-path").extract[String].stripPrefix("file://")
    val reread = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(statPath))
    assert(Puffin.read(reread)._1.size == metas.size)

    // the importer folds the statistics blobs' ndv back into stats.ndv.*,
    // so an imported table plans with cardinalities without re-analyzing
    val back = graft.table.IcebergImport.importTable(spark, metaPath, s"$dir/t_back")
    val bp = back.log.current.properties
    assert(bp.get("stats.ndv.id").contains("1000"))
    assert(bp.get("stats.ndv.cat").contains("37"))
    assert(bp.get("stats.ndv.name").contains("250"))
  }

  test("superseded puffin stats files are swept by remove_orphan_files") {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "puffin-gc-").toString
    val t = GraftTable.create(spark, s"$dir/t",
      spark.range(100).select($"id", ($"id" % 7).as("cat")))
    t.computeColumnStats()
    val firstRel = t.log.current.properties("stats.puffin.path")
    t.append(spark.range(100, 200).select($"id", ($"id" % 7).as("cat")))
    t.computeColumnStats()
    val secondRel = t.log.current.properties("stats.puffin.path")
    assert(firstRel != secondRel)
    // plus a retry-orphan: a stats file written by an attempt whose commit
    // lost the CAS (never referenced by any snapshot)
    t.log.io.writeBytesAtomicReplace(
      s"$dir/t/_graft/stats/puffin-v999.bin", Array[Byte](1, 2, 3))
    def statFiles() = t.log.io.listNames(s"$dir/t/_graft/stats").sorted

    // while the older snapshot is retained, its stats file is NOT an orphan
    // (time travel to it still resolves stats.puffin.path)...
    val sweep1 = t.removeOrphanFiles()
    assert(sweep1.contains("_graft/stats/puffin-v999.bin"), sweep1)
    assert(statFiles().map(n => s"_graft/stats/$n").toSet ==
      Set(firstRel, secondRel))
    // ...and once history is expired down to HEAD, the superseded file goes
    t.expireSnapshots(1)
    assert(statFiles().map(n => s"_graft/stats/$n") == Seq(secondRel),
      s"superseded stats file not swept: ${statFiles()}")
  }
}
