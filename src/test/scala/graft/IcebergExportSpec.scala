package graft

import java.io.File
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.table.GraftTable

/** Iceberg-v2 export validation (VERDICT r7 "Next round" #1). The Avro
  * manifests graft writes BY HAND (pure-JDK encoder, [[graft.table.IcebergExport]])
  * are parsed back here with the INDEPENDENT Apache Avro implementation on
  * Spark's classpath — so a passing run means a real Iceberg reader's Avro
  * layer accepts the files, not merely that our writer agrees with itself.
  * metadata.json is checked for every spec-required v2 field, and the
  * exported file inventory is reconciled row-for-row against the table. */
class IcebergExportSpec extends SparkSpec {
  import spark.implicits._

  private implicit val fmts: Formats = DefaultFormats

  private def tmpDir(): String =
    Files.createTempDirectory(Paths.get("target"), "iceberg-exp-").toString

  /** Read every record of an Avro container file with the real Avro lib. */
  private def readAvro(uri: String): (org.apache.avro.Schema, Map[String, String], Seq[GenericRecord]) = {
    val f = new File(java.net.URI.create(uri).getPath)
    val rdr = new DataFileReader[GenericRecord](f, new GenericDatumReader[GenericRecord]())
    try {
      val recs = rdr.iterator().asScala.toList
      val metaKeys = rdr.getMetaKeys.asScala.toList
      val meta = metaKeys.map(k => k -> rdr.getMetaString(k)).toMap
      (rdr.getSchema, meta, recs)
    } finally rdr.close()
  }

  private def str(r: GenericRecord, f: String): String = String.valueOf(r.get(f))

  test("export emits spec-required v2 metadata fields and real-Avro-parseable manifests") {
    val dir = tmpDir()
    val t = GraftTable.create(spark, s"$dir/tbl",
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "name", "amount"))
    t.append(Seq((4L, "d", 40.0), (5L, "e", 50.0)).toDF("id", "name", "amount"))
    t.delete(col("id") === 2L) // copy-on-write: rewrites the touched file

    val metaPath = t.exportIcebergMetadata(s"$dir/export")
    val json = JsonMethods.parse(Files.readString(Paths.get(metaPath)))

    // -- required metadata.json fields (Iceberg spec "Table Metadata Fields")
    assert((json \ "format-version").extract[Int] == 2)
    assert((json \ "table-uuid").extract[String].nonEmpty)
    assert((json \ "location").extract[String].startsWith("file://"))
    assert((json \ "last-sequence-number").extract[Long] == t.log.currentVersion)
    assert((json \ "last-updated-ms").extract[Long] > 0)
    assert((json \ "last-column-id").extract[Int] >= 3)
    assert((json \ "current-schema-id").extract[Int] >= 0)
    val schemas = (json \ "schemas").extract[List[JValue]]
    assert(schemas.nonEmpty)
    val fields = (schemas.head \ "fields").extract[List[JValue]]
    assert(fields.map(f => (f \ "name").extract[String]) == List("id", "name", "amount"))
    // field ids present, positive, unique
    val ids = fields.map(f => (f \ "id").extract[Int])
    assert(ids.forall(_ > 0) && ids.distinct.size == ids.size)
    assert((json \ "partition-specs").extract[List[JValue]].nonEmpty)
    assert((json \ "default-spec-id").extract[Int] == 0)
    assert((json \ "sort-orders").extract[List[JValue]].nonEmpty)
    assert((json \ "default-sort-order-id").extract[Int] == 0)
    assert((json \ "current-snapshot-id").extract[Long] == t.log.currentVersion)
    assert((json \ "refs" \ "main" \ "snapshot-id").extract[Long] == t.log.currentVersion)
    // name mapping present for field-id-less parquet (spec "Name Mapping")
    val nm = JsonMethods.parse(
      (json \ "properties" \ "schema.name-mapping.default").extract[String])
    assert(nm.extract[List[JValue]].map(e => (e \ "names").extract[List[String]].head)
      == List("id", "name", "amount"))

    // -- snapshot chain: one entry per commit, parent links intact
    val snaps = (json \ "snapshots").extract[List[JValue]]
    assert(snaps.size == 3) // create, append, delete
    assert(snaps.map(s => (s \ "snapshot-id").extract[Long]) == List(0L, 1L, 2L))
    assert((snaps(2) \ "parent-snapshot-id").extract[Long] == 1L)
    val ops = snaps.map(s => (s \ "summary" \ "operation").extract[String])
    assert(ops == List("append", "append", "delete"))
    assert((json \ "snapshot-log").extract[List[JValue]].size == 3)

    // -- manifest list of the head snapshot parses with REAL Avro
    val headList = (snaps.last \ "manifest-list").extract[String]
    val (listSchema, listMeta, manifests) = readAvro(headList)
    assert(listSchema.getName == "manifest_file")
    assert(listMeta("format-version") == "2")
    // field-id props survived into the parsed schema (readers map by them)
    assert(listSchema.getField("manifest_path").getObjectProp("field-id").toString == "500")
    assert(manifests.nonEmpty)

    // -- data manifests parse; entries carry the spec fields and cover the table
    val dataManifests = manifests.filter(m => str(m, "content") == "0")
    val entries = dataManifests.flatMap { m =>
      val (entSchema, entMeta, ents) = readAvro(str(m, "manifest_path"))
      assert(entSchema.getName == "manifest_entry")
      assert(entMeta("format-version") == "2" && entMeta("content") == "data")
      // the embedded iceberg table schema is well-formed JSON with field ids
      val emb = JsonMethods.parse(entMeta("schema"))
      assert((emb \ "type").extract[String] == "struct")
      ents
    }
    val dataFiles = entries.map(e => e.get("data_file").asInstanceOf[GenericRecord])
    dataFiles.foreach { df =>
      assert(str(df, "file_format") == "PARQUET")
      assert(str(df, "content") == "0")
      assert(str(df, "file_path").startsWith("file://"))
      assert(df.get("record_count").asInstanceOf[Long] > 0)
      assert(df.get("file_size_in_bytes").asInstanceOf[Long] > 0)
    }
    // rows-by-manifest == rows-by-table; file paths match the live snapshot
    assert(dataFiles.map(_.get("record_count").asInstanceOf[Long]).sum == t.read.count())
    val exportedPaths = dataFiles.map(df => str(df, "file_path")).toSet
    assert(exportedPaths.size == t.log.current.files.size)

    // -- the exported file list, read back as plain parquet, IS the table
    // (the oracle-engine round-trip: DuckDB/Trino would scan these URIs)
    val viaExport = spark.read.parquet(exportedPaths.toSeq.map(p =>
      java.net.URI.create(p).getPath): _*)
    assert(viaExport.exceptAll(t.read).count() == 0 &&
      t.read.exceptAll(viaExport).count() == 0)
  }

  test("bounds round-trip: manifest lower/upper bounds decode to the table min/max") {
    val dir = tmpDir()
    val t = GraftTable.create(spark, s"$dir/tbl",
      Seq((5L, "mm", 1.5), (9L, "zz", -2.0), (7L, "aa", 0.25)).toDF("id", "name", "amount"))
    t.exportIcebergMetadata(s"$dir/export")
    val json = JsonMethods.parse(Files.readString(
      Paths.get(s"$dir/export/metadata/v1.metadata.json")))
    val headList = ((json \ "snapshots").extract[List[JValue]].last \ "manifest-list").extract[String]
    val (_, _, manifests) = readAvro(headList)
    val (_, _, ents) = readAvro(str(manifests.head, "manifest_path"))
    // rows may split across several files at local[32] — table-level bounds
    // are the min/max across every entry's per-file bounds
    val dfs = ents.map(_.get("data_file").asInstanceOf[GenericRecord])
    val fieldIds = (((json \ "schemas").extract[List[JValue]].head \ "fields")
      .extract[List[JValue]]).map(f => (f \ "name").extract[String] -> (f \ "id").extract[Int]).toMap

    def boundsOf(rec: GenericRecord, field: String): Map[Int, Array[Byte]] =
      rec.get(field).asInstanceOf[java.util.List[GenericRecord]].asScala.map { kv =>
        val buf = kv.get("value").asInstanceOf[java.nio.ByteBuffer]
        val arr = new Array[Byte](buf.remaining()); buf.duplicate().get(arr)
        (kv.get("key").asInstanceOf[Int], arr)
      }.toMap
    def leLong(b: Array[Byte]): Long =
      b.zipWithIndex.map { case (x, i) => (x.toLong & 0xFF) << (8 * i) }.sum

    val los = dfs.map(boundsOf(_, "lower_bounds")); val his = dfs.map(boundsOf(_, "upper_bounds"))
    assert(los.map(m => leLong(m(fieldIds("id")))).min == 5L)
    assert(his.map(m => leLong(m(fieldIds("id")))).max == 9L)
    assert(los.map(m => new String(m(fieldIds("name")), "UTF-8")).min == "aa")
    assert(los.map(m => java.lang.Double.longBitsToDouble(leLong(m(fieldIds("amount"))))).min == -2.0)
    assert(his.map(m => java.lang.Double.longBitsToDouble(leLong(m(fieldIds("amount"))))).max == 1.5)
    // value/null counts present and consistent: totals across files = 3 rows, 0 nulls
    def countsOf(rec: GenericRecord, field: String): Map[Int, Long] =
      rec.get(field).asInstanceOf[java.util.List[GenericRecord]].asScala.map(kv =>
        (kv.get("key").asInstanceOf[Int], kv.get("value").asInstanceOf[Long])).toMap
    assert(dfs.map(d => countsOf(d, "value_counts")(fieldIds("id"))).sum == 3L)
    assert(dfs.map(d => countsOf(d, "null_value_counts")(fieldIds("id"))).sum == 0L)
  }

  test("merge-on-read deletes export as a delete manifest with spec content codes") {
    val dir = tmpDir()
    val t = GraftTable.create(spark, s"$dir/tbl",
      (1L to 100L).map(i => (i, s"n$i", i.toDouble)).toDF("id", "name", "amount"),
      Map("write.delete.mode" -> "merge-on-read"))
    t.delete(col("id") <= 10L)                     // positional delete file
    t.deleteByEquality(Seq(11L, 12L).toDF("id")) // equality delete file

    t.exportIcebergMetadata(s"$dir/export")
    val json = JsonMethods.parse(Files.readString(
      Paths.get(s"$dir/export/metadata/v1.metadata.json")))
    val headList = ((json \ "snapshots").extract[List[JValue]].last \ "manifest-list").extract[String]
    val (_, _, manifests) = readAvro(headList)

    val deleteManifests = manifests.filter(m => str(m, "content") == "1")
    assert(deleteManifests.size == 1, "one delete manifest expected")
    val (_, dMeta, dEnts) = readAvro(str(deleteManifests.head, "manifest_path"))
    assert(dMeta("content") == "deletes")
    val byContent = dEnts.groupBy(e =>
      str(e.get("data_file").asInstanceOf[GenericRecord], "content"))
    assert(byContent.contains("1"), "positional delete entry (content=1)")
    assert(byContent.contains("2"), "equality delete entry (content=2)")
    // equality delete entry names its key field ids
    val eq = byContent("2").head.get("data_file").asInstanceOf[GenericRecord]
    val eqIds = eq.get("equality_ids").asInstanceOf[java.util.List[Int]].asScala
    val idFieldId = (((json \ "schemas").extract[List[JValue]].head \ "fields")
      .extract[List[JValue]])
      .find(f => (f \ "name").extract[String] == "id").map(f => (f \ "id").extract[Int]).get
    assert(eqIds.toSeq == Seq(idFieldId))

    // delete sequence numbers are ABOVE the data files they apply to —
    // the v2 scoping rule a foreign reader uses to apply them
    val dataManifest = manifests.find(m => str(m, "content") == "0").get
    val (_, _, dataEnts) = readAvro(str(dataManifest, "manifest_path"))
    val maxDataSeq = dataEnts.map(_.get("sequence_number").asInstanceOf[Long]).max
    val minDelSeq = dEnts.map(_.get("sequence_number").asInstanceOf[Long]).min
    assert(minDelSeq > 0 && minDelSeq >= maxDataSeq,
      s"delete seq $minDelSeq must be >= data seq $maxDataSeq")

    // live rows = data rows - deleted rows (positional + equality all apply)
    val dataRows = dataEnts.map(e =>
      e.get("data_file").asInstanceOf[GenericRecord].get("record_count").asInstanceOf[Long]).sum
    val delRows = dEnts.map(e =>
      e.get("data_file").asInstanceOf[GenericRecord].get("record_count").asInstanceOf[Long]).sum
    assert(dataRows - delRows == t.read.count())
  }

  test("v3 export: positional deletes render as Puffin deletion vectors " +
      "with spec reference fields and row lineage") {
    val dir = tmpDir()
    val t = GraftTable.create(spark, s"$dir/tbl",
      (1L to 100L).map(i => (i, s"n$i", i.toDouble)).toDF("id", "name", "amount"),
      Map("write.delete.mode" -> "merge-on-read"))
    t.append((101L to 150L).map(i => (i, s"n$i", i.toDouble)).toDF("id", "name", "amount"))
    t.delete(col("id") <= 10L)                    // positional deletes
    t.delete(col("id") >= 148L)                   // second delete commit
    t.deleteByEquality(Seq(11L, 12L).toDF("id"))  // equality deletes stay

    val metaPath = t.exportIcebergMetadata(s"$dir/export", formatVersion = 3)
    val json = JsonMethods.parse(Files.readString(Paths.get(metaPath)))
    // v3 metadata: format-version + row lineage
    assert((json \ "format-version").extract[Int] == 3)
    assert((json \ "next-row-id").extract[Long] == 150L, "next-row-id = rows ever added")
    val snaps = (json \ "snapshots").extract[List[JValue]]
    assert((snaps.head \ "first-row-id").extract[Long] == 0L)
    assert((snaps(1) \ "first-row-id").extract[Long] == 100L,
      "second snapshot's first-row-id continues after the first commit's rows")

    val headList = (snaps.last \ "manifest-list").extract[String]
    val (_, listMeta, manifests) = readAvro(headList)
    assert(listMeta("format-version") == "3")
    val deleteManifests = manifests.filter(m => str(m, "content") == "1")
    assert(deleteManifests.nonEmpty)
    val dEnts = deleteManifests.flatMap(m => readAvro(str(m, "manifest_path"))._3)
    val byFmt = dEnts.groupBy(e =>
      str(e.get("data_file").asInstanceOf[GenericRecord], "file_format"))
    // NO positional-delete parquet in v3 — only DVs + equality parquet
    val posParquet = byFmt.getOrElse("PARQUET", Nil).filter(e =>
      str(e.get("data_file").asInstanceOf[GenericRecord], "content") == "1")
    assert(posParquet.isEmpty, "v3 must not carry positional-delete parquet")
    val dvEnts = byFmt.getOrElse("PUFFIN", Nil)
    assert(dvEnts.nonEmpty, "deletion-vector entries expected")

    // each DV entry: content=1, reference fields present, blob decodes to
    // exactly the positions deleted from that data file
    val dataEnts = manifests.filter(m => str(m, "content") == "0")
      .flatMap(m => readAvro(str(m, "manifest_path"))._3)
      .map(_.get("data_file").asInstanceOf[GenericRecord])
    val dataPaths = dataEnts.map(e => str(e, "file_path")).toSet
    var totalCard = 0L
    dvEnts.foreach { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      assert(str(df, "content") == "1")
      val ref = str(df, "referenced_data_file")
      assert(dataPaths.contains(ref), s"DV references live data file: $ref")
      val off = df.get("content_offset").asInstanceOf[Long]
      val len = df.get("content_size_in_bytes").asInstanceOf[Long]
      val puffin = Files.readAllBytes(Paths.get(
        java.net.URI.create(str(df, "file_path")).getPath))
      // the blob region parses with our spec-pinned DV parser AND the
      // puffin footer (own independent reader) agrees on the region
      val blob = java.util.Arrays.copyOfRange(puffin, off.toInt, (off + len).toInt)
      val positions = graft.table.DeletionVector.deserialize(blob)
      assert(positions.nonEmpty && positions == positions.sorted)
      assert(df.get("record_count").asInstanceOf[Long] == positions.size.toLong)
      val metas = graft.table.Puffin.read(puffin)._1
      val m = metas.find(_.offset == off).get
      assert(m.blobType == "deletion-vector-v1")
      assert(m.properties("referenced-data-file") == ref)
      assert(m.properties("cardinality").toLong == positions.size.toLong)
      totalCard += positions.size
    }
    assert(totalCard == 13L, s"10 + 3 deleted positions, got $totalCard")
    // live rows reconcile: data - DVs - equality = table read
    val dataRows = dataEnts.map(_.get("record_count").asInstanceOf[Long]).sum
    val eqRows = dEnts.filter(e =>
      str(e.get("data_file").asInstanceOf[GenericRecord], "content") == "2")
      .map(_.get("data_file").asInstanceOf[GenericRecord]
        .get("record_count").asInstanceOf[Long]).sum
    assert(dataRows - totalCard - eqRows == t.read.count())
  }

  test("graft parquet files embed Iceberg field ids in their footers") {
    // Written files carry parquet.field.id = graft.id + 1 (the exported
    // mapping), so an Iceberg reader resolves columns BY ID on new files —
    // name mapping remains only for pre-existing ones. Verified at the
    // parquet FOOTER level with parquet-hadoop, not through Spark.
    val dir = tmpDir()
    val t = GraftTable.create(spark, s"$dir/tbl",
      Seq((1L, "a", 1.0)).toDF("id", "name", "amount"),
      Map("write.delete.mode" -> "merge-on-read"))
    t.delete(col("id") === 999L) // no-op match set; still exercises the path

    def footerFields(p: String): Map[String, Integer] = {
      val conf = new org.apache.hadoop.conf.Configuration()
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        r.getFooter.getFileMetaData.getSchema.getFields.asScala
          .map(f => f.getName -> f.getId.intValue().asInstanceOf[Integer]).toMap
      } finally r.close()
    }

    val dataFile = s"$dir/tbl/${t.log.current.files.head.path}"
    val ids = footerFields(dataFile)
    // ids are the export mapping: graft.id + 1, in schema order 1,2,3
    assert(ids == Map("id" -> 1, "name" -> 2, "amount" -> 3), ids.toString)

    // equality-delete files carry the KEY column's table id
    t.deleteByEquality(Seq(1L).toDF("id"))
    val eqFile = s"$dir/tbl/${t.log.current.eqDeleteFiles.head.file.path}"
    assert(footerFields(eqFile) == Map("id" -> 1))

    // positional-delete files carry Iceberg's RESERVED ids
    val t2 = GraftTable.create(spark, s"$dir/tbl2",
      (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"),
      Map("write.delete.mode" -> "merge-on-read"))
    t2.delete(col("id") <= 5L)
    val posFile = s"$dir/tbl2/${t2.log.current.deleteFiles.head.path}"
    assert(footerFields(posFile) ==
      Map("file_path" -> 2147483546, "pos" -> 2147483545))

    // field-id STABILITY across rename — the reason ids exist at all: a
    // renamed column's new files carry the ORIGINAL id under the new name,
    // and a column added later gets a fresh id (never a reused one)
    t.renameColumn("name", "title")
    t.addColumn("score", org.apache.spark.sql.types.DoubleType)
    val t3 = GraftTable.load(spark, s"$dir/tbl")
    val before = t3.log.current.files.map(_.path).toSet
    t3.append(Seq((2L, "b", 2.0, 0.5)).toDF("id", "title", "amount", "score"))
    val newFile = s"$dir/tbl/${
      t3.log.current.files.map(_.path).filterNot(before).head}"
    assert(footerFields(newFile) ==
      Map("id" -> 1, "title" -> 2, "amount" -> 3, "score" -> 4))
  }

  test("manifest reuse: unchanged file lists share one content-addressed manifest") {
    val dir = tmpDir()
    val t = GraftTable.create(spark, s"$dir/tbl", Seq((1L, "a")).toDF("id", "name"))
    t.setProperties(Map("custom.tag" -> "x")) // metadata-only commit: same file list
    t.exportIcebergMetadata(s"$dir/export")
    val files = Files.list(Paths.get(s"$dir/export/metadata")).iterator().asScala
      .map(_.getFileName.toString).toList
    assert(files.count(_.startsWith("m-data-")) == 1,
      s"both snapshots must share one data manifest, got $files")
    assert(files.count(_.startsWith("snap-")) == 2)
    assert(files.contains("version-hint.text"))
  }

  test("partition specs export: tuples + summaries decode with real Avro; pruning survives re-import") {
    val dir = tmpDir()
    // one append per (cat, day): every file is PROVABLY single-valued in
    // both spec fields (transform min==max, zero nulls), so all data lands
    // in spec-1 manifests with real partition tuples
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04")
    def batch(i: Int) = spark.sql(
      s"SELECT id, 'c$i' AS cat, timestamp'${days(i)} 0$i:30:00' AS ts " +
        s"FROM range(${10 * (i + 1)})")
    val t = GraftTable.create(spark, s"$dir/tbl", batch(0),
      Map("write.partition-by" -> "cat,days(ts)"))
    (1 to 3).foreach(i => t.append(batch(i)))
    val all = t.log.current.files
    assert(all.size >= 4, s"need one file per day, got ${all.size}")

    val metaPath = t.exportIcebergMetadata(s"$dir/export")
    val json = JsonMethods.parse(Files.readString(Paths.get(metaPath)))

    // ---- spec JSON: real transforms; the partitioned spec is the default
    assert((json \ "default-spec-id").extract[Int] == 1)
    val specs = (json \ "partition-specs").extract[List[JValue]]
    assert(specs.map(s => (s \ "spec-id").extract[Int]) == List(0, 1))
    val sf = (specs(1) \ "fields").extract[List[JValue]]
    assert(sf.map(f => ((f \ "name").extract[String], (f \ "transform").extract[String],
        (f \ "field-id").extract[Int]))
      == List(("cat", "identity", 1000), ("ts_day", "day", 1001)))
    assert(sf.map(f => (f \ "source-id").extract[Int]).forall(_ > 0))
    assert((json \ "last-partition-id").extract[Int] == 1001)

    // ---- current snapshot's manifest list: a spec-1 data manifest whose
    // field summaries the REAL Avro reader decodes to the expected bounds
    val cur = (json \ "current-snapshot-id").extract[Long]
    val listUri = ((json \ "snapshots").children
      .find(s => (s \ "snapshot-id").extract[Long] == cur).get
      \ "manifest-list").extract[String]
    val (_, _, mfs) = readAvro(listUri)
    val partMfs = mfs.filter(m =>
      str(m, "partition_spec_id") == "1" && str(m, "content") == "0")
    assert(partMfs.nonEmpty, "no spec-1 data manifest in the manifest list")
    def bytesOf(v: Any): Array[Byte] = {
      val bb = v.asInstanceOf[java.nio.ByteBuffer].duplicate()
      val a = new Array[Byte](bb.remaining()); bb.get(a); a
    }
    def leInt(b: Array[Byte]): Int =
      b.zipWithIndex.map { case (x, i) => (x.toInt & 0xFF) << (8 * i) }.sum
    val sums = partMfs.head.get("partitions").asInstanceOf[java.util.Collection[_]]
      .asScala.toList.map(_.asInstanceOf[GenericRecord])
    assert(sums.size == 2)
    assert(new String(bytesOf(sums(0).get("lower_bound")), "UTF-8") == "c0")
    assert(new String(bytesOf(sums(0).get("upper_bound")), "UTF-8") == "c3")
    assert(leInt(bytesOf(sums(1).get("lower_bound"))) ==
      java.time.LocalDate.parse(days.head).toEpochDay.toInt)
    assert(leInt(bytesOf(sums(1).get("upper_bound"))) ==
      java.time.LocalDate.parse(days.last).toEpochDay.toInt)
    assert(sums.forall(s => String.valueOf(s.get("contains_null")) == "false"))

    // ---- manifest entries: typed partition tuples decode per file
    val allTuples = partMfs.flatMap { m =>
      val (_, mmeta, entries) = readAvro(str(m, "manifest_path"))
      assert(mmeta("partition-spec-id") == "1")
      assert(mmeta("partition-spec").contains("\"transform\":\"day\""))
      entries.map { e =>
        val part = e.get("data_file").asInstanceOf[GenericRecord]
          .get("partition").asInstanceOf[GenericRecord]
        (String.valueOf(part.get("cat")),
          part.get("ts_day").asInstanceOf[Number].intValue())
      }
    }
    val expected = days.zipWithIndex.map { case (d, i) =>
      (s"c$i", java.time.LocalDate.parse(d).toEpochDay.toInt) }.toSet
    assert(allTuples.toSet == expected, s"tuples: $allTuples")

    // ---- pruning survives a real-metadata round trip: same pruned-file
    // count on the re-imported table for identity and time-range filters
    import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual}
    val imp = graft.table.IcebergImport.importTable(spark, metaPath, s"$dir/imp")
    assert(imp.log.current.properties.get("write.partition-by")
      .contains("cat,days(ts)"))
    Seq(Seq(EqualTo("cat", "c2")),
        Seq(GreaterThanOrEqual("ts",
          java.sql.Timestamp.valueOf("2024-01-03 00:00:00")))).foreach { fl =>
      val orig = t.pruneFiles(t.log.current, fl).size
      val impd = imp.pruneFiles(imp.log.current, fl).size
      assert(orig < all.size, s"original table didn't prune for $fl")
      assert(impd == orig, s"pruned-file count changed on import for $fl: $impd != $orig")
    }
    // ...and the data is identical
    assert(imp.read.orderBy("id", "cat").collect().toSeq ==
      t.read.orderBy("id", "cat").collect().toSeq)
  }

  test("iceberg_bucket tables export a true bucket[N] spec; buckets survive re-import") {
    val dir = tmpDir()
    // one append per bucket: every file is provably single-valued in the
    // transform, so all data exports with real bucket tuples
    val base = spark.range(400).select($"id", ($"id" % 7).as("v"))
    val withB = base.withColumn("b", graft.functions.IcebergBucket($"id", 4))
    val t = GraftTable.create(spark, s"$dir/tbl", withB.filter($"b" === 0).drop("b"),
      Map("write.partition-by" -> "iceberg_bucket(4,id)"))
    (1 to 3).foreach(b => t.append(withB.filter($"b" === b).drop("b")))

    val metaPath = t.exportIcebergMetadata(s"$dir/export")
    val json = JsonMethods.parse(Files.readString(Paths.get(metaPath)))

    // spec JSON claims the true murmur3 bucket transform
    assert((json \ "default-spec-id").extract[Int] == 1)
    val sfields = ((json \ "partition-specs").extract[List[JValue]].apply(1) \ "fields")
      .extract[List[JValue]]
    assert(sfields.map(f => ((f \ "name").extract[String],
        (f \ "transform").extract[String]))
      == List(("id_bucket", "bucket[4]")))

    // every data file's tuple decodes to ITS rows' murmur3 bucket
    val cur = (json \ "current-snapshot-id").extract[Long]
    val listUri = ((json \ "snapshots").children
      .find(s => (s \ "snapshot-id").extract[Long] == cur).get
      \ "manifest-list").extract[String]
    val (_, _, mfs) = readAvro(listUri)
    val partMfs = mfs.filter(m =>
      str(m, "partition_spec_id") == "1" && str(m, "content") == "0")
    assert(partMfs.nonEmpty, "no spec-1 data manifest — bucket proof failed")
    val tuples = partMfs.flatMap { m =>
      val (_, _, entries) = readAvro(str(m, "manifest_path"))
      entries.map { e =>
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        (str(df, "file_path"),
          df.get("partition").asInstanceOf[GenericRecord]
            .get("id_bucket").asInstanceOf[Number].intValue())
      }
    }
    assert(tuples.map(_._2).toSet == Set(0, 1, 2, 3), s"tuples: $tuples")
    tuples.foreach { case (path, b) =>
      val ids = spark.read.parquet(java.net.URI.create(path).getPath)
        .select("id").collect().map(_.getLong(0))
      assert(ids.forall(id => graft.functions.IcebergMurmur3.bucketOf(
        graft.functions.IcebergMurmur3.hashLong(id), 4) == b),
        s"file $path claims bucket $b but holds foreign rows")
    }

    // re-import: the layout AND bucket pruning survive the round trip
    import org.apache.spark.sql.sources.EqualTo
    val imp = graft.table.IcebergImport.importTable(spark, metaPath, s"$dir/imp")
    assert(imp.log.current.properties.get("write.partition-by")
      .contains("iceberg_bucket(4,id)"))
    val all = t.log.current.files.size
    Seq(17L, 123L, 399L).foreach { id =>
      val orig = t.pruneFiles(t.log.current, Seq(EqualTo("id", id))).size
      val impd = imp.pruneFiles(imp.log.current, Seq(EqualTo("id", id))).size
      assert(orig < all, s"original didn't prune id=$id")
      assert(impd == orig, s"import lost bucket pruning for id=$id: $impd != $orig")
      assert(imp.read.filter($"id" === id).count() == 1L)
    }
  }

  test("a file the stats cannot prove single-valued stays in the unpartitioned manifest") {
    val dir = tmpDir()
    // spec evolution, the Iceberg way files get mixed layouts: the first
    // write predates the partition field (no transform stats — unprovable),
    // the second is written under it (single day — proven)
    val t = GraftTable.create(spark, s"$dir/tbl",
      spark.sql("SELECT id, timestamp'2024-01-01 12:00:00' AS ts FROM range(5)")
        .union(spark.sql("SELECT id, timestamp'2024-01-02 12:00:00' AS ts FROM range(5, 10)")))
    t.addPartitionField("days(ts)")
    t.append(spark.sql("SELECT id, timestamp'2024-02-01 08:00:00' AS ts FROM range(10, 15)"))
    val unproven = t.log.current.files.filter(f => !f.stats.contains("days(ts)"))
    val proven = t.log.current.files.filter(f =>
      f.stats.get("days(ts)").exists(cs => cs.min == cs.max))
    assert(unproven.nonEmpty && proven.nonEmpty,
      s"setup: want both layouts, got ${t.log.current.files.map(_.stats.keySet)}")

    val metaPath = t.exportIcebergMetadata(s"$dir/export")
    val json = JsonMethods.parse(Files.readString(Paths.get(metaPath)))
    val cur = (json \ "current-snapshot-id").extract[Long]
    val listUri = ((json \ "snapshots").children
      .find(s => (s \ "snapshot-id").extract[Long] == cur).get
      \ "manifest-list").extract[String]
    val (_, _, mfs) = readAvro(listUri)
    def filesUnderSpec(specId: String): Set[String] =
      mfs.filter(m => str(m, "partition_spec_id") == specId && str(m, "content") == "0")
        .flatMap { m =>
          val (_, _, entries) = readAvro(str(m, "manifest_path"))
          entries.map(e => String.valueOf(
            e.get("data_file").asInstanceOf[GenericRecord].get("file_path")))
        }.toSet
    val spec0 = filesUnderSpec("0")
    val spec1 = filesUnderSpec("1")
    unproven.foreach(f => assert(spec0.exists(_.endsWith(f.path.stripPrefix("data/"))),
      s"unprovable file ${f.path} must export tuple-less (spec 0)"))
    proven.foreach(f => assert(spec1.exists(_.endsWith(f.path.stripPrefix("data/"))),
      s"proven file ${f.path} must export with a tuple (spec 1)"))

    // a real importer still sees every row, and never a wrong prune
    val imp = graft.table.IcebergImport.importTable(spark, metaPath, s"$dir/imp")
    assert(imp.read.count() == t.read.count())
    import org.apache.spark.sql.sources.GreaterThanOrEqual
    val fl = Seq(GreaterThanOrEqual("ts", java.sql.Timestamp.valueOf("2024-02-01 00:00:00")))
    assert(imp.pruneFiles(imp.log.current, fl).size == t.pruneFiles(t.log.current, fl).size)
    assert(imp.read.where("ts >= timestamp'2024-02-01 00:00:00'").count() == 5)
  }

  test("nested-evolution fixpoint: export → import → add column → re-export keeps ids stable and collision-free") {
    val dir = tmpDir()
    import org.apache.spark.sql.types._

    // every id (struct field ids at any depth + list element / map key/value
    // ids) across every schema of one metadata.json — collisions here mean
    // two columns claim one id and a foreign reader silently mis-binds
    def allIds(json: JValue): List[(String, Int)] = {
      def walk(t: JValue, path: String): List[(String, Int)] = (t \ "type") match {
        case JString("struct") => (t \ "fields").children.flatMap { f =>
          val n = s"$path.${(f \ "name").extract[String]}"
          (n, (f \ "id").extract[Int]) :: walk(f \ "type", n)
        }
        case JString("list") =>
          (s"$path<elem>", (t \ "element-id").extract[Int]) :: walk(t \ "element", s"$path<elem>")
        case JString("map") =>
          List((s"$path<key>", (t \ "key-id").extract[Int]),
            (s"$path<val>", (t \ "value-id").extract[Int])) :::
            walk(t \ "key", s"$path<key>") ::: walk(t \ "value", s"$path<val>")
        case _ => Nil
      }
      (json \ "schemas").children.flatMap(s =>
        walk(s, s"s${(s \ "schema-id").extract[Int]}"))
    }
    def assertUniquePerSchema(json: JValue): Unit =
      (json \ "schemas").children.foreach { s =>
        val ids = allIds(JObject(List("schemas" -> JArray(List(s))))).map(_._2)
        assert(ids.distinct.size == ids.size,
          s"duplicate ids within schema: ${ids.groupBy(identity).filter(_._2.size > 1).keys}")
      }
    // one column = one id, across ALL schemas and renders: same path ⇒ same id
    def idsByPath(json: JValue): Map[String, Set[Int]] =
      allIds(json).groupBy(_._1.dropWhile(_ != '.')).view.mapValues(_.map(_._2).toSet).toMap

    val t = GraftTable.create(spark, s"$dir/tbl",
      spark.sql("""SELECT id, named_struct('a', CAST(id AS INT)) AS meta,
                   array(CAST(id AS STRING)) AS tags,
                   map('k', CAST(id AS INT)) AS m FROM range(3)"""))
    t.addColumn(Seq("meta", "b"), StringType) // nested evolution pre-export

    val metaPath1 = t.exportIcebergMetadata(s"$dir/export1")
    val meta1 = JsonMethods.parse(Files.readString(Paths.get(metaPath1)))
    assertUniquePerSchema(meta1)
    val by1 = idsByPath(meta1)
    by1.foreach { case (p, ids) => assert(ids.size == 1,
      s"column $p changes id across schemas of one render: $ids") }

    // round-trip through real metadata, then evolve AGAIN on the import:
    // top-level add + a second nested add
    val imp = graft.table.IcebergImport.importTable(spark, metaPath1, s"$dir/imp")
    imp.addColumn("extra", LongType)
    imp.addColumn(Seq("meta", "c"), DoubleType)
    imp.append(spark.sql(
      """SELECT id, named_struct('a', CAST(id AS INT), 'b', 'x', 'c', 1.5) AS meta,
         array(CAST(id AS STRING)) AS tags, map('k', CAST(id AS INT)) AS m,
         id AS extra FROM range(3, 6)"""))

    val meta2 = JsonMethods.parse(Files.readString(Paths.get(
      imp.exportIcebergMetadata(s"$dir/export2"))))
    assertUniquePerSchema(meta2)
    val by2 = idsByPath(meta2)
    by2.foreach { case (p, ids) => assert(ids.size == 1,
      s"column $p changes id across schemas after re-export: $ids") }

    // FIXPOINT: every column surviving the round trip keeps its exact id —
    // including list/map element ids — and the added columns took ids no
    // earlier render ever used
    by1.foreach { case (p, ids) =>
      assert(by2.get(p).contains(ids), s"column $p moved: $ids -> ${by2.get(p)}")
    }
    val newIds = (by2.keySet -- by1.keySet).flatMap(by2)
    val oldIds = by1.values.flatten.toSet
    assert(newIds.nonEmpty && newIds.intersect(oldIds).isEmpty,
      s"evolution reused published ids: ${newIds.intersect(oldIds)}")

    // and the data itself round-trips
    assert(imp.read.count() == 6)
    assert(imp.read.filter($"id" < 3).select("meta.b").collect().forall(_.isNullAt(0)))
  }

  test("renamed tables export every schema, per-schema manifests, and historical name-mapping") {
    val dir = tmpDir()
    val t = GraftTable.create(spark, s"$dir/tbl",
      Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    t.renameColumn("name", "title")
    t.append(Seq((3L, "c")).toDF("id", "title"))

    val metaPath = t.exportIcebergMetadata(s"$dir/export")
    val json = JsonMethods.parse(Files.readString(Paths.get(metaPath)))

    // every schema exports, same field id across generations
    val schemas = (json \ "schemas").extract[List[JValue]]
    assert(schemas.size == 2, s"want pre- and post-rename schemas, got ${schemas.size}")
    def fieldNamed(s: JValue, n: String): Option[Int] = (s \ "fields").children
      .find(f => (f \ "name").extractOpt[String].contains(n))
      .map(f => (f \ "id").extract[Int])
    val oldId = schemas.flatMap(fieldNamed(_, "name")).headOption
    val newId = schemas.flatMap(fieldNamed(_, "title")).headOption
    assert(oldId.isDefined && oldId == newId,
      s"rename must keep the field id: name=$oldId title=$newId")

    // name-mapping: both names for the renamed field id, current first
    val nm = JsonMethods.parse(
      (json \ "properties" \ "schema.name-mapping.default").extract[String])
    val entry = nm.children.find(e => (e \ "field-id").extractOpt[Int] == newId).get
    assert((entry \ "names").extract[List[String]] == List("title", "name"))

    // data manifests are stamped with the schema their files were WRITTEN
    // under, and embed that schema
    val cur = (json \ "current-snapshot-id").extract[Long]
    val listUri = ((json \ "snapshots").children
      .find(s => (s \ "snapshot-id").extract[Long] == cur).get
      \ "manifest-list").extract[String]
    val (_, _, mfs) = readAvro(listUri)
    val metas = mfs.filter(m => str(m, "content") == "0")
      .map(m => readAvro(str(m, "manifest_path"))._2)
    assert(metas.map(_("schema-id")).toSet.size == 2,
      s"want one manifest per write schema, got ${metas.map(_("schema-id"))}")
    metas.foreach { mm =>
      val hasOld = mm("schema").contains("\"name\":\"name\"")
      val hasNew = mm("schema").contains("\"name\":\"title\"")
      assert(hasOld != hasNew, "each manifest embeds exactly its own write schema")
    }

    // re-import resolves BOTH generations of files (per-file schema pin)
    val imp = graft.table.IcebergImport.importTable(spark, metaPath, s"$dir/imp")
    assert(imp.read.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("snapshot summary annotations (WAP ids) survive export and re-import") {
    val dir = tmpDir()
    val t = GraftTable.create(spark, s"$dir/tbl", Seq((1L, "a")).toDF("id", "v"))
    t.stageWapAppend(Seq((2L, "b")).toDF("id", "v"), "audit-x")
    t.publishChanges("audit-x")
    val metaPath = t.exportIcebergMetadata(s"$dir/export")
    val json = JsonMethods.parse(Files.readString(Paths.get(metaPath)))
    val summaries = (json \ "snapshots").children.map(s => (s \ "summary"))
    // the published snapshot (main lineage — detached staged snapshots
    // stay internal) exports its published-wap-id annotation, and every
    // summary still carries the spec-required operation key
    assert(summaries.exists(s =>
      (s \ "published-wap-id").extractOpt[String].contains("audit-x")))
    assert(summaries.forall(s => (s \ "operation").extractOpt[String].nonEmpty))
    // round-trip: the imported table's summary map carries the annotation
    val imp = graft.table.IcebergImport.importTable(spark, metaPath, s"$dir/imp")
    assert(imp.log.listVersions.map(imp.log.snapshot)
      .exists(_.summary.get("published-wap-id").contains("audit-x")))
    assert(imp.read.orderBy("id").count() == 2)
  }
}
