package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.functions._

import graft.table.{GraftTable, IcebergImport}

/** Iceberg metadata IMPORT: the inverse interop direction of
  * IcebergExportSpec. The round-trip test proves export → import is
  * lossless (rows, deletes, sequence scoping, field ids, stats); the
  * foreign-table test builds a v1 Iceberg tree from scratch with the REAL
  * Apache Avro writer — a layout graft never wrote — and proves graft
  * loads it, so the importer is coupled to the spec, not to graft's own
  * export habits. */
class IcebergImportSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(Paths.get("target"), "iceberg-imp-")
      .toAbsolutePath.toString

  test("export -> import round-trips rows, deletes, seq scoping, ids, and stats") {
    val dir = tmpDir()
    val t = GraftTable.create(spark, s"$dir/tbl",
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "name", "amount"),
      Map("write.delete.mode" -> "merge-on-read"))
    t.append(Seq((4L, "d", 40.0), (5L, "e", 50.0)).toDF("id", "name", "amount"))
    t.delete(col("id") === 2L)            // positional delete (MOR)
    t.deleteByEquality(Seq(4L).toDF("id")) // equality delete at seq S
    // appended AFTER the eq delete: same key value must SURVIVE (seq scoping)
    t.append(Seq((4L, "d2", 41.0)).toDF("id", "name", "amount"))
    t.renameColumn("name", "title")
    t.createTag("after-first-append", 1L)

    val metaPath = t.exportIcebergMetadata(s"$dir/export")
    val imp = IcebergImport.importTable(spark, metaPath.toString, s"$dir/imported")

    val expect = t.read.orderBy("id").collect().map(_.toSeq)
    val got = imp.read.orderBy("id").collect().map(_.toSeq)
    assert(imp.read.columns.toSeq == Seq("id", "title", "amount"))
    assert(got.toSeq == expect.toSeq)
    // the survivor row proves sequence scoping came through the round trip
    assert(imp.read.filter(col("id") === 4L).count() == 1)
    assert(imp.read.filter(col("id") === 2L).count() == 0)

    // field ids round-trip exactly (iceberg id - 1 == original graft.id)
    val origIds = t.schema.fields.map(f => f.name -> f.metadata.getLong("graft.id")).toMap
    val impIds = imp.schema.fields.map(f => f.name -> f.metadata.getLong("graft.id")).toMap
    assert(impIds == origIds, s"$impIds vs $origIds")

    // per-file min/max stats imported from manifest bounds -> pruning works
    val statted = imp.log.current.files.filter(_.stats.contains("id"))
    assert(statted.nonEmpty, "no imported file carries id bounds")
    val allIdMins = statted.map(_.stats("id").min.toLong)
    assert(allIdMins.min == 1L)
    // operation + provenance recorded
    assert(imp.log.current.operation == "import-iceberg")
    assert(imp.log.current.properties.contains("graft.imported-from"))

    // HISTORY import: the whole snapshot chain replays as graft versions
    // (orig v0..v5 -> imported v1..v6), so time travel works on the import
    assert(imp.log.currentVersion == t.log.currentVersion + 1)
    val midOrig = t.readVersion(1).orderBy("id").collect().map(_.toSeq).toSeq
    val midImp = imp.readVersion(2).orderBy("id").collect().map(_.toSeq).toSeq
    assert(midImp == midOrig, "time travel to a mid-chain version diverged")
    // tags ride the export refs and remap onto the imported chain
    assert(imp.log.refs.get("after-first-append").exists(_.version == 2L),
      imp.log.refs.toString)
    assert(imp.readRef("after-first-append").count() == t.readRef("after-first-append").count())

    // 100 TB plan shape: the imported read is still a vectorized parquet
    // scan with the positional deletes riding as a BROADCAST anti-join —
    // field-id resolution and path canon must not force a sort-merge join
    // or disable codegen
    val plan = imp.read.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("Scan parquet"), plan.linesIterator.take(12).mkString("\n"))
    assert(!plan.contains("SortMergeJoin"), "delete join must broadcast")

    // RE-EXPORT of the imported table: negative (rank-compressed) seqs are
    // uniformly shifted back to spec-valid non-negative numbers; importing
    // the re-export must preserve the same current state (scoping intact)
    val meta2 = imp.exportIcebergMetadata(s"$dir/export2")
    val imp2 = IcebergImport.importTable(spark, meta2.toString, s"$dir/imported2")
    assert(imp2.read.orderBy("id").collect().map(_.toSeq).toSeq == expect.toSeq)
    assert(imp2.log.current.files.forall(_.seq < 0)) // ranks again, by design
  }

  test("v3 deletion vectors: export -> import round-trips MOR deletes exactly, " +
      "history included") {
    val dir = tmpDir()
    val t = GraftTable.create(spark, s"$dir/tbl",
      (1L to 100L).map(i => (i, s"n$i", i.toDouble)).toDF("id", "name", "amount"),
      Map("write.delete.mode" -> "merge-on-read"))
    t.delete(col("id") % 7 === 0L)     // one positional-delete commit
    t.append((101L to 120L).map(i => (i, s"n$i", i.toDouble)).toDF("id", "name", "amount"))
    t.delete(col("id") > 110L)         // second, scoping over the append
    val expect = t.read.collect().map(_.getLong(0)).sorted.toSeq

    val metaPath = t.exportIcebergMetadata(s"$dir/export", formatVersion = 3)
    val imp = IcebergImport.importTable(spark, metaPath, s"$dir/imported")
    // full equality, not just counts
    assert(imp.read.collect().map(_.getLong(0)).sorted.toSeq == expect)
    // deletes arrived as materialized graft positional-delete files
    assert(imp.log.current.deleteFiles.nonEmpty)
    assert(imp.log.current.deleteFiles.forall(_.path.contains("dv-")),
      "imported deletes must come from the DV materialization")
    // HISTORY replays: the pre-delete snapshot still reads 100 undeleted rows
    val counts = (0L to imp.log.currentVersion).map(v => imp.readVersion(v).count())
    assert(counts.contains(100L), s"no replayed version reads 100 rows: $counts")
    assert(counts.last == expect.size.toLong)
    // and a second import of the same tree dedupes the materialized DVs
    val imp2 = IcebergImport.importTable(spark, metaPath, s"$dir/imported2")
    assert(imp2.read.collect().map(_.getLong(0)).sorted.toSeq == expect)
  }

  test("a foreign-written v1 Iceberg table (real Avro writer) imports and reads") {
    val dir = tmpDir()
    // -- data: one plain parquet file, written by Spark, registered in place
    val dataDir = s"$dir/data"
    Seq((1L, "x", "web"), (2L, "y", "web"), (3L, "z", "web"))
      .toDF("id", "name", "src").coalesce(1).write.parquet(dataDir)
    val dataFile = new File(dataDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath

    val metaDir = s"$dir/tbl/metadata"
    Files.createDirectories(Paths.get(metaDir))

    // -- manifest (v1 layout: no content / sequence_number fields anywhere)
    val entrySchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"snapshot_id","type":["null","long"],"default":null},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |{"name":"file_path","type":"string"},
        |{"name":"file_format","type":"string"},
        |{"name":"partition","type":{"type":"record","name":"r102","fields":[
        |  {"name":"src","type":["null","string"],"default":null}]},"default":{"src":null}},
        |{"name":"record_count","type":"long"},
        |{"name":"file_size_in_bytes","type":"long"}]}}]}"""
        .stripMargin.replace("\n", ""))
    val dataFileRec = new GenericData.Record(entrySchema.getField("data_file").schema())
    dataFileRec.put("file_path", s"file://$dataFile")
    dataFileRec.put("file_format", "PARQUET")
    val partRec = new GenericData.Record(
      entrySchema.getField("data_file").schema().getField("partition").schema())
    partRec.put("src", "web") // identity partition value (no column metrics!)
    dataFileRec.put("partition", partRec)
    dataFileRec.put("record_count", 3L)
    dataFileRec.put("file_size_in_bytes", new File(dataFile).length())
    val entry = new GenericData.Record(entrySchema)
    entry.put("status", 1) // ADDED
    entry.put("snapshot_id", 99L)
    entry.put("data_file", dataFileRec)
    val manifestPath = s"$metaDir/m1.avro"
    writeAvro(manifestPath, entrySchema, Seq(entry))

    // -- manifest list (v1 fields only)
    val listSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |{"name":"manifest_path","type":"string"},
        |{"name":"manifest_length","type":"long"},
        |{"name":"partition_spec_id","type":"int"},
        |{"name":"added_snapshot_id","type":["null","long"],"default":null}]}"""
        .stripMargin.replace("\n", ""))
    val mf = new GenericData.Record(listSchema)
    mf.put("manifest_path", s"file://$manifestPath")
    mf.put("manifest_length", new File(manifestPath).length())
    mf.put("partition_spec_id", 0)
    mf.put("added_snapshot_id", 99L)
    val listPath = s"$metaDir/snap-99.avro"
    writeAvro(listPath, listSchema, Seq(mf))

    // -- v1 metadata.json: single "schema", NON-CONTIGUOUS field ids (3, 7)
    Files.writeString(Paths.get(s"$metaDir/v1.metadata.json"),
      s"""{"format-version":1,
         |"table-uuid":"11111111-2222-3333-4444-555555555555",
         |"location":"file://$dir/tbl",
         |"last-updated-ms":1700000000000,
         |"last-column-id":7,
         |"schema":{"type":"struct","fields":[
         |  {"id":3,"name":"id","required":true,"type":"long"},
         |  {"id":7,"name":"name","required":false,"type":"string"},
         |  {"id":9,"name":"src","required":false,"type":"string"}]},
         |"partition-spec":[{"name":"src","transform":"identity",
         |  "source-id":9,"field-id":1000}],
         |"properties":{"owner":"someone-else"},
         |"current-snapshot-id":99,
         |"snapshots":[{"snapshot-id":99,"timestamp-ms":1700000000000,
         |  "manifest-list":"file://$listPath"}]}""".stripMargin)
    Files.writeString(Paths.get(s"$metaDir/version-hint.text"), "1")

    // -- import from the TABLE ROOT (exercises version-hint resolution)
    val imp = IcebergImport.importTable(spark, s"$dir/tbl", s"$dir/imported")
    assert(imp.read.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((1L, "x"), (2L, "y"), (3L, "z")))
    // foreign ids mapped: graft.id = iceberg id - 1, non-contiguous preserved
    assert(imp.schema.fields.map(f => f.metadata.getLong("graft.id")).toSeq
      == Seq(2L, 6L, 8L))
    // the identity partition value became min==max stats (this v1 table
    // writes NO column metrics — partition pruning is the only handle)
    val srcStats = imp.log.current.files.head.stats.get("src")
    assert(srcStats.exists(cs => cs.min == "web" && cs.max == "web"), srcStats.toString)
    // schema evolution keeps allocating ABOVE the imported ids
    imp.addColumn("score", org.apache.spark.sql.types.DoubleType)
    val scoreId = imp.schema.fields.find(_.name == "score").get.metadata.getLong("graft.id")
    assert(scoreId > 6L, s"fresh id $scoreId collides with imported ids")
  }

  test("timestamp and decimal bounds survive export -> import byte-for-byte") {
    // event-time is the most common foreign pruning filter; decimal the most
    // common measure — both bound encodings must round-trip to the EXACT
    // string form graft's own stats use, or pruning comparisons drift
    val dir = tmpDir()
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-15 10:30:00"),
        new java.math.BigDecimal("12.50")),
      (2L, java.sql.Timestamp.valueOf("2024-03-02 23:59:59.123"),
        new java.math.BigDecimal("-3.75")),
      (3L, java.sql.Timestamp.valueOf("2023-12-31 00:00:01"),
        new java.math.BigDecimal("0.000000012"))) // sci-notation rendering
    val t = GraftTable.create(spark, s"$dir/tbl", rows.toDF("id", "ts", "amt"))
    val imp = IcebergImport.importTable(spark,
      t.exportIcebergMetadata(s"$dir/export").toString, s"$dir/imported")
    val orig = t.log.current.files.head.stats
    val got = imp.log.current.files.head.stats
    for (c <- Seq("ts", "amt")) {
      assert(orig.contains(c), s"native stats missing $c")
      assert(got.get(c).map(s => (s.min, s.max)) ==
             orig.get(c).map(s => (s.min, s.max)),
        s"$c: ${got.get(c)} vs ${orig.get(c)}")
    }
  }

  test("imported tables are streamable: tail picks up post-import appends exactly once") {
    // an imported table is a full graft citizen — the incremental streaming
    // source tails it (history snapshots + live appends) like any other
    val dir = tmpDir()
    val t = GraftTable.create(spark, s"$dir/tbl", Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    t.append(Seq((3L, "c")).toDF("id", "name"))
    val metaPath = t.exportIcebergMetadata(s"$dir/export")
    val imp = IcebergImport.importTable(spark, metaPath.toString, s"$dir/imported")

    val q = spark.readStream.format("graft-stream")
      .option("path", s"$dir/imported").load()
      .writeStream.format("memory").queryName("imp_tail")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      q.processAllAvailable()
      assert(spark.table("imp_tail").count() == 3)
      imp.append(Seq((4L, "d")).toDF("id", "name"))
      q.processAllAvailable()
      assert(spark.table("imp_tail").collect().map(_.getLong(0)).sorted.toSeq
        == Seq(1L, 2L, 3L, 4L))
    } finally q.stop()
  }

  test("imported tables emit CDC: a change-feed mirror tracks post-import DML") {
    // the full pipeline a reference user runs after switching: import the
    // Iceberg table, then mirror it elsewhere off its change feed
    val dir = tmpDir()
    val t = GraftTable.create(spark, s"$dir/tbl",
      Seq((1L, "a"), (2L, "b")).toDF("id", "name"),
      Map("write.delete.mode" -> "merge-on-read"))
    val metaPath = t.exportIcebergMetadata(s"$dir/export")
    // importTable intentionally carries no source write.* properties — set
    // the delete mode explicitly so the post-import delete below really is
    // a MOR positional delete against IMPORTED data files (exercising the
    // canon'd changelog + read joins), not a CoW rewrite
    val imp = IcebergImport.importTable(spark, metaPath.toString, s"$dir/imported",
      extraProps = Map("write.delete.mode" -> "merge-on-read"))
    val mirror = s"$dir/mirror"
    val q = spark.readStream.format("graft-stream")
      .option("path", s"$dir/imported").option("readChangeFeed", "true")
      .option("fromVersion", "-1")
      .load()
      .writeStream.format("graft-stream")
      .option("path", mirror).option("upsertKeys", "id")
      .option("applyChangeFeed", "true")
      .option("checkpointLocation", s"$dir/ckpt-impcdc")
      .start()
    try {
      q.processAllAvailable()
      imp.append(Seq((3L, "c")).toDF("id", "name"))
      imp.delete(col("id") === 1L) // MOR positional delete on IMPORTED data
      q.processAllAvailable()
      val got = GraftTable.load(spark, mirror).read
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      assert(got == Seq((2L, "b"), (3L, "c")))
    } finally q.stop()
  }

  test("CALL graft.system.import_iceberg loads an exported table through the catalog") {
    val dir = tmpDir()
    val t = GraftTable.create(spark, s"$dir/tbl",
      Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    val metaPath = t.exportIcebergMetadata(s"$dir/export")

    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", SparkSpec.warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.imp")
    spark.sql(s"CALL graft.system.import_iceberg('imp.from_ice', '$metaPath')")
    assert(spark.sql("SELECT count(*) FROM graft.imp.from_ice").collect()(0).getLong(0) == 2)
    assert(spark.sql("SELECT name FROM graft.imp.from_ice WHERE id = 2")
      .collect()(0).getString(0) == "b")
  }

  private def writeAvro(path: String, schema: org.apache.avro.Schema,
      records: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new File(path))
    try records.foreach(w.append) finally w.close()
  }
}
