package graft

import org.apache.spark.sql.functions._
import graft.table.{DeltaInterop, GraftTable}

/** Delta transaction-log interop (table/DeltaInterop): import replays a
  * HAND-AUTHORED log (an independent fixture, not our own exporter's
  * output) including removes, URL-encoded paths, partitioned tables and
  * parquet checkpoints; export renders a log a Delta reader opens and the
  * importer round-trips; MOR remainders are rejected, not resurrected. */
class DeltaInteropSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String = java.nio.file.Files
    .createTempDirectory(java.nio.file.Paths.get("target"), prefix).toString

  private def writeParquetFile(rows: Seq[(Long, String)], dest: String): Unit = {
    val stage = tmp("delta-stage-")
    rows.toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dest).getParent)
    java.nio.file.Files.copy(part.toPath, java.nio.file.Paths.get(dest))
  }

  private val schemaJson = Seq.empty[(Long, String)].toDF("id", "v").schema.json
  private def metaAction(partCols: String = "[]"): String =
    s"""{"metaData":{"id":"00000000-0000-0000-0000-000000000001","format":{"provider":"parquet","options":{}},"schemaString":${org.json4s.jackson.JsonMethods.compact(org.json4s.JString(schemaJson))},"partitionColumns":$partCols,"configuration":{},"createdTime":1700000000000}}"""
  private val protoAction = """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""

  private def writeCommit(root: String, v: Long, lines: Seq[String]): Unit = {
    val f = java.nio.file.Paths.get(f"$root/_delta_log/$v%020d.json")
    java.nio.file.Files.createDirectories(f.getParent)
    java.nio.file.Files.writeString(f, lines.mkString("", "\n", "\n"))
  }

  test("import replays adds and removes from a hand-written log; encoded paths decode") {
    val root = tmp("delta-src-")
    writeParquetFile(Seq(1L -> "a", 2L -> "b"), s"$root/part one-0.parquet") // space in name
    writeParquetFile(Seq(3L -> "c"), s"$root/f1.parquet")
    writeParquetFile(Seq(4L -> "d"), s"$root/f2.parquet")
    writeParquetFile(Seq(5L -> "e"), s"$root/doc+1.parquet") // literal '+' must survive decode
    writeCommit(root, 0, Seq(protoAction, metaAction(),
      """{"add":{"path":"part%20one-0.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}""",
      """{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""))
    writeCommit(root, 1, Seq(
      """{"remove":{"path":"f1.parquet","deletionTimestamp":2,"dataChange":true}}""",
      """{"add":{"path":"f2.parquet","partitionValues":{},"size":1,"modificationTime":2,"dataChange":true}}""",
      """{"add":{"path":"doc+1.parquet","partitionValues":{},"size":1,"modificationTime":2,"dataChange":true}}""",
      """{"commitInfo":{"operation":"WRITE"}}"""))

    val t = DeltaInterop.importTable(spark, root, tmp("delta-t-") + "/t")
    val rows = t.read.select($"id", $"v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "a"), (2L, "b"), (4L, "d"), (5L, "e")), rows) // f1 removed
    // registered in place: no data copy happened
    val absRoot = new java.io.File(root).getAbsolutePath
    assert(t.log.current.files.forall(_.path.startsWith(absRoot)),
      t.log.current.files.map(_.path).mkString(", "))

    // history replay: v0 empty base, v1 = Delta commit 0 (append), v2 =
    // Delta commit 1 (remove+add = overwrite) — time travel works post-move
    assert(t.log.currentVersion == 2L)
    assert(t.log.snapshot(1L).operation == "append")
    assert(t.log.snapshot(2L).operation == "overwrite")
    val v1rows = t.readVersion(1L).select($"id").collect().map(_.getLong(0)).toSet
    assert(v1rows == Set(1L, 2L, 3L), v1rows) // f1 still live at v1
  }

  test("re-export with fewer versions drops the stale log tail") {
    val dir = tmp("delta-tail-") + "/t"
    val t = GraftTable.create(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    t.append(Seq((2L, "b")).toDF("id", "v"))
    t.append(Seq((3L, "c")).toDF("id", "v"))
    DeltaInterop.export(GraftTable.load(spark, dir), dir) // 3 history commits
    assert(new java.io.File(f"$dir/_delta_log/${2L}%020d.json").exists())
    // head-only re-export must not leave versions 1-2 for readers to replay
    DeltaInterop.export(GraftTable.load(spark, dir), dir, history = false)
    assert(!new java.io.File(f"$dir/_delta_log/${1L}%020d.json").exists())
    assert(!new java.io.File(f"$dir/_delta_log/${2L}%020d.json").exists())
    val back = DeltaInterop.importTable(spark, dir, tmp("delta-tail-rt-") + "/t")
    assert(back.read.count() == 3)
  }

  test("partitioned import materializes log-held partition values as columns") {
    val root = tmp("delta-part-")
    // data files do NOT contain the partition column (the Delta layout)
    writeParquetFile(Seq(1L -> "a"), s"$root/lang=en/p0.parquet")
    writeParquetFile(Seq(2L -> "b"), s"$root/lang=de/p1.parquet")
    val schema3 = org.apache.spark.sql.types.StructType(
      Seq.empty[(Long, String)].toDF("id", "v").schema.fields :+
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType))
    val meta3 =
      s"""{"metaData":{"id":"00000000-0000-0000-0000-000000000002","format":{"provider":"parquet","options":{}},"schemaString":${org.json4s.jackson.JsonMethods.compact(org.json4s.JString(schema3.json))},"partitionColumns":["lang"],"configuration":{},"createdTime":1700000000000}}"""
    writeCommit(root, 0, Seq(protoAction, meta3,
      """{"add":{"path":"lang=en/p0.parquet","partitionValues":{"lang":"en"},"size":1,"modificationTime":1,"dataChange":true}}""",
      """{"add":{"path":"lang=de/p1.parquet","partitionValues":{"lang":"de"},"size":1,"modificationTime":1,"dataChange":true}}"""))

    val t = DeltaInterop.importTable(spark, root, tmp("delta-t-") + "/t")
    val rows = t.read.select($"id", $"lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "en"), (2L, "de")), rows)
  }

  test("checkpoint parquet + later JSON commits replay together") {
    val root = tmp("delta-cp-")
    writeParquetFile(Seq(1L -> "a"), s"$root/c0.parquet")
    writeParquetFile(Seq(2L -> "b"), s"$root/c1.parquet")
    // checkpoint at version 0 carrying protocol+metaData+one add — built by
    // round-tripping the SAME action JSON through spark.read.json so the
    // parquet's struct layout is the one real writers produce
    val cpActions = Seq(protoAction, metaAction(),
      """{"add":{"path":"c0.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}""")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/_delta_log"))
    val stage = tmp("delta-cpstage-")
    spark.read.json(spark.createDataset(cpActions)).coalesce(1)
      .write.mode("overwrite").parquet(stage)
    val cpPart = new java.io.File(stage).listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(cpPart.toPath,
      java.nio.file.Paths.get(f"$root/_delta_log/${0L}%020d.checkpoint.parquet"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/_delta_log/_last_checkpoint"),
      """{"version":0,"size":3}""")
    writeCommit(root, 1, Seq(
      """{"add":{"path":"c1.parquet","partitionValues":{},"size":1,"modificationTime":2,"dataChange":true}}"""))

    val t = DeltaInterop.importTable(spark, root, tmp("delta-t-") + "/t")
    assert(t.read.count() == 2)
  }

  test("reader-version 3 features are rejected, not misread") {
    val root = tmp("delta-v3-")
    writeParquetFile(Seq(1L -> "a"), s"$root/x.parquet")
    writeCommit(root, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"]}}""",
      metaAction(),
      """{"add":{"path":"x.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""))
    val e = intercept[IllegalArgumentException] {
      DeltaInterop.importTable(spark, root, tmp("delta-t-") + "/t")
    }
    assert(e.getMessage.contains("minReaderVersion"))
  }

  test("export renders a log the importer round-trips; MOR remainders rejected") {
    val dir = tmp("delta-exp-") + "/t"
    val t = GraftTable.create(spark, dir,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    t.append(Seq((4L, "d")).toDF("id", "v"))
    t.delete($"id" === 2L) // copy-on-write: no MOR remainder

    val last = DeltaInterop.export(GraftTable.load(spark, dir), dir)
    // history: one Delta commit per graft snapshot (create, append, delete)
    assert(last.endsWith(f"${2L}%020d.json"), last)
    val c0 = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(
      last.replace(f"${2L}%020d.json", f"${0L}%020d.json")))
    assert(c0.get(0).contains("\"minReaderVersion\":1"))
    assert(c0.get(1).contains("\"schemaString\""))
    assert(c0.size >= 3) // protocol + metaData + >=1 add
    assert((2 until c0.size).forall(i => c0.get(i).contains("numRecords")))
    // the delete commit removes files it no longer references
    val c2 = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(last))
    assert((0 until c2.size).exists(i => c2.get(i).contains("\"remove\"")))

    val back = DeltaInterop.importTable(spark, dir, tmp("delta-rt-") + "/t")
    val rows = back.read.select($"id", $"v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "a"), (3L, "c"), (4L, "d")), rows)
    // and the replayed history round-trips: the pre-delete version has id=2
    assert(back.readVersion(back.log.currentVersion - 1)
      .select($"id").collect().map(_.getLong(0)).toSet.contains(2L))

    // a MOR table refuses to export until compacted
    val dir2 = tmp("delta-mor-") + "/t"
    val t2 = GraftTable.create(spark, dir2, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t2.deleteByEquality(Seq(Tuple1(1L)).toDF("id"))
    val e = intercept[IllegalArgumentException] {
      DeltaInterop.export(GraftTable.load(spark, dir2), dir2)
    }
    assert(e.getMessage.contains("merge-on-read"))
  }

  test("export honors a scheme-qualified outDir; off-root data paths keep their scheme") {
    // outDir as a file:/ URI must NOT be re-absolutized through
    // java.io.File (which would mangle scheme'd URIs the way it would
    // s3://bucket/t -> /cwd/s3:/bucket/t) — the _delta_log must land under
    // the URI's own path
    val dir = tmp("delta-scheme-") + "/t"
    val t = GraftTable.create(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val outAbs = new java.io.File(tmp("delta-schemeout-")).getAbsolutePath
    val last = DeltaInterop.export(t, s"file:$outAbs")
    assert(new java.io.File(f"$outAbs/_delta_log/${0L}%020d.json").exists(),
      s"log not under the URI path: $last")
    // data files live under the table root (outside outDir) -> absolute
    // URIs; a scheme-qualified path keeps its scheme verbatim instead of
    // being double-wrapped in file:// with an encoded inner ':'
    val c0 = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(
      f"$outAbs/_delta_log/${0L}%020d.json"))
    val adds = (0 until c0.size).map(c0.get).filter(_.contains("\"add\""))
    assert(adds.nonEmpty)
    assert(adds.forall(_.contains("\"path\":\"file://")), adds.mkString("\n"))
    assert(adds.forall(!_.contains("%3A")), "inner scheme colon was percent-encoded:\n" +
      adds.mkString("\n"))
  }

  test("import timestamps are monotone when commitInfo.timestamp is absent") {
    val root = tmp("delta-ts-")
    writeParquetFile(Seq(1L -> "a"), s"$root/f1.parquet")
    writeParquetFile(Seq(2L -> "b"), s"$root/f2.parquet")
    // neither commit carries commitInfo.timestamp -> fallback is the commit
    // file's mtime with a monotone clamp, never the import-time wall clock
    writeCommit(root, 0, Seq(protoAction, metaAction(),
      """{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""))
    writeCommit(root, 1, Seq(
      """{"add":{"path":"f2.parquet","partitionValues":{},"size":1,"modificationTime":2,"dataChange":true}}"""))
    // force an out-of-order mtime on the LATER commit: the clamp must keep
    // replayed history non-decreasing anyway
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(f"$root/_delta_log/${1L}%020d.json"),
      java.nio.file.attribute.FileTime.fromMillis(1000L))
    val beforeImport = System.currentTimeMillis()
    val t = DeltaInterop.importTable(spark, root, tmp("delta-tst-") + "/t")
    val ts = (1L to t.log.currentVersion).map(v => t.log.snapshot(v).timestampMs)
    assert(ts == ts.sorted, s"non-monotone replayed timestamps: $ts")
    // mtime-derived, not import-time wall clock
    assert(ts.forall(_ < beforeImport), s"wall-clock timestamps leaked in: $ts")
  }

  test("CALL import_delta / export_delta ride the procedure surface") {
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", SparkSpec.warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.proc")
    spark.sql("CREATE TABLE graft.proc.dexp (id BIGINT, v STRING) USING graft")
    spark.sql("INSERT INTO graft.proc.dexp VALUES (1, 'a'), (2, 'b')")
    val out = tmp("delta-proc-")
    spark.sql(s"CALL graft.system.export_delta('proc.dexp', '$out')")
    assert(new java.io.File(
      f"$out/_delta_log/${0L}%020d.json").exists())
    spark.sql(s"CALL graft.system.import_delta('proc.dimp', '$out')")
    assert(spark.sql("SELECT count(*) FROM graft.proc.dimp").head().getLong(0) == 2)
  }
}
