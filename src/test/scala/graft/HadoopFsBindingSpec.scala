package graft

import java.nio.file.{Files, Paths}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath, RawLocalFileSystem}
import org.apache.spark.sql.functions._
import graft.table.{CommitConflictException, GraftTable, HadoopFileIO, Snapshot, SnapshotLog}

/** Local stand-in for an HDFS-contract store: bytes live on local disk, but
  * the scheme is not `file`, so [[HadoopFileIO]] takes its generic (non-
  * POSIX) code paths — and rename-onto-existing FAILS like HDFS's NameNode
  * rename (RawLocalFileSystem would happily clobber via POSIX `rename(2)`,
  * which is exactly the semantic difference the CAS depends on). */
class HdfsContractFs extends RawLocalFileSystem {
  // keep the initialized authority in the FS URI, like real HDFS keeps
  // hdfs://namenode:8020 — makeQualified then preserves it, so listings and
  // input paths agree on the rendering (the local backing store ignores it)
  private var fsUri: java.net.URI = java.net.URI.create("hcfs:///")
  override def initialize(name: java.net.URI, conf: org.apache.hadoop.conf.Configuration): Unit = {
    fsUri = Option(name.getAuthority).filter(_.nonEmpty)
      .map(a => java.net.URI.create(s"hcfs://$a"))
      .getOrElse(java.net.URI.create("hcfs:///"))
    super.initialize(name, conf)
  }
  override def getScheme: String = "hcfs"
  override def getUri: java.net.URI = // null-safe: super's ctor calls this pre-init
    if (fsUri == null) java.net.URI.create("hcfs:///") else fsUri
  override def rename(src: HPath, dst: HPath): Boolean =
    if (exists(dst)) false else super.rename(src, dst)
  // accept authority-less paths against an authority-bearing instance
  override def checkPath(path: HPath): Unit = ()
}

/** The object-store binding (VERDICT r6 next-step #3; reference
  * `main.tf:616-619` keeps data + metadata on S3): all table IO routes
  * through the Hadoop `FileSystem` API, so a non-local store is pure
  * configuration. Proven two ways — the commit CAS + log protocol over an
  * HDFS-contract scheme, and the full table layer over a `file://`-schemed
  * root (and over `hcfs://` end-to-end through Spark itself). */
class HadoopFsBindingSpec extends SparkSpec {
  import spark.implicits._

  private def hcfsConf(): Configuration = {
    val c = new Configuration()
    c.set("fs.hcfs.impl", classOf[HdfsContractFs].getName)
    c
  }

  private def tmpAbs(prefix: String): String =
    Files.createTempDirectory(Paths.get("target"), prefix).toAbsolutePath.toString

  private def snap0 = Snapshot(0L, -1L, 1L, "create", 0, Map("0" -> "{}"), Seq.empty)

  test("createExclusive is a CAS on an HDFS-contract scheme (rename-based)") {
    val root = s"hcfs://${tmpAbs("graft-hcfs-io-")}"
    val io = new HadoopFileIO(root, hcfsConf())
    io.mkdirs(root)
    assert(io.createExclusive(s"$root/x.json", "winner"))
    assert(!io.createExclusive(s"$root/x.json", "loser"))
    assert(io.readString(s"$root/x.json") == "winner") // loser never clobbers
    // atomic-replace + list + size + rename round out the contract
    io.writeAtomicReplace(s"$root/HEAD", "0")
    io.writeAtomicReplace(s"$root/HEAD", "1")
    assert(io.readString(s"$root/HEAD") == "1")
    assert(io.listNames(root).toSet == Set("x.json", "HEAD"))
    assert(io.size(s"$root/x.json") == "winner".length)
    io.rename(s"$root/x.json", s"$root/y.json")
    assert(!io.exists(s"$root/x.json") && io.readString(s"$root/y.json") == "winner")
    assert(io.listNames(s"$root/nope").isEmpty)
  }

  test("snapshot-log commit protocol holds over an HDFS-contract scheme") {
    val root = s"hcfs://${tmpAbs("graft-hcfs-log-")}"
    val log = new SnapshotLog(root, new HadoopFileIO(root, hcfsConf()))
    log.initDirs()
    log.commit(-1L, v => snap0.copy(version = v))
    log.commit(0L, v => snap0.copy(version = v, parent = 0L, operation = "append"))
    assert(log.currentVersion == 1L && log.listVersions == Seq(0L, 1L))
    assert(log.snapshot(1L).operation == "append")
    // stale parent → conflict (head moved on)
    intercept[CommitConflictException] {
      log.commit(0L, v => snap0.copy(version = v, parent = 0L))
    }
    // racing publish of the same candidate version → exactly one wins
    intercept[CommitConflictException] {
      log.commitRaw(0L, 1L, "{}", moveHead = false)
    }
  }

  test("expire through the binding deletes only unprotected versions") {
    val root = s"hcfs://${tmpAbs("graft-hcfs-exp-")}"
    val log = new SnapshotLog(root, new HadoopFileIO(root, hcfsConf()))
    log.initDirs()
    log.commit(-1L, v => snap0.copy(version = v))
    log.commit(0L, v => snap0.copy(version = v, parent = 0L, operation = "append"))
    log.commit(1L, v => snap0.copy(version = v, parent = 1L, operation = "append"))
    log.setRef("keep", graft.table.Ref(0L, "tag"))
    assert(log.expireMetadata(2L) == Seq(1L)) // v0 ref-protected, v2 is head
    assert(log.listVersions == Seq(0L, 2L))
  }

  test("full table layer works on a file://-schemed root") {
    val root = s"file://${tmpAbs("graft-furi-")}/tbl"
    val t = GraftTable.create(spark, root,
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "amount"))
    t.append(Seq((3L, "c", 30.0)).toDF("id", "name", "amount"))
    assert(t.read.count() == 3)
    t.delete(col("id") === 2L)
    assert(t.read.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(t.readVersion(1).count() == 3) // time travel intact
    assert(t.manifestsMeta.count() == t.log.listVersions.size) // io.size path
    t.expireSnapshots(keepLast = 1)
    assert(t.read.count() == 2) // orphan GC didn't eat live files
  }

  test("authority-bearing root (hcfs://ns1/...) — CoW DML matches files correctly") {
    // regression: canon() must NOT strip scheme+authority (s3a://bucket/...,
    // hdfs://nn:8020/...) — that left a relative path and every
    // delete/update silently became a no-op
    spark.sparkContext.hadoopConfiguration
      .set("fs.hcfs.impl", classOf[HdfsContractFs].getName)
    val root = s"hcfs://ns1${tmpAbs("graft-auth-")}/tbl"
    val t = GraftTable.create(spark, root,
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "name", "amount"))
    t.delete(col("id") === 2L)
    assert(t.read.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
    t.update(col("id") === 3L, Map("amount" -> lit(99.0)))
    assert(t.read.filter(col("id") === 3L).collect().head.getDouble(2) == 99.0)
  }

  test("local root with a space in the path — commits do not URI-parse") {
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "graft sp ").toAbsolutePath.toString
    val root = s"file://$base/tbl"
    val log = new SnapshotLog(root)
    log.initDirs()
    log.commit(-1L, v => snap0.copy(version = v))
    log.commit(0L, v => snap0.copy(version = v, parent = 0L, operation = "append"))
    assert(log.currentVersion == 1L)
    assert(log.snapshot(1L).operation == "append")
  }

  test("missing HEAD with committed versions still counts as an existing table") {
    // regression: during a non-posix HEAD replace the file briefly does not
    // exist; probes must not conclude "no table" (a streaming sink would
    // auto-create an empty table over a live one), and commit(-1) must fail
    val root = s"hcfs://${tmpAbs("graft-nohead-")}"
    val log = new SnapshotLog(root, new HadoopFileIO(root, hcfsConf()))
    log.initDirs()
    log.commit(-1L, v => snap0.copy(version = v))
    log.io.delete(s"${log.metaDir}/HEAD") // simulate mid-replace window
    assert(log.exists, "exists must fall back to listing vN.json")
    assert(log.currentVersion == 0L)
    intercept[CommitConflictException] {
      log.commit(-1L, v => snap0.copy(version = v))
    }
  }

  test("a durable commit whose HEAD move is pending still wins its edge (no lost update)") {
    import spark.implicits._
    val root = s"${tmpAbs("graft-inflight-")}/tbl"
    val t = GraftTable.create(spark, root, Seq((1L, "a", 1.0)).toDF("id", "name", "amount"))
    t.append(Seq((2L, "b", 2.0)).toDF("id", "name", "amount")) // v1
    // simulate writer A paused between publishing v1.json and moving HEAD:
    // rewind only the HEAD cache
    t.log.io.writeAtomicReplace(s"${t.log.metaDir}/HEAD", "0")
    // the durable v1 is still the head (forward-walk), so a same-parent
    // racer gets a conflict instead of silently forking the lineage
    assert(t.log.currentVersion == 1L)
    intercept[CommitConflictException] {
      t.log.commit(0L, v => t.log.snapshot(0L).copy(version = v, parent = 0L))
    }
    assert(t.read.count() == 2) // nothing lost
    t.append(Seq((3L, "c", 3.0)).toDF("id", "name", "amount")) // retry on real head
    assert(t.read.count() == 3 && t.log.currentVersion == 2L)
  }

  test("rollback fences the abandoned lineage: old children never re-win the edge") {
    import spark.implicits._
    val root = s"${tmpAbs("graft-fence-")}/tbl"
    val t = GraftTable.create(spark, root, Seq((1L, "a", 1.0)).toDF("id", "name", "amount"))
    t.append(Seq((2L, "b", 2.0)).toDF("id", "name", "amount")) // v1
    t.append(Seq((3L, "c", 3.0)).toDF("id", "name", "amount")) // v2
    t.log.setHead(0L) // rollback — v1/v2 remain readable but fenced
    assert(t.log.currentVersion == 0L, "fenced children must not be followed")
    assert(t.read.count() == 1)
    t.append(Seq((9L, "z", 9.0)).toDF("id", "name", "amount")) // new lineage, v3
    assert(t.log.currentVersion == 3L)
    assert(t.read.count() == 2)
    assert(t.readVersion(2L).count() == 3) // time travel into the old lineage intact
  }

  test("full table layer works end-to-end over the HDFS-contract scheme through Spark") {
    // Register the scheme with the session so Spark's own parquet read/write
    // (scan, staging commit) resolves it too — the S3 story in miniature:
    // table root swaps, zero code changes.
    spark.sparkContext.hadoopConfiguration
      .set("fs.hcfs.impl", classOf[HdfsContractFs].getName)
    val root = s"hcfs://${tmpAbs("graft-hcfs-tbl-")}/tbl"
    val t = GraftTable.create(spark, root,
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "amount"))
    t.append(Seq((3L, "c", 30.0)).toDF("id", "name", "amount"))
    assert(t.read.count() == 3)
    t.delete(col("id") === 1L)
    assert(t.read.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
    val conflictFree = t.log.currentVersion
    assert(t.readVersion(conflictFree - 1).count() == 3)
    t.removeOrphanFiles()
    assert(t.read.count() == 2)
  }

  test("Iceberg export writes its metadata tree through the FS seam (hcfs scheme)") {
    // the export is Hadoop-FileSystem-routed like the table layer itself:
    // pointing outDir at an HDFS-contract scheme must land the whole tree
    // there, with URIs a reader on that filesystem can follow
    val root = s"hcfs://${tmpAbs("graft-hcfs-ice-")}"
    val io = new HadoopFileIO(root, hcfsConf())
    val log = new SnapshotLog(root, io)
    log.initDirs()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = true,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("graft.id", 0L).build())))
    log.commit(-1L, v => snap0.copy(version = v,
      schemas = Map("0" -> schema.json),
      files = Seq(graft.table.DataFile("data/f1.parquet", 10L, 100L, 0))))

    val metaPath = graft.table.IcebergExport.export(
      log, root, s"$root/_iceberg/v0", hcfsConf())
    assert(metaPath.startsWith("hcfs://"), metaPath)
    assert(io.exists(metaPath))
    val json = org.json4s.jackson.JsonMethods.parse(io.readString(metaPath))
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    import org.json4s.JsonDSL._
    val listUri = (((json \ "snapshots")(0)) \ "manifest-list")
      .extract[String]
    assert(listUri.startsWith("hcfs://"), listUri)
    assert(io.exists(listUri)) // the manifest list really lives on the FS
    assert(io.exists(s"${metaPath.substring(0, metaPath.lastIndexOf('/'))}/version-hint.text"))
  }
}
