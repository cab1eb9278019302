package graft

import java.io.IOException
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.table.{FileIO, GraftTable, Replicate, SnapshotLog}

/** Incremental replication ([[graft.table.Replicate]]): the replica must be
  * a READABLE graft table with identical answers — current rows, time
  * travel by the SAME version numbers, refs, pruning stats, properties —
  * and a verbatim copy must never resurrect MOR-deleted rows (positional
  * deletes reference absolute source paths; the rewrite is the point). */
class ReplicationSpec extends SparkSpec {

  private def tmp(tag: String): String =
    Files.createTempDirectory(Paths.get("target"), tag).toString

  private def rows(t: GraftTable): Seq[String] =
    t.read.collect().map(_.toString).sorted.toSeq

  /** AQE coalescing folds transform-keyed toy writes into one file; the
    * pruning-parity check needs a split layout (HiddenPartitioningSpec's
    * idiom). */
  private def noCoalesce[A](body: => A): A = {
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, old)
  }

  test("full fidelity: rows, time travel, refs, properties, pruning parity") {
    val dir = tmp("repl-")
    val src = noCoalesce { GraftTable.create(spark, s"$dir/src",
      spark.range(0, 300).select(col("id"),
        expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,cast(id % 240 as int),0,0)").as("ts"),
        (col("id") * 2).cast("double").as("v")),
      Map("write.partition-by" -> "days(ts)")) }
    src.append(spark.range(300, 400).select(col("id"),
      lit(java.sql.Timestamp.valueOf("2024-02-01 00:00:00")).as("ts"),
      lit(9.0d).as("v")).repartition(2))
    src.createTag("milestone", 0L)
    src.createBranch("dev", 1L)

    val dst = s"$dir/dst"
    val replicated = Replicate.run(spark, s"$dir/src", dst)
    assert(replicated == Seq(0L, 1L))

    val r = GraftTable.load(spark, dst)
    val s2 = GraftTable.load(spark, s"$dir/src")
    // identical answers at HEAD and at every version (same numbers)
    assert(rows(r) == rows(s2))
    assert(r.readVersion(0L).count() == 300)
    assert(r.log.currentVersion == s2.log.currentVersion)
    // refs came over
    assert(r.readRef("milestone").count() == 300)
    assert(r.log.refs.get("dev").map(_.version).contains(1L))
    // properties (and with them the partition transforms) survived
    assert(r.log.current.properties.get("write.partition-by").contains("days(ts)"))
    // pruning parity: the same filter prunes the same number of files
    import org.apache.spark.sql.sources.GreaterThanOrEqual
    val filt = Seq(GreaterThanOrEqual("ts",
      java.sql.Timestamp.valueOf("2024-01-06 00:00:00")))
    val sPruned = s2.pruneFiles(s2.log.current, filt).size
    assert(sPruned < s2.log.current.files.size, "fixture must prune")
    assert(r.pruneFiles(r.log.current, filt).size == sPruned)
    // the replica is stamped, the source is not
    assert(r.log.current.summary.get(Replicate.MarkerKey).contains(s2.path))
    assert(!s2.log.current.summary.contains(Replicate.MarkerKey))
  }

  test("positional deletes are rewritten: replica never resurrects MOR-deleted rows") {
    val dir = tmp("repl-mor-")
    val src = GraftTable.create(spark, s"$dir/src",
      spark.range(0, 100).select(col("id"), (col("id") * 2).cast("double").as("v"))
        .repartition(2),
      Map("write.delete.mode" -> "merge-on-read"))
    src.delete(col("id") < 10L)
    assert(src.log.current.deleteFiles.nonEmpty, "fixture wrote no positional deletes")
    src.deleteByEquality(spark.range(90, 95).toDF("id"))

    val dst = s"$dir/dst"
    Replicate.run(spark, s"$dir/src", dst)
    val r = GraftTable.load(spark, dst)
    assert(rows(r) == rows(GraftTable.load(spark, s"$dir/src")))
    assert(r.read.count() == 85)
    assert(r.read.filter(col("id") < 10L).count() == 0, "MOR-deleted rows resurrected")
    assert(r.read.filter(col("id") >= 90L && col("id") < 95L).count() == 0,
      "equality-deleted rows resurrected")
    // the rewritten delete file references REPLICA paths, not source paths
    val delAbs = GraftTable.resolveUnder(r.path, r.log.current.deleteFiles.head.path)
    val refs = spark.read.parquet(delAbs).select("file_path")
      .collect().map(_.getString(0))
    assert(refs.nonEmpty)
    refs.foreach { p =>
      val c = GraftTable.canonStr(p)
      assert(c.startsWith(GraftTable.canonStr(r.path) + "/"),
        s"delete file still references a foreign path: $p")
    }
  }

  test("incremental: a second run ships only new versions; no-op when current") {
    val dir = tmp("repl-inc-")
    GraftTable.create(spark, s"$dir/src",
      spark.range(0, 50).select(col("id"), (col("id") * 2).cast("double").as("v")))
    val dst = s"$dir/dst"
    assert(Replicate.run(spark, s"$dir/src", dst) == Seq(0L))
    val dataBefore = FileIO.forPath(dst).listNames(s"$dst/data").toSet

    GraftTable.load(spark, s"$dir/src")
      .append(spark.range(50, 80).select(col("id"), lit(1.5d).as("v")))
    assert(Replicate.run(spark, s"$dir/src", dst) == Seq(1L))
    val r = GraftTable.load(spark, dst)
    assert(r.read.count() == 80)
    assert(r.readVersion(0L).count() == 50)
    // old files were not re-copied, only joined by the new version's
    val dataAfter = FileIO.forPath(dst).listNames(s"$dst/data").toSet
    assert(dataBefore.subsetOf(dataAfter) && dataAfter.size > dataBefore.size)
    // already current: nothing to do
    assert(Replicate.run(spark, s"$dir/src", dst).isEmpty)
  }

  test("a source rollback transfers: the replica never resurrects the abandoned lineage") {
    val dir = tmp("repl-rb-")
    val src = GraftTable.create(spark, s"$dir/src", spark.range(0, 20).toDF("id"))
    src.append(spark.range(20, 40).toDF("id"))
    src.createTag("drop-me", 1L)
    val dst = s"$dir/dst"
    Replicate.run(spark, s"$dir/src", dst) // replica holds v0 + v1 + the tag
    GraftTable.load(spark, s"$dir/src").rollbackTo(0L) // fence at 1, HEAD back to 0
    GraftTable.load(spark, s"$dir/src").dropRef("drop-me")
    assert(Replicate.run(spark, s"$dir/src", dst).isEmpty) // nothing new — but state moves
    val r = GraftTable.load(spark, dst)
    // without the fence transfer, HEAD recovery would forward-walk back
    // onto the replicated-then-abandoned v1
    assert(r.log.currentVersion == 0L, "replica resurrected the rolled-back lineage")
    assert(r.read.count() == 20)
    assert(!r.log.refs.contains("drop-me"), "replica kept a source-deleted ref")
    // a post-rollback source commit replays cleanly on top
    GraftTable.load(spark, s"$dir/src").append(spark.range(100, 110).toDF("id"))
    Replicate.run(spark, s"$dir/src", dst)
    val r2 = GraftTable.load(spark, dst)
    assert(r2.read.count() == 30)
    assert(r2.log.currentVersion == GraftTable.load(spark, s"$dir/src").log.currentVersion)
  }

  test("refuses to overwrite a non-replica destination, and itself") {
    val dir = tmp("repl-guard-")
    GraftTable.create(spark, s"$dir/src", spark.range(0, 10).toDF("id"))
    GraftTable.create(spark, s"$dir/other", spark.range(0, 5).toDF("id"))
    val e = intercept[IllegalArgumentException] {
      Replicate.run(spark, s"$dir/src", s"$dir/other") }
    assert(e.getMessage.contains("not a replica"))
    assert(GraftTable.load(spark, s"$dir/other").read.count() == 5)
    intercept[IllegalArgumentException] {
      Replicate.run(spark, s"$dir/src", s"$dir/src") }
  }

  test("CALL graft.system.replicate_table runs the same path through SQL") {
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", SparkSpec.warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.repl")
    spark.sql("CREATE TABLE graft.repl.t AS SELECT id FROM range(40)")
    val dst = tmp("repl-sql-") + "/t"
    spark.sql(s"CALL graft.system.replicate_table('repl.t', '$dst')")
    assert(GraftTable.load(spark, dst).read.count() == 40)
  }

  test("crash mid-replication: replica recovers, re-run converges") {
    // fault-injection seam: the Nth destination-metadata mutation dies and
    // everything after dies too (same model as FaultInjectionSpec)
    class CrashingIO(inner: FileIO, failFrom: Int) extends FileIO {
      var muts = 0
      private var tripped = false
      private def gate(): Unit = if (tripped) throw new IOException("crashed")
      private def mut(): Unit = {
        gate(); muts += 1
        if (failFrom > 0 && muts >= failFrom) { tripped = true; throw new IOException(s"crash@$muts") }
      }
      def mkdirs(d: String): Unit = { mut(); inner.mkdirs(d) }
      def exists(p: String): Boolean = { gate(); inner.exists(p) }
      def readString(p: String): String = { gate(); inner.readString(p) }
      def readBytes(p: String): Array[Byte] = { gate(); inner.readBytes(p) }
      def writeAtomicReplace(p: String, c: String): Unit = { mut(); inner.writeAtomicReplace(p, c) }
      def writeBytesAtomicReplace(p: String, c: Array[Byte]): Unit = { mut(); inner.writeBytesAtomicReplace(p, c) }
      def createExclusive(p: String, c: String): Boolean = { mut(); inner.createExclusive(p, c) }
      def listNames(d: String): Seq[String] = { gate(); inner.listNames(d) }
      def isDirectory(p: String): Boolean = { gate(); inner.isDirectory(p) }
      def delete(p: String): Boolean = { mut(); inner.delete(p) }
      def deleteRecursive(p: String): Unit = { mut(); inner.deleteRecursive(p) }
      def size(p: String): Long = { gate(); inner.size(p) }
      def mtime(p: String): Long = { gate(); inner.mtime(p) }
      def rename(a: String, b: String): Unit = { mut(); inner.rename(a, b) }
    }
    val dir = tmp("repl-crash-")
    val src = GraftTable.create(spark, s"$dir/src",
      spark.range(0, 60).select(col("id"), (col("id") * 2).cast("double").as("v"))
        .repartition(2),
      Map("write.delete.mode" -> "merge-on-read"))
    src.delete(col("id") < 5L) // a pos-delete forces the rewrite leg too
    src.append(spark.range(60, 90).select(col("id"), lit(0.1d).as("v")).repartition(2))
    val srcRows = rows(GraftTable.load(spark, s"$dir/src"))

    // measure the clean mutation count
    val probe = new CrashingIO(FileIO.forPath(s"$dir/probe"), 0)
    Replicate.run(spark, s"$dir/src", s"$dir/probe", Some(probe))
    val m = probe.muts
    assert(m >= 3)

    for (n <- 1 to m) {
      val dst = s"$dir/dst$n"
      val attempt = scala.util.Try(Replicate.run(spark, s"$dir/src", dst,
        Some(new CrashingIO(FileIO.forPath(dst), n))))
      // whatever landed: if the replica exists it must be readable
      val log = new SnapshotLog(dst)
      if (log.exists) {
        val head = log.current
        head.files.foreach(f => assert(
          FileIO.forPath(dst).exists(GraftTable.resolveUnder(dst, f.path)),
          s"crash@$n: replica references missing ${f.path}"))
      }
      if (attempt.isFailure) {
        // re-run with a healthy destination converges to full fidelity
        Replicate.run(spark, s"$dir/src", dst)
      }
      assert(rows(GraftTable.load(spark, dst)) == srcRows, s"crash@$n: diverged")
    }
  }
}
