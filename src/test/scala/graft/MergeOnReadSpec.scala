package graft

import org.apache.spark.sql.functions._
import graft.table.GraftTable

/** Merge-on-read positional deletes (Iceberg v2 semantics): DELETE writes a
  * small delete file instead of rewriting data; reads anti-join; compaction
  * materializes. */
class MergeOnReadSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String = java.nio.file.Files
    .createTempDirectory(java.nio.file.Paths.get("target"), "mor-").resolve("t").toString

  private def mk(): GraftTable =
    GraftTable.create(spark, tmpDir(), (1L to 20L).map(i => (i, i * 1.0)).toDF("id", "v"),
      properties = Map("write.delete.mode" -> "merge-on-read"))

  test("MOR delete writes a delete file and leaves every data file in place") {
    val t = mk()
    val dataPaths = t.log.current.files.map(_.path).toSet
    t.delete($"id" <= 5L)
    val s = t.log.current
    assert(s.files.map(_.path).toSet == dataPaths, "data files were rewritten")
    assert(s.deleteFiles.nonEmpty, "no positional-delete file recorded")
    assert(s.operation == "delete")
    assert(t.read.collect().map(_.getLong(0)).sorted.toSeq == (6L to 20L))
    // time travel to before the delete still sees all rows
    assert(t.readVersion(s.parent).count() == 20)
  }

  test("second MOR delete targets only live rows; no-match delete commits nothing") {
    val t = mk()
    t.delete($"id" <= 5L)
    val afterFirst = t.log.current
    t.delete($"id" <= 10L) // overlaps the already-deleted range
    assert(t.read.collect().map(_.getLong(0)).sorted.toSeq == (11L to 20L))
    val v = t.log.currentVersion
    t.delete($"id" === 3L) // already gone: nothing matches, no commit
    assert(t.log.currentVersion == v)
    assert(t.log.current.deleteFiles.size > afterFirst.deleteFiles.size)
  }

  test("MOR update: old rows deleted by position, updated copies appended — no rewrite") {
    val t = mk()
    t.delete($"id" <= 5L)
    val dataPathsBefore = t.log.current.files.map(_.path).toSet
    t.update($"id" === 10L, Map("v" -> lit(-1.0)))
    val s = t.log.current
    // original data files all still present (plus the appended update file)
    assert(dataPathsBefore.subsetOf(s.files.map(_.path).toSet), "MOR update rewrote files")
    assert(s.files.size > dataPathsBefore.size)
    assert(s.operation == "update")
    val got = t.read.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got.keySet == (6L to 20L).toSet)
    assert(got(10L) == -1.0)
    // time travel to before the update sees the original value
    assert(t.readVersion(s.parent).filter($"id" === 10L).collect()(0).getDouble(1) == 10.0)
  }

  test("compaction materializes deletes; orphan GC never collects live delete files") {
    val t = mk()
    t.delete($"id" <= 5L)
    assert(t.log.current.deleteFiles.nonEmpty)
    // GC with live delete files must keep them (reads still correct)
    t.removeOrphanFiles()
    assert(t.read.count() == 15)
    t.rewriteDataFiles(target = 2)
    val s = t.log.current
    assert(s.deleteFiles.isEmpty, "compaction did not materialize deletes")
    assert(t.read.collect().map(_.getLong(0)).sorted.toSeq == (6L to 20L))
  }

  test("per-commit changelog reports MOR-deleted rows at their ordinal") {
    val t = mk()                       // v0
    t.append(Seq((21L, 21.0)).toDF("id", "v")) // v1
    t.delete($"id" === 21L)            // v2: MOR delete of the appended row
    val log = t.changelogDetailed(0L, t.log.currentVersion)
      .select("id", "_change_type", "_change_ordinal").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(x => (x._3, x._2))
    assert(log.toSeq == Seq((21L, "insert", 0), (21L, "delete", 1)), log.mkString(", "))
  }

  test("equality delete removes matching rows without touching data files") {
    val t = mk()
    val dataPaths = t.log.current.files.map(_.path).toSet
    t.deleteByEquality(Seq(2L, 4L).toDF("id"))
    val s = t.log.current
    assert(s.files.map(_.path).toSet == dataPaths, "data files were rewritten")
    assert(s.eqDeleteFiles.nonEmpty, "no equality-delete file recorded")
    assert(s.operation == "delete")
    assert(t.read.collect().map(_.getLong(0)).sorted.toSeq ==
      (1L to 20L).filterNot(Set(2L, 4L)))
    // time travel to before the delete still sees all rows
    assert(t.readVersion(s.parent).count() == 20)
    // $files reports the delete file with Iceberg's content marker
    val contents = t.filesMeta.select("content").collect().map(_.getString(0)).toSet
    assert(contents == Set("data", "equality-deletes"), contents.toString)
  }

  test("rows appended AFTER an equality delete survive it (sequence scoping)") {
    val t = mk()
    t.deleteByEquality(Seq(3L, 25L).toDF("id"))
    t.append(Seq((25L, 25.0)).toDF("id", "v")) // re-insert a deleted key
    val ids = t.read.collect().map(_.getLong(0)).sorted.toSeq
    assert(!ids.contains(3L), "pre-delete row 3 must be gone")
    assert(ids.contains(25L), "row appended after the delete must survive it")
    // positional + equality deletes compose
    t.delete($"id" === 25L)
    assert(!t.read.collect().map(_.getLong(0)).contains(25L))
  }

  test("equality deletes survive a rename of the key column (field-id scoped)") {
    val t = mk()
    t.deleteByEquality(Seq(6L, 7L).toDF("id"))
    t.renameColumn("id", "doc_id") // pure metadata — the delete must keep applying
    val ids = t.read.collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (1L to 20L).filterNot(Set(6L, 7L)), ids.toString)
    // dropping the key column of a live equality delete is refused —
    // it would silently un-delete the rows
    intercept[IllegalStateException] { t.dropColumn("doc_id") }
    // after compaction materializes the delete, the drop is legal
    t.rewriteDataFiles(target = 1)
    t.dropColumn("v")
    assert(t.read.columns.toSeq == Seq("doc_id"))
  }

  test("equality delete is null-safe: a null key matches null rows") {
    val t = GraftTable.create(spark, tmpDir(),
      Seq((1L, Option(1.0)), (2L, Option.empty[Double]), (3L, Option(3.0)))
        .toDF("id", "v"))
    t.deleteByEquality(Seq(Option.empty[Double]).toDF("v"))
    assert(t.read.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("compaction materializes equality deletes; GC keeps live delete files") {
    val t = mk()
    t.deleteByEquality(Seq(1L, 2L).toDF("id"))
    t.removeOrphanFiles()
    assert(t.read.count() == 18, "orphan GC collected a live equality-delete file")
    t.rewriteDataFiles(target = 2)
    val s = t.log.current
    assert(s.eqDeleteFiles.isEmpty, "compaction did not materialize equality deletes")
    assert(t.read.collect().map(_.getLong(0)).sorted.toSeq == (3L to 20L))
  }

  test("per-commit changelog reports equality-deleted rows") {
    val t = mk()
    t.deleteByEquality(Seq(7L).toDF("id"))
    val log = t.changelogDetailed(0L, t.log.currentVersion)
      .select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(log.toSeq == Seq((7L, "delete")), log.mkString(", "))
  }

  test("rewrite_position_delete_files compacts delete files and drops dead entries") {
    val t = mk()
    t.delete($"id" <= 3L)
    t.delete($"id" === 10L)
    assert(t.log.current.deleteFiles.size >= 2)
    t.rewritePositionDeleteFiles()
    assert(t.log.current.deleteFiles.size == 1, "delete files not compacted")
    assert(t.log.current.operation == "rewrite-deletes")
    assert(t.read.collect().map(_.getLong(0)).sorted.toSeq ==
      (4L to 20L).filterNot(_ == 10L))
    // after every data file is rewritten, all entries point at dead files
    t.rewriteSmallFiles(minBytes = 1L << 30, targetBytes = 1L << 30)
    t.rewritePositionDeleteFiles()
    assert(t.log.current.deleteFiles.isEmpty,
      "entries targeting rewritten files must be dropped")
    assert(t.read.count() == 16)
  }

  test("equality delete racing an append: CAS retry linearizes, sequence decides survival") {
    val t = mk()
    // the append re-inserts key 5; the equality delete targets key 5 — the
    // loser of the commit CAS retries, and the data-sequence rule decides:
    // the original key-5 row (older than any delete) always dies; the
    // re-inserted copy survives iff the append committed AFTER the delete
    val appender = new Thread(() =>
      t.appendWithRetry(Seq((105L, 1.0), (5L, 5.5)).toDF("id", "v")))
    appender.start()
    t.deleteByEquality(Seq(5L).toDF("id"))
    appender.join()
    val snaps = t.log.listVersions.map(t.log.snapshot)
    val delV = snaps.find(_.eqDeleteFiles.nonEmpty).get.version
    val appV = snaps.filter(_.operation == "append").map(_.version).max
    val got = t.read.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got.contains(105L), "racing append lost rows")
    assert(!got.get(5L).contains(5.0), "pre-delete key-5 row must be gone")
    if (appV > delV)
      assert(got.get(5L).contains(5.5), s"append v$appV after delete v$delV must survive")
    else
      assert(!got.contains(5L), s"append v$appV before delete v$delV must be deleted")
  }

  test("MOR merge: positional deletes + appended images, no file rewrite") {
    val t = mk() // write.delete.mode covers merge too (Iceberg fallback)
    val dataPathsBefore = t.log.current.files.map(_.path).toSet
    val src = Seq((10L, 100.0), (15L, -5.0), (30L, 30.0)).toDF("id", "v")
    t.merge(src, expr("t.id = s.id"))
      .whenMatchedUpdate(Map("v" -> col("s.v")), Some(expr("s.v >= 0")))
      .whenMatchedDelete()
      .whenNotMatchedInsertAll()
      .execute()
    val s = t.log.current
    assert(dataPathsBefore.subsetOf(s.files.map(_.path).toSet), "MOR merge rewrote files")
    assert(s.deleteFiles.nonEmpty, "MOR merge wrote no positional deletes")
    assert(s.operation == "merge")
    val got = t.read.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got(10L) == 100.0, "matched update image missing")
    assert(!got.contains(15L), "matched delete row still present")
    assert(got(30L) == 30.0, "not-matched insert missing")
    assert(got.keySet == ((1L to 20L).toSet - 15L) + 30L)
    // time travel to before the merge sees the original state
    assert(t.readVersion(s.parent).count() == 20)
  }

  test("MOR merge result equals copy-on-write merge result") {
    def run(mor: Boolean): Map[Long, Double] = {
      val props = if (mor) Map("write.merge.mode" -> "merge-on-read") else Map.empty[String, String]
      val t = GraftTable.create(spark, tmpDir(),
        (1L to 20L).map(i => (i, i * 1.0)).toDF("id", "v"), properties = props)
      val src = (5L to 25L by 5).map(i => (i, i * -1.0)).toDF("id", "v")
      t.merge(src, expr("t.id = s.id"))
        .whenMatchedUpdate(Map("v" -> col("s.v")), Some(expr("s.id <= 10")))
        .whenMatchedDelete()
        .whenNotMatchedInsertAll()
        .whenNotMatchedBySourceUpdate(Map("v" -> lit(0.0)), Some(expr("t.id = 1")))
        .execute()
      t.read.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    }
    assert(run(mor = true) == run(mor = false))
  }

  test("streaming increments refuse MOR delete snapshots (or skip them)") {
    val t = mk()
    val v0 = t.log.currentVersion
    t.delete($"id" === 1L)
    t.append(Seq((30L, 30.0)).toDF("id", "v"))
    val v2 = t.log.currentVersion
    intercept[IllegalStateException] { t.readAppended(v0, v2).collect() }
    assert(t.readAppended(v0, v2, skipRewrites = true)
      .collect().map(_.getLong(0)).toSeq == Seq(30L))
  }
}
