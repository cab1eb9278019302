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
