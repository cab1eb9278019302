package graft

import java.nio.file.{Files, Paths}
import graft.table.GraftTable

/** Table-as-stream: the graft-stream source tails snapshot commits with
  * version offsets (SURVEY.md §2.9; Iceberg incremental-read analogue). */
class GraftStreamSourceSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(Paths.get("target"), prefix).resolve("t").toString

  test("streaming read tails appends exactly once, across multiple batches") {
    import spark.implicits._
    val path = tmp("stream-src-")
    val t = GraftTable.create(spark, path, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))

    val q = spark.readStream.format("graft-stream").option("path", path).load()
      .writeStream.format("memory").queryName("graft_tail")
      .option("checkpointLocation", s"$path/../ckpt").start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_tail").count() == 2)

      t.append(Seq((3L, "c")).toDF("id", "v"))
      q.processAllAvailable()
      assert(spark.table("graft_tail").count() == 3)

      t.append(Seq((4L, "d"), (5L, "e")).toDF("id", "v"))
      q.processAllAvailable()
      val got = spark.table("graft_tail").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(1L, 2L, 3L, 4L, 5L)) // no replays, no losses
    } finally q.stop()
  }

  test("fromVersion option skips the table's history up to that snapshot") {
    import spark.implicits._
    val path = tmp("stream-from-")
    val t = GraftTable.create(spark, path, Seq(1L).toDF("id"))
    t.append(Seq(2L).toDF("id"))
    val startAt = t.log.currentVersion // = 1
    t.append(Seq(3L).toDF("id"))

    val q = spark.readStream.format("graft-stream")
      .option("path", path).option("fromVersion", startAt.toString).load()
      .writeStream.format("memory").queryName("graft_from").start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_from").collect().map(_.getLong(0)).toSeq == Seq(3L))
    } finally q.stop()
  }

  test("increment between snapshots reads only newly-added files") {
    import spark.implicits._
    val path = tmp("stream-inc-")
    val t = GraftTable.create(spark, path, Seq(1L, 2L).toDF("id"))
    val v0 = t.log.currentVersion
    t.append(Seq(3L).toDF("id"))
    val v1 = t.log.currentVersion
    assert(t.readAppended(v0, v1).collect().map(_.getLong(0)).toSeq == Seq(3L))
    assert(t.readAppended(-1L, v1).count() == 3)
    assert(t.readAppended(v1, v1).count() == 0)
  }
}
