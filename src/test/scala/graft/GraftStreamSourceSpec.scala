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

  test("fromTimestamp option resolves the start snapshot by time") {
    import spark.implicits._
    val path = tmp("stream-fromts-")
    val t = GraftTable.create(spark, path, Seq(1L).toDF("id")) // v0
    val afterV0 = t.log.current.timestampMs
    Thread.sleep(5)
    t.append(Seq(2L).toDF("id")) // v1
    t.append(Seq(3L).toDF("id")) // v2
    // start AS OF just after v0: only v1/v2 rows stream
    val out = spark.readStream.format("graft-stream")
      .option("path", path)
      .option("fromTimestamp", (afterV0 + 1).toString)
      .load()
    val q = out.writeStream.format("memory").queryName("fromts_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("fromts_out").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    } finally q.stop()
    // both options together are rejected loudly
    val ex = intercept[Exception] {
      spark.readStream.format("graft-stream").option("path", path)
        .option("fromVersion", "0").option("fromTimestamp", "1").load()
        .writeStream.format("memory").queryName("fromts_bad").start()
        .processAllAvailable()
    }
    assert(ex.getMessage.contains("mutually exclusive") ||
      Option(ex.getCause).exists(_.getMessage.contains("mutually exclusive")), ex.getMessage)
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

  test("writeStream.format(graft-stream) sink: creates the table, appends per batch, exactly-once") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = tmp("stream-sink-")
    val mem = MemoryStream[Long]
    val q = mem.toDF().toDF("id")
      .writeStream.format("graft-stream")
      .option("path", path)
      .option("checkpointLocation", s"$path/../ckpt-sink")
      .start()
    try {
      mem.addData(1L, 2L)
      q.processAllAvailable()
      val t = GraftTable.load(spark, path)
      assert(t.read.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
      mem.addData(3L)
      q.processAllAvailable()
      val t2 = GraftTable.load(spark, path)
      assert(t2.read.count() == 3)
      // batch id rides the same commit (the exactly-once marker)
      assert(t2.log.current.properties.contains("stream.last-batch-id"))
      // a replayed batch id is a no-op, not a duplicate append
      val before = t2.log.currentVersion
      new graft.streaming.GraftStreamSink(path)
        .addBatch(0L, graft.Tables.documents(spark, sf).selectExpr("doc_id AS id").limit(1))
      assert(GraftTable.load(spark, path).log.currentVersion == before)
    } finally q.stop()
  }

  test("sink upsertKeys: each batch MERGEs on the key — updates in place, inserts new keys") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = tmp("stream-upsert-")
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "v")
      .writeStream.format("graft-stream")
      .option("path", path)
      .option("upsertKeys", "id")
      .option("checkpointLocation", s"$path/../ckpt-upsert")
      .start()
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((2L, "B"), (3L, "c")) // update id=2, insert id=3
      q.processAllAvailable()
      val t = GraftTable.load(spark, path)
      val got = t.read.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      assert(got == Seq((1L, "a"), (2L, "B"), (3L, "c")))
      assert(t.log.current.operation == "merge")
      // replayed batch id: no-op — the batch-id marker rode the merge commit
      val before = t.log.currentVersion
      new graft.streaming.GraftStreamSink(path, Seq("id"))
        .addBatch(1L, Seq((9L, "z")).toDF("id", "v"))
      assert(GraftTable.load(spark, path).log.currentVersion == before)
      // a genuinely new batch id upserts
      new graft.streaming.GraftStreamSink(path, Seq("id"))
        .addBatch(2L, Seq((1L, "A2"), (4L, "d")).toDF("id", "v"))
      val t2 = GraftTable.load(spark, path)
      val got2 = t2.read.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      assert(got2 == Seq((1L, "A2"), (2L, "B"), (3L, "c"), (4L, "d")))
    } finally q.stop()
  }

  test("torn micro-batch: sink merge committed, engine commit marker lost — " +
      "restart from checkpoint dedupes through the batch-id stamp") {
    // The exactly-once crash window: the sink's merge CAS (data + batch-id
    // stamp, one commit) SUCCEEDED, but the process died before the
    // streaming engine wrote checkpoint commits/N. On restart the engine
    // sees offsets/N without commits/N and REPLAYS batch N into the sink —
    // which must recognize its own stamp and not commit again.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = tmp("stream-torn-")
    val ckpt = s"$path/../ckpt-torn"
    val mem = MemoryStream[(Long, String)]
    def start() = mem.toDF().toDF("id", "v")
      .writeStream.format("graft-stream")
      .option("path", path)
      .option("upsertKeys", "id")
      .option("checkpointLocation", ckpt)
      .start()
    val q = start()
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((2L, "B"), (3L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    val vBefore = GraftTable.load(spark, path).log.currentVersion
    // simulate the torn state: erase the engine-side commit marker of the
    // last batch (the sink-side merge commit stays — it already CAS'd)
    val commits = new java.io.File(ckpt, "commits")
    val latest = commits.listFiles().map(_.getName)
      .filter(_.forall(_.isDigit)).map(_.toLong).max
    assert(latest == 1L, s"expected two batches, last marker $latest")
    assert(new java.io.File(commits, latest.toString).delete())
    // the local FS writes a checksum sidecar next to the marker; a real
    // crash would have written neither, so the simulation removes both
    new java.io.File(commits, s".$latest.crc").delete()
    val q2 = start()
    try {
      q2.processAllAvailable() // replays batch 1 into the sink
      val t = GraftTable.load(spark, path)
      assert(t.log.currentVersion == vBefore,
        "replayed batch must be a no-op commit-wise (batch-id stamp dedupe)")
      assert(t.read.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
        == Seq((1L, "a"), (2L, "B"), (3L, "c")))
      // the stream is healthy after recovery: new data lands exactly once
      mem.addData((3L, "C"), (4L, "d"))
      q2.processAllAvailable()
      val t2 = GraftTable.load(spark, path)
      assert(t2.log.currentVersion == vBefore + 1)
      assert(t2.read.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
        == Seq((1L, "a"), (2L, "B"), (3L, "C"), (4L, "d")))
    } finally q2.stop()
  }

  test("applyChangeFeed end-to-end: change feed of one table mirrors into another, deletes included") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val srcPath = tmp("cdc-src-")
    val mirror = tmp("cdc-mirror-")
    val t = GraftTable.create(spark, srcPath, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val q = spark.readStream.format("graft-stream")
      .option("path", srcPath).option("readChangeFeed", "true")
      .option("fromVersion", "-1") // replay from the start
      .load()
      .writeStream.format("graft-stream")
      .option("path", mirror).option("upsertKeys", "id")
      .option("applyChangeFeed", "true")
      .option("checkpointLocation", s"$srcPath/../ckpt-cdcapply")
      .start()
    try {
      q.processAllAvailable()
      t.append(Seq((3L, "c")).toDF("id", "v"))
      t.update(col("id") === 1L, Map("v" -> lit("A"))) // delete+insert change pair
      t.delete(col("id") === 2L)
      q.processAllAvailable()
      val got = GraftTable.load(spark, mirror).read
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      assert(got == Seq((1L, "A"), (3L, "c"))) // update applied, delete applied
      // maintenance upstream emits no change rows — the mirror records the
      // batch id without scanning itself (empty-append, not a merge)
      t.rewriteDataFiles(1)
      q.processAllAvailable()
      val got2 = GraftTable.load(spark, mirror).read
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      assert(got2 == Seq((1L, "A"), (3L, "c")))
    } finally q.stop()
  }

  test("CDC-apply pipeline survives a restart: no lost and no duplicated changes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val srcPath = tmp("cdc-rsrc-")
    val mirror = tmp("cdc-rmirror-")
    val ckpt = tmp("cdc-rckpt-")
    val t = GraftTable.create(spark, srcPath, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    def pipeline() = spark.readStream.format("graft-stream")
      .option("path", srcPath).option("readChangeFeed", "true")
      .option("fromVersion", "-1")
      .load()
      .writeStream.format("graft-stream")
      .option("path", mirror).option("upsertKeys", "id")
      .option("applyChangeFeed", "true")
      .option("checkpointLocation", ckpt)
      .start()
    val q1 = pipeline()
    try {
      q1.processAllAvailable()
      t.update(col("id") === 1L, Map("v" -> lit("A")))
      q1.processAllAvailable()
    } finally q1.stop()
    // changes land while the pipeline is DOWN
    t.delete(col("id") === 2L)
    t.append(Seq((3L, "c")).toDF("id", "v"))
    val q2 = pipeline()
    try {
      q2.processAllAvailable()
      val got = GraftTable.load(spark, mirror).read
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      assert(got == Seq((1L, "A"), (3L, "c")), "mirror must equal the source's final state")
      // and equals the source, row for row
      val src = t.read.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      assert(got == src)
    } finally q2.stop()
  }

  test("a rewrite snapshot in the range fails the increment; skipRewrites streams appends only") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = tmp("stream-rw-")
    val t = GraftTable.create(spark, path, Seq(1L, 2L).toDF("id"))
    val v0 = t.log.currentVersion
    t.update(col("id") === 1L, Map("id" -> org.apache.spark.sql.functions.lit(10L))) // rewrite
    t.append(Seq(3L).toDF("id"))
    val v2 = t.log.currentVersion
    // default: refuse rather than replay row 2 (carried into the rewritten file)
    val e = intercept[IllegalStateException] { t.readAppended(v0, v2).collect() }
    assert(e.getMessage.contains("update") && e.getMessage.contains("skipRewrites"))
    // skip mode: only the genuine append flows
    assert(t.readAppended(v0, v2, skipRewrites = true)
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("an expired snapshot inside the stream range fails with the cause named") {
    import spark.implicits._
    val path = tmp("stream-exp-")
    val t = GraftTable.create(spark, path, Seq(1L).toDF("id"))
    val v0 = t.log.currentVersion
    t.append(Seq(2L).toDF("id"))
    t.append(Seq(3L).toDF("id"))
    t.append(Seq(4L).toDF("id"))
    val head = t.log.currentVersion
    t.expireSnapshots(keepLast = 2) // drops v0..v1 metadata
    val e = intercept[IllegalStateException] { t.readAppended(v0, head).collect() }
    assert(e.getMessage.contains("expire_snapshots"))
  }

  test("maxFilesPerTrigger splits a deep backlog into multiple micro-batches") {
    import spark.implicits._
    val path = tmp("stream-rate-")
    val t = GraftTable.create(spark, path, Seq(1L).toDF("id"))
    t.append(Seq(2L).toDF("id"))
    t.append(Seq(3L).toDF("id"))
    t.append(Seq(4L).toDF("id")) // 4-version backlog before the stream starts
    val q = spark.readStream.format("graft-stream")
      .option("path", path).option("maxFilesPerTrigger", "1").load()
      .writeStream.format("memory").queryName("graft_rate")
      .option("checkpointLocation", s"$path/../ckpt-rate").start()
    try {
      q.processAllAvailable()
      // nothing lost, nothing duplicated …
      assert(spark.table("graft_rate").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 2L, 3L, 4L))
      // … and the catch-up arrived as several rate-limited batches, not one
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= 2, s"backlog was not split: $dataBatches data batches")
    } finally q.stop()
  }

  test("maxRowsPerTrigger caps each micro-batch by added-row count") {
    import spark.implicits._
    val path = tmp("stream-rows-")
    val t = GraftTable.create(spark, path, (1L to 5L).toDF("id"))   // 5 rows
    t.append((6L to 10L).toDF("id"))                                // +5
    t.append((11L to 12L).toDF("id"))                               // +2
    t.append((13L to 20L).toDF("id"))                               // +8
    val q = spark.readStream.format("graft-stream")
      .option("path", path).option("maxRowsPerTrigger", "7").load()
      .writeStream.format("memory").queryName("graft_rows_rate")
      .option("checkpointLocation", s"$path/../ckpt-rows").start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_rows_rate").collect().map(_.getLong(0)).sorted.toSeq ==
        (1L to 20L).toSeq, "nothing lost, nothing duplicated")
      val sizes = q.recentProgress.filter(_.numInputRows > 0).map(_.numInputRows).toSeq
      assert(sizes.length >= 3, s"backlog was not split by rows: $sizes")
      // each batch stays within the cap unless a single commit exceeds it
      // (v3 adds 8 > 7 — progress is still guaranteed, alone in its batch)
      assert(sizes.forall(n => n <= 7 || n == 8), s"row caps violated: $sizes")
    } finally q.stop()
  }

  test("CDC bootstrap under maxFilesPerTrigger splits the backlog into multiple batches") {
    // A mirror bootstrapping with readChangeFeed + fromVersion=-1 replays
    // the table's WHOLE history — on a large table that must arrive as
    // rate-limited micro-batches (checkpoint per step), never one giant
    // first batch (VERDICT r7 #6). Same budget walk as the append path.
    import spark.implicits._
    val path = tmp("stream-cdc-rate-")
    val t = GraftTable.create(spark, path, Seq(1L).toDF("id"))  // v0
    t.append(Seq(2L).toDF("id"))                                // v1
    t.append(Seq(3L).toDF("id"))                                // v2
    t.append(Seq(4L).toDF("id"))                                // v3
    t.delete(org.apache.spark.sql.functions.col("id") === 2L)   // v4
    val q = spark.readStream.format("graft-stream")
      .option("path", path).option("readChangeFeed", "true")
      .option("fromVersion", "-1").option("maxFilesPerTrigger", "1").load()
      .writeStream.format("memory").queryName("graft_cdc_rate")
      .option("checkpointLocation", s"$path/../ckpt-cdc-rate").start()
    try {
      q.processAllAvailable()
      // full-history replay: every change row exactly once, deletes included
      val got = spark.table("graft_cdc_rate")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == Set((1L, "insert", 0L), (2L, "insert", 1L), (3L, "insert", 2L),
        (4L, "insert", 3L), (2L, "delete", 4L)))
      // and the bootstrap was SPLIT: several data-bearing micro-batches
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= 3, s"CDC backlog was not split: $dataBatches data batches")
    } finally q.stop()
  }

  test("Trigger.AvailableNow + maxFilesPerTrigger: bounded backfill drains in rate-limited batches, then stops") {
    // Without SupportsTriggerAvailableNow, Spark wraps a V1 source in
    // AvailableNowSourceWrapper, which captures ONE getOffset result as "all
    // available data" — under maxFilesPerTrigger that is the FIRST capped
    // batch, so the backfill would silently stop at 1/4 of the backlog.
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val path = tmp("stream-avnow-")
    val t = GraftTable.create(spark, path, Seq(1L).toDF("id"))
    t.append(Seq(2L).toDF("id"))
    t.append(Seq(3L).toDF("id"))
    t.append(Seq(4L).toDF("id")) // 4-version backlog before the run
    // sink = a graft table (exactly-once across restarts — the memory sink
    // cannot recover a checkpoint, and run-2 must resume run-1's)
    val mirror = s"$path/../mirror"
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream.format("graft-stream")
        .option("path", path).option("maxFilesPerTrigger", "1").load()
        .writeStream.format("graft-stream").option("path", mirror)
        .option("checkpointLocation", s"$path/../ckpt-avnow")
        .trigger(Trigger.AvailableNow()).start()
    val q = run()
    assert(q.awaitTermination(120000), "AvailableNow run did not terminate")
    // the WHOLE backlog drained (not just the first capped batch) …
    assert(GraftTable.load(spark, mirror).read
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    // … in several rate-limited batches, each its own checkpoint
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches >= 2, s"backfill was not split: $dataBatches data batches")

    // a second run resumes from the checkpoint and delivers ONLY the commits
    // that landed after the first run's captured bound
    t.append(Seq(5L).toDF("id"))
    val q2 = run()
    assert(q2.awaitTermination(120000), "second AvailableNow run did not terminate")
    assert(GraftTable.load(spark, mirror).read
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("Trigger.AvailableNow bounded CDC bootstrap: full history, rate-limited, terminates") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val path = tmp("stream-avnow-cdc-")
    val t = GraftTable.create(spark, path, Seq(1L).toDF("id"))  // v0
    t.append(Seq(2L).toDF("id"))                                // v1
    t.append(Seq(3L).toDF("id"))                                // v2
    t.delete(org.apache.spark.sql.functions.col("id") === 2L)   // v3
    val q = spark.readStream.format("graft-stream")
      .option("path", path).option("readChangeFeed", "true")
      .option("fromVersion", "-1").option("maxFilesPerTrigger", "1").load()
      .writeStream.format("memory").queryName("graft_avnow_cdc")
      .option("checkpointLocation", s"$path/../ckpt-avnow-cdc")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "AvailableNow CDC run did not terminate")
    val got = spark.table("graft_avnow_cdc")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1L, "insert", 0L), (2L, "insert", 1L), (3L, "insert", 2L),
      (2L, "delete", 3L)))
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches >= 2, s"CDC bootstrap was not split: $dataBatches data batches")
  }

  test("mid-stream schema evolution keeps batches on the schema pinned at start") {
    import spark.implicits._
    val path = tmp("stream-evo-")
    val t = GraftTable.create(spark, path, Seq((1L, "a")).toDF("id", "v"))
    val q = spark.readStream.format("graft-stream").option("path", path).load()
      .writeStream.format("memory").queryName("graft_evo")
      .option("checkpointLocation", s"$path/../ckpt-evo").start()
    try {
      q.processAllAvailable()
      // evolve mid-stream: add a column, rename one — the running plan is
      // bound to (id, v), so batches must keep arriving in that shape
      t.addColumn("extra", org.apache.spark.sql.types.StringType)
      t.renameColumn("v", "val")
      GraftTable.load(spark, path)
        .append(Seq(("b", 2L, "x")).toDF("val", "id", "extra"))
      q.processAllAvailable()
      val rows = spark.table("graft_evo").collect()
      assert(spark.table("graft_evo").schema.fieldNames.toSeq == Seq("id", "v"))
      // the renamed column's data still lands in the pinned "v" slot (ID-based)
      assert(rows.map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
        Seq((1L, "a"), (2L, "b")))
    } finally q.stop()
  }

  test("a user-supplied schema is rejected, not silently ignored") {
    import spark.implicits._
    val path = tmp("stream-usch-")
    GraftTable.create(spark, path, Seq(1L).toDF("id"))
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("graft-stream")
        .schema(new org.apache.spark.sql.types.StructType().add("id", "long"))
        .option("path", path).load()
    }
    assert(e.getMessage.contains("not supported"))
  }

  test("CDC start offset is persisted: batch-0 recovery replays from the ORIGINAL base") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val path = tmp("stream-cdcbase-")
    val meta = tmp("stream-cdcbase-meta-")
    val t = GraftTable.create(spark, path, Seq((1L, "a")).toDF("id", "v")) // v0
    // first source instance pins base = current (v0) and persists it
    val s1 = new graft.streaming.GraftStreamSource(spark.sqlContext, path,
      fromVersion = None, readChangeFeed = true, metadataPath = Some(meta))
    t.append(Seq((2L, "b")).toDF("id", "v")) // v1
    t.append(Seq((3L, "c")).toDF("id", "v")) // v2
    // crash before batch 0 commits: a NEW source instance recovers. Without
    // persistence its base would re-evaluate to the CURRENT version (v2) —
    // getOffset would return None and the replayed range (v0, v2] would be
    // silently lost. With persistence it re-reads base = v0.
    assert(graft.table.FileIO.forPath(meta).readString(s"$meta/graft-base").trim == "0")
    val s2 = new graft.streaming.GraftStreamSource(spark.sqlContext, path,
      fromVersion = None, readChangeFeed = true, metadataPath = Some(meta))
    assert(s2.getOffset.contains(LongOffset(2L)),
      "recovered source must still see (v0, v2] as pending")
    s1.stop(); s2.stop()
  }

  test("CDC survives a mid-stream column rename — pinned ids resolve the new names") {
    import spark.implicits._
    val path = tmp("stream-cdcren-")
    val t = GraftTable.create(spark, path, Seq((1L, "a")).toDF("id", "v")) // v0
    val q = spark.readStream.format("graft-stream")
      .option("path", path).option("readChangeFeed", "true").load()
      .writeStream.format("memory").queryName("graft_cdcren")
      .option("checkpointLocation", s"$path/../ckpt-cdcren").start()
    try {
      q.processAllAvailable()
      t.append(Seq((2L, "b")).toDF("id", "v"))
      q.processAllAvailable()
      t.renameColumn("v", "val") // metadata-only snapshot
      GraftTable.load(spark, path).append(Seq((3L, "c")).toDF("id", "val"))
      q.processAllAvailable() // pre-fix: AnalysisException (unresolved 'v') kills the query
      // change rows keep arriving under the ORIGINAL (bound-plan) names
      assert(spark.table("graft_cdcren").schema.fieldNames.take(2).toSeq == Seq("id", "v"))
      val ins = spark.table("graft_cdcren")
        .filter(org.apache.spark.sql.functions.col("_change_type") === "insert")
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(ins == Seq((2L, "b"), (3L, "c")))
    } finally q.stop()
  }

  test("upsert sink rejects a batch with duplicate keys instead of inserting both") {
    import spark.implicits._
    val path = tmp("stream-upsertdup-")
    val sink = new graft.streaming.GraftStreamSink(path, Seq("id"))
    val e = intercept[IllegalStateException] {
      sink.addBatch(0L, Seq((5L, "a"), (5L, "b")).toDF("id", "v"))
    }
    assert(e.getMessage.contains("multiple rows per"))
  }

  test("CDC-apply sink rejects a change feed that is not keyed on upsertKeys") {
    import spark.implicits._
    val path = tmp("stream-cdcdup-")
    val sink = new graft.streaming.GraftStreamSink(path, Seq("id"), applyChangeFeed = true)
    // one source commit carrying TWO inserts for the same key: reduction
    // must not arbitrarily keep one — the contract violation surfaces
    val feed = Seq(
      (5L, "a", "insert", 1L, 0), (5L, "b", "insert", 1L, 0))
      .toDF("id", "v", "_change_type", "_commit_version", "_change_ordinal")
    val e = intercept[IllegalStateException] { sink.addBatch(0L, feed) }
    assert(e.getMessage.contains("not keyed"))
  }

  test("readChangeFeed streams DML as change rows: insert, update, delete") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val path = tmp("stream-cdc-")
    val t = GraftTable.create(spark, path, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val q = spark.readStream.format("graft-stream")
      .option("path", path).option("readChangeFeed", "true").load()
      .writeStream.format("memory").queryName("graft_cdc")
      .option("checkpointLocation", s"$path/../ckpt-cdc").start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_cdc").count() == 0) // CDC starts at current head
      t.append(Seq((3L, "c")).toDF("id", "v"))
      q.processAllAvailable()
      t.update(col("id") === 1L, Map("v" -> lit("A"))) // rewrite snapshot
      t.delete(col("id") === 2L)                       // delete snapshot
      q.processAllAvailable()
      val got = spark.table("graft_cdc")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got == Set(
        (3L, "c", "insert"),               // plain append
        (1L, "a", "delete"), (1L, "A", "insert"), // CoW update = delete + insert
        (2L, "b", "delete")))              // CoW delete
      // carryover rows rewritten unchanged by the DML never appear as changes
      assert(spark.table("graft_cdc").count() == 4)
      // commit versions are the snapshot lineage, usable for ordering
      val versions = spark.table("graft_cdc").select("_commit_version")
        .collect().map(_.getLong(0)).distinct.sorted.toSeq
      assert(versions.size == 3)
    } finally q.stop()
  }

  test("readChangeFeed: compaction on a tailed table emits no change rows") {
    import spark.implicits._
    val path = tmp("stream-cdc-mx-")
    val t = GraftTable.create(spark, path, Seq(1L, 2L).toDF("id"))
    t.append(Seq(3L).toDF("id"))
    val q = spark.readStream.format("graft-stream")
      .option("path", path).option("readChangeFeed", "true").load()
      .writeStream.format("memory").queryName("graft_cdc_mx")
      .option("checkpointLocation", s"$path/../ckpt-cdc-mx").start()
    try {
      q.processAllAvailable()
      t.rewriteDataFiles(1) // pure rewrite: same rows, fewer files
      q.processAllAvailable()
      assert(spark.table("graft_cdc_mx").count() == 0,
        "compaction carryovers leaked into the change feed")
      t.append(Seq(4L).toDF("id"))
      q.processAllAvailable()
      assert(spark.table("graft_cdc_mx").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((4L, "insert")))
    } finally q.stop()
  }

  test("readChangeFeed with fromVersion replays history from that snapshot") {
    import spark.implicits._
    val path = tmp("stream-cdc-re-")
    val t = GraftTable.create(spark, path, Seq(1L).toDF("id")) // v0
    t.append(Seq(2L).toDF("id"))                               // v1
    t.delete(org.apache.spark.sql.functions.col("id") === 1L)  // v2
    val q = spark.readStream.format("graft-stream")
      .option("path", path).option("readChangeFeed", "true")
      .option("fromVersion", "0").load()
      .writeStream.format("memory").queryName("graft_cdc_re")
      .option("checkpointLocation", s"$path/../ckpt-cdc-re").start()
    try {
      q.processAllAvailable()
      val got = spark.table("graft_cdc_re")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == Set((2L, "insert", 1L), (1L, "delete", 2L)))
    } finally q.stop()
  }

  test("streaming a table through an UPDATE with skipRewrites never duplicates rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val path = tmp("stream-skip-")
    val t = GraftTable.create(spark, path, Seq(1L, 2L).toDF("id"))
    val q = spark.readStream.format("graft-stream")
      .option("path", path).option("skipRewrites", "true").load()
      .writeStream.format("memory").queryName("graft_skip")
      .option("checkpointLocation", s"$path/../ckpt-skip").start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_skip").count() == 2)
      t.update(col("id") === 1L, Map("id" -> lit(100L)))
      t.append(Seq(3L).toDF("id"))
      q.processAllAvailable()
      // the rewritten copy of row 2 is NOT replayed; only the append arrives
      assert(spark.table("graft_skip").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 2L, 3L))
    } finally q.stop()
  }
}
