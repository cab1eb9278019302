package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import graft.streaming.Streams
import graft.streaming.Streams.Event

/** MemoryStream micro-batch verification of the Structured Streaming surface
  * (SURVEY.md §2.9 — not oracle-able in DuckDB, so invariants live here). */
class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def ev(id: Long, minute: Int, user: Long, typ: String) =
    Event(id, ts(minute), user, typ, 1.0)

  test("streaming tumbling window counts match the batch computation") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = Streams.tumblingCounts(ms.toDF())
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    try {
      ms.addData(ev(1, 10, 1, "click"), ev(2, 20, 1, "click"), ev(3, 70, 2, "view"))
      q.processAllAvailable()
      val rows = spark.table("tumbling_out").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(rows == Set(
        ("2024-01-01 00:00:00.0", "click", 2L),
        ("2024-01-01 01:00:00.0", "view", 1L)))
      // batch path over the same rows gives the same windows
      val batch = Streams.tumblingCounts(
        Seq(ev(1, 10, 1, "click"), ev(2, 20, 1, "click"), ev(3, 70, 2, "view")).toDF())
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(batch == rows)
    } finally q.stop()
  }

  test("streaming session window merges events within the gap") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = Streams.sessionCounts(ms.toDF())
      .writeStream.format("memory").queryName("session_out")
      .outputMode("complete").start()
    try {
      // user 1: two events 1h apart (same 4h session); second session 6h later
      ms.addData(ev(1, 0, 1, "a"), ev(2, 60, 1, "a"), ev(3, 60 * 8, 1, "a"))
      q.processAllAvailable()
      val rows = spark.table("session_out").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2))).toSet
      assert(rows == Set(
        (1L, "2024-01-01 00:00:00.0", 2L),
        (1L, "2024-01-01 08:00:00.0", 1L)))
    } finally q.stop()
  }

  test("streaming dynamic-gap session window: merged end is a running max") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = Streams.sessionCountsDynamic(ms.toDF())
      .writeStream.format("memory").queryName("dynsession_out")
      .outputMode("complete").start()
    try {
      // user 1: click@0:00 (1h gap -> end 1:00), view@0:30 (4h gap -> end
      // 4:30, session end EXTENDS), click@2:00 (starts before the merged
      // 4:30 end, so it merges even though the click-gap alone had expired
      // at 1:00; its own 3:00 end must NOT shrink the 4:30 bound), then
      // view@5:00 (>= 4:30 -> NEW session).
      // user 2: two clicks 2h apart — the 1h click gap separates them.
      ms.addData(
        ev(1, 0, 1, "click"), ev(2, 30, 1, "view"), ev(3, 120, 1, "click"),
        ev(4, 300, 1, "view"),
        ev(5, 0, 2, "click"), ev(6, 120, 2, "click"))
      q.processAllAvailable()
      val rows = spark.table("dynsession_out").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3))).toSet
      assert(rows == Set(
        (1L, "2024-01-01 00:00:00.0", "2024-01-01 04:30:00.0", 3L),
        (1L, "2024-01-01 05:00:00.0", "2024-01-01 09:00:00.0", 1L),
        (2L, "2024-01-01 00:00:00.0", "2024-01-01 01:00:00.0", 1L),
        (2L, "2024-01-01 02:00:00.0", "2024-01-01 03:00:00.0", 1L)), rows)
      // batch path over the same rows produces the same sessions (the
      // q89 semantics the DuckDB oracle verifies)
      val batch = Streams.sessionCountsDynamic(
        Seq(ev(1, 0, 1, "click"), ev(2, 30, 1, "view"), ev(3, 120, 1, "click"),
          ev(4, 300, 1, "view"), ev(5, 0, 2, "click"), ev(6, 120, 2, "click")).toDF())
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3))).toSet
      assert(batch == rows)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark keeps one event per (user, type)") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = Streams.dedupWithinWatermark(ms.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      ms.addData(ev(1, 0, 1, "click"), ev(2, 5, 1, "click"), ev(3, 10, 1, "view"))
      q.processAllAvailable()
      val n = spark.table("dedup_out").count()
      assert(n == 2, s"expected 2 deduped rows, got $n")
    } finally q.stop()
  }

  test("streaming sink into a graft table: appends per micro-batch, exactly-once on replay") {
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "stream-sink-").toString
    val table = graft.table.GraftTable.createEmpty(spark, dir,
      Seq.empty[Event].toDS().toDF().schema)
    val ms = MemoryStream[Event]
    val q = ms.toDF().writeStream
      .foreachBatch(graft.streaming.Streams.graftSink(table) _)
      .outputMode("append").start()
    try {
      ms.addData(ev(1, 0, 1, "a"), ev(2, 1, 1, "b"))
      q.processAllAvailable()
      ms.addData(ev(3, 2, 2, "c"))
      q.processAllAvailable()
      assert(table.read.count() == 3)
      // each micro-batch is one ACID snapshot commit
      assert(table.history.collect().count(_.getString(3) == "append") == 2)
      // replayed batch id (at-least-once delivery) must be a no-op
      val v = table.log.currentVersion
      graft.streaming.Streams.graftSink(table)(
        Seq(ev(99, 3, 9, "dup")).toDS().toDF(), batchId = 1)
      assert(table.log.currentVersion == v && table.read.count() == 3)
    } finally q.stop()
  }

  test("continuous MV maintenance: the materialization tracks HEAD across micro-batches") {
    implicit val ctx = spark.sqlContext
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), p).toString
    val table = graft.table.GraftTable.createEmpty(spark, tmp("stream-mv-src-"),
      Seq.empty[Event].toDS().toDF().schema)
    val matPath = tmp("stream-mv-mat-") + "/mat"
    graft.operators.IncrementalAgg.materialize(spark, table, matPath,
      Seq("event_type"), Seq("user_id"), Seq("event_id"))
    def assertFresh(): Unit = {
      val mat = graft.table.GraftTable.load(spark, matPath)
      assert(mat.log.current.properties(
        graft.operators.IncrementalAgg.SourceVersionProp).toLong
        == table.log.currentVersion, "MV stamp must track the source HEAD")
      val expect = graft.operators.IncrementalAgg
        .aggregate(table.read, Seq("event_type"), Seq("user_id"), Seq("event_id"))
        .collect().map(_.toString).sorted.toSeq
      val got = mat.read
        .select($"event_type", $"cnt", $"sum_user_id", $"min_event_id", $"max_event_id")
        .collect().map(_.toString).sorted.toSeq
      assert(got == expect, "continuously maintained MV diverged from recompute")
    }
    val ms = MemoryStream[Event]
    val q = ms.toDF().writeStream
      .foreachBatch(graft.streaming.Streams.graftSinkWithAgg(table, matPath) _)
      .outputMode("append").start()
    try {
      ms.addData(ev(1, 0, 1, "a"), ev(2, 1, 2, "b"))
      q.processAllAvailable()
      assertFresh()
      ms.addData(ev(3, 2, 3, "a"), ev(4, 3, 4, "c"))
      q.processAllAvailable()
      assertFresh()
      // a DELETE between micro-batches (a GDPR pass under the stream) is
      // caught up by the next batch's refresh — the stamp drives catch-up
      table.delete($"event_id" === 1L)
      ms.addData(ev(5, 4, 5, "b"))
      q.processAllAvailable()
      assertFresh()
    } finally q.stop()
  }

  test("stream-stream inner join attributes clicks to impressions in-window") {
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = Streams.clickAttribution(imps.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      imps.addData(ev(1, 0, 1, "imp"), ev(2, 0, 2, "imp"))
      clicks.addData(
        ev(10, 20, 1, "click"),  // user 1: 20 min after the impression — in window
        ev(11, 50, 2, "click"))  // user 2: 50 min after — outside the 30-min window
      q.processAllAvailable()
      val rows = spark.table("attr_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set((1L, 10L, 1L)), rows.mkString(", "))
    } finally q.stop()
  }

  test("stream-stream left-outer join emits unmatched impressions after the watermark") {
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = Streams.clickAttributionOuter(imps.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("attr_outer_out")
      .outputMode("append").start()
    try {
      imps.addData(ev(1, 0, 1, "imp"), ev(2, 0, 2, "imp"))
      clicks.addData(ev(10, 20, 1, "click")) // only user 1 clicks
      q.processAllAvailable()
      // advance both watermarks far past the join window so the state store
      // can prove user 2 never clicked and release the null-extended row
      imps.addData(ev(3, 60 * 10, 9, "imp"))
      clicks.addData(ev(12, 60 * 10, 9, "click"))
      q.processAllAvailable()
      val rows = spark.table("attr_outer_out").collect()
        .map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2))).toSet
      assert(rows.contains((1L, Some(10L), 1L)), s"matched row missing: $rows")
      assert(rows.contains((2L, None, 2L)), s"null-extended unmatched row missing: $rows")
    } finally q.stop()
  }

  test("stream-stream FULL-outer join releases unmatched rows from BOTH sides") {
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = Streams.clickAttributionFull(imps.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("attr_full_out")
      .outputMode("append").start()
    try {
      imps.addData(ev(1, 0, 1, "imp"), ev(2, 0, 2, "imp"))
      clicks.addData(
        ev(10, 20, 1, "click"), // user 1: matched in-window
        ev(11, 5, 3, "click"))  // user 3: ORPHAN click, no impression at all
      q.processAllAvailable()
      // advance both watermarks so absence is proven on both sides
      imps.addData(ev(3, 60 * 10, 9, "imp"))
      clicks.addData(ev(12, 60 * 10, 9, "click"))
      q.processAllAvailable()
      val rows = spark.table("attr_full_out").collect()
        .map(r => (Option(r.get(0)), Option(r.get(1)), r.getLong(2))).toSet
      assert(rows.contains((Some(1L), Some(10L), 1L)), s"matched row missing: $rows")
      assert(rows.contains((Some(2L), None, 2L)), s"unmatched impression missing: $rows")
      assert(rows.contains((None, Some(11L), 3L)), s"orphan click missing: $rows")
    } finally q.stop()
  }

  test("stream-static join enriches a stream against a graft dim table per micro-batch") {
    implicit val ctx = spark.sqlContext
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", SparkSpec.warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.stream")
    spark.sql("CREATE TABLE IF NOT EXISTS graft.stream.user_dim (user_id BIGINT, tier STRING)")
    spark.sql("DELETE FROM graft.stream.user_dim WHERE true")
    spark.sql("INSERT INTO graft.stream.user_dim VALUES (1, 'gold'), (2, 'basic')")
    val ms = MemoryStream[Event]
    val q = Streams.enrichWithDim(ms.toDF(), spark.table("graft.stream.user_dim"), "user_id")
      .select(col("event_id"), col("user_id"), col("tier"))
      .writeStream.format("memory").queryName("enriched_out")
      .outputMode("append").start()
    try {
      ms.addData(ev(1, 10, 1, "click"), ev(2, 11, 2, "view"), ev(3, 12, 3, "view"))
      q.processAllAvailable()
      val rows = spark.table("enriched_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      // user 3 has no dim row: inner join drops it
      assert(rows == Set((1L, 1L, "gold"), (2L, 2L, "basic")))
      // a second micro-batch joins again (per-batch join, no state store)
      ms.addData(ev(4, 13, 2, "click"))
      q.processAllAvailable()
      assert(spark.table("enriched_out").count() == 3)
    } finally q.stop()
  }

  test("mapGroupsWithState accumulates running counts across micro-batches") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = Streams.runningCountsPerUser(ms.toDS())
      .writeStream.format("memory").queryName("running_out")
      .outputMode("update").start()
    try {
      ms.addData(ev(1, 0, 7, "a"), ev(2, 1, 7, "a"))
      q.processAllAvailable()
      ms.addData(ev(3, 2, 7, "a"))   // second micro-batch: state carries over
      q.processAllAvailable()
      val latest = spark.table("running_out").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).max }
      assert(latest == Map(7L -> 3L))
    } finally q.stop()
  }

  test("streaming heavy hitters: MG state accumulates, dominant item surfaces exactly") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = Streams.streamingHeavyHitters(ms.toDS(), topK = 2)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("update").start()
    try {
      // batch 1: 30 "hot" + 10 distinct cold types; batch 2: 20 more "hot"
      ms.addData((1 to 30).map(i => Event(i.toLong, ts(0), 5L, "hot", 1.0)) ++
        (31 to 40).map(i => Event(i.toLong, ts(0), 5L, s"cold$i", 1.0)): _*)
      q.processAllAvailable()
      ms.addData((41 to 60).map(i => Event(i.toLong, ts(1), 5L, "hot", 1.0)): _*)
      q.processAllAvailable()
      val last = spark.table("hh_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).maxBy(_._2)
      assert(last._1 == 5L && last._2 == 60L, s"state restarted: $last")
      // 60 events fit in k=64 counters: MG is EXACT here — hot:50 leads
      assert(last._3.startsWith("hot:50"), last._3)
    } finally q.stop()
  }

  test("streaming KLL quantiles: sketch state accumulates, estimates stay rank-bounded") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = Streams.streamingQuantiles(ms.toDS())
      .writeStream.format("memory").queryName("kll_out")
      .outputMode("update").start()
    try {
      // two micro-batches of values 1..600 and 601..1000 for one key — the
      // state-store sketch must carry across batches, not restart
      ms.addData((1 to 600).map(i => Event(i.toLong, ts(0), 1L, "m", i.toDouble)): _*)
      q.processAllAvailable()
      ms.addData((601 to 1000).map(i => Event(i.toLong, ts(1), 1L, "m", i.toDouble)): _*)
      q.processAllAvailable()
      val last = spark.table("kll_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .maxBy(_._2)
      assert(last._1 == "m" && last._2 == 1000L, s"state restarted: $last")
      // same rank-error contract as the batch sketch (KllSketchSpec)
      assert(math.abs(last._3 - 500.0) <= 40.0, s"p50=${last._3}")
      assert(math.abs(last._4 - 900.0) <= 40.0, s"p90=${last._4}")
    } finally q.stop()
  }

  test("streaming theta distinct: re-sent users dedupe across micro-batches, exact below k") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = Streams.streamingDistinct(ms.toDS())
      .writeStream.format("memory").queryName("dc_out")
      .outputMode("update").start()
    try {
      // batch 1: users 1..500; batch 2: users 301..600 (200 re-sent)
      ms.addData((1 to 500).map(i => Event(i.toLong, ts(0), i.toLong, "m", 1.0)): _*)
      q.processAllAvailable()
      ms.addData((501 to 800).map(i => Event(i.toLong, ts(1), (i - 200).toLong, "m", 1.0)): _*)
      q.processAllAvailable()
      val rows = spark.table("dc_out").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      val first = rows.minBy(_._3)
      val last = rows.maxBy(_._3)
      assert(first == (("m", 500.0, 500L)), s"batch-1 emit off: $first")
      // 600 < k: the sketch is exact — 200 re-sent ids must not double-count,
      // and state must have carried (a restart would re-emit 300)
      assert(last == (("m", 600.0, 600L)), s"state restarted or double-counted: $last")
    } finally q.stop()
  }
}
