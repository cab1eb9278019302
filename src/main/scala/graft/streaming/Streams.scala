package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.9): the same event-time
  * transforms as the batch queries in `graft.queries.Temporal`, expressed so
  * they run identically over `readStream` sources — plus the streaming-only
  * pieces (watermarks, `dropDuplicatesWithinWatermark`, custom state via
  * `mapGroupsWithState`). The declared reference stack can stream through
  * Iceberg's Structured Streaming source/sink (Iceberg 1.9.1 runtime,
  * reference `README.md:36`); these transforms are the engine-side
  * equivalents, verified with MemoryStream micro-batches in StreamsSpec.
  *
  * At scale each of these is a keyed-state operator: state lives
  * partitioned by the grouping key in the state store, watermarks bound it,
  * and the shuffle is exactly the one the equivalent batch groupBy does. */
object Streams {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class UserCount(user_id: Long, n_events: Long)

  /** Tumbling 1-hour counts per event type, 2-hour watermark for late data. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n_events"))

  /** Session windows per user (4-hour gap) with watermark. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "4 hours").as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("s.start").as("session_start"), col("n_events"))

  /** Session windows per user with a DYNAMIC per-event gap (clicks time
    * out after 1 hour, everything else after 4) — the streaming run of the
    * same merged-interval semantics the batch q89 oracle-checks: each
    * event spans `[ts, ts+gap)`, sessions merge while the next event
    * starts before the MERGED end (a running max — a later short-gap
    * event must not shrink a bound an earlier long-gap event extended). */
  def sessionCountsDynamic(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"),
        when(col("event_type") === "click", lit("1 hour"))
          .otherwise(lit("4 hours"))).as("s"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("s.start").as("session_start"),
        col("s.end").as("session_end"), col("n_events"))

  /** Stateful dedup: first event per (user, type) within the watermark. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Custom keyed state (`mapGroupsWithState`): running event count per
    * user, emitted as an update every micro-batch. */
  def runningCountsPerUser(events: Dataset[Event]): Dataset[UserCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[Long, UserCount](GroupStateTimeout.NoTimeout()) {
        (user: Long, batch: Iterator[Event], state: GroupState[Long]) =>
          val next = state.getOption.getOrElse(0L) + batch.size
          state.update(next)
          UserCount(user, next)
      }
  }

  /** Output mode for [[runningCountsPerUser]] sinks. */
  val updateMode: OutputMode = OutputMode.Update()

  case class TypeQuantiles(event_type: String, n: Long, p50: Double, p90: Double)

  case class UserHotItems(user_id: Long, n: Long, top: String)

  /** STREAMING HEAVY HITTERS per key: the [[graft.functions.FreqSketch]]
    * Misra–Gries blob as `mapGroupsWithState` state — each micro-batch
    * folds its items into the key's sketch (≤ k (item, count) pairs in the
    * state store) and emits the refreshed top items. The MG guarantee is
    * deterministic (any item above n/(k+1) frequency is present), so a
    * trending-items stream holds its contract at any stream length with
    * bounded state — the streaming twin of batch q108, same blob. */
  def streamingHeavyHitters(events: Dataset[Event], topK: Int): Dataset[UserHotItems] = {
    import events.sparkSession.implicits._
    import graft.functions.FreqSketch
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[Array[Byte], UserHotItems](GroupStateTimeout.NoTimeout()) {
        (user: Long, batch: Iterator[Event], state: GroupState[Array[Byte]]) =>
          val sk = state.getOption.map(FreqSketch.deserialize)
            .getOrElse(new FreqSketch.State(FreqSketch.DefaultK))
          batch.foreach(e => sk.update(e.event_type))
          state.update(FreqSketch.serialize(sk))
          UserHotItems(user, sk.n, sk.top.take(topK).map { case (i, c) => s"$i:$c" }.mkString(","))
      }
  }

  /** STREAMING QUANTILES per key: the [[graft.functions.KllSketch]]
    * mergeable sketch as `mapGroupsWithState` state — each micro-batch
    * folds its values into the key's sketch (serialized KLL blob in the
    * state store, O(k log n/k) bytes per key, never the values) and emits
    * refreshed p50/p90 estimates. This is the streaming twin of batch
    * q104: the SAME sketch bytes, so a bootstrap-from-batch handoff is a
    * state initialization away, and the estimates carry the sketch's
    * rank-error bound at any stream length — unbounded-stream percentiles
    * with bounded state, which no windowed aggregate gives. */
  def streamingQuantiles(events: Dataset[Event]): Dataset[TypeQuantiles] = {
    import events.sparkSession.implicits._
    import graft.functions.KllSketch
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState[Array[Byte], TypeQuantiles](GroupStateTimeout.NoTimeout()) {
        (et: String, batch: Iterator[Event], state: GroupState[Array[Byte]]) =>
          val sk = state.getOption.map(KllSketch.deserialize)
            .getOrElse(new KllSketch.State(KllSketch.DefaultK))
          batch.foreach(e => sk.update(e.value))
          state.update(KllSketch.serialize(sk))
          TypeQuantiles(et, sk.n, sk.quantile(0.5), sk.quantile(0.9))
      }
  }

  case class TypeDistinct(event_type: String, distinct_users: Double, retained: Long)

  /** STREAMING DISTINCT COUNT per key: the [[graft.functions.ThetaSketch]]
    * KMV blob as `mapGroupsWithState` state — each micro-batch offers its
    * user ids into the key's bottom-k hash set (≤ k longs in the state
    * store) and emits the refreshed distinct-user estimate. Re-sent ids
    * hash to the same value and dedupe inside the sketch, so the count
    * never double-counts across micro-batches; below k retained hashes the
    * estimate is EXACT. Completes the streaming summary trio (KLL
    * quantiles, Misra–Gries heavy hitters, theta distinct) with the same
    * blobs as their batch twins — bootstrap-from-batch is a state init
    * away, and a stored stream state rolls up through `theta_union_agg`. */
  def streamingDistinct(events: Dataset[Event]): Dataset[TypeDistinct] = {
    import events.sparkSession.implicits._
    import graft.functions.ThetaSketch
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState[Array[Byte], TypeDistinct](GroupStateTimeout.NoTimeout()) {
        (et: String, batch: Iterator[Event], state: GroupState[Array[Byte]]) =>
          val sk = state.getOption.map { bytes =>
            val (_, theta, hs) = ThetaSketch.parse(bytes)
            val s = new ThetaSketch.Kmv(ThetaSketch.DefaultK)
            s.thetaLong = theta
            hs.foreach(h => s.hashes.add(h))
            s
          }.getOrElse(new ThetaSketch.Kmv(ThetaSketch.DefaultK))
          batch.foreach { e =>
            val bytes = ThetaSketch.serializeValue(
              org.apache.spark.sql.types.LongType, e.user_id)
            sk.offer(ThetaSketch.valueHash(bytes))
          }
          state.update(ThetaSketch.serialize(sk))
          TypeDistinct(et, sk.estimate, sk.hashes.size.toLong)
      }
  }

  /** Watermarked STREAM-STREAM INNER JOIN (the click-attribution shape):
    * join clicks to the impression they followed within 30 minutes, per
    * user. Both sides carry watermarks and the join condition bounds
    * `click_ts` to a window after `imp_ts`, so Spark derives state-eviction
    * watermarks for BOTH state stores — without the time bound, stream-
    * stream join state grows forever. At scale the state is partitioned by
    * the equi-key (user_id): the same shuffle the equivalent batch join
    * does, with state bounded by watermark horizon × event rate. */
  def clickAttribution(impressions: DataFrame, clicks: DataFrame): DataFrame = {
    val imp = impressions
      .select(col("event_id").as("imp_id"), col("user_id"), col("ts").as("imp_ts"))
      .withWatermark("imp_ts", "1 hour")
    val clk = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    imp.join(clk,
      col("user_id") === col("click_user") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("imp_id"), col("click_id"), col("user_id"),
        col("imp_ts"), col("click_ts"))
  }

  /** LEFT-OUTER stream-stream join: same attribution, but impressions with
    * no click inside the window are still emitted (null click columns) once
    * the watermark passes the window end — the state store proves the
    * absence before releasing the row. */
  def clickAttributionOuter(impressions: DataFrame, clicks: DataFrame): DataFrame = {
    val imp = impressions
      .select(col("event_id").as("imp_id"), col("user_id"), col("ts").as("imp_ts"))
      .withWatermark("imp_ts", "1 hour")
    val clk = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    imp.join(clk,
      col("user_id") === col("click_user") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr("INTERVAL 30 MINUTES"),
      "left_outer")
      .select(col("imp_id"), col("click_id"), col("user_id"),
        col("imp_ts"), col("click_ts"))
  }

  /** FULL-outer stream-stream join — completes the streaming join-type
    * matrix (inner: [[clickAttribution]], left-outer:
    * [[clickAttributionOuter]]): unmatched rows from BOTH sides release
    * once their watermark proves no partner can still arrive — orphan
    * clicks (no impression: fraud/bot signal) surface alongside
    * unattributed impressions, in one query. Same time-range-bounded
    * condition, so both state stores stay watermark-evicted. */
  def clickAttributionFull(impressions: DataFrame, clicks: DataFrame): DataFrame = {
    val imp = impressions
      .select(col("event_id").as("imp_id"), col("user_id"), col("ts").as("imp_ts"))
      .withWatermark("imp_ts", "1 hour")
    val clk = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    imp.join(clk,
      col("user_id") === col("click_user") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr("INTERVAL 30 MINUTES"),
      "full_outer")
      .select(col("imp_id"), col("click_id"),
        coalesce(col("user_id"), col("click_user")).as("user_id"),
        col("imp_ts"), col("click_ts"))
  }

  /** STREAM-STATIC equi-join: enrich each micro-batch against a dimension
    * table. The static side is a plain bounded DataFrame (here typically a
    * graft catalog table) joined per micro-batch; with DSv2 row/byte stats
    * on a small graft dim, every batch's join auto-broadcasts — no state
    * store, no watermark, the standard dimension-enrichment shape. */
  def enrichWithDim(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(dim, Seq(key))

  /** Streaming sink into a graft table (the Iceberg Structured Streaming
    * sink equivalent — the declared stack ships one in the Iceberg 1.9.1
    * runtime, reference `README.md:36`). Use with foreachBatch:
    * {{{ ds.writeStream.foreachBatch(Streams.graftSink(table) _).start() }}}
    *
    * Exactly-once: the micro-batch id is committed in the SAME snapshot as
    * the data (one atomic CAS), so a replayed batch after a failure —
    * foreachBatch is at-least-once — is detected and skipped. */
  def graftSink(table: graft.table.GraftTable)(batch: DataFrame, batchId: Long): Unit = {
    val last = table.log.current.properties.get("stream.last-batch-id").map(_.toLong)
    if (last.exists(_ >= batchId)) return // replayed micro-batch: already durable
    table.append(batch, Map("stream.last-batch-id" -> batchId.toString))
  }

  /** [[graftSink]] plus CONTINUOUS materialized-aggregate maintenance: after
    * each exactly-once append, catch the registered materialization up to
    * the new head from the CDC changelog ([[graft.operators.IncrementalAgg]]).
    * The MV's version stamp then always matches HEAD between micro-batches,
    * so [[graft.plans.GraftMvRewrite]] keeps serving dashboard aggregates
    * from the |groups|-row table while the stream ingests underneath —
    * the streaming-MV loop the reference's Databricks side sells as DLT.
    * Refresh cost per batch is O(batch rows + touched groups); a crash
    * between append and refresh just means the next refresh covers two
    * batches (the stamp, not the batch id, drives the catch-up). */
  def graftSinkWithAgg(table: graft.table.GraftTable, matPath: String)(
      batch: DataFrame, batchId: Long): Unit = {
    graftSink(table)(batch, batchId)
    graft.operators.IncrementalAgg.refresh(batch.sparkSession, table, matPath)
  }

  /** [[graftSink]] with ONLINE NEAR-DUP FILTERING: each micro-batch is
    * sketched once ([[graft.operators.DedupIndex]]), checked against the
    * table's persisted signature index AND against itself (first-id-wins
    * inside the batch), and only the novel rows append — the standing
    * "dedup each crawl batch against everything already kept" loop, as a
    * streaming sink.
    *
    * Dedup semantics are TRANSITIVE-CLUSTER (the q62 connected-components
    * rule): a batch doc near-matching a lower-id batch doc drops even when
    * that lower doc itself dropped as a corpus dup — the whole chain is
    * one near-dup cluster and exactly one representative (the corpus copy,
    * or the lowest batch id) survives.
    *
    * The index catches up BEFORE the probe (a no-op when already at the
    * table's head), then again after the append — so a crash between
    * append and refresh cannot make the replayed/next batch probe a stale
    * index (the version stamp, not the batch id, drives catch-up — the
    * [[graftSinkWithAgg]] rule, hardened).
    *
    * Per-batch cost: the batch is sketched twice (once for the probe,
    * once inside the catch-up refresh reading the append's changelog —
    * both O(batch)) + a (band, bucket) equality join against the
    * file-pruned index. The corpus is never re-read and never
    * re-sketched. */
  def graftSinkDeduped(table: graft.table.GraftTable, indexPath: String,
      idCol: String, textCol: String, minJaccard: Double = 0.5)(
      batch: DataFrame, batchId: Long): Unit = {
    import graft.operators.DedupIndex
    val last = table.log.current.properties.get("stream.last-batch-id").map(_.toLong)
    if (last.exists(_ >= batchId)) return // replayed micro-batch: already durable
    val spark = batch.sparkSession
    // sketch once; the cached bands serve the index probe AND the
    // within-batch self-join (the batch itself is already materialized by
    // the streaming engine — no second persist needed)
    val bands = DedupIndex.bandTable(batch, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // catch the index up FIRST: a crash after a previous batch's append
      // but before its refresh leaves the index one commit behind — probing
      // it stale would permanently ingest that batch's near-dups
      val index = DedupIndex.refreshIndexTable(spark, indexPath,
        graft.table.GraftTable.load(spark, table.path), idCol, textCol)
      // pruned probe: only index files whose bucket ranges intersect the
      // batch are read — the corpus index never fully rescans per batch
      val vsCorpus = DedupIndex.probeTableBands(index, bands, minJaccard)
        .select(col("new_id")).distinct()
      // within-batch: of any near-dup pair the batch itself carries, the
      // LOWER id survives — same (b, bucket) equality join, id-ordered
      val withinPairs = DedupIndex.probeBands(bands, bands, minJaccard)
        .filter(col("new_id") > col("dup_of"))
        .select(col("new_id")).distinct()
      val dupIds = vsCorpus.union(withinPairs).distinct()
      val keep = batch.join(dupIds, batch(idCol) === dupIds("new_id"), "left_anti")
      table.append(keep, Map("stream.last-batch-id" -> batchId.toString))
      DedupIndex.refreshIndexTable(spark, indexPath,
        graft.table.GraftTable.load(spark, table.path), idCol, textCol)
    } finally bands.unpersist(blocking = false)
  }
}
