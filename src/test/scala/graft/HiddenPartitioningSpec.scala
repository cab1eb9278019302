package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, LessThan}
import graft.table.GraftTable

/** Hidden-partitioning transforms as partition specs (Iceberg's signature
  * feature, reference `main.tf:803`): bucket/truncate/days drive the write
  * layout, record per-file transform-value bounds, and prune files from
  * filters on the SOURCE column — metadata-only, no data scan. */
class HiddenPartitioningSpec extends SparkSpec {

  private def wh = SparkSpec.warehouse

  private def init(): Unit = {
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.hp")
  }

  /** AQE coalescing folds the transform-keyed write shuffle into one
    * right-sized file at toy row counts (the correct behavior at real scale);
    * disable it around inserts so the layout splits and pruning is visible. */
  private def noCoalesce[A](body: => A): A = {
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, old)
  }

  test("days(ts): SQL PARTITIONED BY prunes a ts range to fewer files") {
    init()
    spark.sql("CREATE TABLE graft.hp.ev (id BIGINT, ts TIMESTAMP) PARTITIONED BY (days(ts))")
    // 16 days of hourly events: the day value distributes writes, so each
    // file covers a narrow day range
    noCoalesce { spark.sql("""INSERT INTO graft.hp.ev
      SELECT id, timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,CAST(id AS INT),0,0)
      FROM range(384)""") }
    val t = GraftTable.load(spark, s"$wh/hp/ev")
    val all = t.log.current.files
    assert(all.size >= 2, s"need multiple files, got ${all.size}")
    assert(all.forall(_.stats.contains("days(ts)")), "per-file transform bounds missing")
    // metadata-only: a one-day range keeps strictly fewer files
    val pruned = t.pruneFiles(t.log.current, Seq(
      GreaterThanOrEqual("ts", java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))))
    assert(pruned.size < all.size, s"no pruning: ${pruned.size} of ${all.size}")
    // and results through SQL stay exact (filter re-checked on residuals)
    assert(spark.sql(
      "SELECT count(*) FROM graft.hp.ev WHERE ts >= timestamp'2024-01-15 00:00:00'")
      .collect()(0).getLong(0) == 48)
  }

  test("bucket(8, id): equality on the source column prunes to the bucket's files") {
    init()
    spark.sql("CREATE TABLE graft.hp.bk (id BIGINT, v DOUBLE) PARTITIONED BY (bucket(8, id))")
    noCoalesce {
      spark.sql("INSERT INTO graft.hp.bk SELECT id, CAST(id AS DOUBLE) FROM range(4000)") }
    val t = GraftTable.load(spark, s"$wh/hp/bk")
    val all = t.log.current.files
    assert(all.size >= 2)
    assert(all.forall(_.stats.contains("bucket(8,id)")))
    val pruned = t.pruneFiles(t.log.current, Seq(EqualTo("id", 1234L)))
    assert(pruned.size < all.size, s"bucket equality did not prune: ${pruned.size}/${all.size}")
    assert(spark.sql("SELECT v FROM graft.hp.bk WHERE id = 1234").collect()(0).getDouble(0) == 1234.0)
    // ranges cannot prune through a hash bucket — and must not mis-prune
    assert(t.pruneFiles(t.log.current, Seq(GreaterThanOrEqual("id", 0L))).size == all.size)
  }

  test("truncate(2, tag): string-prefix layout prunes equality and ranges") {
    init()
    spark.sql("CREATE TABLE graft.hp.tr (id BIGINT, tag STRING) PARTITIONED BY (truncate(2, tag))")
    noCoalesce { spark.sql("""INSERT INTO graft.hp.tr
      SELECT id, concat(substring('abcdefgh', CAST(id % 8 AS INT) + 1, 1), 'x', id) FROM range(800)""") }
    val t = GraftTable.load(spark, s"$wh/hp/tr")
    val all = t.log.current.files
    assert(all.size >= 2)
    val prunedEq = t.pruneFiles(t.log.current, Seq(EqualTo("tag", "axe")))
    assert(prunedEq.size < all.size)
    val prunedRange = t.pruneFiles(t.log.current, Seq(LessThan("tag", "b")))
    assert(prunedRange.size < all.size)
    assert(spark.sql("SELECT count(*) FROM graft.hp.tr WHERE tag < 'b'")
      .collect()(0).getLong(0) == 100)
  }

  test("truncate(w, str): session-free literal eval counts CODE POINTS like Spark") {
    // ADVICE r17 (medium): Java String.substring counts UTF-16 units while
    // the recorded stats come from Spark's substring (code points) — a
    // supplementary char in the first w positions made the session-free
    // literal a SHORTER prefix than the stat rendering, wrongly excluding
    // the matching file. 𝕏 (U+1D54F) is 1 code point / 2 UTF-16 units.
    import graft.table.PartitionTransform
    val tr = PartitionTransform.Truncate("tag", 2, isString = true)
    for (s <- Seq("𝕏abc", "a𝕏bc", "𝕏", "ab", "a", "")) {
      val sparkForm = spark.range(1).select(
        substring(lit(s), 1, 2)).collect()(0).getString(0)
      assert(PartitionTransform.evalOrderPreserving(tr, s) == Some(sparkForm),
        s"literal eval diverged from Spark for ${s.codePoints().toArray.mkString("+")}")
    }
    // end-to-end: a truncate-partitioned table with supplementary-char tags
    // must not prune away the file holding the matching row
    init()
    spark.sql("CREATE TABLE graft.hp.trcp (id BIGINT, tag STRING) PARTITIONED BY (truncate(2, tag))")
    noCoalesce { spark.sql("""INSERT INTO graft.hp.trcp
      SELECT id, concat(char(120792 - CAST(id % 4 AS INT)), 'x', id) FROM range(400)""") }
    // char(120792)=𝕘-block supplementary chars; equality on one of them
    val hit = spark.sql("SELECT tag FROM graft.hp.trcp WHERE id = 3").collect()(0).getString(0)
    val got = spark.sql(s"SELECT count(*) FROM graft.hp.trcp WHERE tag = '$hit'")
      .collect()(0).getLong(0)
    assert(got == 1L, s"supplementary-char truncate pruning lost the row (got $got)")
  }

  test("ADD PARTITION FIELD with a transform: new writes prune, old files stay safe") {
    init()
    spark.sql("CREATE TABLE graft.hp.evolve (id BIGINT, ts TIMESTAMP)")
    noCoalesce { spark.sql("""INSERT INTO graft.hp.evolve
      SELECT id, timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,0,CAST(id AS INT),0,0)
      FROM range(96)""") }
    val t = GraftTable.load(spark, s"$wh/hp/evolve")
    val before = t.log.current.files
    assert(before.forall(f => !f.stats.contains("days(ts)")))
    t.addPartitionField("days(ts)")
    noCoalesce { spark.sql("""INSERT INTO graft.hp.evolve
      SELECT id + 96, timestamp'2024-03-05 00:00:00' + make_interval(0,0,0,0,CAST(id AS INT),0,0)
      FROM range(96)""") }
    val after = GraftTable.load(spark, s"$wh/hp/evolve").log.current
    val newFiles = after.files.filterNot(f => before.exists(_.path == f.path))
    assert(newFiles.nonEmpty && newFiles.forall(_.stats.contains("days(ts)")))
    // pruning a post-evolution day: old stat-less-for-transform files are
    // kept via their PLAIN ts column bounds or conservatively — never lost
    val t2 = GraftTable.load(spark, s"$wh/hp/evolve")
    val pruned = t2.pruneFiles(after, Seq(
      GreaterThanOrEqual("ts", java.sql.Timestamp.valueOf("2024-03-08 00:00:00"))))
    assert(pruned.size < after.files.size)
    assert(spark.sql(
      "SELECT count(*) FROM graft.hp.evolve WHERE ts >= timestamp'2024-03-08 00:00:00'")
      .collect()(0).getLong(0) == 24)
    // duplicate spec rejected; unknown transform rejected
    intercept[IllegalArgumentException] { t2.addPartitionField("days(ts)") }
    intercept[IllegalArgumentException] { t2.addPartitionField("zigzag(ts)") }
  }

  test("bucket(128, id): scattered-bucket files prune equality via EXACT value sets") {
    // THE weak case for range stats: more buckets than write parallelism →
    // every file holds several SCATTERED bucket values, so its [min, max]
    // spans most of the domain and `bucket = v` can't prune by range. The
    // per-file distinct-value SET ([[ColumnStats.values]]) proves
    // membership exactly.
    init()
    spark.sql("CREATE TABLE graft.hp.sc (id BIGINT, v DOUBLE) PARTITIONED BY (bucket(128, id))")
    noCoalesce {
      spark.sql("INSERT INTO graft.hp.sc SELECT id, CAST(id AS DOUBLE) FROM range(4000)") }
    val t = GraftTable.load(spark, s"$wh/hp/sc")
    val head = t.log.current
    val all = head.files
    assert(all.size >= 4, s"need scattered multi-bucket files, got ${all.size}")
    // each file's set is present (small), and genuinely multi-valued
    val sets = all.map(_.stats("bucket(128,id)").values)
    assert(sets.forall(_.isDefined), "value sets missing from bucket stats")
    assert(sets.exists(_.get.size > 1), "expected multi-bucket files")
    val eq = Seq(EqualTo("id", 1234L))
    val pruned = t.pruneFiles(head, eq)
    assert(pruned.size * 4 <= all.size,
      s"value sets did not prune scattered buckets: ${pruned.size}/${all.size}")
    // the SERVER-side pruner (no SparkSession eval available) agrees —
    // bucket literals hash session-free now
    assert(GraftTable.pruneFilesByStats(head, eq).map(_.path).toSet ==
      pruned.map(_.path).toSet, "server-planned bucket pruning diverged from local")
    // IN prunes to the union of member files
    val in = Seq(org.apache.spark.sql.sources.In("id", Array(7L, 1234L)))
    val prunedIn = t.pruneFiles(head, in)
    assert(prunedIn.size * 2 <= all.size)
    assert(GraftTable.pruneFilesByStats(head, in).map(_.path).toSet ==
      prunedIn.map(_.path).toSet)
    // and the answers stay exact
    assert(spark.sql("SELECT v FROM graft.hp.sc WHERE id = 1234")
      .collect()(0).getDouble(0) == 1234.0)
    assert(spark.sql("SELECT count(*) FROM graft.hp.sc WHERE id IN (7, 1234)")
      .collect()(0).getLong(0) == 2L)
  }

  test("value sets stay BOUNDED: a file spanning >64 buckets records none") {
    init()
    spark.sql("CREATE TABLE graft.hp.cap (id BIGINT) PARTITIONED BY (bucket(128, id))")
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try noCoalesce {
      spark.sql("INSERT INTO graft.hp.cap SELECT id FROM range(4000)") }
    finally spark.conf.set("spark.sql.shuffle.partitions", old)
    val t = GraftTable.load(spark, s"$wh/hp/cap")
    val all = t.log.current.files
    assert(all.nonEmpty)
    // one writer partition → every bucket value in each file → over the cap
    assert(all.forall(_.stats("bucket(128,id)").values.isEmpty),
      "a >cap distinct set must fall back to range bounds, not bloat metadata")
    // no set, wide range: equality keeps the file — and stays correct
    assert(t.pruneFiles(t.log.current, Seq(EqualTo("id", 99L))).size == all.size)
    assert(spark.sql("SELECT count(*) FROM graft.hp.cap WHERE id = 99")
      .collect()(0).getLong(0) == 1L)
  }

  test("plain low-cardinality columns carry value sets: equality prunes scattered categories") {
    init()
    spark.sql("CREATE TABLE graft.hp.pv (id BIGINT, cat STRING)")
    // two files whose cat RANGES both span [aa..zz] — only the sets differ
    spark.sql("INSERT INTO graft.hp.pv SELECT id, IF(id % 2 = 0, 'aa', 'zz') FROM range(100)")
    spark.sql("INSERT INTO graft.hp.pv SELECT id + 100, IF(id % 2 = 0, 'bb', 'yy') FROM range(100)")
    val t = GraftTable.load(spark, s"$wh/hp/pv")
    val all = t.log.current.files
    assert(all.size >= 2)
    assert(all.forall(_.stats("cat").values.isDefined), "plain value sets missing")
    // inside every range, outside every set
    assert(t.pruneFiles(t.log.current, Seq(EqualTo("cat", "mm"))).isEmpty)
    // member of exactly one file's set
    val zz = t.pruneFiles(t.log.current, Seq(EqualTo("cat", "zz")))
    assert(zz.size < all.size && zz.nonEmpty)
    // the server-side pruner agrees (shared statsExcluded)
    assert(GraftTable.pruneFilesByStats(t.log.current, Seq(EqualTo("cat", "mm"))).isEmpty)
    // answers stay exact
    assert(spark.sql("SELECT count(*) FROM graft.hp.pv WHERE cat = 'mm'")
      .collect()(0).getLong(0) == 0L)
    assert(spark.sql("SELECT count(*) FROM graft.hp.pv WHERE cat = 'zz'")
      .collect()(0).getLong(0) == 50L)
    // a high-cardinality column records NO set (bounded metadata)
    assert(all.forall(f => f.stats("id").values.forall(_.size <= 16)))
  }

  test("evalBucket: session-free bucket literal hash == the Spark column eval") {
    import graft.table.PartitionTransform
    import graft.table.PartitionTransform.{Bucket, IcebergBucket}
    import org.apache.spark.sql.types._
    def sparkForm(t: PartitionTransform, v: Any): String =
      spark.range(1).select(t.column(lit(v)).cast("string")).collect()(0).getString(0)
    def check(t: PartitionTransform, v: Any, dt: DataType): Unit = {
      val got = PartitionTransform.evalBucket(t, v, Some(dt))
      assert(got == Some(sparkForm(t, v)),
        s"evalBucket diverged for ${t.canonical} over $v ($dt): $got")
    }
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 40) {
      val n = 1 + rnd.nextInt(512)
      check(Bucket("s", n), rnd.nextString(1 + rnd.nextInt(12)), StringType)
      check(Bucket("l", n), rnd.nextLong(), LongType)
      check(Bucket("i", n), rnd.nextInt(), IntegerType)
      check(Bucket("b", n), rnd.nextBoolean(), BooleanType)
      check(Bucket("d", n),
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(rnd.nextInt(40000).toLong)),
        DateType)
      // v2 zone-free timestamp bucket: hash of unix_micros
      check(Bucket("ts", n, tsMicros = true),
        new java.sql.Timestamp(rnd.nextLong() % 4102444800000L), TimestampType)
      check(IcebergBucket("l", n), rnd.nextLong(), LongType)
      check(IcebergBucket("i", n), rnd.nextInt(), IntegerType)
      check(IcebergBucket("s", n), rnd.nextString(1 + rnd.nextInt(12)), StringType)
      check(IcebergBucket("d", n),
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(rnd.nextInt(40000).toLong)),
        DateType)
      check(IcebergBucket("ts", n),
        new java.sql.Timestamp(rnd.nextLong() % 4102444800000L), TimestampType)
    }
    // NO-CLAIM shapes: legacy v1 ts bucket (zone-dependent) and odd types
    import org.apache.spark.sql.types.{TimestampType => TsT}
    assert(PartitionTransform.evalBucket(Bucket("ts", 8),
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Some(TsT)).isEmpty)
    assert(PartitionTransform.evalBucket(Bucket("x", 8), 1.5d, Some(DoubleType)).isEmpty)
    assert(PartitionTransform.evalBucket(IcebergBucket("x", 8),
      new java.math.BigDecimal("1.50"), Some(DecimalType(10, 2))).isEmpty)
    // malformed bucket counts: no claim, never an ArithmeticException —
    // and the DDL parser refuses to mint one in the first place
    assert(PartitionTransform.evalBucket(Bucket("x", 0), "v", Some(StringType)).isEmpty)
    assert(PartitionTransform.evalBucket(IcebergBucket("x", 0), "v", Some(StringType)).isEmpty)
    intercept[IllegalArgumentException] {
      PartitionTransform.parse("bucket(0, s)", org.apache.spark.sql.types.StructType(
        Seq(org.apache.spark.sql.types.StructField("s", StringType))))
    }
  }

  test("partitions metadata table reports transform-valued partitions") {
    init()
    spark.sql("CREATE TABLE graft.hp.pm (id BIGINT, ts TIMESTAMP) PARTITIONED BY (days(ts))")
    noCoalesce { spark.sql("""INSERT INTO graft.hp.pm
      SELECT id, timestamp'2024-06-01 00:00:00' + make_interval(0,0,CAST(id AS INT),0,0,0,0)
      FROM range(4)""") }
    val rows = spark.sql("SELECT partition, total_rows FROM graft.hp.`pm$partitions`").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum == 4L)
  }
}
