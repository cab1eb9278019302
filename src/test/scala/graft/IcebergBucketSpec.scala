package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual}
import graft.functions.{IcebergBucket, IcebergMurmur3}
import graft.table.GraftTable

/** `iceberg_bucket(n, col)` — the Iceberg-SPEC murmur3 bucket transform.
  * The hash vectors below are the published reference values from the
  * Iceberg table spec (Appendix B, "32-bit Hash Requirements"); matching
  * them bit-for-bit is what makes the exported `bucket[N]` spec claim TRUE
  * for Trino/Spark foreign readers. */
class IcebergBucketSpec extends SparkSpec {
  import spark.implicits._

  test("murmur3 hash matches the Iceberg spec's published test vectors") {
    // int and long 34 — ints hash as widened longs (spec: int→long promotion
    // must not move buckets)
    assert(IcebergMurmur3.hashLong(34L) == 2017239379)
    // string "iceberg" over UTF-8 bytes
    assert(IcebergMurmur3.hashBytes("iceberg".getBytes("UTF-8")) == 1210000089)
    // decimal 14.20 over minimal big-endian two's-complement unscaled bytes
    assert(IcebergMurmur3.hashDecimal(
      org.apache.spark.sql.types.Decimal(new java.math.BigDecimal("14.20"))) == -500754589)
    // date 2017-11-16 = 17486 epoch days, hashed as long
    assert(java.time.LocalDate.of(2017, 11, 16).toEpochDay == 17486L)
    assert(IcebergMurmur3.hashLong(17486L) == -653330422)
    // timestamp 2017-11-16T22:31:08 UTC = 1510871468000000 epoch micros
    assert(IcebergMurmur3.hashLong(1510871468000000L) == -2047944441)
  }

  test("expression evaluates the spec bucket for every supported type, codegen == interpreted") {
    val df = Seq((34L, 34, "iceberg", java.sql.Date.valueOf("2017-11-16"),
      java.sql.Timestamp.from(java.time.Instant.parse("2017-11-16T22:31:08Z"))))
      .toDF("l", "i", "s", "d", "ts")
    def b(c: org.apache.spark.sql.Column) = IcebergBucket(c, 16)
    val tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try {
      val row = df.select(b($"l"), b($"i"), b($"s"), b($"d"), b($"ts")).collect()(0)
      def expect(h: Int) = (h & Int.MaxValue) % 16
      assert(row.getInt(0) == expect(2017239379))
      assert(row.getInt(1) == expect(2017239379)) // int buckets like the long
      assert(row.getInt(2) == expect(1210000089))
      assert(row.getInt(3) == expect(-653330422))
      assert(row.getInt(4) == expect(-2047944441))
      // interpreted path (eval) agrees with the codegen'd one
      val interp = df.select(b($"s")).queryExecution.executedPlan
        .executeCollect().map(_.getInt(0)).head
      assert(interp == expect(1210000089))
      // null-safe: null in, null out
      assert(df.select(b(lit(null).cast("string"))).collect()(0).isNullAt(0))
    } finally spark.conf.set("spark.sql.session.timeZone", tz)
  }

  test("iceberg_bucket is SQL-registered (system.bucket analogue)") {
    assert(spark.sql("SELECT iceberg_bucket(16, 34L)").collect()(0).getInt(0)
      == (2017239379 & Int.MaxValue) % 16)
    assert(spark.sql("SELECT iceberg_bucket(16, 'iceberg')").collect()(0).getInt(0)
      == (1210000089 & Int.MaxValue) % 16)
  }

  test("iceberg_bucket(4, id): writes cluster by spec bucket and equality prunes files") {
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "ibkt-").toString
    val df = spark.range(4000).select($"id", ($"id" % 100).cast("string").as("v"))
    val old = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val t = try GraftTable.create(spark, s"$dir/t", df,
      Map("write.partition-by" -> "iceberg_bucket(4,id)"))
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", old)
    val all = t.log.current.files
    assert(all.size >= 2, s"need multiple files, got ${all.size}")
    assert(all.forall(_.stats.contains("iceberg_bucket(4,id)")),
      "per-file spec-bucket bounds missing")
    val pruned = t.pruneFiles(t.log.current, Seq(EqualTo("id", 1234L)))
    assert(pruned.size < all.size, s"no pruning: ${pruned.size}/${all.size}")
    // the kept files' recorded bucket range must contain the literal's bucket
    val want = IcebergMurmur3.bucketOf(IcebergMurmur3.hashLong(1234L), 4)
    assert(pruned.forall { f =>
      val s = f.stats("iceberg_bucket(4,id)")
      s.min.toInt <= want && want <= s.max.toInt
    })
    // exactness through the filter, and ranges never mis-prune a hash bucket
    assert(t.read.filter($"id" === 1234L).count() == 1L)
    assert(t.pruneFiles(t.log.current, Seq(GreaterThanOrEqual("id", 0L))).size == all.size)
  }
}
