package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.table.GraftTable

/** Storage-co-located joins via `write.bucket-by` (Spark-native bucketing:
  * murmur3-partitioned writes + `_NNNNN` bucket files → the scan reports
  * HashPartitioning, so joins/aggs on the bucket key skip their exchange —
  * at 100 TB that deletes the dominant shuffle of every fact-fact join on
  * a shared key). */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(Paths.get("target"), prefix).resolve("t").toString

  private val props = Map("write.bucket-by" -> "4,id")

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange (hash|range)partitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size

  test("co-bucketed tables join with ZERO exchanges and exact results") {
    val a = GraftTable.create(spark, tmp("bk-a-"),
      spark.range(0, 1000).toDF("id").withColumn("va", $"id" * 2), props)
    val b = GraftTable.create(spark, tmp("bk-b-"),
      spark.range(500, 1500).toDF("id").withColumn("vb", $"id" * 3), props)
    val joined = a.read.join(b.read, "id")
    assert(exchanges(joined) == 0,
      s"bucketed join still shuffles:\n${joined.queryExecution.executedPlan}")
    val rows = joined.collect()
    assert(rows.length == 500)
    rows.foreach(r => assert(r.getLong(1) == r.getLong(0) * 2 &&
      r.getLong(2) == r.getLong(0) * 3))
  }

  test("groupBy on the bucket key aggregates without an exchange") {
    val t = GraftTable.create(spark, tmp("bk-g-"),
      spark.range(0, 400).toDF("id").withColumn("v", lit(1L)), props)
    val agg = t.read.groupBy($"id").agg(sum($"v").as("s"))
    assert(exchanges(agg) == 0,
      s"bucketed agg still shuffles:\n${agg.queryExecution.executedPlan}")
    assert(agg.count() == 400)
  }

  test("appends keep the bucketed layout (same hash, same bucket files)") {
    val path = tmp("bk-app-")
    val t = GraftTable.create(spark, path,
      spark.range(0, 100).toDF("id").withColumn("v", $"id"), props)
    t.append(spark.range(100, 200).toDF("id").withColumn("v", $"id"))
    val reread = GraftTable.load(spark, path)
    assert(reread.read.count() == 200)
    val self = reread.read.as("x").join(reread.read.as("y"), "id")
    assert(exchanges(self) == 0, "bucketed self-join after append shuffles")
    // every data file carries the bucket suffix
    assert(reread.log.current.files.forall(f =>
      GraftTable.BucketSuffix.matcher(f.path).matches()))
  }

  test("SQL catalog tables inherit the co-located layout end-to-end") {
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", SparkSpec.warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.bk")
    spark.sql("CREATE TABLE graft.bk.fa (id BIGINT, va BIGINT) " +
      "TBLPROPERTIES ('write.bucket-by'='4,id')")
    spark.sql("CREATE TABLE graft.bk.fb (id BIGINT, vb BIGINT) " +
      "TBLPROPERTIES ('write.bucket-by'='4,id')")
    spark.sql("INSERT INTO graft.bk.fa SELECT id, id * 2 FROM range(300)")
    spark.sql("INSERT INTO graft.bk.fb SELECT id, id * 3 FROM range(100, 400)")
    val j = spark.sql(
      "SELECT a.id, va, vb FROM graft.bk.fa a JOIN graft.bk.fb b ON a.id = b.id")
    assert(j.count() == 200)
    assert(exchanges(j) == 0,
      s"SQL bucketed join still shuffles:\n${j.queryExecution.executedPlan}")
  }

  test("COMPOSITE bucket key: join on both key columns plans zero exchanges") {
    val cprops = Map("write.bucket-by" -> "4,k1,k2")
    val a = GraftTable.create(spark, tmp("bk-c-a-"),
      spark.range(0, 600).select(($"id" % 20).as("k1"), ($"id" % 7).as("k2"),
        $"id".as("va")), cprops)
    val b = GraftTable.create(spark, tmp("bk-c-b-"),
      spark.range(0, 600).select(($"id" % 20).as("k1"), ($"id" % 7).as("k2"),
        ($"id" * 2).as("vb")), cprops)
    val joined = a.read.as("x").join(b.read.as("y"), Seq("k1", "k2"))
    assert(exchanges(joined) == 0,
      s"composite-bucketed join still shuffles:\n${joined.queryExecution.executedPlan}")
    // exact vs the unbucketed equivalent
    val plainA = spark.range(0, 600).select(($"id" % 20).as("k1"), ($"id" % 7).as("k2"), $"id".as("va"))
    val plainB = spark.range(0, 600).select(($"id" % 20).as("k1"), ($"id" % 7).as("k2"), ($"id" * 2).as("vb"))
    assert(joined.count() == plainA.join(plainB, Seq("k1", "k2")).count())
    // a join on only HALF the composite key must still shuffle (the layout
    // is hashed on both columns — partial-key co-location would be wrong)
    val half = a.read.groupBy($"k1").count()
    assert(exchanges(half) > 0, "partial-key agg wrongly claimed co-location")
  }

  test("MOR deletes and schema evolution fall back to the general path, correctly") {
    val path = tmp("bk-fb-")
    val t = GraftTable.create(spark, path,
      spark.range(0, 100).toDF("id").withColumn("v", $"id"),
      props + ("write.delete.mode" -> "merge-on-read"))
    t.delete($"id" < 10)
    val afterDel = GraftTable.load(spark, path).read
    assert(afterDel.count() == 90) // correctness beats co-location
    // schema evolution: files from two schema ids → general path, still exact
    val path2 = tmp("bk-ev-")
    val t2 = GraftTable.create(spark, path2,
      spark.range(0, 50).toDF("id").withColumn("v", $"id"), props)
    t2.addColumn("extra", org.apache.spark.sql.types.StringType)
    GraftTable.load(spark, path2)
      .append(Seq((999L, 999L, "x")).toDF("id", "v", "extra"))
    val evolved = GraftTable.load(spark, path2).read
    assert(evolved.count() == 51)
    assert(evolved.filter($"extra".isNotNull).count() == 1)
  }
}
