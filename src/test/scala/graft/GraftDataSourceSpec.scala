package graft

import org.apache.spark.sql.functions._
import graft.table.GraftTable

/** Path-based `format("graft")` reads/writes (sources/GraftDataSource):
  * head reads, time travel and branch options, appends and overwrites
  * through the same DSv2 table the catalog serves. */
class GraftDataSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory(java.nio.file.Paths.get("target"), "gds-")
    .resolve("t").toString

  test("load(path) reads the head; versionAsOf/timestampAsOf/branch options work") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val ts1 = t.log.current.timestampMs
    t.append(Seq((3L, "c")).toDF("id", "v"))
    t.createBranch("dev")
    t.appendToBranch("dev", Seq((9L, "z")).toDF("id", "v"))

    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select($"id").collect().map(_.getLong(0)).toSet
    assert(ids(spark.read.format("graft").load(dir)) == Set(1L, 2L, 3L))
    assert(ids(spark.read.format("graft").option("versionAsOf", 0).load(dir))
      == Set(1L, 2L))
    assert(ids(spark.read.format("graft").option("timestampAsOf", ts1).load(dir))
      == Set(1L, 2L))
    assert(ids(spark.read.format("graft").option("branch", "dev").load(dir))
      == Set(1L, 2L, 3L, 9L))
    // filters push into the same vectorized scan the catalog serves
    assert(ids(spark.read.format("graft").load(dir).filter($"id" > 1L))
      == Set(2L, 3L))
  }

  test("write.format(graft) appends and overwrites an existing table") {
    val dir = tmp()
    GraftTable.create(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    Seq((2L, "b")).toDF("id", "v")
      .write.format("graft").mode("append").save(dir)
    assert(spark.read.format("graft").load(dir).count() == 2)
    Seq((7L, "x")).toDF("id", "v")
      .write.format("graft").mode("overwrite").save(dir)
    assert(spark.read.format("graft").load(dir)
      .select($"id").collect().map(_.getLong(0)).toSet == Set(7L))
    // the write went through the snapshot log: history is intact
    val t = GraftTable.load(spark, dir)
    assert(t.log.currentVersion == 2L)
    assert(t.readVersion(1L).count() == 2)
  }

  test("missing path and missing table fail with clear errors") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft").load()
    }
    assert(e.getMessage.contains("needs a path"))
    assertThrows[Exception] {
      spark.read.format("graft").load(tmp() + "/nope")
    }
  }
}
