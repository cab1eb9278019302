package graft

import java.sql.{Date, Timestamp}

/** Foreign-format ingestion: the reference stack's EMR Spark reads CSV /
  * JSON-lines / ORC sources routinely (any `spark.read` format, reference
  * `main.tf:761`); this engine ingests them the Spark-first way — the
  * built-in vectorized sources feeding a graft CTAS — so the proof is that
  * the full round trip (foreign file -> graft table -> typed query) is
  * value- and type-exact for each format, not a new code path. Parquet
  * additionally registers IN PLACE via `CALL import_parquet`
  * (GraftProceduresSpec); conversion is the right move for the rest: the
  * engine's scan/prune/stats machinery is parquet-shaped. */
class ForeignFormatIngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), name).toString

  private val rows = Seq(
    (1L, "alpha", 1.5, Date.valueOf("2024-01-02"), Timestamp.valueOf("2024-01-02 03:04:05"), true),
    (2L, "beta,with comma", -2.25, Date.valueOf("2024-06-30"), Timestamp.valueOf("2024-06-30 23:59:59"), false),
    (3L, null, 0.0, null, null, true))

  private def src() = rows.toDF("id", "tag", "v", "d", "ts", "flag")

  private def assertRoundTrip(table: String): Unit = {
    val back = spark.table(table).orderBy("id")
    assert(back.schema("id").dataType.typeName == "long")
    assert(back.schema("v").dataType.typeName == "double")
    assert(back.schema("ts").dataType.typeName == "timestamp")
    val got = back.collect().map(r =>
      (r.getLong(0), Option(r.get(1)), r.getDouble(2),
        Option(r.get(3)).map(_.toString), Option(r.get(4)).map(_.toString), r.getBoolean(5)))
    val want = rows.map(t =>
      (t._1, Option(t._2), t._3, Option(t._4).map(_.toString),
        Option(t._5).map(_.toString), t._6))
    assert(got.toSeq == want, s"round trip through $table diverged")
    // and the result is a REAL graft table: versioned, time-travelable
    val count = spark.sql(s"SELECT count(*) AS c FROM $table VERSION AS OF 1")
      .collect()(0).getLong(0)
    assert(count == rows.size)
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", SparkSpec.warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
  }

  test("CSV ingests through the built-in source + CTAS, types and nulls exact") {
    val dir = tmp("ing-csv")
    src().write.mode("overwrite").option("header", "true").csv(dir)
    // explicit schema: CSV carries none, and inference must not be the
    // thing correctness hangs on
    spark.read
      .schema("id BIGINT, tag STRING, v DOUBLE, d DATE, ts TIMESTAMP, flag BOOLEAN")
      .option("header", "true").csv(dir)
      .createOrReplaceTempView("csv_in")
    spark.sql("DROP TABLE IF EXISTS graft.db.ing_csv")
    spark.sql("CREATE TABLE graft.db.ing_csv AS SELECT * FROM csv_in")
    assertRoundTrip("graft.db.ing_csv")
  }

  test("JSON-lines ingests with an explicit schema, timestamps exact") {
    val dir = tmp("ing-json")
    src().write.mode("overwrite").json(dir)
    spark.read
      .schema("id BIGINT, tag STRING, v DOUBLE, d DATE, ts TIMESTAMP, flag BOOLEAN")
      .json(dir)
      .createOrReplaceTempView("json_in")
    spark.sql("DROP TABLE IF EXISTS graft.db.ing_json")
    spark.sql("CREATE TABLE graft.db.ing_json AS SELECT * FROM json_in")
    assertRoundTrip("graft.db.ing_json")
  }

  test("ORC ingests with its own embedded schema — no re-declaration needed") {
    val dir = tmp("ing-orc")
    src().write.mode("overwrite").orc(dir)
    spark.read.orc(dir).createOrReplaceTempView("orc_in")
    spark.sql("DROP TABLE IF EXISTS graft.db.ing_orc")
    spark.sql("CREATE TABLE graft.db.ing_orc AS SELECT * FROM orc_in")
    assertRoundTrip("graft.db.ing_orc")
  }
}
