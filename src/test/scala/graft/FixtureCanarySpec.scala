package graft

import org.apache.spark.sql.functions._

/** Fixture-schema canary (VERDICT r10 #2): every testdata table's columns and
  * types are pinned by FixtureContract; a regenerated fixture with a new
  * vintage fails HERE with an explicit "fixture drift" message instead of
  * crashing 10 queries mid-round with cast errors. */
class FixtureCanarySpec extends SparkSpec {
  import spark.implicits._

  test("all sf0.001 fixture tables match the pinned schema contract") {
    val d = FixtureContract.drift(spark, sf)
    assert(d.isEmpty, d.mkString("\n"))
  }

  test("contract covers every table the loaders read (no unpinned fixture)") {
    val loaders = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    assert(FixtureContract.expected.keySet == loaders)
  }

  test("accepts both events.ts vintages (timestamp[us] and raw ns long)") {
    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "canary-ok-").toString
    // copy every table unchanged, then re-vintage events.ts as the old ns
    // long — the contract must stay clean for both shapes
    FixtureContract.expected.keys.foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet")
        .write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    }
    Tables.events(spark, sf)
      .withColumn("ts", (unix_micros($"ts") * 1000L).as("ts"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val d = FixtureContract.drift(spark, tmp)
    assert(d.isEmpty, d.mkString("\n"))
    // and the events loader still adapts the ns vintage to a usable timestamp
    assert(Tables.events(spark, tmp).schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("fails loudly on a drifted fixture: renamed column, new type, new column") {
    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "canary-drift-").toString
    FixtureContract.expected.keys.foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet")
        .write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    }
    // drift 1: events.ts becomes a string (a third, unseen vintage)
    spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", $"ts".cast("string"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    // drift 2: documents loses n_chars, gains n_bytes
    spark.read.parquet(s"$sf/documents.parquet")
      .withColumnRenamed("n_chars", "n_bytes")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val d = FixtureContract.drift(spark, tmp)
    assert(d.exists(m => m.contains("events.ts") && m.contains("string")),
      s"ts type drift not reported: $d")
    assert(d.exists(_.contains("documents.n_chars missing")), s"missing column not reported: $d")
    assert(d.exists(_.contains("documents.n_bytes unexpected")), s"new column not reported: $d")
    val ex = intercept[IllegalStateException](FixtureContract.assertClean(spark, tmp))
    assert(ex.getMessage.contains("fixture drift"))
  }
}
