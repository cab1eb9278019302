package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (see FIXTURES.md).
  *
  * The reference stack reads snapshot-versioned Iceberg/Parquet tables through a
  * catalog (reference `main.tf:794-802`); phase A of this engine reads the same
  * columnar Parquet layout directly through Spark's vectorized reader, which
  * preserves the two properties that matter at 100 TB: column pruning and
  * predicate pushdown into the scan (SURVEY.md §4).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet timestamp[ns], which Spark 4 rejects outright
    * (PARQUET_TYPE_ILLEGAL). Read it as a raw long (nanos since epoch) and
    * truncate to a microsecond TimestampType — the same truncation DuckDB
    * applies when it maps parquet ns to its µs TIMESTAMP, so both engines
    * see identical values. Integer `div` (not `/`) — ns values ~1.7e18
    * exceed exact double range. */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
