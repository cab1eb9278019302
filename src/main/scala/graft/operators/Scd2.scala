package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.table.GraftTable

/** SLOWLY-CHANGING-DIMENSION TYPE 2 maintenance over a graft table — the
  * lakehouse pattern every reference-stack user runs for dimensions
  * (Kimball SCD2 on MERGE, the Databricks/Iceberg cookbook form): each
  * key's history is a chain of versioned rows `[scd_start_ts,
  * scd_end_ts)` with exactly one `scd_is_current` row per key; applying
  * a change CLOSES the current row and INSERTS the new version, as one
  * atomic MERGE commit.
  *
  * One MERGE cannot both update and insert for the same matched key, so
  * changes stage TWICE (the standard dual-row trick): a copy carrying
  * the real merge key (matches → closes the old version) and a copy with
  * a NULL merge key (never matches → inserts the new version; the insert
  * clause fires ONLY on null-merge-key rows so brand-new keys do not
  * double-insert). Unchanged keys never stage, so re-applying the same
  * batch is a no-op — idempotent ingestion.
  *
  * Scale shape: change detection is one key-equality join of the updates
  * against CURRENT rows only (the dimension's history never joins); the
  * merge rewrites only files containing touched keys (or positional
  * deletes under merge-on-read). Attribute comparison is null-safe. */
object Scd2 {

  val StartCol = "scd_start_ts"
  val EndCol = "scd_end_ts"
  val CurrentCol = "scd_is_current"

  /** CTAS the dimension from an initial batch: every row current from its
    * `tsCol` value, open-ended. */
  def initialize(spark: SparkSession, path: String, first: DataFrame,
      key: String, tsCol: String,
      props: Map[String, String] = Map.empty): GraftTable = {
    val attrs = attrCols(first, key, tsCol)
    GraftTable.create(spark, path,
      first.select((col(key) +: attrs.map(col)) :+
        col(tsCol).as(StartCol) :+
        lit(null).cast(first.schema(tsCol).dataType).as(EndCol) :+
        lit(true).as(CurrentCol): _*),
      props)
  }

  /** Apply a change batch: close + version changed keys, insert new keys,
    * ignore unchanged rows. `updates` must be one row per key (latest
    * state) with an effective-from timestamp in `tsCol`. */
  def applyChanges(dim: GraftTable, updates: DataFrame, key: String,
      tsCol: String): Unit = {
    val attrs = attrCols(updates, key, tsCol)
    val cur = dim.read.filter(col(CurrentCol))
      .select((col(key).as("__k") +: attrs.map(c => col(c).as(s"__cur_$c"))): _*)
    // changed = attr drift on an existing key (null-safe) OR a new key
    val joined = updates.join(cur, updates(key) === col("__k"), "left")
    val drift = attrs.map(c => !(col(c) <=> col(s"__cur_$c"))).reduceOption(_ || _)
      .getOrElse(lit(false))
    val changes = joined.filter(col("__k").isNull || drift)
      .select((col(key) +: attrs.map(col)) :+ col(tsCol): _*)
    // dual staging: real-key copy closes, null-key copy inserts
    val staged = changes.withColumn("__mk", col(key))
      .unionByName(changes.withColumn("__mk", lit(null).cast(
        changes.schema(key).dataType)))
    def t(n: String): Column = GraftTable.qref("t", n)
    def s(n: String): Column = GraftTable.qref("s", n)
    dim.merge(staged, t(key) === s("__mk") && t(CurrentCol))
      .whenMatchedUpdate(Map(
        EndCol -> s(tsCol),
        CurrentCol -> lit(false)))
      .whenNotMatchedInsert(
        (Seq(key -> s(key)) ++ attrs.map(c => c -> s(c)) ++ Seq(
          StartCol -> s(tsCol),
          EndCol -> lit(null).cast(updates.schema(tsCol).dataType),
          CurrentCol -> lit(true))).toMap,
        Some(s("__mk").isNull))
      .execute()
  }

  /** Point-in-time view of the dimension: the version of each key that
    * was current AS OF `ts` — `[start, end)` interval semantics. */
  def asOf(dim: GraftTable, ts: Column): DataFrame =
    dim.read.filter(col(StartCol) <= ts &&
      (col(EndCol).isNull || col(EndCol) > ts))

  private def attrCols(df: DataFrame, key: String, tsCol: String): Seq[String] =
    df.columns.toSeq.filterNot(c => c == key || c == tsCol ||
      Seq(StartCol, EndCol, CurrentCol).contains(c))
}
