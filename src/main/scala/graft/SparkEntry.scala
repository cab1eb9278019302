package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Advanced, Aggregates, Curation, Dedup, Functions, Pipeline, Relational, Sampling, SetSort, Similarity, Temporal, TextAnalysis, TpchStyle, Windows}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates one named query per implemented operator (SURVEY.md §2) from the
  * per-area modules in `graft.queries`, plus the DuckDB oracle SQL for each
  * (column names aliased identically on both sides — the driver hash-compares).
  */
object SparkEntry {

  // def, not val: TextAnalysis.oracleSql late-binds the q105 entry to the
  // model the verify run actually trained (rendered after queries run)
  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracleSql),
      (Aggregates.queries, Aggregates.oracleSql),
      (Windows.queries, Windows.oracleSql),
      (SetSort.queries, SetSort.oracleSql),
      (Functions.queries, Functions.oracleSql),
      (Dedup.queries, Dedup.oracleSql),
      (Similarity.queries, Similarity.oracleSql),
      (TextAnalysis.queries, TextAnalysis.oracleSql),
      (Temporal.queries, Temporal.oracleSql),
      (Sampling.queries, Sampling.oracleSql),
      (Advanced.queries, Advanced.oracleSql),
      (Pipeline.queries, Pipeline.oracleSql),
      (Curation.queries, Curation.oracleSql),
      (TpchStyle.queries, TpchStyle.oracleSql))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.flatMap(_._2).toMap

  /** Release per-query SCRATCH state — cached plans (q41/q43/q45 reuse an
    * intermediate across a self-join) and localCheckpoint blocks (q62/q100/
    * q119 truncate iterative lineage; the final checkpoint backs the
    * returned DataFrame, so the query itself cannot release it). Runners
    * call this BETWEEN queries, after the result is consumed — otherwise a
    * session executing the whole suite accretes executor storage across
    * queries (VERDICT r12 #7). BenchHygieneSpec pins both that this sweep
    * leaves nothing behind and that only a known allowlist of queries
    * parks scratch at all. */
  def releaseScratch(spark: SparkSession): Unit = {
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }
}
