package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import graft.table.{GraftRuntimeScan, GraftTable}

/** Join-time runtime file pruning (`spark.graft.runtime-filtering=true`):
  * eligible catalog reads plan as a DSv2 `BatchScanExec` over
  * [[GraftRuntimeScan]], and a broadcast star join hands the dimension's
  * surviving join keys back to the scan, which re-prunes the fact table's
  * file list before reading — the 100 TB star-join pattern no static filter
  * can express. Ineligible snapshots (MOR deletes, mixed schemas, bucketed
  * layout) and the default config keep the projection-aware path. */
class RuntimeFilteringSpec extends SparkSpec {
  import spark.implicits._

  private def wh = SparkSpec.warehouse

  private def withFlag[A](on: Boolean)(body: => A): A = {
    spark.conf.set("spark.graft.runtime-filtering", on.toString)
    try body finally spark.conf.unset("spark.graft.runtime-filtering")
  }

  private def finalPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  /** Every node, DESCENDING into AQE query stages (plain `collect` stops at
    * a QueryStageExec boundary — its materialized plan is a field, not a
    * child). */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val nested = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allNodes(q.plan)
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case _ => Seq.empty
    }
    (p +: p.children.flatMap(allNodes)) ++ nested
  }

  private def batchScans(p: SparkPlan): Seq[BatchScanExec] =
    allNodes(p).collect { case b: BatchScanExec => b }

  private def graftScans(p: SparkPlan): Seq[GraftRuntimeScan] =
    batchScans(p).map(_.scan).collect { case s: GraftRuntimeScan => s }

  private def setupStar(): (GraftTable, Int) = {
    spark.conf.set("spark.sql.catalog.graftrf", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftrf.warehouse", wh)
    // fact: 80k rows, k in [0, 8000), RANGE-clustered into 8 files with
    // disjoint k bounds — the layout file pruning bites on
    val fact = spark.range(80000)
      .select(($"id" % 8000).as("k"), ($"id" * 7 % 100).as("v"))
      .repartitionByRange(8, $"k")
    val t = GraftTable.create(spark, s"$wh/db/rf_fact", fact)
    // dim: 100 keys spread over [0, 8000); category "x" keeps 5 keys, all
    // inside the FIRST file's k range — a non-key predicate, so only the
    // join (not static pushdown) can prune the fact side
    val dim = spark.range(100)
      .select(($"id" * 80).as("k"),
        when($"id" < 5, "x").otherwise("y").as("cat"))
      .coalesce(1)
    GraftTable.create(spark, s"$wh/db/rf_dim", dim)
    (t, t.log.current.files.size)
  }

  test("broadcast star join runtime-prunes the fact table's files") {
    val (_, totalFiles) = setupStar()
    assert(totalFiles >= 8, s"fact not split: $totalFiles files")
    val expected = withFlag(on = false) {
      spark.sql("""SELECT f.k, f.v FROM graftrf.db.rf_fact f
                   JOIN graftrf.db.rf_dim d ON f.k = d.k
                   WHERE d.cat = 'x'""").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(expected.nonEmpty)
    withFlag(on = true) {
      val df = spark.sql("""SELECT f.k, f.v FROM graftrf.db.rf_fact f
                            JOIN graftrf.db.rf_dim d ON f.k = d.k
                            WHERE d.cat = 'x'""")
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, "runtime filtering changed the join result")
      val scans = graftScans(finalPlan(df))
      assert(scans.nonEmpty, s"no GraftRuntimeScan planned:\n${finalPlan(df)}")
      val factScan = scans.find(_.description().contains("rf_fact"))
        .getOrElse(fail("fact table not on the runtime-filterable path"))
      // the dimension's surviving keys all sit in one file's k range, so
      // the runtime IN-filter must have dropped most of the fact files
      assert(factScan.plannedFileCount < totalFiles,
        s"runtime filter never pruned: ${factScan.plannedFileCount}/$totalFiles files")
      // and the plan actually carries a runtime (dynamic-pruning) filter
      val withRuntime = batchScans(finalPlan(df)).filter(_.runtimeFilters.nonEmpty)
      assert(withRuntime.nonEmpty, s"no runtime filters in:\n${finalPlan(df)}")
    }
  }

  test("static pushdown still prunes files on the DSv2 batch path") {
    withFlag(on = true) {
      val df = spark.sql("SELECT k, v FROM graftrf.db.rf_fact WHERE k = 42")
      assert(df.collect().length == 10) // 80000/8000 rows per key
      val scans = graftScans(finalPlan(df))
      assert(scans.nonEmpty)
      assert(scans.head.plannedFileCount <= 2,
        s"static pruning missing: ${scans.head.plannedFileCount} files")
    }
  }

  test("MOR deletes make the snapshot ineligible: flag on falls back, reads stay exact") {
    val t = GraftTable.create(spark, s"$wh/db/rf_mor",
      spark.range(1000).select($"id".as("k"), lit(1L).as("v")),
      Map("write.delete.mode" -> "merge-on-read"))
    t.delete($"k" < 100L)
    assert(t.log.current.deleteFiles.nonEmpty, "expected a MOR positional delete")
    withFlag(on = true) {
      val df = spark.sql("SELECT count(*) FROM graftrf.db.rf_mor")
      assert(df.collect()(0).getLong(0) == 900L)
      assert(graftScans(finalPlan(df)).isEmpty,
        "MOR snapshot must not take the bare-parquet batch path")
    }
  }

  test("flag off (default) keeps the swapped vectorized plan") {
    val df = spark.sql("SELECT k, v FROM graftrf.db.rf_fact WHERE k = 42")
    assert(graftScans(finalPlan(df)).isEmpty)
    assert(finalPlan(df).toString.contains("FileScan parquet") ||
      df.queryExecution.executedPlan.toString.contains("FileScan parquet"))
  }

  test("Spark's bloom-filter runtime filter injects onto the swapped scan for shuffle joins") {
    // The row-level companion of the file-level pruning above: when the
    // star join must SHUFFLE (dim too big to broadcast — forced here), the
    // optimizer builds a bloom filter from the dim's selective side and
    // applies might_contain on the fact BEFORE the exchange, shrinking the
    // shuffle instead of the file list. Works through the native-scan swap
    // because the swapped relation is a plain stats-bearing parquet scan —
    // the 100 TB claim is that BOTH pruning layers compose with graft
    // tables, not just DPP-style file pruning.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "32",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    // rf_fact/rf_dim were created by the first test in this suite
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val q =
        """SELECT f.k, f.v, d.cat FROM graftrf.db.rf_fact f
          |JOIN graftrf.db.rf_dim d ON f.k = d.k WHERE d.cat = 'x'""".stripMargin
      val df = spark.sql(q)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected an injected bloom runtime filter in:\n$optimized")
      val rows = df.collect().map(_.toString).sorted.toSeq
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = spark.sql(q)
      assert(!plain.queryExecution.optimizedPlan.toString.contains("might_contain"))
      assert(plain.collect().map(_.toString).sorted.toSeq == rows,
        "bloom-filtered result diverged from the plain join")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
