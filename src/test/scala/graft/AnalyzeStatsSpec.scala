package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.connector.read.{SupportsPushDownFilters, SupportsReportStatistics}
import graft.catalog.GraftDsv2Table
import graft.table.GraftTable

/** ANALYZE (`computeColumnStats`) + DSv2 per-column statistics: distinct
  * counts from the recorded NDV sketch, null counts and exact-numeric
  * min/max merged from the per-file manifest bounds — all metadata-only at
  * plan time (the Iceberg Puffin-stats analogue feeding Spark's CBO). */
class AnalyzeStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String = java.nio.file.Files
    .createTempDirectory(java.nio.file.Paths.get("target"), "analyze-").resolve("t").toString

  private def columnStatsOf(t: GraftTable, filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty) = {
    val builder = GraftDsv2Table(t, "t").newScanBuilder(CaseInsensitiveStringMap.empty())
    builder.asInstanceOf[SupportsPushDownFilters].pushFilters(filters)
    val stats = builder.build().asInstanceOf[SupportsReportStatistics].estimateStatistics()
    import scala.jdk.CollectionConverters._
    stats.columnStats().asScala.map { case (k, v) => k.fieldNames().mkString(".") -> v }.toMap
  }

  test("analyze records per-column NDV properties in a metadata-only commit") {
    val t = GraftTable.create(spark, tmpDir(),
      (1L to 200L).map(i => (i, i % 10, s"s${i % 7}")).toDF("id", "grp", "tag"))
    val filesBefore = t.log.current.files.map(_.path).toSet
    t.computeColumnStats()
    val s = t.log.current
    assert(s.operation == "analyze")
    assert(s.files.map(_.path).toSet == filesBefore, "analyze touched data files")
    // HLL is approximate — accept 10% error around the true cardinalities
    def ndv(c: String) = s.properties(s"stats.ndv.$c").toLong
    assert(math.abs(ndv("id") - 200L) <= 20, s"ndv(id)=${ndv("id")}")
    assert(math.abs(ndv("grp") - 10L) <= 2, s"ndv(grp)=${ndv("grp")}")
    assert(math.abs(ndv("tag") - 7L) <= 2, s"ndv(tag)=${ndv("tag")}")
  }

  test("DSv2 column statistics report NDV, null counts, and merged min/max") {
    val t = GraftTable.create(spark, tmpDir(),
      (1L to 100L).map(i => (i, if (i % 4 == 0) None else Some(i * 2.0))).toDF("id", "v"))
    t.append((101L to 150L).map(i => (i, Some(i * 2.0))).toDF("id", "v"))
    t.computeColumnStats()
    val cs = columnStatsOf(t)
    assert(cs.contains("id") && cs.contains("v"), s"missing columns in $cs")
    assert(cs("id").nullCount().getAsLong == 0L)
    assert(cs("v").nullCount().getAsLong == 25L, "null count must merge across files")
    assert(cs("id").min().get() == java.lang.Long.valueOf(1L))
    assert(cs("id").max().get() == java.lang.Long.valueOf(150L), "max must merge across appends")
    assert(cs("v").max().get() == java.lang.Double.valueOf(300.0))
    val ndvId = cs("id").distinctCount().getAsLong
    assert(math.abs(ndvId - 150L) <= 15, s"ndv(id)=$ndvId")
  }

  test("column statistics follow file pruning: filtered scans report filtered bounds") {
    // two files with disjoint id ranges; a filter that prunes one of them
    val t = GraftTable.create(spark, tmpDir(), (1L to 50L).map(i => (i, i * 1.0)).toDF("id", "v"))
    t.append((1000L to 1050L).map(i => (i, i * 1.0)).toDF("id", "v"))
    import org.apache.spark.sql.sources.LessThan
    val cs = columnStatsOf(t, Array(LessThan("id", 100L)))
    assert(cs("id").max().get() == java.lang.Long.valueOf(50L),
      "pruned file's bounds leaked into the column statistics")
  }

  test("CALL analyze_table runs the NDV pass through the procedure surface") {
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", SparkSpec.warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("CREATE TABLE graft.db.an (id BIGINT, tag STRING)")
    spark.sql("INSERT INTO graft.db.an SELECT id, concat('t', id % 5) FROM range(100)")
    spark.sql("CALL graft.system.analyze_table('db.an')")
    val t = GraftTable.load(spark, s"${SparkSpec.warehouse}/db/an")
    assert(t.log.current.properties.contains("stats.ndv.id"))
    assert(math.abs(t.log.current.properties("stats.ndv.tag").toLong - 5L) <= 1)
  }

  test("the CBO consumes analyzed NDVs: an equality filter's estimate flips the join to broadcast") {
    // The end-to-end proof that ANALYZE's stats.ndv.* properties change
    // PLANS, not just get reported: with cost-based optimization on, an
    // equality filter over a low-cardinality column estimates 1/ndv
    // selectivity — but ONLY once ANALYZE has recorded the column's
    // distinct count. Same query, same data, same thresholds: un-analyzed
    // the filtered dimension still looks bigger than the broadcast
    // threshold (no column stats -> no selectivity -> child-size
    // passthrough) and the join shuffles; analyzed, the 1/ndv estimate
    // drops it under the threshold and the planner broadcasts.
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", SparkSpec.warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.cbo_dim")
    spark.sql("DROP TABLE IF EXISTS graft.db.cbo_fact")
    spark.sql("CREATE TABLE graft.db.cbo_dim (k BIGINT, grp BIGINT, pad STRING)")
    // incompressible payload so the manifest byte size tracks the row count
    spark.sql(
      """INSERT INTO graft.db.cbo_dim
        |SELECT id AS k, id % 10 AS grp, sha2(cast(id AS STRING), 512) AS pad
        |FROM range(20000)""".stripMargin)
    spark.sql("CREATE TABLE graft.db.cbo_fact (k BIGINT, v DOUBLE)")
    spark.sql(
      """INSERT INTO graft.db.cbo_fact
        |SELECT id % 20000 AS k, id * 1.0 AS v FROM range(200000)""".stripMargin)

    val query =
      """SELECT f.k, f.v, d.pad FROM graft.db.cbo_fact f
        |JOIN graft.db.cbo_dim d ON f.k = d.k
        |WHERE d.grp = 3""".stripMargin
    def joins: String = spark.sql(query).queryExecution.sparkPlan.toString

    val prior = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.planStats.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.planStats.enabled", "true")
      // CBO row-size arithmetic: the dim join side projects (k, pad) —
      // ~36 B/row estimated (8 overhead + 8 long + 20 default string). At
      // 20k rows the un-analyzed estimate is ~720 KB; the analyzed 1/10
      // equality estimate is ~72 KB. 200 KB sits between with >3x margin.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "200000")

      assert(!joins.contains("BroadcastHashJoin"),
        s"un-analyzed dim must NOT broadcast (no NDV, no selectivity):\n$joins")

      spark.sql("CALL graft.system.analyze_table('db.cbo_dim')")
      spark.sql("REFRESH TABLE graft.db.cbo_dim")
      assert(joins.contains("BroadcastHashJoin"),
        s"analyzed dim must broadcast (ndv(grp)=10 -> 1/10 selectivity):\n$joins")
    } finally {
      prior.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      spark.sql("DROP TABLE graft.db.cbo_dim")
      spark.sql("DROP TABLE graft.db.cbo_fact")
    }
  }

  test("ANALYZE histograms drive RANGE selectivity: skewed tail filter flips to broadcast") {
    // NDV can price equality; only a HISTOGRAM can price a range over a
    // SKEWED column. dim.sk: 99% of rows in [0, 10], a 1% tail spread to
    // 1e6. Filter sk > 500000: uniform min/max interpolation says ~50%
    // (shuffle); the analyzed equi-height histogram knows only the last
    // bins reach the tail (~3%, broadcast). min/max exist BEFORE analyze
    // (manifest bounds), so the flip isolates histogram consumption.
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", SparkSpec.warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    Seq("cbo_h_fact", "cbo_h_dim").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS graft.db.$t"))
    spark.sql("CREATE TABLE graft.db.cbo_h_dim (k BIGINT, sk BIGINT, pad STRING)")
    spark.sql(
      """INSERT INTO graft.db.cbo_h_dim
        |SELECT id AS k,
        |       CASE WHEN id % 100 = 0 THEN 1000 + (id % 200) * 5000 ELSE id % 10 END AS sk,
        |       sha2(cast(id AS STRING), 512) AS pad
        |FROM range(20000)""".stripMargin)
    spark.sql("CREATE TABLE graft.db.cbo_h_fact (k BIGINT, v DOUBLE)")
    spark.sql(
      """INSERT INTO graft.db.cbo_h_fact
        |SELECT id % 20000 AS k, id * 1.0 AS v FROM range(200000)""".stripMargin)

    val query =
      """SELECT f.k, f.v, d.pad FROM graft.db.cbo_h_fact f
        |JOIN graft.db.cbo_h_dim d ON f.k = d.k
        |WHERE d.sk > 500000""".stripMargin
    def joins: String = spark.sql(query).queryExecution.sparkPlan.toString

    val prior = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.planStats.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.planStats.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "200000")
      assert(!joins.contains("BroadcastHashJoin"),
        s"pre-analyze: uniform min/max interpolation (~50%) must NOT broadcast:\n$joins")
      spark.sql("CALL graft.system.analyze_table('db.cbo_h_dim')")
      spark.sql("REFRESH TABLE graft.db.cbo_h_dim")
      // the analyzed snapshot carries the quantile endpoints
      val t = graft.table.GraftTable.load(spark, s"${SparkSpec.warehouse}/db/cbo_h_dim")
      val hist = t.log.current.properties("stats.hist.sk").split(",").map(_.toDouble)
      assert(hist.length == 33 && hist.head <= hist.last)
      assert(hist(16) <= 10.0, s"median endpoint must sit in the body: ${hist(16)}")
      assert(joins.contains("BroadcastHashJoin"),
        s"analyzed: histogram tail selectivity must broadcast:\n$joins")
    } finally {
      prior.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      Seq("cbo_h_fact", "cbo_h_dim").foreach(t => spark.sql(s"DROP TABLE graft.db.$t"))
    }
  }

  test("the CBO reorders the JOIN TREE from analyzed NDVs, not just the strategy") {
    // At 100x scale join ORDER, not just broadcast-vs-shuffle, is what
    // statistics buy: the DP reorderer should push the most selective
    // dimension join to the bottom of the tree. Same query, same data:
    // un-analyzed, the filter over d2.grp has no selectivity estimate, so
    // the syntactic order (f ⋈ d1 first) stands; analyzed, the 1/ndv
    // estimate shrinks filtered-d2 20x and the DP plan joins f ⋈ d2 first.
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", SparkSpec.warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    Seq("cbo_r_fact", "cbo_r_d1", "cbo_r_d2").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS graft.db.$t"))
    spark.sql("CREATE TABLE graft.db.cbo_r_d1 (k BIGINT, pad STRING)")
    spark.sql(
      """INSERT INTO graft.db.cbo_r_d1
        |SELECT id AS k, sha2(cast(id AS STRING), 512) AS pad FROM range(10000)""".stripMargin)
    spark.sql("CREATE TABLE graft.db.cbo_r_d2 (k BIGINT, grp BIGINT, pad STRING)")
    spark.sql(
      """INSERT INTO graft.db.cbo_r_d2
        |SELECT id AS k, id % 20 AS grp, sha2(cast(id AS STRING), 512) AS pad
        |FROM range(20000)""".stripMargin)
    spark.sql("CREATE TABLE graft.db.cbo_r_fact (k1 BIGINT, k2 BIGINT, v DOUBLE)")
    spark.sql(
      """INSERT INTO graft.db.cbo_r_fact
        |SELECT id % 10000 AS k1, id % 20000 AS k2, id * 1.0 AS v
        |FROM range(200000)""".stripMargin)

    val query =
      """SELECT f.v, d1.pad, d2.pad FROM graft.db.cbo_r_fact f
        |JOIN graft.db.cbo_r_d1 d1 ON f.k1 = d1.k
        |JOIN graft.db.cbo_r_d2 d2 ON f.k2 = d2.k
        |WHERE d2.grp = 7""".stripMargin
    // the dimension joined at the BOTTOM of the optimized join tree: the
    // Join node none of whose children contain another Join
    def bottomDim: String = {
      val plan = spark.sql(query).queryExecution.optimizedPlan
      val bottom = plan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
            if !j.children.exists(_.exists(
              _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Join])) => j
      }.head
      val leaves = bottom.collectLeaves().mkString(";")
      if (leaves.contains("cbo_r_d2")) "d2"
      else if (leaves.contains("cbo_r_d1")) "d1"
      else s"?:$leaves"
    }

    val prior = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.planStats.enabled",
      "spark.sql.cbo.joinReorder.enabled").map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.planStats.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")

      assert(bottomDim == "d1",
        s"un-analyzed: syntactic order must stand (f JOIN d1 at the bottom)")

      spark.sql("CALL graft.system.analyze_table('db.cbo_r_d2')")
      spark.sql("CALL graft.system.analyze_table('db.cbo_r_d1')")
      spark.sql("CALL graft.system.analyze_table('db.cbo_r_fact')")
      Seq("cbo_r_fact", "cbo_r_d1", "cbo_r_d2").foreach(t =>
        spark.sql(s"REFRESH TABLE graft.db.$t"))
      assert(bottomDim == "d2",
        "analyzed: the DP reorderer must join the selective dimension first")
    } finally {
      prior.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      Seq("cbo_r_fact", "cbo_r_d1", "cbo_r_d2").foreach(t =>
        spark.sql(s"DROP TABLE graft.db.$t"))
    }
  }
}
