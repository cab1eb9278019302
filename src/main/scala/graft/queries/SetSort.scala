package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** SURVEY.md §2.6: set operations (UNION ALL/DISTINCT, INTERSECT, EXCEPT ALL),
  * DISTINCT, multi-key ORDER BY with explicit null ordering, and LIMIT top-k.
  *
  * Scale notes: UNION ALL is a zero-shuffle concatenation; UNION/INTERSECT/
  * EXCEPT plan as aggregate / semi / anti joins on all columns (one shuffle).
  * ORDER BY+LIMIT plans as TakeOrderedAndProject — each partition keeps only
  * its local top-k, so the driver merges k×partitions rows, never the input.
  */
object SetSort {

  // ---------------------------------------------------------------- q26
  /** UNION ALL of two tagged selections (bag semantics, no dedup). */
  def q26(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = customer(spark, dir)
    val high = c.filter($"c_acctbal" >= 5000.0)
      .select($"c_custkey", $"c_acctbal", lit("high").as("bal_band"))
    val low = c.filter($"c_acctbal" < 1000.0)
      .select($"c_custkey", $"c_acctbal", lit("low").as("bal_band"))
    high.unionAll(low).orderBy($"c_custkey", $"bal_band")
  }

  val q26Sql: String =
    """SELECT c_custkey, c_acctbal, 'high' AS bal_band FROM customer WHERE c_acctbal >= 5000.0
      |UNION ALL
      |SELECT c_custkey, c_acctbal, 'low' AS bal_band FROM customer WHERE c_acctbal < 1000.0
      |ORDER BY c_custkey, bal_band""".stripMargin

  // ---------------------------------------------------------------- q27
  /** UNION DISTINCT: nation keys present on either side, deduplicated. */
  def q27(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fromCust = customer(spark, dir).select($"c_nationkey".as("nationkey"))
    val fromSupp = supplier(spark, dir).select($"s_nationkey".as("nationkey"))
    fromCust.union(fromSupp).distinct().orderBy($"nationkey")
  }

  val q27Sql: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |UNION
      |SELECT s_nationkey AS nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin

  // ---------------------------------------------------------------- q28
  /** INTERSECT (set semantics): BUILDING-segment customers ∩ big spenders. */
  def q28(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val building = customer(spark, dir).filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val bigSpenders = orders(spark, dir).filter($"o_totalprice" > 150000.0)
      .select($"o_custkey".as("c_custkey"))
    building.intersect(bigSpenders).orderBy($"c_custkey")
  }

  val q28Sql: String =
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |INTERSECT
      |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 150000.0
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q29
  /** EXCEPT ALL (bag semantics — multiplicity preserved): per-customer order
    * multiset of F-status minus O-status. */
  def q29(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val f = orders(spark, dir).filter($"o_orderstatus" === "F")
      .select($"o_custkey", $"o_orderpriority")
    val o = orders(spark, dir).filter($"o_orderstatus" === "O")
      .select($"o_custkey", $"o_orderpriority")
    f.exceptAll(o).orderBy($"o_custkey", $"o_orderpriority")
  }

  val q29Sql: String =
    """SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
      |EXCEPT ALL
      |SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'O'
      |ORDER BY o_custkey, o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q30
  /** Top-k: ORDER BY + LIMIT plans as TakeOrderedAndProject (per-partition
    * heap of k, no global sort — the 100 TB-correct top-k). */
  def q30(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(100)
  }

  val q30Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q31
  /** Multi-key sort with explicit NULLS LAST (Spark's default is NULLS FIRST
    * for ASC — the explicit ordering pins both engines to the same layout). */
  def q31(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    orders(spark, dir)
      .select(
        $"o_orderkey",
        nullif($"o_orderpriority", lit("1-URGENT")).as("prio_or_null"),
        $"o_totalprice")
      .orderBy($"prio_or_null".asc_nulls_last, $"o_orderkey")
      .limit(500)
  }

  val q31Sql: String =
    """SELECT o_orderkey, NULLIF(o_orderpriority, '1-URGENT') AS prio_or_null, o_totalprice
      |FROM orders
      |ORDER BY prio_or_null ASC NULLS LAST, o_orderkey
      |LIMIT 500""".stripMargin

  // ---------------------------------------------------------------- q32
  /** DISTINCT over a multi-column projection. */
  def q32(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    customer(spark, dir)
      .select($"c_mktsegment", $"c_nationkey")
      .distinct()
      .orderBy($"c_mktsegment", $"c_nationkey")
  }

  val q32Sql: String =
    """SELECT DISTINCT c_mktsegment, c_nationkey
      |FROM customer
      |ORDER BY c_mktsegment, c_nationkey""".stripMargin


  // ---------------------------------------------------------------- q80
  /** LIMIT + OFFSET pagination (SQL:2008 OFFSET, Spark 4 `Dataset.offset`):
    * plans as a global-limit(150) + local drop of the first 100 — Spark
    * fetches offset+limit rows total, never materializing the full sort;
    * deep pagination (huge offsets) would degrade, which is why keyset
    * pagination exists — this op covers the standard page-N surface. */
  def q80(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    orders(spark, dir)
      .select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderkey")
      .offset(100).limit(50)
  }

  val q80Sql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_orderkey LIMIT 50 OFFSET 100""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q26_setop_union_all"      -> q26,
    "q27_setop_union_distinct" -> q27,
    "q28_setop_intersect"      -> q28,
    "q29_setop_except_all"     -> q29,
    "q30_sort_topk"            -> q30,
    "q31_sort_nulls_last"      -> q31,
    "q32_distinct"             -> q32,
    "q80_limit_offset"         -> q80)

  val oracleSql: Map[String, String] = Map(
    "q26_setop_union_all"      -> q26Sql,
    "q27_setop_union_distinct" -> q27Sql,
    "q28_setop_intersect"      -> q28Sql,
    "q29_setop_except_all"     -> q29Sql,
    "q30_sort_topk"            -> q30Sql,
    "q31_sort_nulls_last"      -> q31Sql,
    "q32_distinct"             -> q32Sql,
    "q80_limit_offset"         -> q80Sql)
}
