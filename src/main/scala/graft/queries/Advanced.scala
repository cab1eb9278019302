package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** Advanced relational shapes beyond the §2 core rows: correlated scalar
  * subqueries (Catalyst decorrelates to an aggregate + join), UNPIVOT
  * (`stack` — the inverse of q55's PIVOT), and a salted skew-join whose
  * results are verified EQUAL to the plain join by the oracle
  * ([[graft.operators.Skew]]). */
object Advanced {

  // ---------------------------------------------------------------- q59
  /** Correlated scalar subquery: orders priced >1.5× their customer's
    * average. Catalyst decorrelates this into an aggregate joined back on
    * o_custkey — the shape that scales — rather than a per-row subquery.
    * avg goes through DECIMAL on both engines (order-independent). */
  def q59(spark: SparkSession, dir: String): DataFrame = {
    orders(spark, dir).createOrReplaceTempView("q59_orders")
    spark.sql("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM q59_orders o
      WHERE o_totalprice > (SELECT 1.5 * avg(CAST(o2.o_totalprice AS DECIMAL(18,2)))
                            FROM q59_orders o2
                            WHERE o2.o_custkey = o.o_custkey)
      ORDER BY o_orderkey""")
  }

  val q59Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders o
      |WHERE o_totalprice > (SELECT 1.5 * avg(CAST(o2.o_totalprice AS DECIMAL(18,2)))
      |                      FROM orders o2
      |                      WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q60
  /** UNPIVOT (wide → long, the inverse of q55's PIVOT): per-group status
    * counts computed wide, then `stack` explodes them to (status, cnt)
    * rows. Generate-shaped — no shuffle beyond the aggregation's own. */
  def q60(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    orders(spark, dir)
      .groupBy(($"o_custkey" % 10).as("grp"))
      .agg(
        count(when($"o_orderstatus" === "F", 1)).as("f_cnt"),
        count(when($"o_orderstatus" === "O", 1)).as("o_cnt"),
        count(when($"o_orderstatus" === "P", 1)).as("p_cnt"))
      .selectExpr("grp", "stack(3, 'F', f_cnt, 'O', o_cnt, 'P', p_cnt) AS (status, cnt)")
      .orderBy("grp", "status")
  }

  val q60Sql: String =
    """WITH wide AS (
      |  SELECT o_custkey % 10 AS grp,
      |    COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
      |    COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
      |    COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
      |  FROM orders GROUP BY 1)
      |SELECT grp, status, cnt FROM (
      |  SELECT grp, 'F' AS status, f_cnt AS cnt FROM wide
      |  UNION ALL SELECT grp, 'O', o_cnt FROM wide
      |  UNION ALL SELECT grp, 'P', p_cnt FROM wide)
      |ORDER BY grp, status""".stripMargin

  // ---------------------------------------------------------------- q61
  /** Salted skew-join: lineitem ⋈ part through [[graft.operators.Skew]]
    * with 8 salts, then a brand rollup. The oracle runs the PLAIN join —
    * proving the salt never changes results, only the shuffle layout. */
  def q61(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = lineitem(spark, dir).select($"l_partkey", $"l_quantity")
    val p = part(spark, dir).select($"p_partkey".as("l_partkey"), $"p_brand")
    graft.operators.Skew.saltedJoin(li, p, "l_partkey", salts = 8)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_items"),
        sum($"l_quantity".cast(DecimalType(18, 2))).cast("double").as("sum_qty"))
      .orderBy($"p_brand")
  }

  val q61Sql: String =
    """SELECT p_brand,
      |  COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q59_scalar_subquery" -> q59,
    "q60_unpivot"         -> q60,
    "q61_salted_join"     -> q61)

  val oracleSql: Map[String, String] = Map(
    "q59_scalar_subquery" -> q59Sql,
    "q60_unpivot"         -> q60Sql,
    "q61_salted_join"     -> q61Sql)
}
