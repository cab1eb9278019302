package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** TPC-H-STYLE analytical suite (q134–q154): all 22 classic multi-join
  * decision-support shapes — Q1 is the flagship `q01_pricing_summary`, the
  * other 21 live here — adapted to the fixture star schema (no `partsupp`,
  * no comment/date-pair columns; the query SHAPES are faithful, the
  * predicates use the fixture domains; where a shape needs `partsupp`, the
  * part↔supplier relation is DERIVED from lineitem — the same distinct
  * pairs a real partsupp would key).
  * This is the "a reference user could run their reporting queries"
  * claim made concrete: every query is a DuckDB-oracled hash-exact row.
  *
  * Plan discipline carried over from q01–q12: every revenue term folds to
  * DECIMAL before summing (order-independent exact integers — see
  * `discPrice`), dimension joins broadcast, selective filters sit in scans
  * as pushed predicates, and every LIMIT rides a full ORDER BY with a key
  * tiebreaker so top-k is deterministic (TakeOrderedAndProject, no global
  * sort). */
object TpchStyle {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  private def msum(c: Column): Column = sum(dec2(c)).cast("double")
  private def discPrice(price: Column, disc: Column): Column =
    price.cast(DecimalType(12, 2)) * (lit(1.0) - disc).cast(DecimalType(4, 2))
  private def revenue(): Column =
    sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double")

  private val discSql = "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))"

  // r18 NOTE on spreadIfNarrow (guide §2.5): with every dimension
  // broadcast, the whole join chain + partial aggregation pipelines into
  // the FACT scan stage — one task on a single-row-group input. The
  // conditional spread was MEASURED on all 21 queries here and kept only
  // where it paid: fact-wide AGGREGATION work (q142/q143/q147 — the
  // per-row decimal/distinct aggregation is what parallelizes profitably;
  // spread key chosen so the grouping CONTAINS it and the repartition is
  // reused by the aggregate, no extra exchange). For the pure broadcast-
  // probe chains (q134/q135/q137/q138/q139/q144/q148/q149/q150/q151/q153/
  // q154) the extra exchange cost more than the parallelized probes won
  // (batch-measured +7% total), and q152's distinct-aggregate was neutral
  // (within-session A/B 1.04 vs 1.03 s) — left on the single-task scan on
  // purpose.
  // At production split counts every spread no-ops.

  // ------------------------------------------------------------- q134 (Q3)
  /** Shipping priority: top unshipped orders by revenue for one market
    * segment. lineitem⋈orders⋈customer with both date filters pushed to
    * the scans; broadcast customer side; top-10 by (revenue, orderkey). */
  def q134(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = customer(spark, dir).filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val o = orders(spark, dir)
      .filter($"o_orderdate" < lit("1998-03-15").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val l = lineitem(spark, dir)
      .filter($"l_shipdate" > lit("1998-03-15").cast("timestamp"))
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(revenue().as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  val q134Sql: String =
    s"""SELECT l.l_orderkey, o.o_orderdate, CAST(SUM($discSql) AS DOUBLE) AS revenue
       |FROM lineitem l
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |WHERE c.c_mktsegment = 'BUILDING'
       |  AND o.o_orderdate < TIMESTAMP '1998-03-15'
       |  AND l.l_shipdate > TIMESTAMP '1998-03-15'
       |GROUP BY l.l_orderkey, o.o_orderdate
       |ORDER BY revenue DESC, l.l_orderkey
       |LIMIT 10""".stripMargin

  // ------------------------------------------------------------- q135 (Q5)
  /** Local supplier volume: revenue per nation where the customer and the
    * supplier share the nation, one region, one year. The classic 6-table
    * snowflake — nation/region broadcast, the c↔s nation equality rides
    * the join condition. */
  def q135(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val r = region(spark, dir).filter($"r_name" === "ASIA")
    val n = nation(spark, dir)
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val o = orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
    val c = customer(spark, dir).select($"c_custkey", $"c_nationkey")
    val s = supplier(spark, dir).select($"s_suppkey", $"s_nationkey")
    lineitem(spark, dir)
      .join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .join(broadcast(s),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(revenue().as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  val q135Sql: String =
    s"""SELECT n.n_name, CAST(SUM($discSql) AS DOUBLE) AS revenue
       |FROM lineitem l
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
       |JOIN nation n ON s.s_nationkey = n.n_nationkey
       |JOIN region r ON n.n_regionkey = r.r_regionkey
       |WHERE r.r_name = 'ASIA'
       |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
       |GROUP BY n.n_name
       |ORDER BY revenue DESC, n.n_name""".stripMargin

  // ------------------------------------------------------------- q136 (Q6)
  /** Forecast-revenue change: a pure scan-side aggregate — every predicate
    * pushes into the parquet scan, the whole plan is one codegen'd pass. */
  def q136(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
        $"l_discount".between(0.03, 0.07) && $"l_quantity" < 24)
      .agg(sum($"l_extendedprice".cast(DecimalType(12, 2)) *
        $"l_discount".cast(DecimalType(4, 2))).cast("double").as("revenue"),
        count(lit(1)).as("n"))
  }

  val q136Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin

  // ------------------------------------------------------------- q137 (Q7)
  /** Volume shipping between two nations, both directions, by ship year:
    * supplier-nation and customer-nation both resolve through broadcast
    * dims; the pair filter keeps only the two (supp, cust) combinations. */
  def q137(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n1 = nation(spark, dir).select($"n_nationkey".as("sk"), $"n_name".as("supp_nation"))
    val n2 = nation(spark, dir).select($"n_nationkey".as("ck"), $"n_name".as("cust_nation"))
    lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
      .join(orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(supplier(spark, dir)), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n1), $"s_nationkey" === $"sk")
      .join(broadcast(n2), $"c_nationkey" === $"ck")
      .filter(($"supp_nation" === "NATION_3" && $"cust_nation" === "NATION_7") ||
        ($"supp_nation" === "NATION_7" && $"cust_nation" === "NATION_3"))
      .groupBy($"supp_nation", $"cust_nation",
        year($"l_shipdate").cast("long").as("l_year"))
      .agg(revenue().as("volume"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  val q137Sql: String =
    s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       |  year(l.l_shipdate) AS l_year, CAST(SUM($discSql) AS DOUBLE) AS volume
       |FROM lineitem l
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
       |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
       |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
       |  AND ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
       |    OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
       |GROUP BY 1, 2, 3
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // ------------------------------------------------------------- q138 (Q8)
  /** National market share: one nation's fraction of regional revenue for
    * one part type, by order year. The share is a division of two decimal-
    * exact sums in the identical expression shape on both engines. */
  def q138(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val r = region(spark, dir).filter($"r_name" === "AMERICA")
    val custNations = nation(spark, dir)
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey".as("cnk"))
    val suppNations = nation(spark, dir)
      .select($"n_nationkey".as("snk"), $"n_name".as("supp_nation"))
    val p = part(spark, dir).filter($"p_type" === "ECONOMY").select($"p_partkey")
    lineitem(spark, dir)
      .join(broadcast(p), $"l_partkey" === $"p_partkey")
      .join(orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(custNations), $"c_nationkey" === $"cnk")
      .join(broadcast(supplier(spark, dir)), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(suppNations), $"s_nationkey" === $"snk")
      .groupBy(year($"o_orderdate").cast("long").as("o_year"))
      .agg((sum(when($"supp_nation" === "NATION_3",
          discPrice($"l_extendedprice", $"l_discount"))).cast("double") /
        sum(discPrice($"l_extendedprice", $"l_discount")).cast("double"))
        .as("mkt_share"))
      .orderBy($"o_year")
  }

  val q138Sql: String =
    s"""SELECT year(o.o_orderdate) AS o_year,
       |  CAST(SUM(CASE WHEN sn.n_name = 'NATION_3' THEN $discSql END) AS DOUBLE)
       |    / CAST(SUM($discSql) AS DOUBLE) AS mkt_share
       |FROM lineitem l
       |JOIN part p ON l.l_partkey = p.p_partkey
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
       |JOIN region r ON cn.n_regionkey = r.r_regionkey
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
       |WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
       |  AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY 1
       |ORDER BY o_year""".stripMargin

  // ------------------------------------------------------------ q139 (Q10)
  /** Returned-item reporting: revenue lost to returns per customer for one
    * quarter; top-20 by revenue with a key tiebreaker. */
  def q139(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    lineitem(spark, dir).filter($"l_returnflag" === "R")
      .join(orders(spark, dir)
        .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1997-04-01").cast("timestamp")),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
      .agg(revenue().as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  val q139Sql: String =
    s"""SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
       |  CAST(SUM($discSql) AS DOUBLE) AS revenue
       |FROM lineitem l
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN nation n ON c.c_nationkey = n.n_nationkey
       |WHERE l.l_returnflag = 'R'
       |  AND o.o_orderdate >= TIMESTAMP '1997-01-01' AND o.o_orderdate < TIMESTAMP '1997-04-01'
       |GROUP BY 1, 2, 3, 4
       |ORDER BY revenue DESC, c.c_custkey
       |LIMIT 20""".stripMargin

  // ------------------------------------------------------------ q140 (Q13)
  /** Customer order-count distribution: LEFT join (customers with zero
    * orders kept), per-customer count, then a histogram of the counts —
    * the two-level aggregate. */
  def q140(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = orders(spark, dir).filter($"o_orderpriority" =!= "1-URGENT")
      .select($"o_custkey", $"o_orderkey")
    val perCust = customer(spark, dir)
      .join(o, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
    perCust.groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  val q140Sql: String =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      |  FROM customer c
      |  LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      |  GROUP BY c.c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ------------------------------------------------------------ q141 (Q14)
  /** Promotion-revenue share: 100 × promo revenue / total revenue for one
    * month — conditional aggregation over one broadcast-joined scan. */
  def q141(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1997-09-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-10-01").cast("timestamp"))
      .join(broadcast(part(spark, dir)), $"l_partkey" === $"p_partkey")
      .agg((lit(100.0) * sum(when($"p_type" === "PROMO",
          discPrice($"l_extendedprice", $"l_discount"))).cast("double") /
        sum(discPrice($"l_extendedprice", $"l_discount")).cast("double"))
        .as("promo_revenue"))
  }

  val q141Sql: String =
    s"""SELECT 100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN $discSql END) AS DOUBLE)
       |  / CAST(SUM($discSql) AS DOUBLE) AS promo_revenue
       |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       |WHERE l.l_shipdate >= TIMESTAMP '1997-09-01' AND l.l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin

  // ------------------------------------------------------------ q142 (Q17)
  /** Small-quantity-order revenue: lineitems under half their part's
    * average quantity, for one brand. The correlated scalar subquery
    * decorrelates to a per-part aggregate joined back; the threshold is a
    * decimal-exact sum divided by a count, so both engines compare against
    * the identical double. */
  def q142(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val l = spreadIfNarrow(lineitem(spark, dir), $"l_partkey")
    val avgQty = l.groupBy($"l_partkey".as("ap"))
      .agg((msum($"l_quantity") / count(lit(1))).as("avg_qty"))
    val p = part(spark, dir).filter($"p_brand" === "Brand#13").select($"p_partkey")
    l.join(broadcast(p), $"l_partkey" === $"p_partkey")
      .join(avgQty, $"l_partkey" === $"ap")
      .filter($"l_quantity" < lit(0.5) * $"avg_qty")
      .agg((msum($"l_extendedprice") / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n"))
  }

  val q142Sql: String =
    """WITH avg_qty AS (
      |  SELECT l_partkey AS ap,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
      |  FROM lineitem GROUP BY 1)
      |SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
      |  COUNT(*) AS n
      |FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey
      |JOIN avg_qty a ON l.l_partkey = a.ap
      |WHERE p.p_brand = 'Brand#13' AND l.l_quantity < 0.5 * a.avg_qty""".stripMargin

  // ------------------------------------------------------------ q143 (Q18)
  /** Large-volume customers: orders whose total quantity clears a
    * threshold, with customer context — HAVING over a fact-sized group-by,
    * then a bounded top-k. */
  def q143(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val big = spreadIfNarrow(lineitem(spark, dir), $"l_orderkey")
      .groupBy($"l_orderkey".as("bk"))
      .agg(msum($"l_quantity").as("sum_qty"))
      .filter($"sum_qty" > 180.0)
    orders(spark, dir).join(big, $"o_orderkey" === $"bk")
      .join(broadcast(customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
        $"o_totalprice", $"sum_qty")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(20)
  }

  val q143Sql: String =
    """SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice, b.sum_qty
      |FROM (
      |  SELECT l_orderkey AS bk,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |  FROM lineitem GROUP BY 1
      |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 180.0) b
      |JOIN orders o ON o.o_orderkey = b.bk
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |ORDER BY o.o_totalprice DESC, o.o_orderkey
      |LIMIT 20""".stripMargin

  // ------------------------------------------------------------ q144 (Q19)
  /** Discounted revenue under DISJUNCTIVE join predicates: three OR-ed
    * (brand, quantity-range, size-range) alternatives that reference BOTH
    * join sides — the equi key carries the hash join, the OR tree rides the
    * join condition (never a cartesian). */
  def q144(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val l = lineitem(spark, dir)
    val p = part(spark, dir)
    val cond = ($"l_partkey" === $"p_partkey") && (
      ($"p_brand" === "Brand#13" && $"l_quantity".between(1, 11) && $"p_size".between(1, 15)) ||
      ($"p_brand" === "Brand#25" && $"l_quantity".between(10, 20) && $"p_size".between(1, 25)) ||
      ($"p_brand" === "Brand#22" && $"l_quantity".between(20, 30) && $"p_size".between(1, 35)))
    l.join(broadcast(p), cond)
      .agg(revenue().as("revenue"), count(lit(1)).as("n"))
  }

  val q144Sql: String =
    s"""SELECT CAST(SUM($discSql) AS DOUBLE) AS revenue, COUNT(*) AS n
       |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       | AND ((p.p_brand = 'Brand#13' AND l.l_quantity BETWEEN 1 AND 11 AND p.p_size BETWEEN 1 AND 15)
       |   OR (p.p_brand = 'Brand#25' AND l.l_quantity BETWEEN 10 AND 20 AND p.p_size BETWEEN 1 AND 25)
       |   OR (p.p_brand = 'Brand#22' AND l.l_quantity BETWEEN 20 AND 30 AND p.p_size BETWEEN 1 AND 35))""".stripMargin

  // ------------------------------------------------------------ q145 (Q4)
  /** Order-priority checking: orders in one quarter with at least one LATE
    * lineitem (shipped over 60 days after the order date — the fixture has
    * no commit/receipt pair, so lateness is vs the order date). EXISTS with
    * date arithmetic CROSSING both tables: the semi join carries the
    * non-equi condition alongside the key. */
  def q145(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = orders(spark, dir)
      .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-04-01").cast("timestamp"))
    val l = lineitem(spark, dir).select($"l_orderkey", $"l_shipdate")
    o.join(l, $"o_orderkey" === $"l_orderkey" &&
        $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"), "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  val q145Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders o
      |WHERE o.o_orderdate >= TIMESTAMP '1997-01-01' AND o.o_orderdate < TIMESTAMP '1997-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ------------------------------------------------------------ q146 (Q22)
  /** Global-sales-opportunity: well-funded customers (balance above the
    * positive-balance average) with NO orders, grouped by nation (the
    * fixture has no phone column, so nation stands in for the country
    * code). The average folds through DECIMAL(18,4) — c_acctbal doubles sit
    * NEAR the 2-decimal grid but not on it, so a raw double sum would be
    * order-dependent; at 4 decimals the per-value rounding is unambiguous
    * in both engines and the threshold is one exact double. */
  def q146(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = customer(spark, dir)
    val threshold = c.filter($"c_acctbal" > 0.0)
      .agg((sum($"c_acctbal".cast(DecimalType(18, 4))).cast("double") /
        count(lit(1))).as("thr"))
    val o = orders(spark, dir).select($"o_custkey")
    c.crossJoin(broadcast(threshold))
      .filter($"c_acctbal" > $"thr")
      .join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("numcust"),
        sum($"c_acctbal".cast(DecimalType(18, 4))).cast("double").as("totacctbal"))
      .orderBy($"c_nationkey")
  }

  val q146Sql: String =
    """WITH thr AS (
      |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS thr
      |  FROM customer WHERE c_acctbal > 0.0)
      |SELECT c.c_nationkey, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
      |FROM customer c, thr
      |WHERE c.c_acctbal > thr.thr
      |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY c.c_nationkey
      |ORDER BY c.c_nationkey""".stripMargin

  // ------------------------------------------------------------- q147 (Q2)
  /** Minimum-cost supplier: for small STANDARD parts, the European supplier
    * offering the lowest unit cost, with full supplier context. The fixture
    * has no `partsupp`, so the part↔supplier offer relation derives from
    * lineitem: per (partkey, suppkey) the MINIMUM observed unit price —
    * min of per-row IEEE divisions, no accumulation, so the cost is
    * bit-identical across engines and partitionings. The correlated
    * "cost = (SELECT min ...)" decorrelates to a per-part min joined back —
    * the aggregate runs over the already-region-filtered offers, exactly
    * like the decorrelated plan every engine produces for Q2. */
  def q147(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ps = spreadIfNarrow(lineitem(spark, dir), $"l_partkey")
      .groupBy($"l_partkey".as("ps_partkey"), $"l_suppkey".as("ps_suppkey"))
      .agg(min($"l_extendedprice" / $"l_quantity").as("ps_cost"))
    val s = supplier(spark, dir)
      .join(broadcast(nation(spark, dir)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(region(spark, dir).filter($"r_name" === "EUROPE")),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
    val p = part(spark, dir)
      .filter($"p_size" === 15 && $"p_type" === "STANDARD")
      .select($"p_partkey", $"p_name")
    val offers = ps
      .join(broadcast(s), $"ps_suppkey" === $"s_suppkey")
      .join(broadcast(p), $"ps_partkey" === $"p_partkey")
    val minCost = offers.groupBy($"ps_partkey".as("mk"))
      .agg(min($"ps_cost").as("min_cost"))
    offers.join(broadcast(minCost), $"ps_partkey" === $"mk" && $"ps_cost" === $"min_cost")
      .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey", $"p_name",
        $"ps_cost")
      .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
      .limit(100)
  }

  val q147Sql: String =
    """WITH ps AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |    MIN(l_extendedprice / l_quantity) AS ps_cost
      |  FROM lineitem GROUP BY 1, 2),
      |offers AS (
      |  SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
      |    ps.ps_partkey, ps.ps_cost
      |  FROM ps
      |  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |  JOIN part p ON ps.ps_partkey = p.p_partkey
      |  WHERE r.r_name = 'EUROPE' AND p.p_size = 15 AND p.p_type = 'STANDARD')
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_cost
      |FROM offers o
      |JOIN (SELECT ps_partkey AS mk, MIN(ps_cost) AS min_cost
      |      FROM offers GROUP BY 1) m
      |  ON o.ps_partkey = m.mk AND o.ps_cost = m.min_cost
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  // ------------------------------------------------------------- q148 (Q9)
  /** Product-type profit by nation and year: revenue minus cost for every
    * part whose name matches, attributed to the SUPPLIER's nation. Cost
    * proxies `ps_supplycost × l_quantity` with the part's retail price (on
    * the cent grid — exact as DECIMAL(12,2)) at an 80% cost ratio ×
    * integral quantity, so the whole amount stays a decimal-exact term and
    * the sum is order-independent. */
  def q148(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = part(spark, dir).filter($"p_name".contains("widget"))
      .select($"p_partkey", $"p_retailprice")
    val amount = discPrice($"l_extendedprice", $"l_discount") -
      $"p_retailprice".cast(DecimalType(12, 2)) * lit(0.8).cast(DecimalType(2, 1)) *
        $"l_quantity".cast(DecimalType(9, 0))
    lineitem(spark, dir)
      .join(broadcast(p), $"l_partkey" === $"p_partkey")
      .join(broadcast(supplier(spark, dir)), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(nation(spark, dir)), $"s_nationkey" === $"n_nationkey")
      .join(orders(spark, dir).select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"n_name".as("nation"), year($"o_orderdate").cast("long").as("o_year"))
      .agg(sum(amount).cast("double").as("sum_profit"))
      .orderBy($"nation", $"o_year".desc)
  }

  val q148Sql: String =
    s"""SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
       |  CAST(SUM($discSql
       |    - CAST(p.p_retailprice AS DECIMAL(12,2)) * CAST(0.8 AS DECIMAL(2,1))
       |      * CAST(l.l_quantity AS DECIMAL(9,0))) AS DOUBLE) AS sum_profit
       |FROM lineitem l
       |JOIN part p ON l.l_partkey = p.p_partkey
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |JOIN nation n ON s.s_nationkey = n.n_nationkey
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |WHERE p.p_name LIKE '%widget%'
       |GROUP BY 1, 2
       |ORDER BY nation, o_year DESC""".stripMargin

  // ------------------------------------------------------------ q149 (Q11)
  /** Important stock: parts whose shipped value through one nation's
    * suppliers exceeds a scale-free fraction of that nation's total — the
    * HAVING-against-global-scalar shape. Value = decimal-exact extended
    * price; the threshold multiplies one exact total by one double literal,
    * identical IEEE arithmetic on both engines. */
  def q149(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val natSupp = supplier(spark, dir)
      .join(broadcast(nation(spark, dir).filter($"n_name" === "NATION_7")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    val sv = lineitem(spark, dir)
      .join(broadcast(natSupp), $"l_suppkey" === $"s_suppkey")
      .select($"l_partkey", $"l_extendedprice".cast(DecimalType(12, 2)).as("v"))
    val thr = sv.agg((sum($"v").cast("double") * lit(0.001)).as("thr"))
    sv.groupBy($"l_partkey".as("ps_partkey"))
      .agg(sum($"v").cast("double").as("value"))
      .crossJoin(broadcast(thr))
      .filter($"value" > $"thr")
      .select($"ps_partkey", $"value")
      .orderBy($"value".desc, $"ps_partkey")
  }

  val q149Sql: String =
    """WITH sv AS (
      |  SELECT l.l_partkey, CAST(l.l_extendedprice AS DECIMAL(12,2)) AS v
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  WHERE n.n_name = 'NATION_7'),
      |thr AS (SELECT CAST(SUM(v) AS DOUBLE) * 0.001 AS thr FROM sv)
      |SELECT l_partkey AS ps_partkey, CAST(SUM(v) AS DOUBLE) AS value
      |FROM sv, thr
      |GROUP BY 1, thr.thr
      |HAVING CAST(SUM(v) AS DOUBLE) > thr.thr
      |ORDER BY value DESC, ps_partkey""".stripMargin

  // ------------------------------------------------------------ q150 (Q12)
  /** Shipping-mode priority split, adapted: the fixture has no ship mode or
    * commit/receipt dates, so the mode dimension is `l_linestatus` and
    * lateness is shipping >45 days after the order date. The shape is
    * faithful — join + date arithmetic filter + CASE-conditional two-way
    * counts per mode. */
  def q150(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val high = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
    lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
      .join(orders(spark, dir), $"l_orderkey" === $"o_orderkey" &&
        $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 45 DAYS"))
      .groupBy($"l_linestatus")
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy($"l_linestatus")
  }

  val q150Sql: String =
    """SELECT l.l_linestatus,
      |  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
      |GROUP BY 1
      |ORDER BY l.l_linestatus""".stripMargin

  // ------------------------------------------------------------ q151 (Q15)
  /** Top supplier: the revenue view over one quarter, then the supplier(s)
    * achieving its maximum — view + scalar-max subquery. Revenue folds
    * through decimals, so the max and the equality against it compare the
    * exact same doubles on both engines. */
  def q151(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rev = lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(revenue().as("total_revenue"))
    val mx = rev.agg(max($"total_revenue").as("mx"))
    supplier(spark, dir)
      .join(rev, $"s_suppkey" === $"l_suppkey")
      .crossJoin(broadcast(mx))
      .filter($"total_revenue" === $"mx")
      .select($"s_suppkey", $"s_name", $"total_revenue")
      .orderBy($"s_suppkey")
  }

  val q151Sql: String =
    s"""WITH rev AS (
       |  SELECT l_suppkey, CAST(SUM($discSql) AS DOUBLE) AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
       |  GROUP BY 1)
       |SELECT s.s_suppkey, s.s_name, r.total_revenue
       |FROM supplier s
       |JOIN rev r ON s.s_suppkey = r.l_suppkey
       |WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
       |ORDER BY s.s_suppkey""".stripMargin

  // ------------------------------------------------------------ q152 (Q16)
  /** Part/supplier relationship counting: distinct suppliers able to supply
    * each qualifying (brand, type, size) combination, EXCLUDING an
    * exclusion list (suppliers in deficit — the fixture's stand-in for the
    * complaints NOT IN subquery). The supplier relation derives from
    * lineitem's distinct (part, supplier) pairs; exclusion is an anti-join
    * that never materializes the complement. */
  def q152(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ps = lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey").distinct()
    val p = part(spark, dir)
      .filter($"p_brand" =!= "Brand#13" && $"p_type" =!= "PROMO" &&
        $"p_size".isin(1, 5, 10, 15, 20, 25, 30, 35))
      .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
    val bad = supplier(spark, dir).filter($"s_acctbal" < 0.0).select($"s_suppkey")
    ps.join(broadcast(p), $"l_partkey" === $"p_partkey")
      .join(broadcast(bad), $"l_suppkey" === $"s_suppkey", "left_anti")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  val q152Sql: String =
    """SELECT p.p_brand, p.p_type, p.p_size,
      |  COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      |JOIN part p ON ps.l_partkey = p.p_partkey
      |WHERE p.p_brand <> 'Brand#13' AND p.p_type <> 'PROMO'
      |  AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      |  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size""".stripMargin

  // ------------------------------------------------------------ q153 (Q20)
  /** Potential part promotion: suppliers in one nation who DOMINATE the
    * shipping of some small part — shipped more than half that part's total
    * 1997 volume (the fixture has no availqty, so "excess availability"
    * becomes dominant shipped share; the nested correlated-threshold shape
    * is intact). Quantities sum as exact decimals; the half-share threshold
    * multiplies one exact total by a double literal. */
  def q153(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pk = part(spark, dir).filter($"p_name".startsWith("small"))
      .select($"p_partkey")
    val sq = lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(pk), $"l_partkey" === $"p_partkey", "left_semi")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(sum($"l_quantity".cast(DecimalType(18, 2))).as("qty"))
    val tot = sq.groupBy($"l_partkey".as("tk"))
      .agg((sum($"qty").cast("double") * lit(0.5)).as("half"))
    val dominant = sq.join(broadcast(tot), $"l_partkey" === $"tk")
      .filter($"qty".cast("double") > $"half")
      .select($"l_suppkey").distinct()
    supplier(spark, dir)
      .join(broadcast(nation(spark, dir).filter($"n_name" === "NATION_5")),
        $"s_nationkey" === $"n_nationkey")
      .join(dominant, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name")
      .orderBy($"s_name")
  }

  val q153Sql: String =
    """WITH sq AS (
      |  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      |  GROUP BY 1, 2),
      |tot AS (
      |  SELECT l_partkey AS tk, CAST(SUM(qty) AS DOUBLE) * 0.5 AS half
      |  FROM sq GROUP BY 1),
      |dominant AS (
      |  SELECT DISTINCT sq.l_suppkey
      |  FROM sq JOIN tot ON sq.l_partkey = tot.tk
      |  WHERE CAST(sq.qty AS DOUBLE) > tot.half)
      |SELECT s.s_suppkey, s.s_name
      |FROM supplier s
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |WHERE n.n_name = 'NATION_5'
      |  AND s.s_suppkey IN (SELECT l_suppkey FROM dominant)
      |ORDER BY s.s_name""".stripMargin

  // ------------------------------------------------------------ q154 (Q21)
  /** Suppliers who kept orders waiting: for finished multi-supplier orders,
    * the supplier who was the SOLE late shipper (shipped >60 days after the
    * order date — the fixture's lateness rule, q145). The classic
    * exists/not-exists pair decorrelates to one per-(order, supplier)
    * aggregate and one per-order rollup: n_suppliers > 1 AND n_late = 1
    * picks exactly the orders where one supplier failed everyone else —
    * two hash aggregates and a key join, no correlated re-scans. */
  def q154(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perOS = lineitem(spark, dir)
      .join(orders(spark, dir).filter($"o_orderstatus" === "F")
          .select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey", $"l_suppkey")
      .agg(max(when($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"), 1L)
        .otherwise(0L)).as("late"))
    val perO = perOS.groupBy($"l_orderkey".as("ok"))
      .agg(count(lit(1)).as("n_supp"), sum($"late").as("n_late"))
    perOS.filter($"late" === 1L)
      .join(perO.filter($"n_supp" > 1L && $"n_late" === 1L),
        $"l_orderkey" === $"ok", "left_semi")
      .join(broadcast(supplier(spark, dir)), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
      .limit(100)
  }

  val q154Sql: String =
    """WITH per_os AS (
      |  SELECT l.l_orderkey, l.l_suppkey,
      |    MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS late
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE o.o_orderstatus = 'F'
      |  GROUP BY 1, 2),
      |per_o AS (
      |  SELECT l_orderkey AS ok, COUNT(*) AS n_supp, SUM(late) AS n_late
      |  FROM per_os GROUP BY 1)
      |SELECT s.s_name, COUNT(*) AS numwait
      |FROM per_os p
      |JOIN per_o ON p.l_orderkey = per_o.ok AND per_o.n_supp > 1 AND per_o.n_late = 1
      |JOIN supplier s ON p.l_suppkey = s.s_suppkey
      |WHERE p.late = 1
      |GROUP BY 1
      |ORDER BY numwait DESC, s.s_name
      |LIMIT 100""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q134_tpch_q3_shipping_priority"  -> q134,
    "q135_tpch_q5_local_supplier"     -> q135,
    "q136_tpch_q6_forecast_revenue"   -> q136,
    "q137_tpch_q7_volume_shipping"    -> q137,
    "q138_tpch_q8_market_share"       -> q138,
    "q139_tpch_q10_returned_items"    -> q139,
    "q140_tpch_q13_order_distribution" -> q140,
    "q141_tpch_q14_promo_share"       -> q141,
    "q142_tpch_q17_small_qty"         -> q142,
    "q143_tpch_q18_large_volume"      -> q143,
    "q144_tpch_q19_disjunctive_join"  -> q144,
    "q145_tpch_q4_priority_check"     -> q145,
    "q146_tpch_q22_idle_balances"     -> q146,
    "q147_tpch_q2_min_cost_supplier"  -> q147,
    "q148_tpch_q9_product_profit"     -> q148,
    "q149_tpch_q11_important_stock"   -> q149,
    "q150_tpch_q12_priority_split"    -> q150,
    "q151_tpch_q15_top_supplier"      -> q151,
    "q152_tpch_q16_supplier_count"    -> q152,
    "q153_tpch_q20_dominant_share"    -> q153,
    "q154_tpch_q21_waiting_supplier"  -> q154)

  val oracleSql: Map[String, String] = Map(
    "q134_tpch_q3_shipping_priority"  -> q134Sql,
    "q135_tpch_q5_local_supplier"     -> q135Sql,
    "q136_tpch_q6_forecast_revenue"   -> q136Sql,
    "q137_tpch_q7_volume_shipping"    -> q137Sql,
    "q138_tpch_q8_market_share"       -> q138Sql,
    "q139_tpch_q10_returned_items"    -> q139Sql,
    "q140_tpch_q13_order_distribution" -> q140Sql,
    "q141_tpch_q14_promo_share"       -> q141Sql,
    "q142_tpch_q17_small_qty"         -> q142Sql,
    "q143_tpch_q18_large_volume"      -> q143Sql,
    "q144_tpch_q19_disjunctive_join"  -> q144Sql,
    "q145_tpch_q4_priority_check"     -> q145Sql,
    "q146_tpch_q22_idle_balances"     -> q146Sql,
    "q147_tpch_q2_min_cost_supplier"  -> q147Sql,
    "q148_tpch_q9_product_profit"     -> q148Sql,
    "q149_tpch_q11_important_stock"   -> q149Sql,
    "q150_tpch_q12_priority_split"    -> q150Sql,
    "q151_tpch_q15_top_supplier"      -> q151Sql,
    "q152_tpch_q16_supplier_count"    -> q152Sql,
    "q153_tpch_q20_dominant_share"    -> q153Sql,
    "q154_tpch_q21_waiting_supplier"  -> q154Sql)
}
