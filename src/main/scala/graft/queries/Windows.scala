package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** SURVEY.md §2.5 window functions: ranking, analytic (lag/lead/first/last/
  * cume_dist), and aggregates over explicit ROWS / RANGE frames.
  *
  * Scale notes: a window over `partitionBy(k)` shuffles once on k and sorts
  * within partitions — the right plan at 100 TB as long as no single key is
  * huge (the fixture keys are customer/order-grained, cardinality ~rows/15).
  * Every window ordering includes a unique tie-break column so results are
  * deterministic under hash-compare.
  */
object Windows {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  // ---------------------------------------------------------------- q22
  /** Ranking family: row_number / rank / dense_rank / ntile / percent_rank. */
  def q22(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderstatus").orderBy($"o_totalprice".desc, $"o_orderkey")
    orders(spark, dir)
      .select(
        $"o_orderkey", $"o_orderstatus", $"o_totalprice",
        row_number().over(w).cast("long").as("rn"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"))
  }

  val q22Sql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice,
      |  ROW_NUMBER() OVER w AS rn,
      |  RANK() OVER w AS rnk,
      |  DENSE_RANK() OVER w AS drnk,
      |  NTILE(4) OVER w AS quartile,
      |  ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q23
  /** Analytic family over an event stream: lag / lead / first_value /
    * last_value (full-partition frame) / cume_dist per user timeline. */
  def q23(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    events(spark, dir)
      .select(
        $"event_id", $"user_id", $"event_type", $"value",
        lag($"value", 1).over(w).as("prev_value"),
        lead($"value", 1).over(w).as("next_value"),
        first($"event_type").over(wAll).as("first_type"),
        last($"event_type").over(wAll).as("last_type"),
        round(cume_dist().over(w), 6).as("cd"))
  }

  val q23Sql: String =
    """SELECT event_id, user_id, event_type, value,
      |  LAG(value, 1) OVER w AS prev_value,
      |  LEAD(value, 1) OVER w AS next_value,
      |  FIRST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_type,
      |  LAST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type,
      |  ROUND(CUME_DIST() OVER w, 6) AS cd
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q24
  /** ROWS frame: running total + 4-row moving average along each order's
    * line numbers (decimal accumulation → order-independent exactness).
    * The fixture has duplicate (l_orderkey, l_linenumber) pairs, so the
    * ordering extends to the full 6-column key — verified unique at every
    * scale factor — making the ROWS frames deterministic under hash-compare. */
  def q24(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"l_orderkey")
      .orderBy($"l_linenumber", $"l_quantity", $"l_extendedprice", $"l_partkey", $"l_suppkey")
    val wRun  = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wMove = w.rowsBetween(-3, Window.currentRow)
    lineitem(spark, dir)
      .select(
        $"l_orderkey", $"l_linenumber", $"l_quantity",
        sum(dec2($"l_quantity")).over(wRun).cast("double").as("running_qty"),
        (sum(dec2($"l_quantity")).over(wMove).cast("double") /
          count(lit(1)).over(wMove)).as("moving_avg_qty"))
  }

  val q24Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_qty,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_orderkey
      |    ORDER BY l_linenumber, l_quantity, l_extendedprice, l_partkey, l_suppkey
      |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / COUNT(*) OVER (PARTITION BY l_orderkey
      |    ORDER BY l_linenumber, l_quantity, l_extendedprice, l_partkey, l_suppkey
      |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS moving_avg_qty
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_orderkey
      |  ORDER BY l_linenumber, l_quantity, l_extendedprice, l_partkey, l_suppkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_partkey, l_suppkey""".stripMargin

  // ---------------------------------------------------------------- q25
  /** RANGE frame over a numeric ordering key: per-customer 30-day trailing
    * order volume (order day as int days since 1990-01-01). */
  def q25(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val withDay = orders(spark, dir)
      .withColumn("order_day", datediff($"o_orderdate".cast("date"), lit("1990-01-01").cast("date")))
    val w = Window.partitionBy($"o_custkey").orderBy($"order_day").rangeBetween(-30, 0)
    withDay
      .select(
        $"o_orderkey", $"o_custkey", $"order_day",
        sum(dec2($"o_totalprice")).over(w).cast("double").as("trailing_30d_total"),
        count(lit(1)).over(w).as("trailing_30d_orders"))
  }

  val q25Sql: String =
    """SELECT o_orderkey, o_custkey,
      |  date_diff('day', DATE '1990-01-01', o_orderdate::DATE)::INT AS order_day,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trailing_30d_total,
      |  COUNT(*) OVER w AS trailing_30d_orders
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY date_diff('day', DATE '1990-01-01', o_orderdate::DATE)::INT
      |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q110
  /** NTILE bucketing: per-source size quartiles of documents, rolled up to
    * quartile stats — the standard equal-frequency binning step (feature
    * bucketing, per-domain size tiers). The window is PARTITIONED by
    * source, so no single-partition funnel; a GLOBAL ntile at 100 TB would
    * instead bucket scan-shaped against approximate boundaries from the
    * KLL sketch (`functions/KllSketch.scala`) — the window form here is
    * the per-group semantics oracle. Tie-break on doc_id keeps bucket
    * assignment engine-exact (NTILE's ceil/floor bucket sizing is
    * SQL-standard in both engines). */
  def q110(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir)
      .withColumn("quartile",
        ntile(4).over(Window.partitionBy($"source").orderBy($"n_chars", $"doc_id"))
          .cast("long"))
      .groupBy($"source", $"quartile")
      .agg(count(lit(1)).as("n_docs"),
        min($"n_chars").as("min_chars"), max($"n_chars").as("max_chars"))
      .orderBy($"source", $"quartile")
  }

  val q110Sql: String =
    """SELECT source, quartile, COUNT(*) AS n_docs,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
      |FROM (SELECT source, n_chars,
      |        ntile(4) OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS quartile
      |      FROM documents)
      |GROUP BY source, quartile
      |ORDER BY source, quartile""".stripMargin

  // ---------------------------------------------------------------- q122
  /** GAPS-AND-ISLANDS: maximal runs of ≥4 consecutive same-type events per
    * user, via the classic row_number-difference trick — `rn_all − rn_type`
    * is constant exactly along a run, so runs fall out of ONE groupBy with
    * no self-join, no loop (the streak/uptime/sessionized-state pattern).
    *
    * Scale shape: two window ranks over the same user_id shuffle + one
    * hash aggregate; per-user data never leaves its partition. */
  def q122(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wAll = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wType = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts", $"event_id")
    events(spark, dir)
      .select($"user_id", $"event_type", $"ts",
        (row_number().over(wAll) - row_number().over(wType)).as("grp"))
      .groupBy($"user_id", $"event_type", $"grp")
      .agg(min($"ts").as("start_ts"), max($"ts").as("end_ts"),
        count(lit(1)).as("run_len"))
      .filter($"run_len" >= 4)
      .select($"user_id", $"event_type", $"start_ts", $"end_ts", $"run_len")
      .orderBy($"user_id", $"start_ts", $"event_type")
  }

  val q122Sql: String =
    """WITH ordered AS (
      |  SELECT user_id, event_type, ts,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_all,
      |    row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn_type
      |  FROM events)
      |SELECT user_id, event_type, min(ts) AS start_ts, max(ts) AS end_ts,
      |       count(*)::BIGINT AS run_len
      |FROM ordered GROUP BY user_id, event_type, rn_all - rn_type
      |HAVING count(*) >= 4 ORDER BY user_id, start_ts, event_type""".stripMargin

  // ---------------------------------------------------------------- q129
  /** PARETO / revenue-concentration analysis: per-brand revenue ranked
    * descending with each brand's cumulative share of total, flagging the
    * brands that make up the first 80% (the 80/20 dashboard; in a corpus
    * pipeline the same shape answers "which sources make up 80% of
    * tokens"). The window runs over the 25-row AGGREGATE, not the fact
    * table — ranking a pre-aggregated dimension profile is the one place a
    * single-partition window is the right call at any scale.
    *
    * Cross-engine exactness: revenue folds to DECIMAL before summing
    * (extendedprice lossless at (12,2), discount at (4,2)) so the running
    * and total sums are order-independent exact integers; shares are single
    * double divisions in the identical expression shape. */
  def q129(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // spreadIfNarrow: the broadcast probe + per-row decimal fold + partial
    // brand aggregate otherwise run inside the single scan task (q01 shape)
    val rev = spreadIfNarrow(lineitem(spark, dir)
        .select($"l_partkey", $"l_extendedprice", $"l_discount"), $"l_partkey")
      .join(broadcast(part(spark, dir)), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand".as("brand"))
      .agg(sum($"l_extendedprice".cast(DecimalType(12, 2)) *
        (lit(1) - $"l_discount".cast(DecimalType(4, 2)))).as("revenue"))
    val wOrd = Window.orderBy($"revenue".desc, $"brand")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = rev.agg(sum($"revenue").as("tot"))
    rev.withColumn("rnk", row_number().over(wOrd).cast("long"))
      .withColumn("run", sum($"revenue").over(wRun))
      .crossJoin(broadcast(tot))
      .select($"brand", $"rnk",
        round($"revenue".cast("double"), 2).as("revenue"),
        round($"run".cast("double") / $"tot".cast("double"), 6).as("cum_share"),
        ($"run".cast("double") / $"tot".cast("double")
          - $"revenue".cast("double") / $"tot".cast("double") < 0.8).as("in_top80"))
      .orderBy($"rnk")
  }

  val q129Sql: String =
    """WITH rev AS (
      |  SELECT p.p_brand AS brand,
      |         sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
      |             * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS revenue
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY 1),
      |w AS (
      |  SELECT brand, revenue,
      |    CAST(row_number() OVER (ORDER BY revenue DESC, brand) AS BIGINT) AS rnk,
      |    sum(revenue) OVER (ORDER BY revenue DESC, brand
      |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run,
      |    sum(revenue) OVER () AS tot
      |  FROM rev)
      |SELECT brand, rnk, round(CAST(revenue AS DOUBLE), 2) AS revenue,
      |  round(CAST(run AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS cum_share,
      |  CAST(run AS DOUBLE) / CAST(tot AS DOUBLE)
      |    - CAST(revenue AS DOUBLE) / CAST(tot AS DOUBLE) < 0.8 AS in_top80
      |FROM w ORDER BY rnk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q129_pareto_share"      -> q129,
    "q122_islands"           -> q122,
    "q22_window_ranking"     -> q22,
    "q23_window_analytic"    -> q23,
    "q24_window_rows_frame"  -> q24,
    "q25_window_range_frame" -> q25,
    "q110_ntile_buckets"     -> q110)

  val oracleSql: Map[String, String] = Map(
    "q129_pareto_share"      -> q129Sql,
    "q122_islands"           -> q122Sql,
    "q22_window_ranking"     -> q22Sql,
    "q23_window_analytic"    -> q23Sql,
    "q24_window_rows_frame"  -> q24Sql,
    "q25_window_range_frame" -> q25Sql,
    "q110_ntile_buckets"     -> q110Sql)
}
