package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // ---------------------------------------------------------------- q71
  /** VARIANT semi-structured path (Spark 4 native): build a nested JSON
    * document per event, `parse_json` it into a VARIANT, then extract typed
    * fields with `variant_get` and filter on one. VARIANT stores a parsed
    * binary form, so repeated extraction doesn't re-tokenize the JSON text —
    * at 100 TB this is the difference between one parse per row and one
    * parse per field (q38's `get_json_object` pays the latter). The whole
    * query is scan-shaped: parse + extract + filter fuse into one codegen
    * stage, no shuffle. `floor` (not `round`) keeps the constructed integers
    * bit-identical across engines. */
  def q71(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    events(spark, dir)
      // filter on the cheap pre-parse expression, not the extracted field:
      // a filter on variant_get(cents) would push below the parse projection
      // and re-run parse_json a second time per row (Catalyst inlines the
      // alias when pushing) — same rows, half the parse work this way.
      // Plan-verified (r15): exactly ONE parseJson StaticInvoke in its own
      // Project (CollapseProject's cheap-expression guard keeps it from
      // being inlined into the four variant_gets), filter at the scan —
      // the residual SCALING ratio is inherent row-linear parse work
      .filter(floor($"value" * 100).cast("long") > 50)
      // spreadIfNarrow (guide §2.5): the parse_json + variant_gets below are
      // the row-linear hot loop this query exists to exercise; on a single-
      // row-group input they otherwise run inside the one scan task
      .transform(df => graft.Tables.spreadIfNarrow(df, $"event_id"))
      .withColumn("js", concat(
        lit("{\"meta\":{\"type\":\""), $"event_type", lit("\",\"uid\":"), $"user_id",
        lit("},\"vals\":["), floor($"value" * 100).cast("long"),
        lit(","), $"event_id" % 10, lit("]}")))
      .withColumn("v", expr("parse_json(js)"))
      .select($"event_id",
        expr("variant_get(v, '$.meta.type', 'string')").as("vtype"),
        expr("variant_get(v, '$.meta.uid', 'bigint')").as("vuid"),
        expr("variant_get(v, '$.vals[0]', 'bigint')").as("cents"),
        expr("variant_get(v, '$.vals[1]', 'bigint')").as("mod10"))
      .orderBy($"event_id")
  }

  val q71Sql: String =
    """SELECT event_id, vtype, vuid, cents, mod10 FROM (
      |  WITH j AS (SELECT event_id,
      |    '{"meta":{"type":"' || event_type || '","uid":' || user_id ||
      |    '},"vals":[' || CAST(floor(value*100) AS BIGINT) || ',' || (event_id % 10) || ']}' AS js
      |    FROM events)
      |  SELECT event_id,
      |    json_extract_string(js, '$.meta.type') AS vtype,
      |    json_extract(js, '$.meta.uid')::BIGINT AS vuid,
      |    json_extract(js, '$.vals[0]')::BIGINT AS cents,
      |    json_extract(js, '$.vals[1]')::BIGINT AS mod10
      |  FROM j)
      |WHERE cents > 50 ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q72
  /** RECURSIVE CTE (Spark 4 `WITH RECURSIVE` → UnionLoop): hierarchical
    * traversal of an implicit binary tree over documents (parent(n) =
    * (n-1) div 2), reporting per-depth node counts. Each recursion step is
    * one equi-join of the frontier against the base table — the frontier is
    * tiny relative to the table, so at scale every step is a broadcast join
    * and the loop runs O(depth) jobs, never materializing the closure
    * driver-side. Depth over N docs is ceil(log2(N)) — 30 levels at 10^9
    * rows, well under the recursion limit. */
  def q72(spark: SparkSession, dir: String): DataFrame = {
    // r19: the recursion's base relation is a locally-checkpointed NARROW
    // projection (doc_id only) — every UnionLoop step re-reads tiny
    // in-memory blocks instead of re-planning + re-running a parquet scan
    // per iteration (O(depth) iterations, so the per-step constant is the
    // whole cost at any scale; measured 2.49 → 1.67 s at sf0.1/local[32]).
    // Same rows, same oracle; the checkpoint is released by the runner's
    // between-query sweep (SparkEntry.releaseScratch).
    import org.apache.spark.sql.functions.col
    graft.Mat.checkpoint(documents(spark, dir).select(col("doc_id")))
      .createOrReplaceTempView("q72_docs")
    spark.sql("""
      WITH RECURSIVE tree AS (
        SELECT doc_id AS id, CAST(0 AS BIGINT) AS depth FROM q72_docs WHERE doc_id = 0
        UNION ALL
        SELECT d.doc_id AS id, t.depth + 1 AS depth
        FROM q72_docs d JOIN tree t ON (d.doc_id - 1) div 2 = t.id
        WHERE d.doc_id > 0)
      SELECT depth, count(*) AS n_nodes, min(id) AS min_id, max(id) AS max_id,
             sum(id) AS sum_id
      FROM tree GROUP BY depth ORDER BY depth""")
  }

  val q72Sql: String =
    """WITH RECURSIVE tree AS (
      |  SELECT doc_id AS id, CAST(0 AS BIGINT) AS depth FROM documents WHERE doc_id = 0
      |  UNION ALL
      |  SELECT d.doc_id AS id, t.depth + 1 AS depth
      |  FROM documents d JOIN tree t ON (d.doc_id - 1) // 2 = t.id
      |  WHERE d.doc_id > 0)
      |SELECT depth, COUNT(*) AS n_nodes, min(id) AS min_id, max(id) AS max_id,
      |       sum(id)::BIGINT AS sum_id
      |FROM tree GROUP BY depth ORDER BY depth""".stripMargin

  // ---------------------------------------------------------------- q76
  /** LATERAL correlated subquery (SQL-standard LATERAL join): top-2
    * customers by balance PER NATION, the per-row-parameterized-subquery
    * shape. Catalyst decorrelates the LIMIT-over-ORDER BY into a rank
    * window partitioned by the correlation key — so what reads as "run a
    * top-k query per outer row" executes as ONE window over the inner
    * table plus an equi-join, never a nested loop. */
  def q76(spark: SparkSession, dir: String): DataFrame = {
    nation(spark, dir).createOrReplaceTempView("q76_nation")
    customer(spark, dir).createOrReplaceTempView("q76_customer")
    spark.sql("""
      SELECT n_name, c_name, c_acctbal
      FROM q76_nation n, LATERAL (
        SELECT c_name, c_acctbal FROM q76_customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_name LIMIT 2) c
      ORDER BY n_name, c_acctbal DESC, c_name""")
  }

  val q76Sql: String =
    """SELECT n_name, c_name, c_acctbal
      |FROM nation n, LATERAL (
      |  SELECT c_name, c_acctbal FROM customer
      |  WHERE c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_name LIMIT 2) c
      |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin

  // ---------------------------------------------------------------- q77
  /** LISTAGG (SQL:2016, Spark 4 native) — ordered string aggregation
    * WITHIN GROUP. The per-group ORDER BY rides the aggregation's own
    * shuffle (sort-based aggregate), no extra exchange; group sizes bound
    * the string, so the filter keeps the demo deterministic AND small. */
  def q77(spark: SparkSession, dir: String): DataFrame = {
    orders(spark, dir).createOrReplaceTempView("q77_orders")
    spark.sql("""
      SELECT o_orderpriority,
             listagg(cast(o_orderkey AS STRING), ',')
               WITHIN GROUP (ORDER BY o_orderkey) AS ids
      FROM q77_orders WHERE o_orderkey < 300
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  }

  val q77Sql: String =
    """SELECT o_orderpriority,
      |       string_agg(o_orderkey::VARCHAR, ',' ORDER BY o_orderkey) AS ids
      |FROM orders WHERE o_orderkey < 300
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q78
  /** LOCF gap-fill (last observation carried forward): per user, carry the
    * most recent purchase value forward over non-purchase events —
    * `last(..., ignoreNulls)` over an unbounded-preceding frame, the
    * standard time-series imputation. One window shuffle on user_id; the
    * running frame never materializes more than the current carry value
    * per row, so a hot user costs memory O(1), not O(events). */
  def q78(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    events(spark, dir)
      .withColumn("pv", when($"event_type" === "purchase", $"value"))
      .select($"event_id", $"user_id",
        last($"pv", ignoreNulls = true).over(
          Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("locf"))
      .orderBy($"event_id")
  }

  val q78Sql: String =
    """SELECT event_id, user_id,
      |  last_value(pv IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf
      |FROM (SELECT event_id, user_id, ts,
      |        CASE WHEN event_type = 'purchase' THEN value END AS pv FROM events)
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q116
  /** MODERN SQL SURFACE: `SELECT * EXCEPT (...)` (projection by
    * exclusion — the wide-table ergonomic), `GROUP BY ALL` (group by
    * every non-aggregate output), and `ORDER BY ALL` — the DuckDB-origin
    * conveniences Spark 4 adopted and the reference's SQL users lean on
    * for 100-column lakehouse tables. Same text shape on both engines
    * (DuckDB spells the star form `* EXCLUDE`). */
  def q116(spark: SparkSession, dir: String): DataFrame = {
    orders(spark, dir).createOrReplaceTempView("q116_orders")
    // revenue as BIGINT *cents*: cast-inside-sum makes the total an exact
    // decimal (order-independent); ×100 + round lands on an integer because
    // the source values are scale-2 exact. int64 has ONE textual/binary
    // canonical form in every stack — unlike DECIMAL, whose harness-side
    // canonicalization (float64 vs Decimal decode) is not under our
    // control. Values were verified bit-identical cross-engine at the
    // decimal stage; only the transport representation differed.
    spark.sql("""
      SELECT o_orderstatus, o_orderpriority,
             count(*) AS n,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 100) AS BIGINT) AS revenue_cents
      FROM (SELECT * EXCEPT (o_orderkey, o_custkey, o_orderdate) FROM q116_orders)
      GROUP BY ALL
      ORDER BY ALL""")
  }

  val q116Sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |       count(*) AS n,
      |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 100) AS BIGINT) AS revenue_cents
      |FROM (SELECT * EXCLUDE (o_orderkey, o_custkey, o_orderdate) FROM orders)
      |GROUP BY ALL
      |ORDER BY ALL""".stripMargin

  // ---------------------------------------------------------------- q118
  /** SKYLINE / Pareto frontier per event type: the events no other event of
    * the same type beats on BOTH dimensions (earlier-or-equal ts AND
    * higher-or-equal value, strictly better in one) — the classic
    * multi-criteria "best tradeoffs" operator (Börzsönyi et al., ICDE'01).
    *
    * Distributed 3-phase shape (dominance is transitive, so pruning a
    * dominated point never removes anyone's dominator — each local prune
    * preserves the global skyline):
    *   1. collapse to one candidate per (type, ts): max(value) — map-side
    *      combinable pre-aggregation;
    *   2. LOCAL prune per (type, day): running-max window inside each
    *      day bucket, thousands of independent partitions — this is where
    *      100 TB of points dies down to per-day frontiers;
    *   3. GLOBAL pass per type over the tiny survivor set, same window.
    * The naive formulation is one window per type = one reducer per type;
    * phase 2 is what keeps the sort parallel at scale. Witness rows come
    * back via an equality join against the (broadcast-sized) frontier.
    *
    * The oracle is the INDEPENDENT quadratic NOT EXISTS definition, so the
    * window algebra is verified against the textbook semantics, not
    * against itself. */
  def q118(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = events(spark, dir)
    val pt = ev.groupBy($"event_type", $"ts").agg(max($"value").as("vmax"))
    def prune(df: DataFrame, parts: Column*): DataFrame = {
      val w = Window.partitionBy(parts: _*).orderBy($"ts")
        .rowsBetween(Window.unboundedPreceding, -1)
      df.withColumn("runmax", max($"vmax").over(w))
        .filter($"runmax".isNull || $"vmax" > $"runmax")
        .drop("runmax")
    }
    val local = prune(pt, $"event_type", to_date($"ts"))
    val sky = prune(local, $"event_type")
      .select($"event_type".as("s_type"), $"ts".as("s_ts"), $"vmax")
    sky.join(ev, $"s_type" === ev("event_type") && $"s_ts" === ev("ts") &&
        $"vmax" === ev("value"))
      .groupBy($"s_type".as("event_type"), $"s_ts".as("ts"), $"vmax".as("value"))
      .agg(count(lit(1)).as("n_events"), min($"event_id").as("witness_id"))
      .orderBy($"event_type", $"ts")
  }

  val q118Sql: String =
    """SELECT r.event_type, r.ts, r.value,
      |       COUNT(*)::BIGINT AS n_events, min(r.event_id) AS witness_id
      |FROM events r
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM events s
      |  WHERE s.event_type = r.event_type
      |    AND s.ts <= r.ts AND s.value >= r.value
      |    AND (s.ts < r.ts OR s.value > r.value))
      |GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q116_modern_sql"     -> q116,
    "q118_skyline"        -> q118,
    "q59_scalar_subquery" -> q59,
    "q60_unpivot"         -> q60,
    "q61_salted_join"     -> q61,
    "q71_variant_extract" -> q71,
    "q72_recursive_cte"   -> q72,
    "q76_lateral_topk"    -> q76,
    "q77_listagg"         -> q77,
    "q78_locf_fill"       -> q78)

  val oracleSql: Map[String, String] = Map(
    "q116_modern_sql"     -> q116Sql,
    "q118_skyline"        -> q118Sql,
    "q59_scalar_subquery" -> q59Sql,
    "q60_unpivot"         -> q60Sql,
    "q61_salted_join"     -> q61Sql,
    "q71_variant_extract" -> q71Sql,
    "q72_recursive_cte"   -> q72Sql,
    "q76_lateral_topk"    -> q76Sql,
    "q77_listagg"         -> q77Sql,
    "q78_locf_fill"       -> q78Sql)
}
