package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** SURVEY.md §2.7 scalar-function families: string, date/time, math, array +
  * higher-order, map, JSON (the `events.props` target), and the Iceberg
  * partition-transform equivalents (`system.truncate` ≡ integer/string
  * truncation; `system.bucket` ≡ pmod(hash, n), spec-verified since hash
  * implementations differ across engines — reference `main.tf:803`).
  *
  * All functions are Spark built-ins, so every expression stays inside
  * whole-stage codegen — no UDFs anywhere (the 100 TB rule: a codegen'd
  * projection is a pure map over the scan, zero shuffle).
  *
  * Cross-engine drift pinned down by probe (scripts/check_oracle.py runs
  * DuckDB 1.0): floor/ceil return DOUBLE there vs LONG here → explicit BIGINT
  * casts both sides; DuckDB regexp_replace needs the 'g' flag to match
  * Spark's replace-all; DuckDB list_sum returns DOUBLE → cast; DuckDB map
  * extraction returns LIST → its oracle computes expected values from base
  * columns instead.
  */
object Functions {

  // ---------------------------------------------------------------- q33
  /** String family over documents.text: length, case, substring, split,
    * regexp_extract / regexp_replace (replace-all), lpad, concat_ws, trim. */
  def q33(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir)
      .select(
        $"doc_id",
        length($"text").as("n_chars_fn"),
        upper(substring($"text", 1, 10)).as("head_upper"),
        lower(trim(substring($"text", 1, 12))).as("head_lower"),
        size(split($"text", " ")).as("n_words"),
        regexp_extract($"text", "([a-z]+)", 1).as("first_word"),
        substring(regexp_replace($"text", "a", "X"), 1, 40).as("replaced_head"),
        lpad($"source", 8, "0").as("source_padded"),
        concat_ws("|", $"lang", $"source").as("lang_source"))
      .orderBy($"doc_id")
  }

  val q33Sql: String =
    """SELECT doc_id,
      |  CAST(length(text) AS INT) AS n_chars_fn,
      |  upper(substr(text, 1, 10)) AS head_upper,
      |  lower(trim(substr(text, 1, 12))) AS head_lower,
      |  CAST(len(string_split(text, ' ')) AS INT) AS n_words,
      |  regexp_extract(text, '([a-z]+)', 1) AS first_word,
      |  substr(regexp_replace(text, 'a', 'X', 'g'), 1, 40) AS replaced_head,
      |  lpad(source, 8, '0') AS source_padded,
      |  concat_ws('|', lang, source) AS lang_source
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q34
  /** Date/time family over orders: extract fields, date_trunc, date
    * arithmetic, datediff, last_day. */
  def q34(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    orders(spark, dir)
      .select(
        $"o_orderkey",
        year($"o_orderdate").as("yr"),
        month($"o_orderdate").as("mo"),
        dayofmonth($"o_orderdate").as("dom"),
        quarter($"o_orderdate").as("qtr"),
        date_trunc("month", $"o_orderdate").as("month_start"),
        date_add($"o_orderdate".cast("date"), 30).as("plus_30d"),
        datediff($"o_orderdate".cast("date"), lit("1995-01-01").cast("date")).as("days_since_95"),
        last_day($"o_orderdate".cast("date")).as("month_end"))
    // full-table projection: no trailing global sort (scale-killer pattern)
  }

  val q34Sql: String =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS yr,
      |  CAST(month(o_orderdate) AS INT) AS mo,
      |  CAST(day(o_orderdate) AS INT) AS dom,
      |  CAST(quarter(o_orderdate) AS INT) AS qtr,
      |  date_trunc('month', o_orderdate) AS month_start,
      |  o_orderdate::DATE + 30 AS plus_30d,
      |  CAST(date_diff('day', DATE '1995-01-01', o_orderdate::DATE) AS INT) AS days_since_95,
      |  last_day(o_orderdate::DATE) AS month_end
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q35
  /** Math family over part: round, floor/ceil (pinned to BIGINT both sides),
    * abs, mod, pow, sqrt, ln, sign, greatest/least. */
  def q35(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    part(spark, dir)
      .select(
        $"p_partkey",
        round($"p_retailprice", 1).as("price_r1"),
        floor($"p_retailprice").cast("long").as("price_floor"),
        ceil($"p_retailprice").cast("long").as("price_ceil"),
        abs($"p_size" - 25).as("size_dev"),
        ($"p_size" % 7).as("size_mod7"),
        round(pow($"p_size", 2.0), 1).as("size_sq"),
        round(sqrt($"p_retailprice"), 4).as("price_sqrt"),
        round(log($"p_retailprice"), 4).as("price_ln"),
        signum($"p_retailprice" - lit(1000.0)).cast("int").as("above_1000"),
        greatest($"p_size", lit(10)).as("size_hi"),
        least($"p_size", lit(40)).as("size_lo"))
      .orderBy($"p_partkey")
  }

  val q35Sql: String =
    """SELECT p_partkey,
      |  round(p_retailprice, 1) AS price_r1,
      |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
      |  CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
      |  CAST(abs(p_size - 25) AS INT) AS size_dev,
      |  CAST(p_size % 7 AS INT) AS size_mod7,
      |  round(pow(p_size, 2.0), 1) AS size_sq,
      |  round(sqrt(p_retailprice), 4) AS price_sqrt,
      |  round(ln(p_retailprice), 4) AS price_ln,
      |  CAST(sign(p_retailprice - 1000.0) AS INT) AS above_1000,
      |  CAST(greatest(p_size, 10) AS INT) AS size_hi,
      |  CAST(least(p_size, 40) AS INT) AS size_lo
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q36
  /** Array + higher-order family over documents: split, size, slice,
    * array_distinct, sort_array, array_contains, filter, transform,
    * aggregate (fold) — arrays stringified for the hash-compare. */
  def q36(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir)
      .withColumn("words", split($"text", " "))
      .select(
        $"doc_id",
        size($"words").as("n_words"),
        expr("CAST(aggregate(words, 0L, (a, w) -> a + length(w)) AS BIGINT)").as("total_chars"),
        array_join(sort_array(array_distinct(slice($"words", 1, 5))), ",").as("first5_distinct"),
        array_contains($"words", "the").as("has_the"),
        array_join(expr("filter(words, w -> length(w) > 4)"), ",").as("long_words"),
        array_join(expr("transform(slice(words, 1, 3), w -> upper(w))"), ",").as("first3_upper"))
    // no trailing sort: higher-order lambdas are interpreted (not codegen'd),
    // and a global sort's range-sampling pass would evaluate them all twice
  }

  val q36Sql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INT) AS n_words,
      |  CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS BIGINT) AS total_chars,
      |  array_to_string(list_sort(list_distinct(string_split(text, ' ')[1:5])), ',') AS first5_distinct,
      |  list_contains(string_split(text, ' '), 'the') AS has_the,
      |  array_to_string(list_filter(string_split(text, ' '), w -> length(w) > 4), ',') AS long_words,
      |  array_to_string(list_transform(string_split(text, ' ')[1:3], w -> upper(w)), ',') AS first3_upper
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q37
  /** Map family over events: map_from_arrays, element_at, map_keys,
    * map_values, size, str_to_map. DuckDB's map extraction returns a LIST,
    * so its oracle computes the expected scalars from the base columns —
    * the comparison still pins every map-op output. */
  def q37(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    events(spark, dir)
      .withColumn("m", map_from_arrays(
        array(lit("type"), lit("uid")),
        array($"event_type", $"user_id".cast("string"))))
      .select(
        $"event_id",
        element_at($"m", "type").as("etype"),
        size($"m").as("m_size"),
        array_join(map_keys($"m"), ",").as("m_keys"),
        array_join(map_values($"m"), ",").as("m_vals"),
        element_at(str_to_map(concat(lit("a:1,u:"), $"user_id"), lit(","), lit(":")), "u").as("uid_str"))
  }

  val q37Sql: String =
    """SELECT event_id,
      |  event_type AS etype,
      |  CAST(2 AS INT) AS m_size,
      |  'type,uid' AS m_keys,
      |  concat_ws(',', event_type, user_id::VARCHAR) AS m_vals,
      |  user_id::VARCHAR AS uid_str
      |FROM events
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q38
  /** JSON family over events.props: ONE schema'd `from_json` parse per row,
    * then numeric/typed/string/`to_json`-round-trip views of the parsed
    * struct. Earlier form ran get_json_object AND from_json per row — two
    * independent tokenizations of the same text (the worst SCALING ratio in
    * r14, 9.3 at 100× data). Single-parse relies on CollapseProject's
    * cheap-expression guard: `p` is referenced four times and from_json is
    * not "cheap", so Catalyst keeps the parse in its own Project instead of
    * inlining four copies — one parse per row, still scan-shaped, still one
    * WholeStageCodegen span. */
  def q38(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    events(spark, dir)
      .withColumn("p", expr("from_json(props, 'k INT')"))
      .select(
        $"event_id",
        $"p.k".as("k_num"),
        $"p.k".as("k_parsed"),
        $"p.k".cast("string").as("k_str"),
        to_json($"p").as("k_rt"))
  }

  val q38Sql: String =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k_num,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k_parsed,
      |  json_extract_string(props, '$.k') AS k_str,
      |  concat('{"k":', json_extract_string(props, '$.k'), '}') AS k_rt
      |FROM events
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q39
  /** Iceberg partition-transform equivalents (reference `main.tf:803`,
    * SURVEY.md §2.7): `system.truncate(w, col)` for int and string columns.
    * (`system.bucket` = pmod(hash, n) is spec-verified in FunctionsSpec —
    * hash functions differ across engines so it has no SQL oracle.) */
  def q39(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    part(spark, dir)
      .groupBy(
        ($"p_size" - ($"p_size" % 10)).as("size_trunc10"),
        substring($"p_name", 1, 4).as("name_trunc4"))
      .agg(count(lit(1)).as("n_parts"))
      .orderBy($"size_trunc10", $"name_trunc4")
  }

  val q39Sql: String =
    """SELECT CAST(p_size - (p_size % 10) AS INT) AS size_trunc10,
      |  substr(p_name, 1, 4) AS name_trunc4,
      |  COUNT(*) AS n_parts
      |FROM part
      |GROUP BY 1, 2
      |ORDER BY size_trunc10, name_trunc4""".stripMargin

  /** `system.bucket(n, col)` equivalent: stable hash-bucket of a column.
    * Spark's murmur3 `hash` is deterministic across executors and releases
    * within a Spark major — the property that matters for partition layout. */
  def bucket(n: Int)(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(hash(c), lit(n))

  // ---------------------------------------------------------------- q56
  /** Table-generating functions (SURVEY.md §2.10): `posexplode` — Catalyst's
    * `Generate` operator — turning one row into one row per array element
    * with its ordinal. Generates inline with the scan (no shuffle). */
  def q56(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    part(spark, dir)
      .select($"p_partkey", posexplode(split($"p_name", " ")))
      .select($"p_partkey", $"pos".cast("long").as("pos"), $"col".as("word"))
    // no trailing global sort: result is table-sized and the checker
    // canonicalizes row order itself (a full range-shuffle buys nothing)
  }

  val q56Sql: String =
    """SELECT p_partkey, i - 1 AS pos, w[i] AS word
      |FROM (SELECT p_partkey, string_split(p_name, ' ') AS w FROM part)
      |CROSS JOIN UNNEST(range(1, len(w) + 1)) AS t(i)""".stripMargin


  // ---------------------------------------------------------------- q81
  /** Error-safe function family (ANSI-safe `try_*`): division by zero and
    * failing casts yield NULL instead of aborting the job — the behavior a
    * 100 TB pipeline needs when one malformed row must not kill the stage.
    * Pure codegen'd projection. */
  def q81(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    part(spark, dir)
      .select($"p_partkey",
        expr("try_divide(p_retailprice, p_size - p_size)").as("div0"),
        expr("try_cast(p_type AS DOUBLE)").as("bad_cast"),
        expr("try_cast(p_size AS TINYINT)").as("small_cast"))
      .orderBy($"p_partkey").limit(200)
  }

  val q81Sql: String =
    """SELECT p_partkey,
      |  p_retailprice / NULLIF(p_size - p_size, 0) AS div0,
      |  TRY_CAST(p_type AS DOUBLE) AS bad_cast,
      |  TRY_CAST(p_size AS TINYINT) AS small_cast
      |FROM part ORDER BY p_partkey LIMIT 200""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q56_fn_generate"   -> q56,
    "q81_fn_try_safe"   -> q81,
    "q33_fn_string"     -> q33,
    "q34_fn_datetime"   -> q34,
    "q35_fn_math"       -> q35,
    "q36_fn_array_ho"   -> q36,
    "q37_fn_map"        -> q37,
    "q38_fn_json"       -> q38,
    "q39_fn_transforms" -> q39)

  val oracleSql: Map[String, String] = Map(
    "q56_fn_generate"   -> q56Sql,
    "q81_fn_try_safe"   -> q81Sql,
    "q33_fn_string"     -> q33Sql,
    "q34_fn_datetime"   -> q34Sql,
    "q35_fn_math"       -> q35Sql,
    "q36_fn_array_ho"   -> q36Sql,
    "q37_fn_map"        -> q37Sql,
    "q38_fn_json"       -> q38Sql,
    "q39_fn_transforms" -> q39Sql)
}
