package graft

import org.apache.spark.sql.SparkSession

/** Fixture-schema canary (VERDICT r9/r10 carry-over): the driver regenerates
  * `/root/testdata/sf*` between rounds, and a silent schema drift (round 9's
  * events.ts ns→µs flip) crashes queries mid-round with opaque errors. This
  * contract pins every fixture table's column names and acceptable Spark
  * types — including BOTH observed timestamp vintages — and reports any
  * drift as an explicit, loud message naming the table/column instead of
  * letting 10 queries die on a cast.
  *
  * Checked in two places: FixtureCanarySpec (fails `sbt test`) and at the
  * top of Verify.main (prints a `[fixture-drift]` banner per finding but
  * still runs the queries, so one drifted table costs its own queries, not
  * the whole round).
  */
object FixtureContract {

  /** timestamp vintages seen so far: parquet timestamp[us] surfaces as
    * TIMESTAMP or TIMESTAMP_NTZ depending on isAdjustedToUTC; the old ns
    * vintage reads as bigint under `nanosAsLong`. */
  private val Ts = Set("timestamp", "timestamp_ntz")
  private val TsOrNs = Ts + "bigint"

  /** table -> (column -> acceptable Spark `DataType.simpleString` values). */
  val expected: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Seq(
      "n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Seq(
      "c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq(
      "s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Seq(
      "p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Seq(
      "o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> Ts, "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq(
      "l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> Ts),
    "events" -> Seq(
      "event_id" -> Set("bigint"), "ts" -> TsOrNs,
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq(
      "doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq(
      "vec_id" -> Set("bigint"), "embedding" -> Set("array<float>"),
      "label" -> Set("int")))

  /** Returns one human-readable drift message per finding; empty = clean.
    * Reads parquet footers only (schema inference), no data scan. */
  def drift(spark: SparkSession, dir: String): Seq[String] = {
    // the old events.ts ns vintage needs this to be readable at all
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val path = s"$dir/$table.parquet"
      scala.util.Try(spark.read.parquet(path).schema) match {
        case scala.util.Failure(e) =>
          Seq(s"fixture drift: $table unreadable at $path: ${e.getMessage}")
        case scala.util.Success(schema) =>
          val got = schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
          val missing = cols.collect { case (c, _) if !got.contains(c) =>
            s"fixture drift: $table.$c missing (have: ${schema.fieldNames.mkString(", ")})" }
          val extra = (got.keySet -- cols.map(_._1)).toSeq.sorted.map(c =>
            s"fixture drift: $table.$c unexpected new column (${got(c)})")
          val wrongType = cols.collect {
            case (c, ok) if got.contains(c) && !ok(got(c)) =>
              s"fixture drift: $table.$c type ${got(c)} not in accepted {${ok.mkString(", ")}}" }
          missing ++ extra ++ wrongType
      }
    }
  }

  /** Throw with every finding listed — the spec-facing entry point. */
  def assertClean(spark: SparkSession, dir: String): Unit = {
    val d = drift(spark, dir)
    if (d.nonEmpty) throw new IllegalStateException(
      s"${d.size} fixture drift(s) at $dir:\n  ${d.mkString("\n  ")}")
  }
}
