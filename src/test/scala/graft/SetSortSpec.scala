package graft

import org.apache.spark.sql.functions._
import graft.queries.SetSort

class SetSortSpec extends SparkSpec {

  test("every set/sort query runs and returns rows at sf0.001") {
    SetSort.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }

  test("every set/sort query has an oracle") {
    assert(SetSort.oracleSql.keySet == SetSort.queries.keySet)
  }

  test("q27 union distinct equals the distinct union of both key sets") {
    val got = SetSort.q27(spark, sf).collect().map(_.getInt(0)).toSet
    val c = Tables.customer(spark, sf).select("c_nationkey").collect().map(_.getInt(0)).toSet
    val s = Tables.supplier(spark, sf).select("s_nationkey").collect().map(_.getInt(0)).toSet
    assert(got == (c union s))
  }

  test("q30 top-k is sorted descending and bounded by k") {
    val prices = SetSort.q30(spark, sf).collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.length <= 100)
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q30 plans as TakeOrderedAndProject (no global sort)") {
    val plan = SetSort.q30(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q29 except-all multiplicity: |F ∖ O| counts match manual bag difference") {
    val f = Tables.orders(spark, sf).filter(col("o_orderstatus") === "F")
      .groupBy("o_custkey", "o_orderpriority").count().withColumnRenamed("count", "nf")
    val o = Tables.orders(spark, sf).filter(col("o_orderstatus") === "O")
      .groupBy("o_custkey", "o_orderpriority").count().withColumnRenamed("count", "no")
    val expected = f.join(o, Seq("o_custkey", "o_orderpriority"), "left")
      .select(greatest(col("nf") - coalesce(col("no"), lit(0L)), lit(0L)).as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(SetSort.q29(spark, sf).count() == expected)
  }
}
