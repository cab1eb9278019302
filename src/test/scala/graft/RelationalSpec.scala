package graft

import graft.queries.Relational

class RelationalSpec extends SparkSpec {

  test("every relational query runs and returns rows at sf0.001") {
    Relational.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every relational query has an oracle") {
    assert(Relational.oracleSql.keySet == Relational.queries.keySet)
  }

  test("q01 aggregates correctly against a hand check") {
    val rows = Relational.q01(spark, sf).collect()
    // groups are the (returnflag, linestatus) pairs; counts sum to filtered rows
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val filtered = Tables.lineitem(spark, sf)
      .filter(org.apache.spark.sql.functions.col("l_shipdate") <= "1998-09-02").count()
    assert(total == filtered)
    assert(rows.forall(r => r.getAs[Double]("sum_qty") > 0))
  }

  test("q10 anti join: result customers have no URGENT orders") {
    import org.apache.spark.sql.functions._
    val anti = Relational.q10(spark, sf).select("c_custkey")
    val withUrgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey")).distinct()
    assert(anti.join(withUrgent, Seq("c_custkey"), "inner").count() == 0)
  }

  test("q08 full outer covers union of nation keys from both sides") {
    val nk = Relational.q08(spark, sf).select("nk").collect().map(_.getInt(0)).toSet
    val c = Tables.customer(spark, sf).select("c_nationkey").distinct().collect().map(_.getInt(0)).toSet
    val s = Tables.supplier(spark, sf).select("s_nationkey").distinct().collect().map(_.getInt(0)).toSet
    assert(nk == (c union s))
  }

  test("q130 audit: one row per check, rates consistent, FK checks clean on fixtures") {
    val rows = Relational.q130(spark, sf).collect()
    assert(rows.length == 7)
    assert(rows.map(_.getString(0)).distinct.length == 7)
    rows.foreach { r =>
      val (bad, checked) = (r.getLong(1), r.getLong(2))
      assert(bad >= 0 && bad <= checked)
      assert(math.abs(r.getAs[Double]("bad_rate") - bad.toDouble / checked) < 1e-6)
    }
    // fixture FKs are intact in the child->parent direction
    val byName = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName("lineitem_orphan_order") == 0)
    assert(byName("lineitem_orphan_part") == 0)
    assert(byName("order_orphan_customer") == 0)
  }

  test("q130 plans every FK probe as an anti join with broadcast dims") {
    val plan = Relational.q130(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert("LeftAnti".r.findAllIn(plan).size >= 5, "five FK checks must be anti joins")
  }
}
