package graft

import org.apache.spark.sql.functions._
import graft.queries.Windows

class WindowsSpec extends SparkSpec {

  test("every window query runs and returns rows at sf0.001") {
    Windows.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }

  test("every window query has an oracle") {
    assert(Windows.oracleSql.keySet == Windows.queries.keySet)
  }

  test("q22 row_number is a permutation of 1..n within each partition") {
    val df = Windows.q22(spark, sf)
    val bad = df.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), max("rn").as("max_rn"), countDistinct("rn").as("d_rn"))
      .filter(col("n") =!= col("max_rn") || col("n") =!= col("d_rn"))
    assert(bad.count() == 0)
  }

  test("q24 running_qty ends at the partition's total quantity") {
    val df = Windows.q24(spark, sf)
    val last = df.groupBy("l_orderkey").agg(max("running_qty").as("final_run"))
    val totals = Tables.lineitem(spark, sf).groupBy("l_orderkey")
      .agg(round(sum(col("l_quantity").cast("decimal(18,2)")).cast("double"), 2).as("tot"))
    val diff = last.join(totals, "l_orderkey")
      .filter(abs(col("final_run") - col("tot")) > 0.001)
    assert(diff.count() == 0)
  }

  test("q25 trailing window includes at least the current row") {
    val rows = Windows.q25(spark, sf).collect()
    assert(rows.forall(_.getAs[Long]("trailing_30d_orders") >= 1L))
  }

  test("q129 pareto: shares are monotone to 1.0 and the 80% flag is a prefix") {
    val rows = Windows.q129(spark, sf).collect()
    assert(rows.map(_.getLong(1)).toSeq == (1L to rows.length))
    val shares = rows.map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b + 1e-9 })
    assert(math.abs(shares.last - 1.0) < 1e-6)
    // revenues ranked descending
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    // in_top80 is a contiguous prefix: once false, never true again
    val flags = rows.map(_.getAs[Boolean]("in_top80"))
    assert(!flags.zip(flags.tail).exists { case (a, b) => !a && b })
    assert(flags.head, "top brand is always inside the 80% bucket")
  }
}
