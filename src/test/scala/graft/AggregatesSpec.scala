package graft

import org.apache.spark.sql.functions._
import graft.queries.Aggregates

class AggregatesSpec extends SparkSpec {

  test("every aggregate query runs and returns rows at sf0.001") {
    Aggregates.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }

  test("every aggregate query has an oracle (sketch queries emit verdicts)") {
    assert(Aggregates.queries.keySet -- Aggregates.oracleSql.keySet == Set.empty)
  }

  test("q21 HLL verdict: exact counts match recomputation, bound verdicts all true") {
    val got = Aggregates.q21(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4))).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("parts"),
        countDistinct(col("l_orderkey")).as("orders"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == exact.keySet)
    exact.foreach { case (flag, (parts, orders)) =>
      val (eParts, eOrders, okParts, okOrders) = got(flag)
      assert(eParts == parts && eOrders == orders,
        s"$flag exact columns drifted: ($eParts,$eOrders) vs ($parts,$orders)")
      assert(okParts && okOrders,
        s"$flag HLL estimate outside its advertised bound")
    }
  }

  test("q14 rollup group counts: (s,p) + (s) + ()") {
    val df = Aggregates.q14(spark, sf)
    val byGid = df.groupBy("gid").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val statuses = Tables.orders(spark, sf).select("o_orderstatus").distinct().count()
    assert(byGid(3L) == 1L)        // grand total
    assert(byGid(1L) == statuses)  // per-status subtotals
    assert(byGid.getOrElse(0L, 0L) > 0)
  }

  test("q17 having: every surviving group satisfies both predicates") {
    val rows = Aggregates.q17(spark, sf).collect()
    assert(rows.forall(r =>
      r.getAs[Long]("n_orders") >= 12 && r.getAs[Double]("total_spent") > 100000.0))
  }

  test("q128 moments match a driver-side exact recomputation per event type") {
    val got = Aggregates.q128(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val vals = Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).toSeq).toMap
    assert(got.keySet == vals.keySet)
    vals.foreach { case (t, xs) =>
      val n = xs.length.toDouble
      val mu = xs.sum / n
      val m2 = xs.map(x => (x - mu) * (x - mu)).sum / n
      val m3 = xs.map(x => math.pow(x - mu, 3)).sum / n
      val m4 = xs.map(x => math.pow(x - mu, 4)).sum / n
      val r = got(t)
      // centered two-pass vs the query's raw power sums: agree to ~1e-6 rel
      assert(math.abs(r.getAs[Double]("mean") - mu) < 1e-4, s"$t mean")
      assert(math.abs(r.getAs[Double]("stddev_pop") - math.sqrt(m2)) < 1e-4, s"$t sd")
      assert(math.abs(r.getAs[Double]("skewness") - m3 / (m2 * math.sqrt(m2))) < 1e-3, s"$t skew")
      assert(math.abs(r.getAs[Double]("excess_kurtosis") - (m4 / (m2 * m2) - 3)) < 1e-3, s"$t kurt")
    }
  }

  test("q128 plans as one partial->final aggregate pass (no second scan for the mean)") {
    val plan = Aggregates.q128(spark, sf).queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).size <= 4, // partial+final, maybe sort-agg fallback pair
      s"unexpected aggregate cascade:\n${plan.linesIterator.take(12).mkString("\n")}")
    assert(!plan.contains("Join"), "moment profile must not need a join")
  }
}
