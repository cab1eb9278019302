package graft

import org.apache.spark.sql.functions._
import graft.queries.Advanced
import graft.operators.Skew

/** Advanced shapes: decorrelated scalar subqueries, unpivot, and the
  * salted skew-join's result-identity + plan-shape guarantees. */
class AdvancedSpec extends SparkSpec {
  import spark.implicits._

  test("q59 decorrelates: no per-row subquery, plans as aggregate + join") {
    val df = Advanced.q59(spark, sf)
    assert(df.count() > 0)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("ScalarSubquery"), "subquery not decorrelated:\n" + plan.take(800))
    assert(plan.contains("Join"), plan.take(400))
  }

  test("q60 unpivot emits exactly 3 rows per group, counts preserved") {
    val rows = Advanced.q60(spark, sf).collect()
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length == 3))
    val total = rows.map(_.getLong(2)).sum
    assert(total == Tables.orders(spark, sf).count())
  }

  test("salted join returns exactly the plain join's rows") {
    val li = Tables.lineitem(spark, sf).select($"l_partkey", $"l_quantity")
    val p = Tables.part(spark, sf).select($"p_partkey".as("l_partkey"), $"p_brand")
    val salted = Skew.saltedJoin(li, p, "l_partkey", salts = 4)
    val plain = li.join(p, "l_partkey")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
    // the join keys really carry the salt (hot keys spread across reducers)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), "salt missing from join keys:\n" + plan.take(600))
  }

  test("salted collect_list gathers the same elements as the direct one") {
    val df = Tables.orders(spark, sf).select(($"o_custkey" % 5).as("k"), $"o_orderkey")
    val salted = Skew.saltedCollect(df, "k", "o_orderkey", salts = 4)
      .select($"k", explode($"o_orderkey_all").as("v"))
    val direct = df.select($"k", $"o_orderkey".as("v"))
    assert(salted.exceptAll(direct).count() == 0 && direct.exceptAll(salted).count() == 0)
  }
}
