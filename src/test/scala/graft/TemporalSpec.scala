package graft

import org.apache.spark.sql.functions._
import graft.queries.Temporal

/** Event-time query invariants (the module previously rode on the Verify
  * oracle gate alone; this adds the standard smoke loop + targeted checks
  * for the changepoint / seasonal-anomaly pair). */
class TemporalSpec extends SparkSpec {

  test("every temporal query runs and returns rows at sf0.001") {
    Temporal.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }

  test("every temporal query has an oracle") {
    assert(Temporal.oracleSql.keySet == Temporal.queries.keySet)
  }

  test("q131 changepoint: scores recompute from raw trailing/leading windows") {
    import spark.implicits._
    val got = Temporal.q131(spark, sf).collect()
    assert(got.nonEmpty)
    // replay one flagged user driver-side from the raw ordered series
    val u = got.head.getLong(0)
    val series = Tables.events(spark, sf).filter($"user_id" === u)
      .select($"ts", $"event_id", $"value").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    val flagged = got.filter(_.getLong(0) == u)
      .map(r => r.getLong(1) -> r.getAs[Double]("score")).toMap
    series.indices.foreach { i =>
      if (i >= 9 && i + 10 < series.length) {
        val pre = series.slice(i - 9, i + 1).map(_._3)
        val post = series.slice(i + 1, i + 11).map(_._3)
        val score = math.abs(post.sum / 10 - pre.sum / 10)
        val id = series(i)._2
        if (score >= 40.5) // margin: decimal(8,4) fold vs double replay
          assert(flagged.contains(id), s"missed changepoint at event $id score=$score")
        if (flagged.contains(id))
          assert(math.abs(flagged(id) - score) < 0.01, s"score drift at $id")
      }
    }
  }

  test("q131 interior-only: every flagged event has full windows on both sides") {
    import spark.implicits._
    val perUser = Tables.events(spark, sf).groupBy($"user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Temporal.q131(spark, sf).collect().groupBy(_.getLong(0)).foreach { case (u, rows) =>
      assert(perUser(u) >= 20, s"user $u flagged with fewer than 20 events")
    }
  }

  test("q132 seasonal anomaly: every kept ratio recomputes from the (type,hour) baseline") {
    import spark.implicits._
    val got = Temporal.q132(spark, sf).collect()
    assert(got.nonEmpty)
    val base = Tables.events(spark, sf)
      .groupBy($"event_type", hour($"ts").as("hr"))
      .agg(avg($"value").as("b")).collect()
      .map(r => (r.getString(0), r.getInt(1).toLong) -> r.getDouble(2)).toMap
    got.foreach { r =>
      val b = base((r.getString(1), r.getLong(2)))
      assert(math.abs(r.getAs[Double]("baseline") - b) < 0.01)
      assert(r.getAs[Double]("ratio") >= 5.0 - 1e-4)
      assert(math.abs(r.getAs[Double]("ratio") - r.getAs[Double]("value") / b) < 0.01)
    }
  }

  test("q132 plans the baseline as a broadcast join — no fact-table window or extra shuffle") {
    val plan = Temporal.q132(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "baseline must broadcast")
    assert(!plan.contains("Window"), "no window needed for the seasonal baseline")
  }
}
