package graft

import graft.queries.Sampling

/** Deterministic splitting/sampling invariants + the 100 TB plan shape. */
class SamplingSpec extends SparkSpec {

  test("q57 hash split is total, deterministic, and roughly 80/10/10") {
    val rows = Sampling.q57(spark, sf).collect()
    assert(rows.length == 500)
    val bySplit = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > 300, s"train share off: $bySplit")
    assert(bySplit("val") < 120 && bySplit("test") < 120, s"holdout share off: $bySplit")
    // deterministic: a second run assigns identically
    val again = Sampling.q57(spark, sf).collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getString(1))).toSeq)
  }

  test("q58 stratified sample balances classes near the rarest class size") {
    val docs = Tables.documents(spark, sf)
    val minClass = docs.groupBy("lang").count().collect().map(_.getLong(1)).min
    val sampled = Sampling.q58(spark, sf).collect()
    val perLang = sampled.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // hash-threshold sampling: each class lands within binomial noise of m
    perLang.foreach { case (lang, n) =>
      assert(math.abs(n - minClass) <= math.max(5L, minClass / 2),
        s"$lang sampled $n vs target $minClass")
    }
  }

  test("q58 plans with no window and no global sort before the output order") {
    val plan = Sampling.q58(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "per-class rank window would funnel a hot class")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 1, "class counts should broadcast")
    // the only single-partition exchange allowed is the scalar min(cnt)
    // aggregate over the tiny per-class count table
    assert(!plan.contains("Exchange SinglePartition") || plan.contains("partial_min"),
      s"unexpected funnel:\n${plan.linesIterator.take(20).mkString("\n")}")
  }

  test("q127 WOE bins partition the table and IV parts are internally consistent") {
    val rows = Sampling.q127(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L), "exactly bins 1..10 in order")
    val total = Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total, "bins must partition all orders")
    // bins are contiguous value ranges: each bin's hi ≤ next bin's lo
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo") + 0.01, "bins overlap")
    }
    rows.foreach { r =>
      val (g, bad) = (r.getAs[Long]("n_good"), r.getAs[Long]("n_bad"))
      assert(g + bad == r.getAs[Long]("n"))
      val tg = rows.map(_.getAs[Long]("n_good")).sum.toDouble
      val tb = rows.map(_.getAs[Long]("n_bad")).sum.toDouble
      val woe = math.log((g / tg) / (bad / tb))
      assert(math.abs(r.getAs[Double]("woe") - woe) < 1e-5)
      assert(math.abs(r.getAs[Double]("iv_part") - (g / tg - bad / tb) * woe) < 1e-5)
    }
  }

  test("q127 plans with NO window: bin edges come from one percentile aggregate") {
    val plan = Sampling.q127(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "decile binning must not be a global ntile window (single-partition sort)")
  }
}
