package graft

import graft.functions.FreqSketch

/** Misra–Gries heavy hitters: exactness below capacity, the DETERMINISTIC
  * n/(k+1) error guarantee, merge preservation of the bound, byte
  * round-trip, and the partial→final Spark plan. */
class FreqSketchSpec extends SparkSpec {

  // zipf-ish stream: item i (1..m) appears ceil(C/i) times, shuffled
  private def zipf(m: Int, c: Int, seed: Int): (Vector[String], Map[String, Long]) = {
    val items = (1 to m).flatMap(i => Vector.fill(math.ceil(c.toDouble / i).toInt)(s"w$i"))
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    (new scala.util.Random(seed).shuffle(items.toVector), truth)
  }

  test("exact when distinct items fit in k") {
    val s = new FreqSketch.State(64)
    val data = Seq("a", "b", "a", "c", "a", "b")
    data.foreach(s.update(_))
    assert(s.top == Seq(("a", 3L), ("b", 2L), ("c", 1L)))
    assert(s.n == 6)
  }

  test("MG guarantee: counts within n/(k+1), every true-heavy item present") {
    val k = 64
    val (data, truth) = zipf(2000, 2000, 11)
    val s = new FreqSketch.State(k)
    data.foreach(s.update(_))
    val n = data.size.toLong
    assert(s.n == n)
    val bound = n / (k + 1) + 1
    val est = s.top.toMap
    // stored counts never exceed the truth and undershoot by at most n/(k+1)
    est.foreach { case (item, c) =>
      assert(c <= truth(item), s"$item overcounted: $c > ${truth(item)}")
      assert(truth(item) - c <= bound, s"$item undershoots past the bound")
    }
    // the deterministic guarantee: true frequency > n/(k+1) => present
    truth.filter(_._2 > bound).keys.foreach { item =>
      assert(est.contains(item), s"guaranteed heavy item $item missing")
    }
  }

  test("merged partial sketches keep the guarantee (doubled bound per Agarwal et al.)") {
    val k = 64
    val (data, truth) = zipf(2000, 2000, 12)
    val parts = data.grouped(data.size / 8 + 1).map { chunk =>
      val p = new FreqSketch.State(k)
      chunk.foreach(p.update(_))
      FreqSketch.serialize(p)
    }.toVector
    val m = new FreqSketch.State(k)
    parts.foreach(b => m.mergeIn(FreqSketch.deserialize(b)))
    val n = data.size.toLong
    assert(m.n == n)
    val bound = n / (k + 1) + 1
    val est = m.top.toMap
    est.foreach { case (item, c) => assert(c <= truth(item)) }
    // merging k-sized summaries k-truncates once more: 2x the single-pass
    // undershoot is the published mergeable-summaries bound
    truth.filter(_._2 > 2 * bound).keys.foreach { item =>
      assert(est.contains(item), s"heavy item $item lost in merge")
    }
  }

  test("serialized bytes round-trip exactly") {
    val s = new FreqSketch.State(8)
    Seq("x", "y", "x", "z", "z", "z").foreach(s.update(_))
    val bytes = FreqSketch.serialize(s)
    val back = FreqSketch.deserialize(bytes)
    assert(back.n == s.n && back.top == s.top)
    assert(FreqSketch.topFrom(bytes, 2) == Seq("z:3", "x:2"))
  }

  test("Spark aggregate: heavy hitters per group via partial->final combine") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // per group: item "hot" dominates, tail of 500 distinct cold items
    val df = spark.range(0, 40000)
      .select(($"id" % 2).as("g"),
        when($"id" % 4 < 2, lit("hot")).otherwise(concat(lit("cold"), $"id" % 500)).as("item"))
      .repartition(8)
    val agged = df.groupBy($"g").agg(graft.functions.FreqSketch($"item").as("sk"))
    val plan = agged.queryExecution.executedPlan.toString
    assert(plan.contains("partial_freq_sketch"), s"no partial aggregation:\n$plan")
    agged.collect().foreach { r =>
      val top = FreqSketch.topFrom(r.getAs[Array[Byte]]("sk"), 1)
      assert(top.head.startsWith("hot:"), s"g=${r.getLong(0)} top=$top")
      // "hot" is half of the group's 20000 rows; MG undershoot <= 2n/(k+1)
      val c = top.head.split(":")(1).toLong
      assert(c >= 10000 - 2 * 20000 / 65 - 1 && c <= 10000, s"hot count $c")
    }
  }

  test("non-string input fails at analysis time, not with a runtime CCE") {
    import spark.implicits._
    val df = spark.range(0, 10).toDF("id")
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(graft.functions.FreqSketch($"id").as("sk")).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("string"), ex.getMessage)
  }
}
