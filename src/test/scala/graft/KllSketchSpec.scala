package graft

import graft.functions.KllSketch
import org.scalatest.funsuite.AnyFunSuite

/** KLL quantile sketch: exactness below capacity, rank-error bounds at
  * 100k values, merge associativity bounds, byte round-trip, and the
  * partial→final Spark aggregation plan. */
class KllSketchSpec extends AnyFunSuite with SparkSpec {

  private def freshState(values: Seq[Double], k: Int = KllSketch.DefaultK): KllSketch.State = {
    val s = new KllSketch.State(k)
    values.foreach(s.update)
    s
  }

  test("below capacity the sketch is exact") {
    val vals = new scala.util.Random(7).shuffle((1 to 100).toVector).map(_.toDouble)
    val s = freshState(vals)
    for (p <- Seq(0.1, 0.25, 0.5, 0.75, 0.9)) {
      val exact = (1 to 100).map(_.toDouble).apply(math.max(1, math.ceil(p * 100).toInt) - 1)
      assert(s.quantile(p) == exact, s"p=$p")
    }
  }

  test("rank error stays bounded at 100k values (uniform and skewed)") {
    val n = 100000
    val uniform = new scala.util.Random(42).shuffle((1 to n).toVector).map(_.toDouble)
    // skewed: 90% mass in [0,1), long tail to 10^6
    val skewed = new scala.util.Random(43).shuffle(
      (1 to n).toVector.map(i => if (i % 10 == 0) i.toDouble * 10 else i.toDouble / n))
    def rankOf(sorted: Vector[Double], v: Double): Int = {
      // count of elements <= v
      var lo = 0; var hi = sorted.length
      while (lo < hi) { val m = (lo + hi) / 2; if (sorted(m) <= v) lo = m + 1 else hi = m }
      lo
    }
    for ((data, label) <- Seq((uniform, "uniform"), (skewed, "skewed"))) {
      val s = freshState(data)
      val sorted = data.sorted
      for (p <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
        val est = s.quantile(p)
        val err = math.abs(rankOf(sorted, est) - p * n)
        assert(err <= 0.04 * n, s"$label p=$p est=$est rank-err=$err")
      }
    }
  }

  test("merging partial sketches stays within the same bound, any merge order") {
    val n = 100000
    val data = new scala.util.Random(44).shuffle((1 to n).toVector).map(_.toDouble)
    val parts = data.grouped(n / 16 + 1).map(c => freshState(c)).toVector
    def mergeAll(ps: Seq[KllSketch.State]): KllSketch.State = {
      val acc = new KllSketch.State(KllSketch.DefaultK)
      ps.foreach(p => acc.mergeIn(KllSketch.deserialize(KllSketch.serialize(p))))
      acc
    }
    val fwd = mergeAll(parts)
    val rev = mergeAll(parts.reverse)
    assert(fwd.n == n && rev.n == n)
    for (m <- Seq(fwd, rev); p <- Seq(0.1, 0.5, 0.9)) {
      val err = math.abs(m.quantile(p) - p * n)
      assert(err <= 0.04 * n, s"p=$p merged est=${m.quantile(p)}")
    }
  }

  test("serialized bytes round-trip exactly") {
    val s = freshState((1 to 5000).map(_.toDouble * 1.5))
    val bytes = KllSketch.serialize(s)
    val back = KllSketch.deserialize(bytes)
    assert(java.util.Arrays.equals(KllSketch.serialize(back), bytes))
    assert(KllSketch.countFrom(bytes) == 5000)
    assert(KllSketch.quantileFrom(bytes, 0.5) == s.quantile(0.5))
  }

  test("q104: rank-error verdicts all true, group sizes exact") {
    import org.apache.spark.sql.functions._
    val res = graft.queries.Aggregates.q104(spark, sf).collect()
    assert(res.nonEmpty)
    val sizes = graft.Tables.events(spark, sf).groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(res.map(_.getString(0)).toSet == sizes.keySet)
    res.foreach { r =>
      val et = r.getString(0)
      assert(r.getLong(1) == sizes(et), s"$et group size drifted")
      assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4),
        s"$et: a KLL estimate's exact rank fell outside p±0.05")
    }
  }

  test("Spark aggregate: per-group quantiles via partial->final combine") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 100000)
      .select(($"id" % 4).as("g"), $"id".cast("double").as("v"))
      .repartition(8)
    val agged = df.groupBy($"g").agg(KllSketch($"v").as("sk"))
    // map-side combine: the physical plan must carry a partial kll_sketch
    val plan = agged.queryExecution.executedPlan.toString
    assert(plan.contains("partial_kll_sketch"), s"no partial aggregation:\n$plan")
    val rows = agged.collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val g = r.getLong(0)
      val med = KllSketch.quantileFrom(r.getAs[Array[Byte]]("sk"), 0.5)
      // group g holds {g, g+4, g+8, ...}: true median ~ 50000 + g
      assert(math.abs(med - 50000.0) <= 4000.0, s"g=$g med=$med")
      assert(KllSketch.countFrom(r.getAs[Array[Byte]]("sk")) == 25000)
    }
  }

  test("kll_merge rollup: per-group sketch blobs re-aggregate to bounded global quantiles") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val n = 100000
    val df = spark.range(0, n)
      .select(($"id" % 16).as("g"), $"id".cast("double").as("v"))
      .repartition(8)
    df.groupBy($"g").agg(expr("kll_sketch(v)").as("sk"))
      .createOrReplaceTempView("sketch_layer")
    // the summary-layer query: roll 16 blobs up, never rescanning rows
    val merged = spark.sql(
      "SELECT kll_quantile(kll_merge(sk), 0.5) AS p50, " +
        "kll_quantile(kll_merge(sk), 0.9) AS p90 FROM sketch_layer").collect()(0)
    assert(math.abs(merged.getDouble(0) - n * 0.5) <= 0.04 * n, s"p50=${merged.getDouble(0)}")
    assert(math.abs(merged.getDouble(1) - n * 0.9) <= 0.04 * n, s"p90=${merged.getDouble(1)}")
    // total mass survives the rollup exactly
    val cnt = spark.sql("SELECT kll_merge(sk) AS m FROM sketch_layer").collect()(0)
    assert(KllSketch.countFrom(cnt.getAs[Array[Byte]]("m")) == n)
  }

  test("theta_union_agg rollup: order-independent, fold-identical, bounded error") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.ThetaSketch
    // ids overlap across groups: rollup must not double-count
    val df = spark.range(0, 60000)
      .select(($"id" % 6).as("g"), ($"id" % 20000).cast("string").as("u"))
      .repartition(8)
    val perGroup = df.groupBy($"g").agg(expr("theta_sketch(u)").as("sk"))
    perGroup.createOrReplaceTempView("theta_layer")
    val rolled = ThetaSketch.estimateFrom(
      spark.sql("SELECT theta_union_agg(sk) AS m FROM theta_layer")
        .collect()(0).getAs[Array[Byte]]("m"))
    // min/∪ are commutative-associative: the aggregate must equal a manual
    // fold of the binary union in BOTH directions, bit-for-bit on estimate
    val blobs = perGroup.collect().map(_.getAs[Array[Byte]]("sk"))
    val foldL = ThetaSketch.estimateFrom(blobs.reduceLeft(ThetaSketch.unionBlobs))
    val foldR = ThetaSketch.estimateFrom(blobs.reverse.reduceLeft(ThetaSketch.unionBlobs))
    assert(rolled == foldL && rolled == foldR,
      s"agg $rolled vs folds $foldL/$foldR — union must be order-independent")
    // unbiased θ-sampling: estimate within KMV error of the 20000 true dedup
    val single = ThetaSketch.estimateFrom(
      df.agg(expr("theta_sketch(u)").as("sk")).collect()(0).getAs[Array[Byte]]("sk"))
    assert(math.abs(rolled - 20000.0) <= 0.05 * 20000.0, s"rollup estimate off: $rolled")
    assert(math.abs(single - 20000.0) <= 0.05 * 20000.0, s"single-pass off: $single")
  }

  test("kll_merge and theta_union_agg reject non-binary input at analysis time") {
    import spark.implicits._
    val df = spark.range(0, 10).select($"id".cast("double").as("v"))
    df.createOrReplaceTempView("not_sketches")
    val e1 = intercept[Exception](spark.sql("SELECT kll_merge(v) FROM not_sketches").collect())
    assert(e1.getMessage.toLowerCase.contains("binary"))
    val e2 = intercept[Exception](spark.sql("SELECT theta_union_agg(v) FROM not_sketches").collect())
    assert(e2.getMessage.toLowerCase.contains("binary"))
  }
}
