package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Scd2
import graft.table.GraftTable

/** SCD Type-2 dimension maintenance: close+version on change, insert on
  * new keys, no-op on unchanged batches, exactly one current row per key,
  * gap-free interval chains, point-in-time reads. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory(java.nio.file.Paths.get("target"), "scd2-").resolve("d").toString

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def rows(t: GraftTable) = t.read
    .select($"cust_id", $"tier", $"city", $"scd_start_ts", $"scd_end_ts", $"scd_is_current")
    .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5)))
    .sortBy(r => (r._1, r._4.getTime))

  test("change closes the old version, inserts the new; unchanged and new keys behave") {
    val dim = Scd2.initialize(spark, tmp(),
      Seq((1L, "gold", "paris", ts("2024-01-01 00:00:00")),
          (2L, "silver", "rome", ts("2024-01-01 00:00:00")))
        .toDF("cust_id", "tier", "city", "eff_ts"), "cust_id", "eff_ts")

    // batch: 1 changes tier, 2 unchanged, 3 brand new
    Scd2.applyChanges(dim, Seq(
      (1L, "platinum", "paris", ts("2024-02-01 00:00:00")),
      (2L, "silver", "rome", ts("2024-02-01 00:00:00")),
      (3L, "gold", "oslo", ts("2024-02-01 00:00:00")))
      .toDF("cust_id", "tier", "city", "eff_ts"), "cust_id", "eff_ts")

    val t = GraftTable.load(spark, dim.path)
    val r = rows(t)
    assert(r.map(x => (x._1, x._2, x._6)).toSeq == Seq(
      (1L, "gold", false), (1L, "platinum", true),
      (2L, "silver", true), (3L, "gold", true)), r.mkString("\n"))
    // the closed row's end == the successor's start (gap-free chain)
    val closed = r.find(x => x._1 == 1L && !x._6).get
    val open = r.find(x => x._1 == 1L && x._6).get
    assert(closed._5.contains(open._4))
    // exactly one current row per key
    assert(t.read.filter($"scd_is_current").groupBy($"cust_id").count()
      .filter($"count" > 1).isEmpty)
  }

  test("re-applying the same batch is a no-op (idempotent ingestion)") {
    val dim = Scd2.initialize(spark, tmp(),
      Seq((1L, "gold", "paris", ts("2024-01-01 00:00:00")))
        .toDF("cust_id", "tier", "city", "eff_ts"), "cust_id", "eff_ts")
    val batch = Seq((1L, "platinum", "paris", ts("2024-02-01 00:00:00")))
      .toDF("cust_id", "tier", "city", "eff_ts")
    Scd2.applyChanges(dim, batch, "cust_id", "eff_ts")
    val v = GraftTable.load(spark, dim.path).log.currentVersion
    Scd2.applyChanges(GraftTable.load(spark, dim.path), batch, "cust_id", "eff_ts")
    val t = GraftTable.load(spark, dim.path)
    assert(t.read.count() == 2, "no new versions for an unchanged re-apply")
    // (the merge may commit an empty change set; rows are what must hold)
    assert(rows(t).count(_._6) == 1)
  }

  test("null-safe drift: a NULL attribute does not re-version every batch") {
    val dim = Scd2.initialize(spark, tmp(),
      Seq((1L, null.asInstanceOf[String], "paris", ts("2024-01-01 00:00:00")))
        .toDF("cust_id", "tier", "city", "eff_ts"), "cust_id", "eff_ts")
    Scd2.applyChanges(dim, Seq((1L, null.asInstanceOf[String], "paris", ts("2024-02-01 00:00:00")))
      .toDF("cust_id", "tier", "city", "eff_ts"), "cust_id", "eff_ts")
    assert(GraftTable.load(spark, dim.path).read.count() == 1, "null == null, no drift")
    // but null -> value IS drift
    Scd2.applyChanges(GraftTable.load(spark, dim.path),
      Seq((1L, "gold", "paris", ts("2024-03-01 00:00:00")))
        .toDF("cust_id", "tier", "city", "eff_ts"), "cust_id", "eff_ts")
    assert(GraftTable.load(spark, dim.path).read.count() == 2)
  }

  test("property: random batch sequences ≡ a plain-Scala SCD2 replay") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // each batch: for keys 1..4, an optional new tier value
    val batchGen = Gen.listOfN(4, Gen.option(Gen.oneOf("a", "b", "c")))
    val seqGen = Gen.listOfN(4, batchGen)
    val prop = Prop.forAllNoShrink(seqGen) { batches =>
      val dim = Scd2.initialize(spark, tmp(),
        Seq((1L, "z", "x", ts("2024-01-01 00:00:00")))
          .toDF("cust_id", "tier", "city", "eff_ts"), "cust_id", "eff_ts")
      // plain-Scala reference: key -> list of (tier, start)
      var ref = Map(1L -> List(("z", 1)))
      batches.zipWithIndex.foreach { case (batch, bi) =>
        val t0 = ts(f"2024-02-0${bi + 1}%d 00:00:00")
        val rows = batch.zipWithIndex.collect { case (Some(tier), ki) =>
          (ki + 1L, tier, "x", t0)
        }
        if (rows.nonEmpty) {
          Scd2.applyChanges(GraftTable.load(spark, dim.path),
            rows.toDF("cust_id", "tier", "city", "eff_ts"), "cust_id", "eff_ts")
          rows.foreach { case (k, tier, _, _) =>
            val chain = ref.getOrElse(k, Nil)
            if (chain.headOption.map(_._1) != Some(tier))
              ref += k -> ((tier, bi + 2) :: chain)
          }
        }
      }
      val t = GraftTable.load(spark, dim.path)
      val cur = t.read.filter($"scd_is_current")
        .select($"cust_id", $"tier").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val versions = t.read.groupBy($"cust_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val refCur = ref.view.mapValues(_.head._1).toMap
      val refVer = ref.view.mapValues(_.size.toLong).toMap
      cur == refCur && versions == refVer &&
        t.read.filter($"scd_is_current").groupBy($"cust_id").count()
          .filter($"count" > 1).isEmpty
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }

  test("asOf reads the version current at a point in time, across the chain") {
    val dim = Scd2.initialize(spark, tmp(),
      Seq((1L, "gold", "paris", ts("2024-01-01 00:00:00")))
        .toDF("cust_id", "tier", "city", "eff_ts"), "cust_id", "eff_ts")
    Scd2.applyChanges(dim, Seq((1L, "silver", "paris", ts("2024-02-01 00:00:00")))
      .toDF("cust_id", "tier", "city", "eff_ts"), "cust_id", "eff_ts")
    val t = GraftTable.load(spark, dim.path)
    Scd2.applyChanges(t, Seq((1L, "bronze", "paris", ts("2024-03-01 00:00:00")))
      .toDF("cust_id", "tier", "city", "eff_ts"), "cust_id", "eff_ts")
    val t2 = GraftTable.load(spark, dim.path)
    def tierAt(s: String): Seq[String] =
      Scd2.asOf(t2, lit(ts(s))).select($"tier").as[String].collect().toSeq
    assert(tierAt("2024-01-15 00:00:00") == Seq("gold"))
    assert(tierAt("2024-02-15 00:00:00") == Seq("silver"))
    assert(tierAt("2024-03-15 00:00:00") == Seq("bronze"))
    // boundary: end is EXCLUSIVE, start inclusive
    assert(tierAt("2024-02-01 00:00:00") == Seq("silver"))
    assert(tierAt("2023-12-01 00:00:00").isEmpty)
  }
}
