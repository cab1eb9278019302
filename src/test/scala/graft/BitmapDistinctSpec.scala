package graft

import org.apache.spark.sql.functions._
import graft.functions.BitmapDistinct

/** Exact bitmap distinct family: zero-error contract against
  * count(DISTINCT), rollup through stored blobs, overlap algebra, SQL
  * callability, and the analysis-time type gate. */
class BitmapDistinctSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (0L until 5000L)
    .map(i => (i % 7, (i * 37) % 900 - 450, s"u${i % 11}"))
    .toDF("grp", "uid", "tag") // uid spans negatives — full signed-long space

  test("bitmap_count(bitmap_agg) equals count(DISTINCT) exactly, negatives included") {
    val got = df.groupBy($"grp")
      .agg(BitmapDistinct.count(BitmapDistinct($"uid")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = df.groupBy($"grp")
      .agg(countDistinct($"uid").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("rollup over STORED blobs equals a direct global pass — the summary-layer shape") {
    val perGroup = df.groupBy($"grp").agg(BitmapDistinct($"uid").as("bm"))
    val rolled = perGroup.agg(
      BitmapDistinct.count(BitmapDistinct.unionAgg($"bm")).as("n"))
      .collect().head.getLong(0)
    val direct = df.select(countDistinct($"uid")).collect().head.getLong(0)
    assert(rolled == direct)
  }

  test("overlap algebra is exact: and / or / andnot cardinalities match set math") {
    val a = (0L until 100L).toDF("uid")
    val b = (60L until 160L).toDF("uid")
    val bmA = a.agg(BitmapDistinct($"uid").as("bm")).collect().head.getAs[Array[Byte]](0)
    val bmB = b.agg(BitmapDistinct($"uid").as("bm")).collect().head.getAs[Array[Byte]](0)
    val pair = Seq((bmA, bmB)).toDF("a", "b")
    val row = pair.select(
      BitmapDistinct.count(BitmapDistinct.setOp($"a", $"b", "and")).as("i"),
      BitmapDistinct.count(BitmapDistinct.setOp($"a", $"b", "or")).as("u"),
      BitmapDistinct.count(BitmapDistinct.setOp($"a", $"b", "andnot")).as("d"))
      .collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((40L, 160L, 60L)))
  }

  test("the family is SQL-callable through the extensions hook") {
    df.createOrReplaceTempView("bm_in")
    val row = spark.sql(
      """SELECT bitmap_count(bitmap_and(a, b)) AS i,
        |       bitmap_count(bitmap_or(a, b)) AS u
        |FROM (SELECT bitmap_agg(CASE WHEN grp < 4 THEN uid END) AS a,
        |             bitmap_agg(CASE WHEN grp >= 2 THEN uid END) AS b
        |      FROM bm_in)""".stripMargin).collect().head
    val lo = df.filter($"grp" < 4).select($"uid").distinct()
    val hi = df.filter($"grp" >= 2).select($"uid").distinct()
    assert(row.getLong(0) == lo.intersect(hi).count())
    assert(row.getLong(1) == lo.union(hi).distinct().count())
  }

  test("non-integral keys are rejected at analysis time, pointing at theta") {
    val e = intercept[Exception] {
      df.groupBy($"grp").agg(BitmapDistinct($"tag")).collect()
    }
    assert(e.getMessage.contains("theta_sketch"), e.getMessage)
  }

  test("nulls are skipped; an all-null group yields an empty (zero) bitmap") {
    val d = Seq((1L, Some(5L)), (1L, None), (2L, None))
      .toDF("grp", "uid")
    val got = d.groupBy($"grp")
      .agg(BitmapDistinct.count(BitmapDistinct($"uid")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L), (2L, 0L)))
  }
}
