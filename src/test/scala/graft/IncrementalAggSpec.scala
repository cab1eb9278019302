package graft

import org.apache.spark.sql.functions._
import graft.operators.IncrementalAgg
import graft.table.GraftTable

/** Incremental materialized aggregate: refresh-from-changelog must equal a
  * full recompute EXACTLY (decimal sums) after appends, deletes, and
  * updates; the source-version stamp rides the refresh commit; rollback is
  * refused. */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), name).resolve("t").toString

  private def rows(ids: Range, tag: String) =
    ids.map(i => (i.toLong, s"g${i % 5}", (i % 17) + 0.25, tag))
      .toDF("id", "grp", "amount", "tag")

  private def assertEquivalent(mat: GraftTable, source: GraftTable): Unit = {
    val expect = IncrementalAgg.aggregate(source.read, Seq("grp"), Seq("amount"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    val got = mat.read.select($"grp", $"cnt", $"sum_amount")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    assert(got == expect)
  }

  test("refresh after append + delete + update equals a full recompute exactly") {
    val src = GraftTable.create(spark, tmp("ia-src"), rows(0 until 200, "a"))
    val matPath = tmp("ia-mat")
    val mat0 = IncrementalAgg.materialize(spark, src, matPath, Seq("grp"), Seq("amount"))
    assertEquivalent(mat0, src)
    // append new rows, delete a slice, update another slice
    src.append(rows(200 until 260, "b"))
    src.delete($"id" % 7 === 0)
    src.update($"id" % 11 === 3, Map("amount" -> ($"amount" + 100.5)))
    val mat1 = IncrementalAgg.refresh(spark, src, matPath)
    assertEquivalent(mat1, src)
    assert(mat1.log.current.properties(IncrementalAgg.SourceVersionProp).toLong
      == src.log.currentVersion)
  }

  test("a group emptied by deletes leaves the aggregate; a new group arrives") {
    val src = GraftTable.create(spark, tmp("ia-src2"),
      Seq((1L, "only", 5.0), (2L, "only", 6.0), (3L, "keep", 7.0))
        .toDF("id", "grp", "amount"))
    val matPath = tmp("ia-mat2")
    IncrementalAgg.materialize(spark, src, matPath, Seq("grp"), Seq("amount"))
    src.delete($"grp" === "only")
    src.append(Seq((4L, "fresh", 1.5)).toDF("id", "grp", "amount"))
    val mat = IncrementalAgg.refresh(spark, src, matPath)
    val grps = mat.read.select($"grp").as[String].collect().toSet
    assert(grps == Set("keep", "fresh"), grps.toString)
    assertEquivalent(mat, src)
  }

  test("refresh is a no-op when current and refuses a rolled-back source") {
    val src = GraftTable.create(spark, tmp("ia-src3"), rows(0 until 50, "a"))
    val matPath = tmp("ia-mat3")
    IncrementalAgg.materialize(spark, src, matPath, Seq("grp"), Seq("amount"))
    val before = GraftTable.load(spark, matPath).log.currentVersion
    IncrementalAgg.refresh(spark, src, matPath) // already current
    assert(GraftTable.load(spark, matPath).log.currentVersion == before)
    // advance then roll the mat's stamp PAST the source by rolling back src
    src.append(rows(50 until 60, "b"))
    IncrementalAgg.refresh(spark, src, matPath)
    src.rollbackTo(src.log.current.parent)
    val ex = intercept[IllegalArgumentException] {
      IncrementalAgg.refresh(spark, src, matPath)
    }
    assert(ex.getMessage.contains("rolled back"))
  }

  test("refresh merges aggregated deltas — the merge source is groups, not rows") {
    val src = GraftTable.create(spark, tmp("ia-src4"), rows(0 until 300, "a"))
    val matPath = tmp("ia-mat4")
    IncrementalAgg.materialize(spark, src, matPath, Seq("grp"), Seq("amount"))
    src.append(rows(300 until 400, "b")) // 100 changed rows, 5 groups
    val mat = IncrementalAgg.refresh(spark, src, matPath)
    // 5 groups total, each still one row in the materialization
    assert(mat.read.count() == 5)
    assertEquivalent(mat, src)
  }
}
