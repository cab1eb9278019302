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

  test("NULL sum values stay exact: null-only deltas, all-null groups, " +
      "and deleting the last non-null value") {
    def df(rows: Seq[(Long, String, Option[Double])]) =
      rows.toDF("id", "grp", "amount")
    // g1 has a real sum; g2 is all-NULL from the start (sum must be NULL)
    val src = GraftTable.create(spark, tmp("ia-null-src"),
      df(Seq((1L, "g1", Some(5.0)), (2L, "g1", None),
             (3L, "g2", None), (4L, "g2", None))))
    val matPath = tmp("ia-null-mat")
    val mat0 = IncrementalAgg.materialize(spark, src, matPath, Seq("grp"), Seq("amount"))
    assertEquivalent(mat0, src)
    assert(mat0.read.filter($"grp" === "g2").select($"sum_amount")
      .collect().head.isNullAt(0), "all-null group must materialize NULL sum")
    // delta batch touching g1 with ONLY null amounts — must not clobber 5.0
    src.append(df(Seq((5L, "g1", None))))
    val mat1 = IncrementalAgg.refresh(spark, src, matPath)
    assertEquivalent(mat1, src)
    assert(mat1.read.filter($"grp" === "g1").select($"sum_amount")
      .collect().head.getDecimal(0).doubleValue() == 5.0)
    // delete g1's last NON-NULL row — recompute says sum flips back to NULL
    src.delete($"id" === 1L)
    val mat2 = IncrementalAgg.refresh(spark, src, matPath)
    assertEquivalent(mat2, src)
    assert(mat2.read.filter($"grp" === "g1").select($"sum_amount")
      .collect().head.isNullAt(0),
      "deleting the last non-null value must restore NULL, not 0")
    // a brand-new all-NULL group inserts with a NULL sum
    src.append(df(Seq((6L, "g3", None), (7L, "g3", None))))
    val mat3 = IncrementalAgg.refresh(spark, src, matPath)
    assertEquivalent(mat3, src)
    assert(mat3.read.filter($"grp" === "g3").select($"sum_amount")
      .collect().head.isNullAt(0))
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

  private def assertMinMaxEquivalent(mat: GraftTable, source: GraftTable): Unit = {
    val expect = IncrementalAgg.aggregate(source.read, Seq("grp"), Nil, Seq("amount"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)))).toSet
    val got = mat.read.select($"grp", $"cnt", $"min_amount", $"max_amount")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)))).toSet
    assert(got == expect)
  }

  test("min/max maintenance: insert-only folds, a deleted extremum forces the group recompute") {
    val src = GraftTable.create(spark, tmp("ia-mm-src"), rows(0 until 100, "a"))
    val matPath = tmp("ia-mm-mat")
    val mat0 = IncrementalAgg.materialize(spark, src, matPath,
      Seq("grp"), Nil, Seq("amount"))
    assertMinMaxEquivalent(mat0, src)
    // pure inserts: extrema fold in without touching the source
    src.append(rows(100 until 140, "b"))
    assertMinMaxEquivalent(IncrementalAgg.refresh(spark, src, matPath), src)
    // delete the current MAX rows of every group (amount = (id%17)+0.25,
    // max at id%17 == 16) — self-maintenance would keep the stale extremum,
    // only the per-group recompute can lower a max
    src.delete($"id" % 17 === 16)
    assertMinMaxEquivalent(IncrementalAgg.refresh(spark, src, matPath), src)
    // mixed batch: inserts AND a delete touching the same groups
    src.append(rows(140 until 150, "c"))
    src.delete($"id" % 17 === 0)
    assertMinMaxEquivalent(IncrementalAgg.refresh(spark, src, matPath), src)
  }

  test("min/max NULL discipline: all-null groups and deleting the last non-null value") {
    def df(rows: Seq[(Long, String, Option[Double])]) =
      rows.toDF("id", "grp", "amount")
    val src = GraftTable.create(spark, tmp("ia-mm-null"),
      df(Seq((1L, "g1", Some(5.0)), (2L, "g1", None), (3L, "g2", None))))
    val matPath = tmp("ia-mm-null-mat")
    val mat0 = IncrementalAgg.materialize(spark, src, matPath,
      Seq("grp"), Nil, Seq("amount"))
    assertMinMaxEquivalent(mat0, src)
    assert(mat0.read.filter($"grp" === "g2").select($"min_amount")
      .collect().head.isNullAt(0), "all-null group must materialize NULL min")
    // null-only delta must not clobber g1's extrema
    src.append(df(Seq((4L, "g1", None))))
    assertMinMaxEquivalent(IncrementalAgg.refresh(spark, src, matPath), src)
    // deleting the last non-null value flips min/max back to NULL
    src.delete($"id" === 1L)
    val mat = IncrementalAgg.refresh(spark, src, matPath)
    assertMinMaxEquivalent(mat, src)
    assert(mat.read.filter($"grp" === "g1").select($"max_amount")
      .collect().head.isNullAt(0))
  }
}
