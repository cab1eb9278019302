package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import graft.table.GraftTable

/** Row-level DML semantics on the graft table format (SURVEY.md §2.8, §5
  * "property-based for MERGE = (delete ∪ update ∪ insert)"). */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(Paths.get("target"), "graft-dml-").toString

  private def mk(rows: Seq[(Long, String, Double)]): GraftTable =
    GraftTable.create(spark, tmpDir(), rows.toDF("id", "name", "amount"))

  test("merge works on a table whose column name contains a dot") {
    val dir = tmpDir()
    val t = GraftTable.create(spark, dir,
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "a.b"))
    t.merge(Seq((2L, 99.0), (3L, 30.0)).toDF("id", "a.b"), expr("t.id = s.id"))
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .execute()
    val got = t.read.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 10.0), (2L, 99.0), (3L, 30.0)))
  }

  test("delete is copy-on-write: untouched files carry over by reference") {
    val t = mk(Seq((1L, "a", 10.0)))
    t.append(Seq((100L, "b", 20.0)).toDF("id", "name", "amount"))
    val before = t.log.current.files.map(_.path).toSet
    t.delete(col("id") === 1L)
    val after = t.log.current.files.map(_.path).toSet
    // the file holding id=100 must survive untouched
    assert(before.intersect(after).nonEmpty, "untouched file was rewritten")
    assert(t.read.collect().map(_.getLong(0)).toSeq == Seq(100L))
    assert(t.log.current.operation == "delete")
  }

  test("delete with no matches is a no-op (no new snapshot)") {
    val t = mk(Seq((1L, "a", 10.0)))
    val v = t.log.currentVersion
    t.delete(col("id") === 999L)
    assert(t.log.currentVersion == v)
  }

  test("update rewrites only matching rows") {
    val t = mk(Seq((1L, "a", 10.0), (2L, "b", 20.0)))
    t.update(col("id") === 2L, Map("amount" -> (col("amount") * 10), "name" -> lit("B")))
    val got = t.read.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "B", 200.0)))
  }

  test("merge: update + delete + insert clauses in one pass") {
    val t = mk(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
    val src = Seq((2L, "b2", 99.0), (3L, "del", 0.0), (4L, "d", 40.0))
      .toDF("id", "name", "amount")
    t.merge(src, expr("t.id = s.id"))
      .whenMatchedDelete(Some(expr("s.name = 'del'")))
      .whenMatchedUpdate(Map("name" -> col("s.name"), "amount" -> col("s.amount")))
      .whenNotMatchedInsertAll()
      .execute()
    val got = t.read.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "b2", 99.0), (4L, "d", 40.0)))
    assert(t.log.current.operation == "merge")
  }

  test("merge: first matching clause wins (SQL clause ordering)") {
    val t = mk(Seq((1L, "a", 10.0)))
    val src = Seq((1L, "x", 5.0)).toDF("id", "name", "amount")
    t.merge(src, expr("t.id = s.id"))
      .whenMatchedUpdate(Map("name" -> lit("first")), Some(expr("s.amount < 10")))
      .whenMatchedUpdate(Map("name" -> lit("second")))
      .execute()
    assert(t.read.collect()(0).getString(1) == "first")
  }

  test("merge: conditional insert filters source rows") {
    val t = mk(Seq((1L, "a", 10.0)))
    val src = Seq((5L, "in", 50.0), (6L, "out", -1.0)).toDF("id", "name", "amount")
    t.merge(src, expr("t.id = s.id"))
      .whenNotMatchedInsertAll(Some(expr("s.amount > 0")))
      .execute()
    assert(t.read.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 5L))
  }

  test("merge: not-matched-by-source update and delete") {
    val t = mk(Seq((1L, "keep", 10.0), (2L, "stale", 20.0), (3L, "old", 30.0)))
    val src = Seq((1L, "k", 1.0)).toDF("id", "name", "amount")
    t.merge(src, expr("t.id = s.id"))
      .whenNotMatchedBySourceDelete(Some(expr("t.amount >= 30")))
      .whenNotMatchedBySourceUpdate(Map("name" -> lit("flagged")))
      .execute()
    val got = t.read.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "keep"), (2L, "flagged")))
  }

  test("merge: cardinality violation raises") {
    val t = mk(Seq((1L, "a", 10.0)))
    val src = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("id", "name", "amount")
    intercept[IllegalStateException] {
      t.merge(src, expr("t.id = s.id"))
        .whenMatchedUpdate(Map("name" -> col("s.name")))
        .execute()
    }
  }

  test("property: merge ≡ delete ∪ update ∪ insert (random keysets)") {
    val keyGen = Gen.listOfN(12, Gen.choose(1L, 20L)).map(_.distinct)
    val prop = Prop.forAllNoShrink(keyGen, keyGen) { (targetKeys: List[Long], sourceKeys: List[Long]) =>
      (targetKeys.nonEmpty && sourceKeys.nonEmpty) ==> {
        val tRows = targetKeys.map(k => (k, s"t$k", k * 1.0))
        val sRows = sourceKeys.map(k => (k, s"s$k", k * 2.0))
        val t = mk(tRows)
        val src = sRows.toDF("id", "name", "amount")
        t.merge(src, expr("t.id = s.id"))
          .whenMatchedUpdateAll()
          .whenNotMatchedInsertAll()
          .execute()
        val got = t.read.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
        // oracle: upsert semantics computed in plain Scala
        val tk = targetKeys.toSet; val sk = sourceKeys.toSet
        val expected =
          tRows.filterNot(r => sk(r._1)).toSet ++ sRows.toSet
        got == expected
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("merge evaluates the source exactly once (single-pass CoW)") {
    // The round-6 weakness: CoW MERGE re-evaluated the full-outer join for
    // the cardinality check, touched-file collect, rewrite, and inserts —
    // 4 source scans. The fused plan must read each source row ONCE (the
    // join materializes into the cached decision set; the rewrite pass
    // rescans only touched files, never the source).
    val t = mk(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
    val acc = spark.sparkContext.longAccumulator("srcRows")
    val seen = udf { (_: Long) => acc.add(1L); true }
    val src = Seq((2L, "B", 200.0), (4L, "d", 40.0)).toDF("id", "name", "amount")
      .filter(seen(col("id")))
    t.merge(src, expr("t.id = s.id"))
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .execute()
    assert(t.read.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d")))
    assert(acc.value == 2L,
      s"source was scanned ${acc.value / 2.0}x — the merge must evaluate the join once")
  }

  test("merge into empty table acts as pure insert") {
    val t = GraftTable.createEmpty(spark, tmpDir(),
      Seq.empty[(Long, String, Double)].toDF("id", "name", "amount").schema)
    val src = Seq((1L, "a", 1.0)).toDF("id", "name", "amount")
    t.merge(src, expr("t.id = s.id")).whenNotMatchedInsertAll().execute()
    assert(t.read.count() == 1)
  }
}
