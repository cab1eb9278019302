package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.table.GraftTable

/** Write-time CHECK constraints (`graft.check.<name>` table properties):
  * enforced on every new-row ingest path, SQL-standard NULL semantics,
  * definition-time validation, and the full SQL surface (ALTER + INSERT). */
class CheckConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(Paths.get("target"), "graft-chk-").toString

  private def mk(): GraftTable = {
    val t = GraftTable.create(spark, tmpDir(),
      Seq((1L, "a", 10.0)).toDF("id", "name", "amount"))
    t.setProperties(Map(
      "graft.check.positive_amount" -> "amount > 0",
      "graft.check.id_not_null" -> "id IS NOT NULL"))
    t
  }

  test("append rejects a violating row and names constraint, predicate, and row") {
    val t = mk()
    val e = intercept[IllegalArgumentException] {
      t.append(Seq((2L, "b", -5.0)).toDF("id", "name", "amount"))
    }
    assert(e.getMessage.contains("positive_amount"))
    assert(e.getMessage.contains("amount > 0"))
    assert(e.getMessage.contains("-5"))
    // nothing committed
    assert(t.read.count() == 1)
    assert(t.log.currentVersion == 1) // create + setProperties only
  }

  test("append of valid rows commits; several checks can trip at once") {
    val t = mk()
    t.append(Seq((2L, "b", 5.0)).toDF("id", "name", "amount"))
    assert(t.read.count() == 2)
    val e = intercept[IllegalArgumentException] {
      t.append(Seq((null.asInstanceOf[java.lang.Long], "c", -1.0))
        .toDF("id", "name", "amount"))
    }
    assert(e.getMessage.contains("positive_amount") && e.getMessage.contains("id_not_null"))
  }

  test("SQL-standard NULL semantics: a NULL predicate result passes the check") {
    val t = mk()
    // amount NULL -> 'amount > 0' is NULL -> row passes (id still enforced)
    t.append(Seq((3L, "c", null.asInstanceOf[java.lang.Double]))
      .toDF("id", "name", "amount"))
    assert(t.read.count() == 2)
  }

  test("overwrite and branch appends are guarded too") {
    val t = mk()
    intercept[IllegalArgumentException] {
      t.overwrite(Seq((9L, "x", -1.0)).toDF("id", "name", "amount"))
    }
    t.createBranch("audit")
    intercept[IllegalArgumentException] {
      t.appendToBranch("audit", Seq((9L, "x", 0.0)).toDF("id", "name", "amount"))
    }
    assert(t.read.count() == 1, "no bad rows slipped through any path")
  }

  test("SQL surface: ALTER TABLE adds the check, INSERT trips it, bad ALTER rejected") {
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", SparkSpec.warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.chk")
    spark.sql("CREATE TABLE graft.chk.t (id BIGINT, qty DOUBLE)")
    spark.sql("ALTER TABLE graft.chk.t SET TBLPROPERTIES " +
      "('graft.check.qty_pos' = 'qty > 0')")
    spark.sql("INSERT INTO graft.chk.t VALUES (1, 2.0)")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graft.chk.t VALUES (2, -1.0)")
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + messages(t.getCause)
    assert(messages(e).contains("qty_pos"), messages(e))
    assert(spark.sql("SELECT count(*) FROM graft.chk.t").collect()(0).getLong(0) == 1)
    // definition-time validation: unparseable / unresolvable predicates fail the ALTER
    val bad1 = intercept[Exception](spark.sql(
      "ALTER TABLE graft.chk.t SET TBLPROPERTIES ('graft.check.oops' = 'qty >')"))
    assert(messages(bad1).toLowerCase.contains("parse"), messages(bad1))
    val bad2 = intercept[Exception](spark.sql(
      "ALTER TABLE graft.chk.t SET TBLPROPERTIES ('graft.check.oops' = 'no_col > 0')"))
    assert(messages(bad2).toLowerCase.contains("resolve"), messages(bad2))
  }

  test("UPDATE and MERGE images are checked too (CoW and MOR)") {
    for (mor <- Seq(false, true)) {
      val t = mk()
      if (mor) t.setProperties(Map("write.delete.mode" -> "merge-on-read"))
      // UPDATE driving amount negative trips the check
      val e1 = intercept[IllegalArgumentException] {
        t.update($"id" === 1L, Map("amount" -> lit(-3.0)))
      }
      assert(e1.getMessage.contains("positive_amount"), s"mor=$mor: ${e1.getMessage}")
      // MERGE: matched update violates; insert-only violation also trips
      val src = Seq((1L, "z", -7.0)).toDF("sid", "sname", "samount")
      val e2 = intercept[IllegalArgumentException] {
        t.merge(src, $"id" === $"sid")
          .whenMatchedUpdate(Map("amount" -> $"samount")).execute()
      }
      assert(e2.getMessage.contains("positive_amount"), s"mor=$mor: ${e2.getMessage}")
      val e3 = intercept[IllegalArgumentException] {
        t.merge(Seq((99L, "n", -1.0)).toDF("sid", "sname", "samount"), $"id" === $"sid")
          .whenNotMatchedInsert(Map(
            "id" -> $"sid", "name" -> $"sname", "amount" -> $"samount")).execute()
      }
      assert(e3.getMessage.contains("positive_amount"), s"mor=$mor: ${e3.getMessage}")
      // valid update/merge still commit; delete clauses are never checked
      t.update($"id" === 1L, Map("amount" -> lit(42.0)))
      t.merge(Seq((1L, "gone", -1.0)).toDF("sid", "sname", "samount"), $"id" === $"sid")
        .whenMatchedDelete().execute()
      assert(t.read.count() == 0, s"mor=$mor")
    }
  }

  test("dropping the property lifts the constraint") {
    val t = mk()
    t.removeProperties(Seq("graft.check.positive_amount"))
    t.append(Seq((4L, "d", -1.0)).toDF("id", "name", "amount"))
    assert(t.read.count() == 2)
  }
}
