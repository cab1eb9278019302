package graft

import java.nio.file.{Files, Paths}

/** SQL row-level DML through the extensions hook (reference `main.tf:803`
  * — the `IcebergSparkSessionExtensions` analogue): UPDATE, MERGE INTO,
  * and non-pushable DELETE as plain `spark.sql(...)` statements against
  * catalog tables. */
class GraftSqlDmlSpec extends SparkSpec {

  private def init(): Unit = {
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", SparkSpec.warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
  }

  test("SQL UPDATE rewrites matching rows, self-referencing expressions allowed") {
    init()
    spark.sql("CREATE TABLE graft.dml.u1 (id BIGINT, qty BIGINT, tag STRING)")
    spark.sql("INSERT INTO graft.dml.u1 VALUES (1, 10, 'a'), (2, 20, 'b'), (3, 30, 'a')")
    spark.sql("UPDATE graft.dml.u1 SET qty = qty + 5, tag = upper(tag) WHERE tag = 'a'")
    val rows = spark.sql("SELECT id, qty, tag FROM graft.dml.u1 ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq((1L, 15L, "A"), (2L, 20L, "b"), (3L, 35L, "A")))
  }

  test("SQL UPDATE without WHERE touches every row") {
    init()
    spark.sql("CREATE TABLE graft.dml.u2 (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.dml.u2 VALUES (1, 1.0), (2, 2.0)")
    spark.sql("UPDATE graft.dml.u2 SET v = v * 10")
    assert(spark.sql("SELECT sum(v) FROM graft.dml.u2").collect()(0).getDouble(0) == 30.0)
  }

  test("SQL DELETE with a non-pushable predicate (arithmetic over two columns)") {
    init()
    spark.sql("CREATE TABLE graft.dml.d1 (id BIGINT, a BIGINT, b BIGINT)")
    spark.sql("INSERT INTO graft.dml.d1 VALUES (1, 1, 1), (2, 5, 6), (3, 2, 1)")
    spark.sql("DELETE FROM graft.dml.d1 WHERE a + b > 10")
    assert(spark.sql("SELECT id FROM graft.dml.d1 ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("SQL MERGE INTO: conditional update, delete, insert, by-source clauses") {
    init()
    spark.sql("CREATE TABLE graft.dml.m1 (id BIGINT, qty BIGINT, status STRING)")
    spark.sql("INSERT INTO graft.dml.m1 VALUES (1, 10, 'keep'), (2, 20, 'old'), (3, 30, 'old'), (4, 40, 'stale')")
    spark.sql("""
      MERGE INTO graft.dml.m1 t
      USING (SELECT * FROM VALUES (2, 200L), (3, -1L), (5, 500L) AS s(id, qty)) s
      ON t.id = s.id
      WHEN MATCHED AND s.qty < 0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET qty = s.qty, status = 'merged'
      WHEN NOT MATCHED THEN INSERT (id, qty, status) VALUES (s.id, s.qty, 'new')
      WHEN NOT MATCHED BY SOURCE AND t.status = 'stale' THEN DELETE
    """)
    val rows = spark.sql("SELECT id, qty, status FROM graft.dml.m1 ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(rows == Seq((1L, 10L, "keep"), (2L, 200L, "merged"), (5L, 500L, "new")))
  }

  test("equality-MOR SQL DELETE: key-only predicate writes equality deletes " +
      "with ZERO data scan (data files physically absent)") {
    init()
    spark.sql("CREATE TABLE graft.dml.ed1 (id BIGINT, grp STRING, v DOUBLE) " +
      "TBLPROPERTIES ('write.delete.mode'='merge-on-read', 'graft.delete.equality'='true')")
    spark.sql("INSERT INTO graft.dml.ed1 VALUES (1, 'a', 1.0), (2, 'b', 2.0), (3, 'a', 3.0)")
    val path = s"${SparkSpec.warehouse}/dml/ed1"
    // remove every DATA file from disk: if the DELETE scanned anything it
    // would fail loudly — the O(keys) commit must not touch data at all
    val dataDir = Paths.get(path, "data")
    import scala.jdk.CollectionConverters._
    val removed = Files.list(dataDir).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toList
    removed.foreach(Files.delete)
    val before = graft.table.GraftTable.load(spark, path).log.current
    spark.sql("DELETE FROM graft.dml.ed1 WHERE id IN (1, 3) AND grp = 'a'")
    val after = graft.table.GraftTable.load(spark, path).log.current
    assert(after.operation == "delete")
    assert(after.files == before.files, "data file list must be untouched")
    assert(after.deleteFiles == before.deleteFiles, "no positional deletes")
    assert(after.eqDeleteFiles.size == before.eqDeleteFiles.size + 1)
    assert(after.eqDeleteFiles.last.cols.toSet == Set("id", "grp"))
  }

  test("equality-MOR SQL DELETE: read-exact, seq-scoped, and non-key " +
      "predicates fall back to positional MOR") {
    init()
    spark.sql("CREATE TABLE graft.dml.ed2 (id BIGINT, grp STRING, v DOUBLE) " +
      "TBLPROPERTIES ('write.delete.mode'='merge-on-read', 'graft.delete.equality'='true')")
    spark.sql("INSERT INTO graft.dml.ed2 VALUES (1, 'a', 1.0), (2, 'b', 2.0), " +
      "(3, 'a', 3.0), (4, 'c', 4.0), (5, 'b', 5.0)")
    // OR of AND-tuples + IN: (2,'b'), (3,'a'), (4,'c') leave
    spark.sql("DELETE FROM graft.dml.ed2 WHERE (id = 2 AND grp = 'b') " +
      "OR (id = 3 AND grp = 'a') OR (id = 4 AND grp = 'c')")
    val path = s"${SparkSpec.warehouse}/dml/ed2"
    val t = graft.table.GraftTable.load(spark, path)
    assert(t.log.current.eqDeleteFiles.nonEmpty, "equality path must engage")
    assert(t.log.current.deleteFiles.isEmpty)
    assert(spark.sql("SELECT id FROM graft.dml.ed2 ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 5L))
    // a row with a deleted key appended AFTER the delete survives (Iceberg
    // sequence-number scoping)
    spark.sql("INSERT INTO graft.dml.ed2 VALUES (2, 'b', 20.0)")
    assert(spark.sql("SELECT id FROM graft.dml.ed2 ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 5L))
    // non-key-only predicate (range) under the same properties: falls back
    // to the positional-MOR path, still exact
    spark.sql("DELETE FROM graft.dml.ed2 WHERE v > 10.0")
    val t2 = graft.table.GraftTable.load(spark, path)
    assert(t2.log.current.deleteFiles.nonEmpty, "fallback must be positional")
    assert(spark.sql("SELECT id FROM graft.dml.ed2 ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 5L))
    // = NULL never matches: no-op, no new delete artifacts
    val eqBefore = t2.log.current.eqDeleteFiles.size
    spark.sql("DELETE FROM graft.dml.ed2 WHERE grp = NULL")
    val t3 = graft.table.GraftTable.load(spark, path)
    assert(spark.sql("SELECT count(*) FROM graft.dml.ed2").collect()(0).getLong(0) == 2L)
    assert(t3.log.current.eqDeleteFiles.size == eqBefore)
  }

  test("SQL MERGE INTO with UPDATE SET * / INSERT * star clauses") {
    init()
    spark.sql("CREATE TABLE graft.dml.m2 (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.dml.m2 VALUES (1, 'x'), (2, 'y')")
    spark.sql("""
      MERGE INTO graft.dml.m2 t
      USING (SELECT * FROM VALUES (2, 'Y2'), (3, 'Z') AS s(id, v)) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
    """)
    val rows = spark.sql("SELECT id, v FROM graft.dml.m2 ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "x"), (2L, "Y2"), (3L, "Z")))
  }

  test("SQL UPDATE assignments are simultaneous (swap two columns)") {
    init()
    spark.sql("CREATE TABLE graft.dml.sw (id BIGINT, a BIGINT, b BIGINT)")
    spark.sql("INSERT INTO graft.dml.sw VALUES (1, 10, 20)")
    spark.sql("UPDATE graft.dml.sw SET a = b, b = a")
    val r = spark.sql("SELECT a, b FROM graft.dml.sw").collect()(0)
    assert((r.getLong(0), r.getLong(1)) == (20L, 10L)) // not (20, 20)
  }

  test("SQL MERGE raises the SQL-standard cardinality violation on duplicate matches") {
    init()
    spark.sql("CREATE TABLE graft.dml.cv (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft.dml.cv VALUES (1, 0)")
    val e = intercept[Exception] {
      spark.sql("""
        MERGE INTO graft.dml.cv t
        USING (SELECT * FROM VALUES (1, 100L), (1, 200L) AS s(id, v)) s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET v = s.v
      """)
    }
    assert(e.getMessage.toLowerCase.contains("cardinality"))
  }

  test("SQL MERGE WITH SCHEMA EVOLUTION auto-adds missing source columns") {
    init()
    spark.sql("CREATE TABLE graft.dml.se (id BIGINT, qty BIGINT)")
    spark.sql("INSERT INTO graft.dml.se VALUES (1, 10), (2, 20)")
    spark.sql("""
      MERGE WITH SCHEMA EVOLUTION INTO graft.dml.se t
      USING (SELECT * FROM VALUES (2, 200L, 'new'), (3, 300L, 'ins') AS s(id, qty, tag)) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val rows = spark.sql("SELECT id, qty, tag FROM graft.dml.se ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) null else r.getString(2)))
    // pre-existing row 1 null-fills the evolved column; 2 updated; 3 inserted
    assert(rows.toSeq == Seq((1L, 10L, null), (2L, 200L, "new"), (3L, 300L, "ins")))
    // and the evolution is an ID-based metadata add, not a rewrite
    assert(spark.table("graft.dml.se").columns.toSeq == Seq("id", "qty", "tag"))
    // the source's narrower INT id must NOT narrow the table column
    // (Iceberg semantics: only loss-free widenings evolve types)
    assert(spark.table("graft.dml.se").schema("id").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("ALTER COLUMN TYPE widening is pure metadata; old files upcast on read") {
    init()
    spark.sql("CREATE TABLE graft.dml.wide (id INT, v DOUBLE)")
    spark.sql("INSERT INTO graft.dml.wide VALUES (1, 1.5)")
    spark.sql("ALTER TABLE graft.dml.wide ALTER COLUMN id TYPE BIGINT")
    spark.sql("INSERT INTO graft.dml.wide VALUES (2147483648, 2.5)") // > Int.MaxValue
    val rows = spark.sql("SELECT id FROM graft.dml.wide ORDER BY id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2147483648L))
  }

  test("SQL DML commits snapshots: history shows update/delete/merge operations") {
    init()
    spark.sql("CREATE TABLE graft.dml.h1 (id BIGINT)")
    spark.sql("INSERT INTO graft.dml.h1 VALUES (1), (2)")
    spark.sql("UPDATE graft.dml.h1 SET id = id + 10 WHERE id = 1")
    spark.sql("DELETE FROM graft.dml.h1 WHERE id % 2 = 0")
    val ops = spark.sql("SELECT operation FROM graft.dml.`h1$history` ORDER BY version")
      .collect().map(_.getString(0)).toSeq
    assert(ops.containsSlice(Seq("update", "delete")))
    // time travel still sees the pre-DML state
    assert(spark.sql("SELECT count(*) FROM graft.dml.h1 VERSION AS OF 1").collect()(0).getLong(0) == 2)
  }
}
