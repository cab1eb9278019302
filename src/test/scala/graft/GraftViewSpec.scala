package graft

/** Persistent catalog views (DSv2 ViewCatalog — the Iceberg view-spec
  * analogue): view TEXT + creation context stored in the warehouse,
  * re-resolved at read time (late binding). */
class GraftViewSpec extends SparkSpec {

  private def init(): Unit = {
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", SparkSpec.warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.vw")
  }

  test("CREATE VIEW / SELECT / late binding / DROP via SQL") {
    init()
    spark.sql("CREATE TABLE graft.vw.base (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.vw.base VALUES (1, 10.0), (2, 20.0), (3, 30.0)")
    spark.sql("CREATE VIEW graft.vw.big AS SELECT id, v FROM graft.vw.base WHERE v >= 20.0")
    assert(spark.sql("SELECT id FROM graft.vw.big ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
    // late binding: new base rows appear through the view without refresh
    spark.sql("INSERT INTO graft.vw.base VALUES (4, 40.0)")
    assert(spark.sql("SELECT count(*) FROM graft.vw.big").collect()(0).getLong(0) == 3L)
    // the view is persisted in the warehouse, not session state: a second
    // catalog instance pointed at the same warehouse resolves it
    val cat2 = new graft.catalog.GraftCatalog
    cat2.initialize("graft2", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("warehouse", SparkSpec.warehouse)))
    assert(cat2.viewExists(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("vw"), "big")))
    assert(spark.sql("SHOW VIEWS IN graft.vw").collect().map(_.getString(1)).contains("big"))
    spark.sql("DROP VIEW graft.vw.big")
    intercept[Exception] { spark.sql("SELECT * FROM graft.vw.big").collect() }
  }

  test("views of views and ALTER VIEW properties") {
    init()
    spark.sql("CREATE TABLE graft.vw.t2 (id BIGINT)")
    spark.sql("INSERT INTO graft.vw.t2 SELECT id FROM range(10)")
    spark.sql("CREATE VIEW graft.vw.even AS SELECT id FROM graft.vw.t2 WHERE id % 2 = 0")
    spark.sql("CREATE VIEW graft.vw.even_small AS SELECT id FROM graft.vw.even WHERE id < 6")
    assert(spark.sql("SELECT id FROM graft.vw.even_small ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(0L, 2L, 4L))
    spark.sql("ALTER VIEW graft.vw.even SET TBLPROPERTIES ('team' = 'pipeline')")
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.catalog.GraftCatalog]
    val v = cat.loadView(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("vw"), "even"))
    assert(v.properties().get("team") == "pipeline")
  }

  test("concurrent CREATE OR REPLACE VIEW: CAS keeps every version (none dropped)") {
    init()
    spark.sql("CREATE TABLE graft.vw.casbase (id BIGINT)")
    spark.sql("CREATE VIEW graft.vw.casv AS SELECT id FROM graft.vw.casbase")
    // 4 threads × 5 replaces race on the same view; without the marker CAS
    // two replacers could read the same history, both write version N+1,
    // and one update would vanish
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futs = (1 to 20).map { i =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = spark.sql(
            s"CREATE OR REPLACE VIEW graft.vw.casv AS " +
              s"SELECT id, $i AS tag FROM graft.vw.casbase")
        })
      }
      futs.foreach(_.get())
    } finally pool.shutdown()
    val sv = graft.catalog.ViewStore.read(
      graft.table.FileIO.forPath(SparkSpec.warehouse),
      s"${SparkSpec.warehouse}/vw/_views/casv.json")
    // 1 create + 20 replaces, version ids gapless and strictly increasing
    assert(sv.allVersions.map(_.versionId) == (1 to 21),
      s"got versions ${sv.allVersions.map(_.versionId)}")
    assert(sv.currentVersionId == 21)
    // the current top-level state matches the last version in the history
    assert(sv.sql == sv.allVersions.last.sql)
    spark.sql("DROP VIEW graft.vw.casv")
  }

  test("orphaned replace marker (crash between marker create and write) is reclaimed") {
    init()
    spark.sql("CREATE TABLE graft.vw.orphbase (id BIGINT)")
    spark.sql("CREATE VIEW graft.vw.orphv AS SELECT id FROM graft.vw.orphbase")
    val io = graft.table.FileIO.forPath(SparkSpec.warehouse)
    val path = s"${SparkSpec.warehouse}/vw/_views/orphv.json"
    val sv = graft.catalog.ViewStore.read(io, path)
    val uuid = sv.viewUuid.get
    val nextId = sv.allVersions.map(_.versionId).max + 1
    // simulate a replacer that crashed between its marker create and the
    // view write: pre-timestamp (empty-content) marker counts as infinitely
    // old, so the very next replace reclaims it instead of wedging forever
    assert(io.createExclusive(s"$path.$uuid.v$nextId", ""))
    spark.sql("CREATE OR REPLACE VIEW graft.vw.orphv AS SELECT id, 1 AS t FROM graft.vw.orphbase")
    val after = graft.catalog.ViewStore.read(io, path)
    assert(after.currentVersionId == nextId, s"takeover failed: ${after.currentVersionId}")

    // a FRESH marker (a live racer mid-write) must NOT be stolen within the
    // grace period — the replace loses the CAS and reports it
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.catalog.GraftCatalog]
    val next2 = after.allVersions.map(_.versionId).max + 1
    assert(io.createExclusive(s"$path.$uuid.v$next2", System.currentTimeMillis().toString))
    val ex = intercept[Throwable] {
      spark.sql("CREATE OR REPLACE VIEW graft.vw.orphv AS SELECT id, 2 AS t FROM graft.vw.orphbase")
    }
    assert(ex.getMessage.contains("lost the version CAS"), ex.getMessage)
    // once the grace period elapses without a history advance, takeover wins
    cat.replaceGraceMs = 1L
    try {
      Thread.sleep(5)
      spark.sql("CREATE OR REPLACE VIEW graft.vw.orphv AS SELECT id, 3 AS t FROM graft.vw.orphbase")
      assert(graft.catalog.ViewStore.read(io, path).currentVersionId == next2)
    } finally cat.replaceGraceMs = 30000L
    spark.sql("DROP VIEW graft.vw.orphv")
  }

  test("unqualified view references bind to the DEFINITION namespace, not the reader's") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ctxa")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ctxb")
    spark.sql("CREATE TABLE graft.ctxa.src (id BIGINT)")
    spark.sql("INSERT INTO graft.ctxa.src VALUES (1), (2)")
    // decoy with the SAME name in a different namespace: if the view body's
    // unqualified `src` bound to the READER's context, it would read this
    spark.sql("CREATE TABLE graft.ctxb.src (id BIGINT)")
    spark.sql("INSERT INTO graft.ctxb.src VALUES (100)")
    val prevCat = spark.catalog.currentCatalog()
    val prevDb = spark.catalog.currentDatabase
    try {
      spark.sql("USE graft.ctxa")
      spark.sql("CREATE VIEW graft.ctxa.ctxv AS SELECT id FROM src")
      // read with a DIFFERENT current namespace (where the decoy lives):
      // late binding must re-resolve `src` against ctxa, captured at
      // definition time — Iceberg view-spec default-namespace semantics
      spark.sql("USE graft.ctxb")
      assert(spark.sql("SELECT max(id) FROM graft.ctxa.ctxv").collect()(0).getLong(0) == 2L)
      // CTE names inside a view body are NOT namespace objects and must
      // never be qualified into the definition namespace
      spark.sql("USE graft.ctxa")
      spark.sql(
        """CREATE VIEW graft.ctxa.ctev AS
          |WITH src AS (SELECT 42 AS id) SELECT id FROM src""".stripMargin)
      spark.sql("USE graft.ctxb")
      assert(spark.sql("SELECT id FROM graft.ctxa.ctev").collect()(0).getInt(0) == 42)
    } finally {
      spark.sql(s"USE $prevCat.$prevDb")
      spark.sql("DROP VIEW graft.ctxa.ctxv")
      spark.sql("DROP VIEW graft.ctxa.ctev")
      spark.sql("DROP TABLE graft.ctxa.src")
      spark.sql("DROP TABLE graft.ctxb.src")
    }
  }
}
