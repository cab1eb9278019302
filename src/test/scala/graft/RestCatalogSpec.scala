package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.rest.{RestCatalogClient, RestCatalogServer, RestSnapshotLog}
import graft.table.{CommitConflictException, GraftTable}

/** REST catalog mode (reference `main.tf:795-801`): engines resolve tables
  * and CAS-commit snapshots over HTTP with OAuth2 bearer auth, while the
  * data plane stays on shared storage. One server instance is shared by the
  * whole suite — Spark caches catalog instances, same as the warehouse. */
class RestCatalogSpec extends SparkSpec {

  private def server = RestCatalogSpec.server
  private def init(): Unit = {
    RestCatalogSpec.server // force start
    spark.conf.set("spark.sql.catalog.graftr", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftr.uri", server.uri)
    spark.conf.set("spark.sql.catalog.graftr.credential", "engine-a:secret-a")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftr.db")
  }

  /** A direct client, as a second "engine" would construct it. */
  private def client(cred: String = "engine-a:secret-a") =
    new RestCatalogClient(server.uri, Some(cred), None)

  test("OAuth handshake: bad credentials rejected, bad token gets 401") {
    init()
    intercept[IllegalArgumentException] { client("engine-a:wrong") }
    val forged = new RestCatalogClient(server.uri, None, Some("not-a-real-token"))
    val e = intercept[IllegalStateException] { forged.listNamespaces() }
    assert(e.getMessage.contains("401"))
  }

  test("full SQL round-trip over the REST catalog: DDL, insert, select") {
    init()
    spark.sql("CREATE TABLE graftr.db.rt (id BIGINT, name STRING)")
    spark.sql("INSERT INTO graftr.db.rt VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graftr.db.rt VALUES (3, 'c')")
    assert(spark.sql("SELECT * FROM graftr.db.rt ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // the table lives under the SERVER's warehouse (shared storage)
    val root = Paths.get(server.warehouse, "db", "rt")
    assert(Files.exists(root.resolve("_graft").resolve("HEAD")))
    // DROP goes through the server too
    spark.sql("DROP TABLE graftr.db.rt")
    assert(!Files.exists(root))
  }

  test("a second engine (own token) reads and writes the same table") {
    init()
    spark.sql("CREATE TABLE graftr.db.shared (id BIGINT)")
    spark.sql("INSERT INTO graftr.db.shared VALUES (1)")
    // engine B: separate client + separate credentials, REST-routed commits
    val c = client("engine-b:secret-b")
    val loc = c.tableLocation(Seq("db"), "shared").get
    val tB = GraftTable.load(spark, loc, p => new RestSnapshotLog(p, c, Seq("db"), "shared"))
    import spark.implicits._
    tB.append(Seq(2L).toDF("id"))
    // engine A sees B's commit immediately (no cache in the resolution path)
    assert(spark.sql("SELECT * FROM graftr.db.shared ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("stale commit CASes to 409 and surfaces as CommitConflictException") {
    init()
    spark.sql("CREATE TABLE graftr.db.cas (id BIGINT)")
    val c = client()
    val loc = c.tableLocation(Seq("db"), "cas").get
    def handle() = GraftTable.load(spark, loc, p => new RestSnapshotLog(p, c, Seq("db"), "cas"))
    import spark.implicits._
    val a = handle(); val b = handle()
    val staleHead = a.log.current // capture head, then someone else commits
    b.append(Seq(1L).toDF("id"))
    intercept[CommitConflictException] {
      a.log.commit(staleHead.version, v => staleHead.copy(
        version = v, parent = staleHead.version,
        timestampMs = System.currentTimeMillis(), operation = "append"))
    }
    // the standard retry loop absorbs the conflict
    a.appendWithRetry(Seq(2L).toDF("id"))
    assert(handle().read.count() == 2)
  }

  test("maintenance procedures route through the server (rollback, refs)") {
    init()
    spark.sql("CREATE TABLE graftr.db.mt (id BIGINT)")
    spark.sql("INSERT INTO graftr.db.mt VALUES (1)") // v1
    spark.sql("INSERT INTO graftr.db.mt VALUES (2)") // v2
    spark.sql("CALL graftr.system.rollback_to_snapshot('db.mt', 1)")
    assert(spark.sql("SELECT * FROM graftr.db.mt").collect().map(_.getLong(0)).toSeq == Seq(1L))
    spark.sql("CALL graftr.system.create_tag('db.mt', 'keep')")
    assert(spark.sql("SELECT name FROM graftr.db.`mt$refs`").collect().map(_.getString(0))
      .contains("keep"))
  }

  test("namespace DDL over REST: create, list, drop (cascade)") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftr.tmpns")
    assert(spark.sql("SHOW NAMESPACES IN graftr").collect().map(_.getString(0))
      .contains("tmpns"))
    spark.sql("CREATE TABLE graftr.tmpns.x (id BIGINT)")
    spark.sql("DROP NAMESPACE graftr.tmpns CASCADE")
    assert(!spark.sql("SHOW NAMESPACES IN graftr").collect().map(_.getString(0))
      .contains("tmpns"))
  }

  test("CASCADE drops a namespace holding views, not just tables") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftr.vns")
    spark.sql("CREATE TABLE graftr.vns.base (id BIGINT)")
    spark.sql("CREATE VIEW graftr.vns.v AS SELECT id FROM graftr.vns.base")
    // regression: the _views dir used to leave the namespace "non-empty"
    // after cascade dropped the tables → server 409 → DDL failure
    spark.sql("DROP NAMESPACE graftr.vns CASCADE")
    assert(!spark.sql("SHOW NAMESPACES IN graftr").collect().map(_.getString(0))
      .contains("vns"))
  }

  test("auth/server failures raise — never masquerade as 'does not exist'") {
    init()
    spark.sql("CREATE TABLE IF NOT EXISTS graftr.db.errmap (id BIGINT)")
    val forged = new RestCatalogClient(server.uri, None, Some("not-a-real-token"))
    // regression: these returned false/absent on 401, so a DROP against an
    // auth failure reported success-as-no-op and probes reported "absent"
    assert(intercept[IllegalStateException] {
      forged.dropTable(Seq("db"), "errmap") }.getMessage.contains("401"))
    assert(intercept[IllegalStateException] {
      forged.tableExists(Seq("db"), "errmap") }.getMessage.contains("401"))
    assert(intercept[IllegalStateException] {
      forged.namespaceExists(Seq("db")) }.getMessage.contains("401"))
    // the table is still there through a valid client
    assert(client().tableExists(Seq("db"), "errmap"))
    spark.sql("DROP TABLE graftr.db.errmap")
  }

  test("spec IRC list pagination: a conformant client pages tables with pageToken/pageSize") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftr.pg")
    (0 until 7).foreach(i =>
      spark.sql(s"CREATE TABLE IF NOT EXISTS graftr.pg.t$i (id BIGINT)"))
    val http = java.net.http.HttpClient.newHttpClient()
    val token = client().token
    def listPage(tok: Option[String]): org.json4s.JValue = {
      val q = "pageSize=3" + tok.map(t =>
        s"&pageToken=${java.net.URLEncoder.encode(t, "UTF-8")}").getOrElse("")
      val resp = http.send(java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"${server.uri}/v1/iceberg/namespaces/pg/tables?$q"))
        .header("Authorization", s"Bearer $token").GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200, resp.body())
      org.json4s.jackson.JsonMethods.parse(resp.body())
    }
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    // the conformant loop: follow next-page-token until absent
    var tok: Option[String] = None
    var pages = 0
    val seen = scala.collection.mutable.ListBuffer.empty[String]
    var done = false
    while (!done) {
      val page = listPage(tok)
      val names = (page \ "identifiers").children.map(i => (i \ "name").extract[String])
      assert(names.size <= 3)
      seen ++= names
      pages += 1
      (page \ "next-page-token").extractOpt[String] match {
        case some @ Some(_) => tok = some
        case None           => done = true
      }
      assert(pages <= 10, "runaway pagination loop")
    }
    assert(pages >= 3, s"7 tables at pageSize=3 must take >=3 pages, took $pages")
    assert(seen.toList == (0 until 7).map(i => s"t$i").toList,
      s"pages must cover every table exactly once in order, got $seen")
    // an unpaged request still returns everything (pageSize optional)
    val all = http.send(java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"${server.uri}/v1/iceberg/namespaces/pg/tables"))
      .header("Authorization", s"Bearer $token").GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    assert((org.json4s.jackson.JsonMethods.parse(all.body()) \ "identifiers")
      .children.size == 7)
    spark.sql("DROP NAMESPACE graftr.pg CASCADE")
  }
}

object RestCatalogSpec {
  lazy val server: RestCatalogServer = {
    val wh = Files.createTempDirectory(Paths.get("target"), "rest-wh-").toString
    new RestCatalogServer(wh,
      Map("engine-a" -> "secret-a", "engine-b" -> "secret-b")).start()
  }
}
