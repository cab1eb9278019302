package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.rest.{RestCatalogClient, RestCatalogServer, RestSnapshotLog}
import graft.table.{CommitConflictException, Snapshot, SnapshotLog}

/** Concurrency soak (VERDICT r17 #5): TWO RestCatalogServer instances and a
  * DIRECT-storage writer racing over ONE warehouse — the reference's interop
  * invariant is exactly "same table, two engines, consistent reads"
  * (SURVEY §3 EP3). The r17 snapshot-stamp revalidation handles the known
  * drop/recreate shape; this spec hunts the unknown interleavings:
  *
  *   1. CAS linearizability under pure commit races: every commit an actor
  *      saw SUCCEED is in the final state exactly once, every commit that
  *      saw a conflict is NOT, and the version chain is a clean lineage.
  *   2. 100 seeded random schedules of commit / drop / recreate / plan
  *      across both servers: no 5xx, no torn final state, and no plan
  *      response that mixes incarnations (every planned file belongs to
  *      the incarnation serving it).
  */
class ConcurrencySoakSpec extends SparkSpec {
  private implicit val fmts: Formats = DefaultFormats
  private val http = HttpClient.newHttpClient()

  private lazy val wh =
    Files.createTempDirectory(Paths.get("target"), "graft-soak-wh-").toString
  private lazy val serverA = new RestCatalogServer(wh, Map("a" -> "sa")).start()
  private lazy val serverB = new RestCatalogServer(wh, Map("b" -> "sb")).start()
  private lazy val clientA = new RestCatalogClient(serverA.uri, Some("a:sa"), None)
  private lazy val clientB = new RestCatalogClient(serverB.uri, Some("b:sb"), None)

  private def freshTable(name: String): String = {
    val root = s"$wh/soak/$name"
    graft.table.GraftTable.createEmpty(spark, root,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))))
    root
  }

  /** One properties-bump commit with bounded conflict retry; returns true
    * iff the log REPORTED success. */
  private def commitProp(log: SnapshotLog, key: String): Boolean = {
    var attempts = 0
    while (attempts < 200) {
      attempts += 1
      try {
        val head = log.current
        log.commit(head.version, v => head.copy(version = v,
          parent = head.version, timestampMs = System.currentTimeMillis(),
          operation = "soak", properties = head.properties + (key -> "1")))
        return true
      } catch {
        case _: CommitConflictException => Thread.sleep(1L + attempts % 3)
      }
    }
    false
  }

  test("CAS linearizability: 2 servers + direct storage, 90 racing commits, none lost, none phantom") {
    val root = freshTable("lin")
    // IMPORTANT: namespace must exist for the REST logs' routes
    val logs = Seq[(String, SnapshotLog)](
      "direct" -> new SnapshotLog(root),
      "srvA" -> new RestSnapshotLog(root, clientA, Seq("soak"), "lin"),
      "srvB" -> new RestSnapshotLog(root, clientB, Seq("soak"), "lin"))
    val perWriter = 30
    val succeeded = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val failed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val pool = Executors.newFixedThreadPool(logs.size)
    val start = new CountDownLatch(1)
    logs.foreach { case (who, log) =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          (1 to perWriter).foreach { i =>
            val key = s"soak.$who.$i"
            if (commitProp(log, key)) succeeded.add(key) else failed.add(key)
          }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "soak writers hung")

    // every success retryable ran to completion
    assert(failed.isEmpty, s"writers exhausted retries: $failed")
    assert(succeeded.size == logs.size * perWriter)

    val fin = new SnapshotLog(root)
    val head = fin.current
    // 1. no lost commits: every reported success is in the final merged
    //    properties (properties accumulate monotonically along the chain)
    import scala.jdk.CollectionConverters._
    succeeded.asScala.foreach { k =>
      assert(head.properties.contains(k), s"commit $k reported success but is LOST")
    }
    // 2. no phantoms: every soak key in the final state was a reported success
    head.properties.keys.filter(_.startsWith("soak.")).foreach { k =>
      assert(succeeded.contains(k), s"phantom commit $k in final state")
    }
    // 3. clean lineage: walking parents from HEAD visits each version once,
    //    down to the create commit, and each step adds EXACTLY its own keys
    var v = head.version
    var seen = Set.empty[Long]
    while (v >= 0) {
      assert(!seen.contains(v), s"lineage cycle at v$v")
      seen += v
      val s = fin.snapshot(v)
      if (s.parent >= 0) {
        val p = fin.snapshot(s.parent)
        val added = s.properties.keySet -- p.properties.keySet
        assert(added.size <= 1, s"v$v added ${added.size} keys: $added")
      }
      v = fin.snapshot(v).parent
    }
    assert(seen.size.toLong == logs.size.toLong * perWriter + 1,
      s"chain length ${seen.size} != ${logs.size * perWriter + 1}")
  }

  test("100 seeded schedules: drop / recreate / commit / plan races never 5xx, never tear state, never mix incarnations") {
    val rnd = new scala.util.Random(5180816L)
    def tok(client: String, secret: String, srv: RestCatalogServer): String = {
      val r = http.send(HttpRequest.newBuilder(
          URI.create(s"${srv.uri}/v1/oauth/tokens"))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(
          s"grant_type=client_credentials&client_id=$client&client_secret=$secret"))
        .build(), HttpResponse.BodyHandlers.ofString())
      (JsonMethods.parse(r.body()) \ "access_token").extract[String]
    }
    lazy val tokA = tok("a", "sa", serverA)
    lazy val tokB = tok("b", "sb", serverB)
    def reqSrv(srv: RestCatalogServer, t: String, method: String, path: String,
        body: Option[String]): HttpResponse[String] = {
      val b = HttpRequest.newBuilder(URI.create(s"${srv.uri}$path"))
        .header("Authorization", s"Bearer $t")
        .header("Content-Type", "application/json")
      body match {
        case Some(x) => b.method(method, HttpRequest.BodyPublishers.ofString(x))
        case None    => b.method(method, HttpRequest.BodyPublishers.noBody())
      }
      http.send(b.build(), HttpResponse.BodyHandlers.ofString())
    }

    val root = s"$wh/soak/rc"
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def record5xx(who: String, r: HttpResponse[String]): Unit =
      if (r.statusCode() >= 500)
        errors.add(s"$who -> ${r.statusCode()} ${r.body().take(200)}")

    for (s <- 1 to 100) {
      // ensure the table exists at schedule start (a fresh incarnation)
      if (!new SnapshotLog(root).exists)
        graft.table.GraftTable.createEmpty(spark, root,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType))))
      val ops: Seq[() => Unit] = Seq(
        // racing property commit through server A's CAS route
        () => {
          try commitProp(new RestSnapshotLog(root, clientA, Seq("soak"), "rc"),
            s"sched.$s.a")
          catch { case _: Exception => () } // drop race: table may vanish
        },
        // drop (sometimes purge) through a random server
        () => {
          val (srv, t) = if (rnd.nextBoolean()) (serverA, tokA) else (serverB, tokB)
          val purge = if (rnd.nextBoolean()) "?purgeRequested=true" else ""
          record5xx("drop", reqSrv(srv, t, "DELETE",
            s"/v1/iceberg/namespaces/soak/tables/rc$purge", None))
        },
        // recreate through server B (restarts version numbering)
        () => record5xx("recreate", reqSrv(serverB, tokB, "POST",
          "/v1/iceberg/namespaces/soak/tables",
          Some("""{"name":"rc","schema":{"type":"struct","schema-id":0,"fields":[
            {"id":1,"name":"id","required":false,"type":"long"}]}}"""))),
        // rename races (the verdict's "commits/drops/RENAMES"): the whole
        // table tree moves mid-commit/mid-plan; the commit protocol never
        // recreates a moved-away parent (createExclusive/writeAtomicReplace
        // fail without mkdirs), so racers abort cleanly instead of
        // stranding a half-table
        () => record5xx("rename", reqSrv(serverA, tokA, "POST",
          "/v1/iceberg/tables/rename",
          Some("""{"source":{"namespace":["soak"],"name":"rc"},
            "destination":{"namespace":["soak"],"name":"rc2"}}"""))),
        () => record5xx("renameBack", reqSrv(serverB, tokB, "POST",
          "/v1/iceberg/tables/rename",
          Some("""{"source":{"namespace":["soak"],"name":"rc2"},
            "destination":{"namespace":["soak"],"name":"rc"}}"""))),
        // plan through server A; on 200, planned files must not mix
        // incarnations (all exist under the LIVE root's data dir or the
        // response is empty — a stale cache would hand back purged paths)
        () => {
          val r = reqSrv(serverA, tokA, "POST",
            "/v1/iceberg/namespaces/soak/tables/rc/plan", Some("{}"))
          record5xx("plan", r)
          if (r.statusCode() == 200) {
            val paths = (JsonMethods.parse(r.body()) \ "file-scan-tasks").children
              .map(t => (t \ "data-file" \ "file-path").extract[String])
            // a purge+recreate can legitimately land between the response
            // and any existence probe, so point-in-time file checks are
            // unsound here — what IS invariant: every planned path belongs
            // to THIS table's tree (no cross-table/escaped paths; the
            // deterministic stale-incarnation case is ForeignWriterSpec's
            // drop/recreate-bypass test)
            paths.foreach { p =>
              if (!graft.table.GraftTable.canonStr(p).startsWith(
                  graft.table.GraftTable.canonStr(root) + "/"))
                errors.add(s"schedule $s: plan served foreign path $p")
            }
          }
        })
      val sched = rnd.shuffle(ops ++ ops) // each op twice, random order
      val pool = Executors.newFixedThreadPool(4)
      sched.foreach(op => pool.submit(new Runnable {
        def run(): Unit =
          try op()
          catch { case _: CommitConflictException | _: IllegalStateException => () }
      }))
      pool.shutdown()
      assert(pool.awaitTermination(60, TimeUnit.SECONDS), s"schedule $s hung")

      // post-schedule: state is never torn — absent, or cleanly walkable,
      // under EITHER name the rename race may have left it at
      Seq(root, s"$wh/soak/rc2").foreach { r =>
        val log = new SnapshotLog(r)
        if (log.exists) {
          val head = log.current // parses
          assert(head.version >= 0)
          // every file the snapshot references exists on disk
          head.files.foreach(f => assert(
            Files.exists(Paths.get(graft.table.GraftTable.resolveUnder(r, f.path))),
            s"schedule $s: HEAD at $r references missing file ${f.path}"))
        }
      }
      // normalize for the next schedule: anything at rc2 goes back to rc
      // (threads are joined — no concurrency here)
      if (new SnapshotLog(s"$wh/soak/rc2").exists) {
        if (new SnapshotLog(root).exists)
          reqSrv(serverA, tokA, "DELETE",
            "/v1/iceberg/namespaces/soak/tables/rc2?purgeRequested=true", None)
        else
          reqSrv(serverA, tokA, "POST", "/v1/iceberg/tables/rename",
            Some("""{"source":{"namespace":["soak"],"name":"rc2"},
              "destination":{"namespace":["soak"],"name":"rc"}}"""))
      }
    }
    assert(errors.isEmpty, s"soak violations:\n${errors.toArray.mkString("\n")}")
  }
}
