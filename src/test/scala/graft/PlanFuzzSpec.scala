package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Adversarial fuzz of the REST scan-planning surface (VERDICT r15 #5):
  * [[graft.rest.RestCatalogServer]]'s `parseIcebergExpr` + `/plan` +
  * `/tasks` under hostile filter JSON — unknown ops, deep nesting, huge /
  * wrapping literals, mixed-type comparisons, malformed bodies. The
  * contract under attack input is exactly two-sided:
  *
  *   1. the server NEVER 500s (every outcome is 200 or a 4xx), and
  *   2. a 200 response NEVER drops a file containing a row the filter
  *      definitively matches (conservative keep — StatsPruningSpec proves
  *      the pruner sound for well-formed filters; this proves the PARSER
  *      can't launder a hostile tree into an unsound one).
  *
  * The soundness oracle is an independent three-valued evaluator over the
  * table's actual rows: Some(true)/Some(false) only where real SQL
  * semantics are unambiguous, None (no claim) for any construct outside
  * them — exactly the set the server may not prune against.
  */
class PlanFuzzSpec extends SparkSpec {
  import spark.implicits._
  private implicit val fmts: Formats = DefaultFormats

  private def server = RestCatalogSpec.server
  private val http = HttpClient.newHttpClient()

  private lazy val token: String = {
    val resp = http.send(HttpRequest.newBuilder(
        URI.create(s"${server.uri}/v1/oauth/tokens"))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(
        "grant_type=client_credentials&client_id=engine-a&client_secret=secret-a"))
      .build(), HttpResponse.BodyHandlers.ofString())
    (JsonMethods.parse(resp.body()) \ "access_token").extract[String]
  }

  private def post(path: String, body: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(s"${server.uri}$path"))
      .header("Content-Type", "application/json")
      .header("Authorization", s"Bearer $token")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  // ---- fixture: a table whose per-file contents the test KNOWS ----------
  private type Row = (Option[Long], Option[String])
  /** file-path -> rows, derived from the unfiltered plan itself so no
    * assumption about Spark's write fan-out is baked in. */
  private lazy val filesToRows: Map[String, Seq[Row]] = {
    spark.conf.set("spark.sql.catalog.graftr", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftr.uri", server.uri)
    spark.conf.set("spark.sql.catalog.graftr.credential", "engine-a:secret-a")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftr.db")
    spark.sql("DROP TABLE IF EXISTS graftr.db.fuzzplan")
    spark.sql("CREATE TABLE graftr.db.fuzzplan (id BIGINT, v STRING) USING graft")
    // small band, 2^53-collapsing band, nulls, empty + unicode strings
    spark.sql("INSERT INTO graftr.db.fuzzplan VALUES " +
      "(1, 'a'), (2, 'ab'), (-5, ''), (NULL, 'z')")
    spark.sql("INSERT INTO graftr.db.fuzzplan VALUES " +
      "(1000000000000000000, 'big'), (1000000000000000001, NULL)")
    spark.sql("INSERT INTO graftr.db.fuzzplan VALUES " +
      s"(${Long.MaxValue}, 'max'), (${Long.MinValue}, 'é中')")
    val all = JsonMethods.parse(
      post("/v1/iceberg/namespaces/db/tables/fuzzplan/plan", "{}").body())
    (all \ "file-scan-tasks").children.map { t =>
      val p = (t \ "data-file" \ "file-path").extract[String]
      p -> spark.read.parquet(p).collect().toSeq.map { r =>
        (if (r.isNullAt(0)) None else Some(r.getLong(0)),
         if (r.isNullAt(1)) None else Some(r.getString(1)))
      }
    }.toMap
  }

  // ---- the independent three-valued oracle ------------------------------
  private def numLit(v: JValue): Option[BigDecimal] = v match {
    case JInt(i)     => Some(BigDecimal(i))
    case JLong(l)    => Some(BigDecimal(l))
    case JDouble(d)  => if (d.isNaN || d.isInfinite) None else Some(BigDecimal(d))
    case JDecimal(d) => Some(d)
    case _           => None
  }
  private def strLit(v: JValue): Option[String] = v match {
    case JString(s) => Some(s); case _ => None
  }
  private def termName(v: JValue): Option[String] = v match {
    case JString(s) => Some(s)
    case o: JObject if (o \ "type") == JString("reference") =>
      (o \ "term") match { case JString(s) => Some(s); case _ => None }
    case _ => None
  }

  /** Some(true/false) where ANSI semantics are unambiguous for this row;
    * None everywhere else. Comparisons with a NULL operand are Some(false)
    * ("matches" = predicate TRUE; UNKNOWN does not match). */
  private def eval(j: JValue, row: Row): Option[Boolean] = {
    def cmpOn(sign: Int => Boolean): Option[Boolean] =
      termName(j \ "term") match {
        case Some("id") => numLit(j \ "value").map(lit =>
          row._1.exists(x => sign(BigDecimal(x).compare(lit))))
        case Some("v") => strLit(j \ "value").map(lit =>
          row._2.exists(x => sign(x.compareTo(lit))))
        case _ => None
      }
    (j \ "type") match {
      case JString("true")  => Some(true)
      case JString("false") => Some(false)
      case JString("eq")    => cmpOn(_ == 0)
      case JString("lt")    => cmpOn(_ < 0)
      case JString("lt-eq") => cmpOn(_ <= 0)
      case JString("gt")    => cmpOn(_ > 0)
      case JString("gt-eq") => cmpOn(_ >= 0)
      case JString("in") => termName(j \ "term") match {
        case Some("id") => (j \ "values") match {
          case JArray(vs) =>
            val lits = vs.map(numLit)
            if (lits.exists(_.isEmpty)) None
            else Some(row._1.exists(x => lits.flatten.contains(BigDecimal(x))))
          case _ => None
        }
        case Some("v") => (j \ "values") match {
          case JArray(vs) =>
            val lits = vs.map(strLit)
            if (lits.exists(_.isEmpty)) None
            else Some(row._2.exists(lits.flatten.contains))
          case _ => None
        }
        case _ => None
      }
      case JString("is-null") => termName(j \ "term") match {
        case Some("id") => Some(row._1.isEmpty)
        case Some("v")  => Some(row._2.isEmpty)
        case _          => None
      }
      case JString("not-null") => termName(j \ "term") match {
        case Some("id") => Some(row._1.isDefined)
        case Some("v")  => Some(row._2.isDefined)
        case _          => None
      }
      case JString("not") => eval(j \ "child", row).orElse(eval(j \ "left", row)).map(!_)
      case JString("and") =>
        (eval(j \ "left", row), eval(j \ "right", row)) match {
          case (Some(false), _) | (_, Some(false)) => Some(false)
          case (Some(true), Some(true))            => Some(true)
          case _                                   => None
        }
      case JString("or") =>
        (eval(j \ "left", row), eval(j \ "right", row)) match {
          case (Some(true), _) | (_, Some(true)) => Some(true)
          case (Some(false), Some(false))        => Some(false)
          case _                                 => None
        }
      case _ => None
    }
  }

  // ---- hostile-tree generator (seeded: failures reproduce) --------------
  private val rnd = new scala.util.Random(160816L)
  private def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.size))

  private def genValue(): JValue = pick[() => JValue](Seq(
    () => JInt(BigInt(rnd.between(-30L, 30L))),
    () => JInt(BigInt("1000000000000000000") + rnd.between(-2L, 3L)),
    () => JInt(BigInt(2).pow(64) + rnd.between(-5L, 6L)),       // wraps if .toLong'd
    () => JInt(-(BigInt(2).pow(64)) - rnd.between(0L, 6L)),     // the unsound wrap
    () => JInt(BigInt(Long.MaxValue)), () => JInt(BigInt(Long.MinValue)),
    () => JDouble(rnd.nextDouble() * 50 - 25),
    () => JDouble(Double.MaxValue), () => JDouble(Double.NaN),
    () => JDouble(Double.PositiveInfinity),
    () => JDecimal(BigDecimal("1e400")), () => JDecimal(BigDecimal("-1e400")),
    () => JString(pick(Seq("a", "ab", "", "z", "abc", "é中",
      "10", "1e18", "NaN", "Infinity", "-", "' OR 1=1 --", "\"quoted\""))),
    () => JBool(rnd.nextBoolean()),
    () => JNull,
    () => JArray(List(JInt(1), JString("x")))))()

  private def genTerm(): JValue = pick[() => JValue](Seq(
    () => JString("id"), () => JString("id"), () => JString("v"),
    () => JString("v"), () => JString("missing_col"), () => JString(""),
    () => JString("id.nested"), () => JNull,
    () => JObject("type" -> JString("reference"), "term" -> JString(pick(Seq("id", "v")))),
    () => JObject("type" -> JString("bucket[16]"), "term" -> JString("id")),
    () => JInt(42)))()

  private def genExpr(depth: Int): JValue = {
    val leafOps = Seq("eq", "lt", "lt-eq", "gt", "gt-eq", "in", "is-null",
      "not-null", "is-nan", "true", "false", "between", "starts-with",
      "xor", "", "EQ", "\t", "definitely-not-an-op")
    def leaf(): JValue = {
      val op = pick(leafOps)
      val fields = scala.collection.mutable.ListBuffer[(String, JValue)]("type" -> JString(op))
      if (rnd.nextInt(10) > 0) fields += ("term" -> genTerm())
      if (op == "in") {
        if (rnd.nextInt(10) > 0)
          fields += ("values" -> JArray(List.fill(rnd.nextInt(6))(genValue())))
      } else if (rnd.nextInt(10) > 0) fields += ("value" -> genValue())
      if (rnd.nextInt(8) == 0) fields += ("junk" -> genValue())
      JObject(fields.toList: _*)
    }
    if (depth <= 0 || rnd.nextInt(3) == 0) leaf()
    else pick[() => JValue](Seq(
      () => JObject("type" -> JString("and"),
        "left" -> genExpr(depth - 1), "right" -> genExpr(depth - 1)),
      () => JObject("type" -> JString("or"),
        "left" -> genExpr(depth - 1), "right" -> genExpr(depth - 1)),
      () => JObject("type" -> JString("not"), "child" -> genExpr(depth - 1)),
      () => leaf()))()
  }

  // ---- the properties ---------------------------------------------------

  test("500 hostile filter trees: never a 500, never a dropped matching file") {
    val rows = filesToRows // force fixture
    assert(rows.nonEmpty && rows.values.flatten.nonEmpty)
    var pruned = 0
    for (i <- 1 to 500) {
      val expr = genExpr(depth = 4)
      val body = JsonMethods.compact(JsonMethods.render(
        JObject("filter" -> expr)))
      val resp = post("/v1/iceberg/namespaces/db/tables/fuzzplan/plan", body)
      val code = resp.statusCode()
      assert(code == 200 || code == 400,
        s"iteration $i: status $code for $body -> ${resp.body()}")
      if (code == 200) {
        val kept = (JsonMethods.parse(resp.body()) \ "file-scan-tasks").children
          .map(t => (t \ "data-file" \ "file-path").extract[String]).toSet
        if (kept.size < rows.size) pruned += 1
        rows.foreach { case (path, fileRows) =>
          val mustKeep = fileRows.exists(r => eval(expr, r).contains(true))
          assert(!mustKeep || kept.contains(path),
            s"iteration $i: DROPPED file with a definitely-matching row.\n" +
              s"filter: $body\nfile: $path rows: $fileRows kept: $kept")
        }
      }
    }
    // the run must have exercised real pruning, not 500 no-op keeps
    assert(pruned > 20, s"only $pruned/500 trees pruned anything - generator too hostile?")
  }

  // ---- fixture 2: days(ts)-partitioned table (transform-domain pruning) --
  private type TRow = (Option[Long], Option[java.time.Instant])
  private lazy val tsFilesToRows: Map[String, Seq[TRow]] = {
    filesToRows // ensure catalog conf + namespace exist
    spark.sql("DROP TABLE IF EXISTS graftr.db.fuzzts")
    spark.sql("CREATE TABLE graftr.db.fuzzts (id BIGINT, ts TIMESTAMP) " +
      "USING graft PARTITIONED BY (days(ts))")
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val oldCoalesce = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try spark.sql("""INSERT INTO graftr.db.fuzzts
      SELECT id, CASE WHEN id = 19 THEN CAST(NULL AS TIMESTAMP)
        ELSE timestamp'2026-03-01 00:00:00' +
          make_interval(0,0,0,0,CAST(id*7 AS INT),0,0) END
      FROM range(20)""")
    finally spark.conf.set(coalesceKey, oldCoalesce)
    val all = JsonMethods.parse(
      post("/v1/iceberg/namespaces/db/tables/fuzzts/plan", "{}").body())
    (all \ "file-scan-tasks").children.map { t =>
      val p = (t \ "data-file" \ "file-path").extract[String]
      p -> spark.read.parquet(p).collect().toSeq.map { r =>
        (if (r.isNullAt(0)) None else Some(r.getLong(0)),
         if (r.isNullAt(1)) None
         else Some(r.getTimestamp(1).toInstant))
      }
    }.toMap
  }

  /** Independent micros parse for the ts oracle: ISO 'T' / space forms as
    * UTC wall-clock, 'Z' instants, explicit-offset forms — ONLY the forms
    * whose semantics are unambiguous; anything else is no-claim. */
  private def oracleMicros(v: JValue): Option[Long] = v match {
    case JString(s) =>
      val t = s.trim
      scala.util.Try(java.time.Instant.parse(t)).toOption
        .map(i => i.getEpochSecond * 1000000L + i.getNano / 1000L)
        .orElse(scala.util.Try(java.time.OffsetDateTime.parse(t).toInstant).toOption
          .map(i => i.getEpochSecond * 1000000L + i.getNano / 1000L))
        .orElse(scala.util.Try {
          val ldt = java.time.LocalDateTime.parse(t.replace(' ', 'T'))
          ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
        }.toOption)
    case _ => None
  }

  private def evalTs(j: JValue, row: TRow): Option[Boolean] = {
    def micros(i: java.time.Instant): Long =
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    def cmpOn(sign: Int => Boolean): Option[Boolean] =
      termName(j \ "term") match {
        case Some("id") => numLit(j \ "value").map(lit =>
          row._1.exists(x => sign(BigDecimal(x).compare(lit))))
        case Some("ts") => oracleMicros(j \ "value").map(lit =>
          row._2.exists(x => sign(java.lang.Long.compare(micros(x), lit))))
        case _ => None
      }
    (j \ "type") match {
      case JString("true")  => Some(true)
      case JString("false") => Some(false)
      case JString("eq")    => cmpOn(_ == 0)
      case JString("lt")    => cmpOn(_ < 0)
      case JString("lt-eq") => cmpOn(_ <= 0)
      case JString("gt")    => cmpOn(_ > 0)
      case JString("gt-eq") => cmpOn(_ >= 0)
      case JString("is-null") => termName(j \ "term") match {
        case Some("id") => Some(row._1.isEmpty)
        case Some("ts") => Some(row._2.isEmpty)
        case _          => None
      }
      case JString("not-null") => termName(j \ "term") match {
        case Some("id") => Some(row._1.isDefined)
        case Some("ts") => Some(row._2.isDefined)
        case _          => None
      }
      case JString("not") => evalTs(j \ "child", row).orElse(evalTs(j \ "left", row)).map(!_)
      case JString("and") =>
        (evalTs(j \ "left", row), evalTs(j \ "right", row)) match {
          case (Some(false), _) | (_, Some(false)) => Some(false)
          case (Some(true), Some(true))            => Some(true)
          case _                                   => None
        }
      case JString("or") =>
        (evalTs(j \ "left", row), evalTs(j \ "right", row)) match {
          case (Some(true), _) | (_, Some(true)) => Some(true)
          case (Some(false), Some(false))        => Some(false)
          case _                                 => None
        }
      case _ => None
    }
  }

  private def genTsValue(): JValue = pick[() => JValue](Seq(
    // canonical forms around the data's range, sub-day offsets included
    () => JString(graft.table.GraftTable.tsCanon(
      1772323200000000L + rnd.between(-3L, 4L) * 43200000000L)), // 2026-03-01 ± half-days
    () => JString(graft.table.GraftTable.tsCanon(
      1772323200000000L + rnd.between(0L, 140L) * 3600000000L)),
    () => JString("2026-03-03 12:00:00"),         // space form (UTC)
    () => JString("2026-03-03T12:00:00Z"),        // instant form
    () => JString("2026-03-03T12:00:00+14:00"),   // explicit-offset form
    () => JString("not a timestamp"), () => JString(""),
    () => JString("2026-13-45T99:99:99.000000"),  // unparseable calendar
    () => JInt(BigInt(rnd.between(-30L, 30L))),   // number against ts: no claim
    () => JDouble(Double.NaN), () => JNull,
    () => JString("9999-12-31T23:59:59.999999"),
    () => JString("0001-01-01T00:00:00.000000")))()

  private def genTsExpr(depth: Int): JValue = {
    val leafOps = Seq("eq", "lt", "lt-eq", "gt", "gt-eq", "is-null",
      "not-null", "is-nan", "true", "false", "between", "")
    def leaf(): JValue = {
      val op = pick(leafOps)
      val fields = scala.collection.mutable.ListBuffer[(String, JValue)]("type" -> JString(op))
      if (rnd.nextInt(10) > 0) fields += ("term" -> pick[() => JValue](Seq(
        () => JString("ts"), () => JString("ts"), () => JString("ts"),
        () => JString("id"), () => JString("days(ts)"), // transform NAME as term: no claim
        () => JString("missing"), () => JNull))())
      if (rnd.nextInt(10) > 0) fields += ("value" -> genTsValue())
      JObject(fields.toList: _*)
    }
    if (depth <= 0 || rnd.nextInt(3) == 0) leaf()
    else pick[() => JValue](Seq(
      () => JObject("type" -> JString("and"),
        "left" -> genTsExpr(depth - 1), "right" -> genTsExpr(depth - 1)),
      () => JObject("type" -> JString("or"),
        "left" -> genTsExpr(depth - 1), "right" -> genTsExpr(depth - 1)),
      () => JObject("type" -> JString("not"), "child" -> genTsExpr(depth - 1)),
      () => leaf()))()
  }

  test("300 hostile trees against a days(ts)-partitioned table: transform pruning stays sound") {
    val rows = tsFilesToRows
    assert(rows.size >= 2, s"need multiple files, got ${rows.keys}")
    var pruned = 0
    for (i <- 1 to 300) {
      val expr = genTsExpr(depth = 3)
      val body = JsonMethods.compact(JsonMethods.render(JObject("filter" -> expr)))
      val resp = post("/v1/iceberg/namespaces/db/tables/fuzzts/plan", body)
      val code = resp.statusCode()
      assert(code == 200 || code == 400,
        s"iteration $i: status $code for $body -> ${resp.body()}")
      if (code == 200) {
        val kept = (JsonMethods.parse(resp.body()) \ "file-scan-tasks").children
          .map(t => (t \ "data-file" \ "file-path").extract[String]).toSet
        if (kept.size < rows.size) pruned += 1
        rows.foreach { case (path, fileRows) =>
          val mustKeep = fileRows.exists(r => evalTs(expr, r).contains(true))
          assert(!mustKeep || kept.contains(path),
            s"iteration $i: DROPPED file with a definitely-matching row.\n" +
              s"filter: $body\nfile: $path rows: $fileRows kept: $kept")
        }
      }
    }
    assert(pruned > 15, s"only $pruned/300 trees pruned anything")
  }

  test("deep nesting, huge IN lists, and malformed bodies never 500") {
    // 300-deep and-chain: past the parser's depth cap -> conservative keep
    val deep = (1 to 300).foldLeft[JValue](
      JObject("type" -> JString("gt"), "term" -> JString("id"), "value" -> JInt(0))) {
      (acc, _) => JObject("type" -> JString("and"),
        "left" -> JObject("type" -> JString("lt"), "term" -> JString("id"),
          "value" -> JInt(5)), "right" -> acc)
    }
    val rows = filesToRows
    val deepResp = post("/v1/iceberg/namespaces/db/tables/fuzzplan/plan",
      JsonMethods.compact(JsonMethods.render(JObject("filter" -> deep))))
    assert(deepResp.statusCode() == 200 || deepResp.statusCode() == 400, deepResp.body())
    if (deepResp.statusCode() == 200) {
      val kept = (JsonMethods.parse(deepResp.body()) \ "file-scan-tasks").children
        .map(t => (t \ "data-file" \ "file-path").extract[String]).toSet
      // 0 < id < 5 has matches (1, 2): their file must survive the deep tree
      rows.foreach { case (path, fileRows) =>
        if (fileRows.exists(r => r._1.exists(x => x > 0 && x < 5)))
          assert(kept.contains(path), s"deep chain dropped $path")
      }
    }

    val hugeIn = JObject("type" -> JString("in"), "term" -> JString("id"),
      "values" -> JArray((1 to 2000).map(i => JInt(BigInt(i))).toList))
    assert(post("/v1/iceberg/namespaces/db/tables/fuzzplan/plan",
      JsonMethods.compact(JsonMethods.render(JObject("filter" -> hugeIn))))
      .statusCode() == 200)

    // malformed / non-JSON bodies are the client's error, not a server fault
    Seq("{", "", "[1,2", new String(Array[Byte](0, 1, 2), "UTF-8"), "{\"filter\":", "nul",
      "[" * 5000, "{\"filter\":\"not an object\"}").foreach { b =>
      val r = post("/v1/iceberg/namespaces/db/tables/fuzzplan/plan", b)
      assert(r.statusCode() == 200 || (r.statusCode() >= 400 && r.statusCode() < 500),
        s"body ${b.take(30)}: ${r.statusCode()} ${r.body().take(200)}")
    }
    // hostile fetchScanTasks tokens
    Seq("a", "====", "e30", // e30 = base64 "{}" with no fields
      java.util.Base64.getUrlEncoder.encodeToString(
        """{"s":9999999,"o":0,"f":null}""".getBytes("UTF-8"))).foreach { tok =>
      val r = post("/v1/iceberg/namespaces/db/tables/fuzzplan/tasks",
        s"""{"plan-task":"$tok"}""")
      assert(r.statusCode() >= 400 && r.statusCode() < 500,
        s"token $tok: ${r.statusCode()} ${r.body().take(200)}")
    }
  }
}
