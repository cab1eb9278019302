package graft.table

import java.net.URLEncoder
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Delta Lake transaction-log interop — the OTHER side of the reference
  * stack's table-format story: its Databricks workspace stores managed
  * tables as Delta while the EMR side speaks Iceberg
  * (reference `main.tf:638-756` vs `main.tf:791-807`). [[IcebergImport]]/
  * [[IcebergExport]] cover the Iceberg half; this covers Delta, so a user
  * can hand either format's tables to this engine (import) or open this
  * engine's tables from either ecosystem (export) without a data rewrite.
  *
  * Everything here is implemented against the PUBLIC Delta protocol
  * (delta.io PROTOCOL.md): `_delta_log/` versioned JSON-lines commits of
  * `protocol` / `metaData` / `add` / `remove` actions, optional parquet
  * checkpoints named by `_last_checkpoint`, URL-encoded relative paths,
  * `schemaString` carrying the Spark StructType JSON. No Delta library is
  * involved on either side.
  */
object DeltaInterop {

  private implicit val fmts: Formats = DefaultFormats

  /** One replayed action stream: (last metaData json, live add actions).
    * Adds/removes reconcile by decoded path, last action wins — the
    * protocol's log-replay rule. */
  private case class ReplayState(
      metaData: Option[JValue] = None,
      minReader: Int = 1,
      live: Map[String, JValue] = Map.empty) {
    def apply(action: JValue): ReplayState = {
      val addPath = (action \ "add" \ "path").extractOpt[String]
      val rmPath = (action \ "remove" \ "path").extractOpt[String]
      if (addPath.isDefined) copy(live = live + (decode(addPath.get) -> (action \ "add")))
      else if (rmPath.isDefined) copy(live = live - decode(rmPath.get))
      else if ((action \ "metaData") != JNothing) copy(metaData = Some(action \ "metaData"))
      else if ((action \ "protocol") != JNothing)
        copy(minReader = (action \ "protocol" \ "minReaderVersion").extractOpt[Int].getOrElse(1))
      else this
    }
  }

  /** Percent-decode a protocol path. URI semantics, NOT URLDecoder's form
    * semantics: a literal '+' in a file name must stay '+' (the statFiles
    * rule) — URLDecoder would turn it into a space and mis-resolve the
    * file. Paths are spec-encoded, so the URI parse succeeds; anything
    * unparseable passes through raw. */
  private def decode(p: String): String = scala.util.Try {
    val u = new java.net.URI(p)
    require(u.getPath != null) // opaque URI: fall through to raw
    if (u.getScheme == null || u.getAuthority == null || u.getAuthority.isEmpty)
      u.getPath
    else s"${u.getScheme}://${u.getAuthority}${u.getPath}"
  }.getOrElse(p)
  private def encodePath(p: String): String =
    // the protocol URL-encodes path segments; '/' must survive
    p.split("/", -1).map(URLEncoder.encode(_, "UTF-8").replace("+", "%20")).mkString("/")

  private def commitFile(root: String, v: Long): String =
    f"${root.stripSuffix("/")}/_delta_log/$v%020d.json"

  /** Import a Delta table (its root directory) as a new graft table.
    *
    * Unpartitioned tables import IN PLACE: the live file set after log
    * replay registers directly (one stats pass for pruning bounds, no data
    * copy — the importParquet discipline). With `history = true` every
    * Delta version after the checkpoint base becomes its own graft
    * snapshot (operation classified from its add/remove mix), so
    * `VERSION AS OF` and changelog reads survive the migration —
    * UNLESS some historical file was vacuumed from disk, in which case the
    * import falls back to the single-snapshot HEAD (Delta itself can't
    * time-travel past a vacuum either). Partitioned Delta tables store
    * partition values in the LOG, not the files, so in-place registration
    * would lose those columns — they MATERIALIZE (read each file, inject
    * its partition literals, write once; history flattens), documented as
    * the one copying path. Checkpoint parquets are honored via
    * `_last_checkpoint`; reader-version ≥ 3 features (deletion vectors,
    * column mapping) are rejected loudly rather than misread. The final
    * schema serves every snapshot: protocol ≤ 2 permits only additive
    * by-name evolution, so name resolution against the latest schema is
    * exactly Delta's own read semantics. */
  def importTable(spark: SparkSession, source: String, targetPath: String,
      history: Boolean = true): GraftTable = {
    // absolutize scheme-less local roots: replayed file paths must compare
    // equal to the absolute rendering the stats pass records
    val root0 = source.stripSuffix("/")
    val root = if (root0.contains("://") || root0.startsWith("/")) root0
               else new java.io.File(root0).getAbsolutePath
    val io = FileIO.forPath(root)
    require(io.exists(s"$root/_delta_log"), s"no _delta_log under $root — not a Delta table")

    // checkpoint base, if any: actions live in a parquet of action structs
    val lastCp = s"$root/_delta_log/_last_checkpoint"
    val (cpVersion, cpActions): (Long, Seq[JValue]) =
      if (io.exists(lastCp)) {
        val cp = JsonMethods.parse(io.readString(lastCp))
        val v = (cp \ "version").extract[Long]
        // multi-part checkpoints name their slices v.checkpoint.i.n.parquet
        val cpFiles = (cp \ "parts").extractOpt[Int] match {
          case Some(n) => (1 to n).map(i =>
            f"$root/_delta_log/$v%020d.checkpoint.$i%010d.$n%010d.parquet")
          case None => Seq(f"$root/_delta_log/$v%020d.checkpoint.parquet")
        }
        val rows = spark.read.parquet(cpFiles: _*)
          .toJSON.collect() // checkpoints are metadata-sized: one row per action
          .map(JsonMethods.parse(_)).toSeq
        (v, rows)
      } else (-1L, Seq.empty)

    // JSON commits after the checkpoint, one action batch per Delta version
    val jsonBatches: Seq[(Long, Seq[JValue])] = Iterator.iterate(cpVersion + 1)(_ + 1)
      .map(v => v -> commitFile(root, v))
      .takeWhile { case (_, f) => io.exists(f) }
      .map { case (v, f) =>
        v -> io.readString(f).split("\n").filter(_.nonEmpty)
          .map(JsonMethods.parse(_)).toSeq
      }
      .toSeq
    require(cpVersion >= 0 || jsonBatches.nonEmpty, s"empty _delta_log under $root")

    // replay: the state after the checkpoint base, then after each version
    val base = cpActions.foldLeft(ReplayState())(_ apply _)
    case class Step(state: ReplayState, added: Int, removed: Int, ts: Long)
    val steps: Seq[Step] = jsonBatches.scanLeft(
        Step(base, 0, 0, 0L)) { case (prev, (v, actions)) =>
      val added = actions.count(a => (a \ "add") != JNothing)
      val removed = actions.count(a => (a \ "remove") != JNothing)
      // commitInfo.timestamp is optional in the protocol; fall back to the
      // commit file's own mtime, then clamp monotone against the previous
      // step — an import-time wall clock here would misorder timestampAsOf
      // over the migrated snapshots
      val ts = actions.flatMap(a =>
        (a \ "commitInfo" \ "timestamp").extractOpt[Long]).headOption
        .orElse(scala.util.Try(io.mtime(commitFile(root, v))).toOption)
        .getOrElse(prev.ts)
        .max(prev.ts)
      Step(actions.foldLeft(prev.state)(_ apply _), added, removed, ts)
    }.tail
    val state = if (steps.isEmpty) base else steps.last.state
    require(state.minReader <= 2,
      s"Delta minReaderVersion ${state.minReader} needs table features " +
      "(deletion vectors / column mapping) this importer does not read")
    val meta = state.metaData.getOrElse(
      throw new IllegalArgumentException(s"no metaData action in $root/_delta_log"))
    val schema = DataType.fromJson((meta \ "schemaString").extract[String])
      .asInstanceOf[StructType]
    val partCols = (meta \ "partitionColumns").extract[Seq[String]]
    def abs(p: String): String =
      if (p.startsWith("/") || p.contains("://")) p else s"$root/$p"
    val absFiles = state.live.keys.toSeq.sorted.map(abs)

    if (partCols.isEmpty) {
      // every path any replayed snapshot references — vacuumed files force
      // the head-only fallback (their rows/bytes are unknowable)
      val everLive = (base.live.keys ++ steps.flatMap(_.state.live.keys))
        .toSeq.distinct.sorted.map(abs)
      val replayable = history && steps.nonEmpty && everLive.forall(io.exists)
      if (!replayable) {
        GraftTable.importFiles(spark, absFiles, schema, targetPath,
          "import-delta", Map("graft.imported-from" -> root))
      } else {
        // one stats pass over the whole chain's file pool, then one graft
        // snapshot per Delta version (the IcebergImport history-replay
        // shape): v0 is the checkpoint base (empty for log-from-birth)
        val (t, statted) = GraftTable.statForImport(spark, everLive, schema, targetPath)
        // scheme-insensitive lookup (file:/a vs /a — the canon rule)
        def strip(p: String): String =
          p.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:(//)?+(?=/)", "")
        val byPath = statted.map(f => strip(f.path) -> f).toMap
        def filesOf(st: ReplayState): Seq[DataFile] =
          st.live.keys.toSeq.sorted.map(p => byPath(strip(abs(p))))
        val schemas = Map("0" -> GraftTable.stampIds(schema).json)
        val props = Map("graft.imported-from" -> root)
        t.log.commit(-1L, _ => Snapshot(0L, -1L, System.currentTimeMillis(),
          if (cpVersion >= 0) "import-delta" else "create",
          0, schemas, filesOf(base), props))
        steps.zipWithIndex.foreach { case (s, i) =>
          val op = (s.added > 0, s.removed > 0) match {
            case (true, false)  => "append"
            case (false, true)  => "delete"
            case (true, true)   => "overwrite"
            case (false, false) => "import-delta" // action-less (property) commit
          }
          t.log.commit(i.toLong, v => Snapshot(v, i.toLong, s.ts, op,
            0, schemas, filesOf(s.state), props))
        }
        GraftTable.load(spark, targetPath)
      }
    } else {
      // materialize: inject each file's partition literals (log-only values)
      val dataSchema = StructType(schema.fields.filterNot(f => partCols.contains(f.name)))
      val byVals = state.live.toSeq.groupBy { case (_, add) =>
        partCols.map(c => (add \ "partitionValues" \ c).extractOpt[String])
      }
      val parts = byVals.map { case (vals, group) =>
        val paths = group.map { case (p, _) =>
          if (p.startsWith("/") || p.contains("://")) p else s"$root/$p"
        }
        val df = spark.read.schema(dataSchema).parquet(paths: _*)
        partCols.zip(vals).foldLeft(df) { case (d, (c, v)) =>
          val dt = schema(c).dataType
          d.withColumn(c, v.map(s => lit(s).cast(dt)).getOrElse(lit(null).cast(dt)))
        }.select(schema.fieldNames.map(col): _*)
      }
      // a partitioned table with zero live files (freshly created, or all
      // rows deleted) is valid — import its schema as an empty table
      val df = parts.reduceOption(_ union _).getOrElse(
        spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          schema))
      GraftTable.create(spark, targetPath, df, Map("graft.imported-from" -> root))
    }
  }

  /** Export the table's CURRENT snapshot as a Delta transaction log under
    * `outDir` (usually the graft table root itself, so `add` paths stay
    * relative and any Delta reader opens the directory as a table). Data
    * files are referenced in place — relative when they live under
    * `outDir`, absolute `file://` URIs otherwise; nothing is copied.
    *
    * Protocol (1, 2) — plain parquet adds, no table features — which is
    * exactly why MOR remainders must be compacted first: Delta v1 cannot
    * express positional/equality deletes, so exporting a snapshot that
    * still carries them would silently resurrect deleted rows. Rejected
    * instead; `rewrite_data_files`/`rewrite_position_delete_files` folds
    * them in. */
  def export(table: GraftTable, outDir: String, history: Boolean = true): String = {
    val snap = table.log.current
    require(snap.deleteFiles.isEmpty && snap.eqDeleteFiles.isEmpty,
      "current snapshot carries merge-on-read deletes Delta v1 cannot express — " +
      "compact first (CALL graft.system.rewrite_data_files / rewrite_position_delete_files)")
    // absolutize ONLY a plain relative outDir (the IcebergExport rule):
    // File.getAbsolutePath on a scheme-qualified URI would mangle
    // s3://bucket/t into /cwd/s3:/bucket/t and write the _delta_log to a
    // bogus local path
    val root = (
      if (outDir.matches("^[a-zA-Z][a-zA-Z0-9+.-]*:/.*") || outDir.startsWith("/")) outDir
      else new java.io.File(outDir).getAbsolutePath
    ).stripSuffix("/")
    val io = FileIO.forPath(root)
    val schema = DataType.fromJson(snap.schemas(snap.currentSchemaId.toString))
      .asInstanceOf[StructType]

    def resolve(p: String): String =
      if (p.startsWith("/") || p.contains("://")) p else s"${table.path.stripSuffix("/")}/$p"
    def deltaPath(abs: String): String =
      if (abs.startsWith(s"$root/")) encodePath(abs.stripPrefix(s"$root/"))
      else if (abs.matches("^[a-zA-Z][a-zA-Z0-9+.-]*:/.*")) {
        // already scheme-qualified (s3://bucket/... or file:/...): keep
        // scheme+authority verbatim and percent-encode ONLY the path part —
        // prefixing file:// (and encoding the inner ':') would make the
        // add-action path unreadable by every Delta client
        val withAuth = "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)(/.*)$".r
        abs match {
          case withAuth(pre, path) => pre + encodePath(path)
          case _ => // scheme:/path, no authority
            val i = abs.indexOf(':')
            abs.substring(0, i + 1) + encodePath(abs.substring(i + 1))
        }
      } else s"file://${encodePath(abs)}"

    // stable metaData id: derived from path + version, so re-export of the
    // same snapshot is byte-identical (no wall-clock UUID)
    val metaId = java.util.UUID.nameUUIDFromBytes(
      s"${table.path}#v${snap.version}".getBytes(UTF_8)).toString
    def js(s: String): String = JsonMethods.compact(JString(s))

    val protocol = """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
    def metaData(ts: Long): String =
      s"""{"metaData":{"id":"$metaId","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${js(schema.json)},"partitionColumns":[],""" +
      s""""configuration":{},"createdTime":$ts}}"""
    def addLine(f: DataFile, ts: Long): String =
      s"""{"add":{"path":"${deltaPath(resolve(f.path))}","partitionValues":{},""" +
      s""""size":${f.bytes},"modificationTime":$ts,""" +
      s""""dataChange":true,"stats":${js(s"""{"numRecords":${f.rows}}""")}}}"""
    def removeLine(p: String, ts: Long): String =
      s"""{"remove":{"path":"${deltaPath(resolve(p))}","deletionTimestamp":$ts,""" +
      """"dataChange":true}}"""

    // main-lineage chain, oldest first; history=false keeps just the HEAD.
    // MOR deletes ANYWHERE in the replayed span disqualify only HISTORY
    // (those intermediate states are inexpressible) — the head still
    // exports as a single commit.
    val chain = {
      var acc = List.empty[Snapshot]
      var v = table.log.currentVersion
      while (v >= 0 && scala.util.Try(table.log.snapshot(v)).isSuccess) {
        val s = table.log.snapshot(v); acc = s :: acc; v = s.parent
      }
      acc
    }
    val replayable = history && chain.size > 1 &&
      chain.forall(s => s.deleteFiles.isEmpty && s.eqDeleteFiles.isEmpty) &&
      chain.forall(s => s.currentSchemaId == snap.currentSchemaId)
    io.mkdirs(s"$root/_delta_log")
    // a shorter re-export over a longer previous log would leave stale
    // higher-numbered commits that Delta's contiguous replay happily reads
    // ON TOP of the new state — drop everything above the last version
    // written before returning
    def dropTail(lastWritten: Long): Unit =
      Iterator.iterate(lastWritten + 1)(_ + 1)
        .map(v => commitFile(root, v)).takeWhile(io.exists)
        .foreach(io.delete)
    if (!replayable) {
      val ts = snap.timestampMs
      val commit = commitFile(root, 0L)
      io.writeAtomicReplace(commit,
        (Seq(protocol, metaData(ts)) ++ snap.files.map(addLine(_, ts)))
          .mkString("", "\n", "\n"))
      dropTail(0L)
      commit
    } else {
      // one Delta version per graft snapshot: adds/removes are the file-set
      // diff against the parent (Delta's own log-replay contract)
      var prev = Set.empty[String]
      val commits = chain.zipWithIndex.map { case (s, i) =>
        val cur = s.files.map(_.path).toSet
        val byPath = s.files.map(f => f.path -> f).toMap
        val diff =
          (prev -- cur).toSeq.sorted.map(removeLine(_, s.timestampMs)) ++
          (cur -- prev).toSeq.sorted.map(p => addLine(byPath(p), s.timestampMs))
        val lines =
          (if (i == 0) Seq(protocol, metaData(s.timestampMs)) else Seq.empty) ++
          // a no-file-change snapshot (property-only commit) still needs one
          // action in its Delta commit — readers reject empty files
          (if (diff.isEmpty && i > 0)
             Seq(s"""{"commitInfo":{"timestamp":${s.timestampMs},"operation":"${s.operation}"}}""")
           else diff)
        prev = cur
        val commit = commitFile(root, i.toLong)
        io.writeAtomicReplace(commit, lines.mkString("", "\n", "\n"))
        commit
      }
      dropTail(chain.size - 1L)
      commits.last
    }
  }
}
