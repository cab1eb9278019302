package graft.table

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

/** Per-file column statistics (min/max as strings + the column's Spark type
  * name) used for log-level file pruning — the same role Iceberg manifests'
  * column bounds play for its `ScanBuilder` (reference `main.tf:794,803`;
  * SURVEY.md §4 row 1). */
case class ColumnStats(min: String, max: String, dataType: String,
    nullCount: Long = -1L, // -1 = unknown (entry written before null tracking)
    // EXACT distinct-value set (sorted), recorded only for small sets on
    // hash-transform stat entries (bucket/iceberg_bucket). Ranges are weak
    // for hash domains — a file holding buckets {3, 29} carries the bound
    // [3, 29], so `bucket = 17` can't prune it; the set proves membership
    // exactly. None = unknown (large set, or entry predates the field —
    // json4s omits None on write and defaults it on legacy reads).
    values: Option[Seq[String]] = None)

/** One immutable data file registered in a snapshot. `schemaId` pins the
  * column names/ids the file was written with, so schema evolution (rename/
  * add/drop — reference `main.tf:803` DDL surface) never rewrites data.
  * `seq` is the Iceberg-v2 DATA SEQUENCE NUMBER: the version at which the
  * file entered the table (stamped by the commit itself; 0 = legacy entry,
  * older than everything). Equality deletes apply only to files with a
  * strictly LOWER sequence — rows appended after the delete survive it. */
case class DataFile(
    path: String,
    rows: Long,
    bytes: Long,
    schemaId: Int,
    stats: Map[String, ColumnStats] = Map.empty,
    seq: Long = 0L,
    // true = the parquet footer embeds Iceberg field ids, so reads may
    // resolve columns BY ID ([[GraftTable]] physicalize). Only set
    // (and only meaningful) on tables imported from Iceberg metadata,
    // where per-file schema history is unavailable; files a foreign
    // writer added WITHOUT ids (Iceberg add_files) read by name.
    footerIds: Boolean = false)

/** Iceberg-v2-style EQUALITY DELETE file: a parquet file of key rows; any
  * data row in an OLDER file (data seq < `seq`) whose key-column values match
  * a key row (null-safe, null matches null — Iceberg's StructLike equality)
  * is deleted on read. Written by [[GraftTable.deleteByEquality]] without
  * scanning any data — the CDC-writer fast path positional deletes can't
  * offer. `cols` are the key columns AS NAMED WHEN THE DELETE WAS WRITTEN
  * (the delete parquet's own column names); `colIds` are their field ids —
  * Iceberg's equality_ids — so the keys keep matching after the table column
  * is RENAMED (reads resolve ids against the current schema; empty = legacy
  * entry, resolved by name). */
case class EqDeleteFile(file: DataFile, cols: Seq[String], seq: Long = 0L,
    colIds: Seq[Int] = Seq.empty)

/** One snapshot = full table state at a version: the file list plus every
  * schema ever used (kept forward so `expireSnapshots` can drop old metadata
  * JSONs without breaking reads of old files). In-memory view only — on disk
  * the file list is split into shared content-addressed manifest chunks
  * ([[StoredSnapshot]]), the Iceberg metadata/manifest split, so a commit
  * writes O(new files), not O(all files). */
case class Snapshot(
    version: Long,
    parent: Long, // -1 for the first snapshot
    timestampMs: Long,
    operation: String,
    currentSchemaId: Int,
    schemas: Map[String, String], // schemaId -> StructType JSON
    files: Seq[DataFile],
    properties: Map[String, String] = Map.empty,
    // Iceberg-v2-style POSITIONAL DELETE files (merge-on-read): parquet
    // files of (file_path, pos) rows anti-joined against data on read.
    // Few and small, so stored inline, never chunked.
    deleteFiles: Seq[DataFile] = Seq.empty,
    // Iceberg-v2-style EQUALITY DELETE files — also few and small (a
    // compaction folds them into the data), stored inline.
    eqDeleteFiles: Seq[EqDeleteFile] = Seq.empty,
    // true = committed on the MAIN lineage (HEAD-moving commit); false =
    // detached (branch write). Lets head recovery and commit arbitration
    // tell an in-flight main commit apart from a branch child of the same
    // parent. Legacy snapshots (field absent) default to true.
    mainLineage: Boolean = true,
    // Iceberg-style snapshot SUMMARY: commit-scoped annotations (wap.id,
    // published-wap-id, ...) that must NOT travel forward the way table
    // `properties` do — each commit stamps its own. Legacy: empty.
    summary: Map[String, String] = Map.empty)

/** On-disk snapshot form: `manifests` names immutable chunk files
  * (`_graft/m-<contenthash>.json`, each a JSON array of [[DataFile]]) that
  * together hold the file list. A commit reuses every parent chunk whose
  * files all survive and writes ONE new chunk for the rest — so an append's
  * metadata write is proportional to the files it adds. `files` inline is
  * the legacy/fallback form, still readable. */
private[table] case class StoredSnapshot(
    version: Long,
    parent: Long,
    timestampMs: Long,
    operation: String,
    currentSchemaId: Int,
    schemas: Map[String, String],
    files: Seq[DataFile] = Seq.empty,
    manifests: Seq[String] = Seq.empty,
    properties: Map[String, String] = Map.empty,
    deleteFiles: Seq[DataFile] = Seq.empty,
    eqDeleteFiles: Seq[EqDeleteFile] = Seq.empty,
    mainLineage: Boolean = true,
    summary: Map[String, String] = Map.empty)

/** Named reference to a snapshot version (Iceberg branch/tag semantics,
  * SURVEY.md §2.8 "Branching/tagging"). */
case class Ref(version: Long, refType: String) // refType: "tag" | "branch"

/** Snapshot log with optimistic-concurrency commits over a [[FileIO]]
  * storage binding — Hadoop `FileSystem` underneath, so the same log runs
  * on local disk, HDFS, or an object store by changing only the table-root
  * URI (the reference keeps table data + metadata on S3,
  * `main.tf:616-619`).
  *
  * Layout under the table root:
  * {{{
  *   data/<uuid>.parquet      immutable data files
  *   _graft/v<N>.json         immutable snapshot metadata
  *   _graft/HEAD              current version (atomic replace on update)
  *   _graft/refs.json         tags/branches (atomic replace on update)
  * }}}
  *
  * Commit protocol (SURVEY.md §7 "hard parts" #2): the new `v<N+1>.json` is
  * published with [[FileIO.createExclusive]] — the filesystem's
  * compare-and-swap (POSIX `link(2)` locally, exists-failing rename under
  * the HDFS contract; see [[FileIO]] for the per-store mapping, including
  * why S3 commits should arbitrate through the REST catalog instead). Two
  * racing writers both build their candidate snapshot; exactly one wins the
  * create, the loser gets [[CommitConflictException]] and must retry on the
  * new head. HEAD is then updated via write-temp + atomic rename, and is only
  * a cache of "highest vN.json" — recovery derives it by listing. This is the
  * local-filesystem analogue of the Iceberg REST catalog's CAS `updateTable`
  * (reference `main.tf:795-801`; SURVEY.md §3 EP1 step 7).
  */
class SnapshotLog(tableRoot: String, val io: FileIO) {
  def this(tableRoot: String) = this(tableRoot, FileIO.forPath(tableRoot))

  private implicit val fmts: Formats = DefaultFormats

  val root: String = tableRoot
  val metaDir: String = s"$tableRoot/_graft"
  val dataDir: String = s"$tableRoot/data"
  private val headPath: String = s"$metaDir/HEAD"

  def initDirs(): Unit = { io.mkdirs(metaDir); io.mkdirs(dataDir) }
  /** Table existence: HEAD, or any committed snapshot. The listing
    * fallback matters on stores where the HEAD replace is delete+rename —
    * a probe in that window must not conclude "no table" (a streaming sink
    * acting on that would auto-create an empty table over a live one). */
  def exists: Boolean = listVersions.nonEmpty || {
    // HEAD alone counts only while its target version is durable: HEAD is
    // a CACHE of the version files, and a purge racing a recreate can
    // strand an orphan HEAD with zero versions at rest (r19 soak) — no
    // durable content is no table. The delete+rename HEAD-replace window
    // this disjunction exists for (see below) has the version files
    // present, so it is covered by the listVersions arm.
    io.exists(headPath) &&
      scala.util.Try(io.readString(headPath).trim.toLong)
        .toOption.exists(v => io.exists(versionPath(v)))
  }

  private def versionPath(v: Long): String = s"$metaDir/v$v.json"
  private def fencePath: String = s"$metaDir/FENCE"

  /** Versions at or below the fence predate the latest backward HEAD move
    * (rollback / set_current_snapshot) — their lineage is dead for head
    * recovery and commit arbitration, even where it shares parents with
    * the live one. */
  private def fence: Long =
    if (io.exists(fencePath)) io.readString(fencePath).trim.toLong else -1L

  /** The real head: the HEAD file, advanced along durable main-lineage
    * children. A commit is durable the moment its vN.json wins the
    * exclusive create — HEAD is only a cache of that fact, so a writer
    * paused (or dead) between the create and the cache move must not make
    * its committed snapshot unreachable, nor block the edge forever.
    * Winner per edge = SMALLEST main-lineage child above the fence — the
    * same total order [[commitRaw]]'s post-create validation enforces, so
    * every process (and a foreign writer following the published protocol)
    * agrees on the lineage. */
  def currentVersion: Long = {
    val vs = listVersions
    val f = fence
    // HEAD-absent anchor recovery: the highest MAIN-LINEAGE version above
    // the fence — the bare max can be a detached branch tip or a fenced
    // rolled-back lineage, and serving either as head is wrong data.
    def recoveredAnchor: Long = {
      if (vs.isEmpty) throw new IllegalStateException(s"no graft table at $tableRoot")
      vs.reverseIterator.find(v => v > f && lineageOf(v).exists(_._2))
        .orElse(vs.reverseIterator.find(v => lineageOf(v).exists(_._2)))
        .getOrElse(vs.max)
    }
    val anchor =
      if (io.exists(headPath)) {
        // HEAD is only a CACHE of the durable version files (see class
        // doc). A purge racing a recreate can leave a stale HEAD whose
        // target version was deleted (r19 ConcurrencySoakSpec flake:
        // HEAD=3 at rest, v3.json purged) — a vanished target gets the
        // same recovery as an absent HEAD instead of poisoning every read.
        val h = io.readString(headPath).trim.toLong
        if (vs.contains(h) || io.exists(versionPath(h))) h else recoveredAnchor
      } else recoveredAnchor
    var cur = anchor
    var advanced = true
    while (advanced) {
      mainChildOf(cur, vs, f) match {
        case Some(c) => cur = c
        case None    => advanced = false
      }
    }
    cur
  }

  /** Smallest surviving main-lineage child of `v` above the fence. */
  private def mainChildOf(v: Long, vs: Seq[Long], f: Long): Option[Long] =
    vs.filter(c => c > v && c > f).sorted
      .find(c => lineageOf(c).contains((v, true)))

  // (parent, mainLineage) per version — immutable once committed, so cached
  // forever; a version expired underneath just stops being consulted.
  private val lineageCache = scala.collection.concurrent.TrieMap.empty[Long, (Long, Boolean)]
  private def lineageOf(v: Long): Option[(Long, Boolean)] =
    lineageCache.get(v).orElse {
      try {
        val st = JsonMethods.parse(io.readString(versionPath(v))).extract[StoredSnapshot]
        val e = (st.parent, st.mainLineage)
        lineageCache.put(v, e)
        Some(e)
      } catch {
        // ONLY the racing-expiry signal (the file vanished between listing
        // and read) may be skipped. A transient IO error or a corrupt JSON
        // must propagate: silently treating a real committed child as
        // absent would let two durable children win the same commit edge
        // (lost update) — the exactly-one-winner invariant depends on every
        // reader seeing every durable main-lineage child.
        case _: java.io.FileNotFoundException => None
      }
    }

  /** All snapshot versions still present in the log (ascending). */
  def listVersions: Seq[Long] =
    io.listNames(metaDir)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json").toLong }
      .sorted

  def snapshot(v: Long): Snapshot = {
    val p = versionPath(v)
    require(io.exists(p), s"snapshot v$v does not exist (expired or never committed)")
    hydrate(JsonMethods.parse(io.readString(p)).extract[StoredSnapshot])
  }

  // ---- manifest chunks ----------------------------------------------------
  // Immutable, content-addressed file-list chunks shared across snapshots:
  // the Iceberg manifest split. Cached in memory — a chunk never changes.
  private val chunkCache = scala.collection.concurrent.TrieMap.empty[String, Seq[DataFile]]

  private def chunkPath(name: String): String = s"$metaDir/$name"

  private def readChunk(name: String): Seq[DataFile] =
    chunkCache.getOrElseUpdate(name,
      JsonMethods.parse(io.readString(chunkPath(name))).extract[Seq[DataFile]])

  private def writeChunk(files: Seq[DataFile]): String = {
    val json = Serialization.write(files)
    val hash = java.security.MessageDigest.getInstance("SHA-256")
      .digest(json.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val name = s"m-$hash.json"
    if (!io.exists(chunkPath(name)))
      io.createExclusive(chunkPath(name), json) // losing the race is fine: identical content
    chunkCache.put(name, files)
    name
  }

  /** Parent chunks carried before consolidating into one — bounds the
    * manifest list and read fan-out (Iceberg's manifest merging); commits
    * stay O(new files) amortized. */
  private val ConsolidateAt = 32

  private def storedManifests(v: Long): Seq[String] =
    if (!io.exists(versionPath(v))) Seq.empty
    else JsonMethods.parse(io.readString(versionPath(v))).extract[StoredSnapshot].manifests

  /** Split a snapshot's file list for storage: reuse every parent chunk whose
    * files all survive, write ONE fresh chunk for the rest. The version JSON
    * itself holds only chunk names — its size is independent of the
    * pre-existing file count. */
  private def toStored(s: Snapshot): StoredSnapshot = {
    val base = StoredSnapshot(s.version, s.parent, s.timestampMs, s.operation,
      s.currentSchemaId, s.schemas, properties = s.properties,
      deleteFiles = s.deleteFiles, eqDeleteFiles = s.eqDeleteFiles,
      mainLineage = s.mainLineage, summary = s.summary)
    val parentManifests = if (s.parent >= 0) storedManifests(s.parent) else Seq.empty
    // reuse requires ENTRY equality, not just path survival: a commit that
    // mutates a carried file's metadata in place (refresh_stats re-records
    // stats under the same path) must not have its mutation silently
    // shadowed by a reused parent chunk holding the stale entry
    val liveByPath = s.files.map(f => f.path -> f).toMap
    val kept = parentManifests.filter(m =>
      readChunk(m).forall(f => liveByPath.get(f.path).contains(f)))
    if (kept.size >= ConsolidateAt)
      base.copy(manifests = if (s.files.isEmpty) Seq.empty else Seq(writeChunk(s.files)))
    else {
      val covered = kept.flatMap(readChunk).map(_.path).toSet
      val fresh = s.files.filterNot(f => covered.contains(f.path))
      base.copy(manifests =
        kept ++ (if (fresh.nonEmpty) Seq(writeChunk(fresh)) else Seq.empty))
    }
  }

  private def hydrate(st: StoredSnapshot): Snapshot =
    Snapshot(st.version, st.parent, st.timestampMs, st.operation, st.currentSchemaId,
      st.schemas, st.files ++ st.manifests.flatMap(readChunk), st.properties,
      st.deleteFiles, st.eqDeleteFiles, st.mainLineage, st.summary)

  /** Stamp the Iceberg-style data sequence number: every file the commit
    * ADDS (path not in the parent) gets `seq =` the new version; carried
    * files keep the seq they were stamped with. Centralizing this in the
    * commit itself means no write path can forget it — the invariant
    * "file.seq = version that introduced it" holds by construction. */
  private def stampNew(snap: Snapshot, parentVersion: Long): Snapshot = {
    val parent: Option[Snapshot] =
      if (parentVersion >= 0 && io.exists(versionPath(parentVersion)))
        Some(hydrate(JsonMethods.parse(io.readString(versionPath(parentVersion)))
          .extract[StoredSnapshot]))
      else None
    val parentPaths = parent.map(_.files.map(_.path).toSet).getOrElse(Set.empty)
    val parentDelPaths = parent.map(_.deleteFiles.map(_.path).toSet).getOrElse(Set.empty)
    snap.copy(
      // seq 0 is the "unset" sentinel: new files get this commit's version.
      // A caller-provided EXPLICIT seq is honored — [[graft.table.IcebergImport]]
      // registers foreign files with their (rank-compressed, negative)
      // Iceberg data sequence numbers so delete scoping survives the import.
      files = snap.files.map(f =>
        if (parentPaths.contains(f.path) || f.seq != 0L) f
        else f.copy(seq = snap.version)),
      // positional-delete files get the same stamp: their sequence number
      // must sit ABOVE the data files they apply to (Iceberg v2 delete
      // scoping — what a foreign reader of the exported metadata uses).
      // Explicit (nonzero) seqs are honored here too, so an imported
      // table's pos-delete ordering survives to a re-export.
      deleteFiles = snap.deleteFiles.map(f =>
        if (parentDelPaths.contains(f.path) || f.seq != 0L) f
        else f.copy(seq = snap.version)))
  }

  def current: Snapshot = snapshot(currentVersion)

  /** Latest snapshot whose commit time is <= tsMs (time travel TIMESTAMP AS
    * OF — SURVEY.md §2.8). */
  def snapshotAsOf(tsMs: Long): Snapshot = {
    val vs = listVersions.map(snapshot).filter(_.timestampMs <= tsMs)
    require(vs.nonEmpty, s"no snapshot as of $tsMs")
    vs.maxBy(_.version)
  }

  /** Client-side half of a commit, shared by the local CAS and the REST
    * client ([[graft.rest.RestSnapshotLog]]): allocate version max+1, run
    * the builder, stamp data sequence numbers, split the file list into
    * manifest chunks (written to shared storage — the engine writes
    * manifests, the catalog only arbitrates the swap, exactly Iceberg's
    * REST-catalog contract). Returns the in-memory snapshot plus its
    * serialized stored form. */
  protected def prepare(parentVersion: Long, build: Long => Snapshot,
      mainLineage: Boolean = true): (Snapshot, String) = {
    val next = (listVersions.lastOption.getOrElse(-1L) max parentVersion) + 1
    val snap = stampNew(build(next), parentVersion).copy(mainLineage = mainLineage)
    require(snap.version == next)
    (snap, Serialization.write(toStored(snap)))
  }

  /** Server-side half: publish a fully-built, serialized candidate. The
    * exclusive create of `v<N>.json` IS the CAS (a plain move's
    * exists-check-then-rename has a race window on POSIX; see [[FileIO]]
    * for how each store provides the primitive); with `moveHead` the
    * linear-head check runs first and HEAD advances on success. This is
    * the REST server's commit entry point — and the local path funnels
    * through it too, so both modes share one protocol. */
  def commitRaw(parentVersion: Long, version: Long, storedJson: String,
      moveHead: Boolean): Unit = {
    if (moveHead) {
      // `exists` (not a bare HEAD probe): during a non-posix HEAD replace
      // the file is briefly absent, and a commit(-1) racing that window
      // must still see the table as existing and fail the stale check.
      // currentVersion forward-walks to in-flight main commits, so a racer
      // that already published its vN.json (but not yet the HEAD cache)
      // surfaces here as a stale-parent conflict.
      val headNow = if (exists) currentVersion else -1L
      if (headNow != parentVersion)
        throw new CommitConflictException(
          s"stale commit: parent v$parentVersion but head is v$headNow")
    } else require(io.exists(versionPath(parentVersion)), s"no parent v$parentVersion")
    val next = (listVersions.lastOption.getOrElse(-1L) max parentVersion) + 1
    if (version != next)
      throw new CommitConflictException(
        s"candidate v$version is stale: next version is v$next; retry on the new head")
    if (!io.createExclusive(versionPath(version), storedJson))
      throw new CommitConflictException(
        s"concurrent commit created v$version first; retry on the new head")
    if (moveHead) {
      // POST-CREATE validation, closing the remaining race: a rival main
      // commit on the same parent that landed between the head check and
      // our create holds a LOWER version (it was visible to our max+1
      // allocation, we were not to its). Lowest version wins the edge —
      // deterministically, in every process — so on seeing a lower rival
      // we retract our own snapshot and lose; a higher rival retracts
      // itself. Same-version racers already collided on the create above.
      val rival = listVersions
        .filter(c => c > fence && c < version)
        .sorted.find(c => lineageOf(c).contains((parentVersion, true)))
      if (rival.isDefined) {
        io.delete(versionPath(version))
        throw new CommitConflictException(
          s"concurrent commit v${rival.get} won parent v$parentVersion; retry on the new head")
      }
      writeHead(version)
    }
  }

  /** CAS commit: verify `parentVersion` is still the head, then atomically
    * create the next version file (always max(existing)+1, so a rollback's
    * HEAD move never collides with versions it left behind — Iceberg
    * likewise only ever appends metadata versions). Losing either check ->
    * [[CommitConflictException]], retry on the new head. */
  def commit(parentVersion: Long, build: Long => Snapshot): Snapshot = {
    val headNow = if (exists) currentVersion else -1L
    if (headNow != parentVersion)
      throw new CommitConflictException(
        s"stale commit: parent v$parentVersion but head is v$headNow")
    val (snap, json) = prepare(parentVersion, build)
    commitRaw(parentVersion, snap.version, json, moveHead = true)
    snap
  }

  /** CAS commit that does NOT move HEAD and allows any existing snapshot as
    * parent — the primitive behind branch writes (a branch head is a ref,
    * not HEAD, so the linear-head check doesn't apply; version numbers stay
    * globally unique via max+1 allocation). */
  def commitDetached(parentVersion: Long, build: Long => Snapshot): Snapshot = {
    require(io.exists(versionPath(parentVersion)), s"no parent v$parentVersion")
    val (snap, json) = prepare(parentVersion, build, mainLineage = false)
    commitRaw(parentVersion, snap.version, json, moveHead = false)
    snap
  }

  /** Move HEAD to an existing snapshot (rollback_to_snapshot /
    * set_current_snapshot — SURVEY.md §2.8 CALL procedures). A BACKWARD
    * move first fences at the current max version: the abandoned lineage's
    * snapshots stay readable (time travel), but head recovery and commit
    * arbitration ignore them — without the fence, an old main-lineage
    * child of the rollback target would permanently win the target's
    * commit edge. */
  def setHead(v: Long): Unit = {
    require(io.exists(versionPath(v)), s"cannot set HEAD to missing v$v")
    val mx = listVersions.lastOption.getOrElse(-1L)
    if (v < mx) io.writeAtomicReplace(fencePath, mx.toString)
    writeHead(v)
  }

  private def writeHead(v: Long): Unit = io.writeAtomicReplace(headPath, v.toString)

  // ---- refs (tags / branches) --------------------------------------------
  private def refsPath: String = s"$metaDir/refs.json"

  def refs: Map[String, Ref] =
    if (!io.exists(refsPath)) Map.empty
    else JsonMethods.parse(io.readString(refsPath)).extract[Map[String, Ref]]

  def setRef(name: String, ref: Ref): Unit = {
    require(io.exists(versionPath(ref.version)), s"ref to missing v${ref.version}")
    writeRefs(refs + (name -> ref))
  }

  def dropRef(name: String): Unit = writeRefs(refs - name)

  private def writeRefs(m: Map[String, Ref]): Unit =
    io.writeAtomicReplace(refsPath, Serialization.write(m))

  /** Delete snapshot JSONs strictly older than `keepFrom` (never HEAD or a
    * ref target), then GC manifest chunks no surviving snapshot references.
    * Data files are handled by removeOrphanFiles. */
  /** The versions [[expireMetadata]] would delete for `keepFrom`, with no
    * side effects — lets a caller handed an EXPLICIT expiry set (the spec
    * IRC `remove-snapshots` action) validate it up front instead of
    * discovering mid-delete that it doesn't match the retention rules. */
  def expireCandidates(keepFrom: Long): Seq[Long] = {
    val protectedVs = refs.values.map(_.version).toSet + currentVersion
    listVersions.filter(v => v < keepFrom && !protectedVs.contains(v))
  }

  def expireMetadata(keepFrom: Long): Seq[Long] = {
    val expired = expireCandidates(keepFrom)
    expired.foreach(v => io.delete(versionPath(v)))
    val referenced = listVersions.flatMap(storedManifests).toSet
    io.listNames(metaDir)
      .filter(n => n.startsWith("m-") && n.endsWith(".json") && !referenced.contains(n))
      .foreach(n => io.delete(chunkPath(n)))
    expired
  }
}

class CommitConflictException(msg: String) extends RuntimeException(msg)
