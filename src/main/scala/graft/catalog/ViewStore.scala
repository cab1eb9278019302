package graft.catalog

import graft.table.FileIO
import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

/** One materialized state of a view's defining query (Iceberg view spec
  * "Versions"): the SQL text plus the schema and session context captured
  * when that text was set. `CREATE OR REPLACE VIEW` APPENDS one of these
  * instead of overwriting the file wholesale, so the stored view carries
  * its full version history — exactly what the spec's `versions` +
  * `version-log` arrays serialize (reference stack: Unity Catalog serves
  * the same history to Trino, `main.tf:812-816`).
  */
private[graft] case class StoredViewVersion(
    versionId: Int,
    timestampMs: Long,
    sql: String,
    schemaJson: String,
    currentCatalog: String,
    currentNamespace: Seq[String])

/** Persisted form of a graft view (`<ns>/_views/<name>.json`). Top-level
  * fields describe the CURRENT version (the shape round 3 shipped — files
  * written before view versioning existed parse unchanged, `viewUuid` and
  * `versions` simply absent); `versions` holds the full history including
  * the current version, oldest first. */
private[graft] case class StoredView(
    sql: String,
    currentCatalog: String,
    currentNamespace: Seq[String],
    schemaJson: String,
    queryColumnNames: Seq[String],
    columnAliases: Seq[String],
    columnComments: Seq[String],
    properties: Map[String, String],
    viewUuid: Option[String] = None,
    versions: Option[Seq[StoredViewVersion]] = None) {

  def currentVersionId: Int = versions.map(_.map(_.versionId).max).getOrElse(1)

  /** History, oldest first — synthesized for pre-versioning files (one
    * version, epoch timestamp: deterministic, so every render of a legacy
    * view serializes identically regardless of which process renders it). */
  def allVersions: Seq[StoredViewVersion] = versions.getOrElse(
    Seq(StoredViewVersion(1, 0L, sql, schemaJson, currentCatalog, currentNamespace)))
}

private[graft] object ViewStore {
  private implicit val fmts: Formats = DefaultFormats

  def read(io: FileIO, path: String): StoredView =
    JsonMethods.parse(io.readString(path)).extract[StoredView]

  def write(io: FileIO, dir: String, path: String, sv: StoredView): Unit = {
    io.mkdirs(dir)
    io.writeAtomicReplace(path, Serialization.write(sv))
  }

  /** Stable uuid for a view file that predates uuid stamping: derived from
    * the view's warehouse-relative identity, NOT random — concurrent
    * renderers must agree on it without coordinating. */
  def fallbackUuid(nsAndName: Seq[String]): String =
    java.util.UUID.nameUUIDFromBytes(
      ("graft-view:" + nsAndName.mkString("\u0000")).getBytes("UTF-8")).toString

  /** Optimistic replace via a per-(uuid, target-version) exclusive-create
    * marker (`<view>.json.<uuid>.v<N>`), the view analogue of SnapshotLog's
    * v<N>.json commit CAS. SHARED between [[GraftCatalog]]'s replaceView
    * (Spark `CREATE OR REPLACE VIEW`) and the REST server's spec
    * `commitView` endpoint, so graft-native and foreign replacers arbitrate
    * through the SAME files — two engines replacing concurrently can never
    * both land version N+1 with one update vanishing.
    *
    * The marker carries its creation timestamp: a crash between marker
    * create and the main-file write would otherwise wedge the view forever
    * (markers are only swept on DROP VIEW), so a loser that still sees no
    * history advance after `graceMs` reclaims the orphan and retries.
    *
    * @param readPrev re-read the CURRENT stored view each attempt (throws
    *                 the caller's no-such-view error on concurrent drop)
    * @param next     build the replacement from (prev, resolved uuid); its
    *                 `currentVersionId` names the CAS target version
    */
  def replaceWithCas(io: FileIO, dir: String, path: String,
      fallbackIds: Seq[String], graceMs: Long)(readPrev: () => StoredView)(
      next: (StoredView, String) => StoredView): StoredView = {
    var attempts = 0
    while (true) {
      val prev = readPrev()
      val uuid = prev.viewUuid.getOrElse(fallbackUuid(fallbackIds))
      val now = System.currentTimeMillis()
      val candidate = next(prev, uuid)
      val marker = s"$path.$uuid.v${candidate.currentVersionId}"
      if (!io.createExclusive(marker, now.toString)) {
        // CAS loss with NO history advance: either a racing replacer whose
        // write is in flight, or an orphan. Age decides — an unparseable /
        // pre-timestamp marker counts as infinitely old.
        val stamp = scala.util.Try(io.readString(marker).trim.toLong).getOrElse(0L)
        if (now - stamp > graceMs) io.delete(marker)
      } else {
        write(io, dir, path, candidate)
        return candidate
      }
      // lost the marker race: the winner's main-file write may still be in
      // flight, so back off briefly before re-reading the new history
      attempts += 1
      if (attempts >= 50) throw new IllegalStateException(
        s"replaceView $path: lost the version CAS $attempts times")
      Thread.sleep(10)
    }
    throw new IllegalStateException("unreachable")
  }
}
