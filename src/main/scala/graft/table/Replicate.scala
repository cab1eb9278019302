package graft.table

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

/** Incremental table replication: mirror a graft table's live snapshot
  * lineage into a second warehouse/filesystem — the disaster-recovery and
  * cross-region story for the reference's single-region S3 layout
  * (reference `main.tf:616-619`; at 100 TB you replicate tables, not
  * buckets, so metadata and data move together and the replica is a
  * READABLE TABLE at every point, not a pile of objects).
  *
  * Design:
  *  - **Metadata replays verbatim.** Snapshot JSONs and content-addressed
  *    manifest chunks copy as-is (table-owned data paths are RELATIVE, so
  *    they stay valid under the new root); version NUMBERS are preserved,
  *    so `VERSION AS OF` time travel answers identically on the replica.
  *  - **Data copies distributed and resumably.** One Spark job copies the
  *    table-owned files via the Hadoop FileSystem API (works across
  *    schemes); a file already at the destination with the right size is
  *    skipped, so a crashed run converges on re-run. Externally-referenced
  *    files (absolute paths from `import_parquet`/`add_files`) are NOT
  *    copied — they stay referenced in place, exactly the import's
  *    semantics.
  *  - **Positional deletes are REWRITTEN, not copied.** Their `file_path`
  *    column stores absolute paths under the SOURCE root; a verbatim copy
  *    would anti-join against nothing on the replica and silently
  *    resurrect deleted rows. The rewrite swaps the canonical root prefix
  *    and re-lands the file under the same relative name. (Equality
  *    deletes reference key VALUES — they copy verbatim.)
  *  - **Incremental.** Every replicated snapshot's summary carries
  *    `graft.replica.source`; a later run replicates only source versions
  *    above the replica's max. A destination that exists WITHOUT the
  *    marker is refused — replication never clobbers a real table.
  *  - **Crash-safe.** Versions land ascending via `createExclusive`
  *    (idempotent on re-run), HEAD and refs move last; the replica's HEAD
  *    recovery derives the tip by listing, so a crash between a version
  *    landing and the HEAD move still serves the landed version.
  *
  * Rollback fences and detached branch snapshots are NOT replicated: the
  * replica receives the LIVE main lineage (walking parents from the source
  * head), which needs no fence by construction; refs (tags/branches) copy
  * for every version the replica holds.
  */
object Replicate {

  /** Summary key stamped on every replicated snapshot. */
  val MarkerKey = "graft.replica.source"

  private implicit val fmts: Formats = DefaultFormats

  private val deleteSchema = StructType(Seq(
    StructField("file_path", StringType), StructField("pos", LongType)))

  /** Replicate `srcRoot`'s live lineage into `dstRoot`; returns the source
    * versions replicated this run (empty = already up to date). `dstIoOpt`
    * is a test seam (fault injection). */
  /** [[GraftTable]]'s root normalization: positional-delete `file_path`
    * columns record ABSOLUTE `_metadata.file_path` renderings, so the
    * prefix rewrite must compare absolute-to-absolute — a relative root
    * would silently match nothing and the replica would resurrect every
    * MOR-deleted row (caught by ReplicationSpec's resurrect test). */
  private def absRoot(p: String): String =
    if (p.matches("^[a-zA-Z][a-zA-Z0-9+.-]*:/.*")) p.stripSuffix("/")
    else java.nio.file.Paths.get(p).toAbsolutePath.normalize.toString

  def run(spark: SparkSession, srcRootRaw: String, dstRootRaw: String,
      dstIoOpt: Option[FileIO] = None): Seq[Long] = {
    val srcRoot = absRoot(srcRootRaw)
    val dstRoot = absRoot(dstRootRaw)
    val src = new SnapshotLog(srcRoot)
    require(src.exists, s"no graft table at $srcRoot")
    val dstIo = dstIoOpt.getOrElse(FileIO.forPath(dstRoot))
    val dst = new SnapshotLog(dstRoot, dstIo)
    val srcCanon = GraftTable.canonStr(src.root)
    val dstCanon = GraftTable.canonStr(dst.root)
    require(srcCanon != dstCanon, "cannot replicate a table onto itself")

    // live main lineage, ascending; stops at the first expired ancestor
    // (the replica mirrors what the source can still serve)
    val chain = {
      val b = scala.collection.mutable.ArrayBuffer.empty[Long]
      var v = src.currentVersion
      while (v >= 0 && src.listVersions.contains(v)) { b += v; v = src.snapshot(v).parent }
      b.toSeq.reverse
    }

    val done: Long =
      if (!dst.exists) -1L
      else {
        require(dst.current.summary.contains(MarkerKey),
          s"$dstRoot exists and is not a replica of anything — refusing to overwrite")
        dst.listVersions.max
      }
    val todo = chain.filter(_ > done)
    dst.initDirs()

    for (v <- todo) {
      val st = JsonMethods.parse(src.io.readString(s"${src.metaDir}/v$v.json"))
        .extract[StoredSnapshot]
      // manifest chunks verbatim: immutable, content-addressed, and their
      // relative data paths stay valid under the new root
      val chunkFiles: Seq[DataFile] = st.manifests.flatMap { m =>
        val content = src.io.readString(s"${src.metaDir}/$m")
        val p = s"${dst.metaDir}/$m"
        if (!dstIo.exists(p)) dstIo.createExclusive(p, content)
        JsonMethods.parse(content).extract[Seq[DataFile]]
      }
      // distributed, resumable copy of the table-owned files this version
      // can reference (data + equality deletes; external absolutes stay put)
      val owned = (st.files ++ chunkFiles ++ st.eqDeleteFiles.map(_.file))
        .map(_.path)
        .filterNot(p => p.startsWith("/") || p.contains("://"))
        .distinct
      copyOwned(spark, src.root, dst.root, owned)
      // positional deletes: root-prefix rewrite of the file_path column
      val dels = st.deleteFiles.map(f =>
        rewriteDelete(spark, f, src.root, dst.root, srcCanon, dstCanon, dstIo))
      val out = st.copy(deleteFiles = dels,
        summary = st.summary + (MarkerKey -> src.root))
      // idempotent on re-run: an existing version was landed by a previous
      // (crashed) run of this same replication
      dstIo.createExclusive(s"${dst.metaDir}/v$v.json", Serialization.write(out))
    }

    // the FENCE travels: version numbers are shared, so a source rollback's
    // fence means the same thing on the replica — without it, a replica of
    // a rolled-back source would forward-walk HEAD back onto the abandoned
    // lineage it replicated in an earlier run (stale versions stay present;
    // only the fence keeps them dead, exactly as on the source)
    if (src.io.exists(s"${src.metaDir}/FENCE"))
      dstIo.writeAtomicReplace(s"${dst.metaDir}/FENCE",
        src.io.readString(s"${src.metaDir}/FENCE"))
    if (chain.nonEmpty)
      dstIo.writeAtomicReplace(s"${dst.metaDir}/HEAD", chain.last.toString)
    // refs (tags/branches) for every version the replica holds — written
    // whenever the source HAS a refs file, so a ref deleted at the source
    // disappears from the replica too
    if (src.io.exists(s"${src.metaDir}/refs.json")) {
      val have = dst.listVersions.toSet
      val refs = JsonMethods.parse(src.io.readString(s"${src.metaDir}/refs.json"))
        .extract[Map[String, Ref]]
        .filter { case (_, r) => have.contains(r.version) }
      dstIo.writeAtomicReplace(s"${dst.metaDir}/refs.json",
        Serialization.write(refs))
    }
    todo
  }

  /** One Spark job copying `rel` paths from `srcRoot` to `dstRoot` via the
    * Hadoop FileSystem API — scheme-crossing, skip-if-same-size resumable.
    * File lists are metadata-sized (thousands of entries at 100 TB), the
    * BYTES are what needs a cluster: each task streams its files directly
    * between filesystems, nothing routes through the driver. */
  private def copyOwned(spark: SparkSession, srcRoot: String, dstRoot: String,
      rel: Seq[String]): Unit = {
    if (rel.isEmpty) return
    val pairs = rel.map(r => (s"$srcRoot/$r", s"$dstRoot/$r"))
    val slices = math.max(1, math.min(64, pairs.size))
    spark.sparkContext.parallelize(pairs, slices).foreachPartition { it =>
      val conf = new org.apache.hadoop.conf.Configuration()
      it.foreach { case (a, b) =>
        val sp = new org.apache.hadoop.fs.Path(a)
        val dp = new org.apache.hadoop.fs.Path(b)
        val sfs = sp.getFileSystem(conf)
        val dfs = dp.getFileSystem(conf)
        val srcLen = sfs.getFileStatus(sp).getLen
        if (!dfs.exists(dp) || dfs.getFileStatus(dp).getLen != srcLen)
          org.apache.hadoop.fs.FileUtil.copy(sfs, sp, dfs, dp,
            /*deleteSource=*/ false, /*overwrite=*/ true, conf)
      }
    }
  }

  /** Rewrite one positional-delete file for the new root: every `file_path`
    * under the source root maps to the destination root (canonical, so
    * `file:/` vs `file:///` renderings can't miss); external paths pass
    * through. Lands under the SAME relative name, so the snapshot entry's
    * path is unchanged; stats are dropped (sound — they only ever prune)
    * because the recorded bounds would still name source paths. */
  private def rewriteDelete(spark: SparkSession, f: DataFile,
      srcRoot: String, dstRoot: String, srcCanon: String, dstCanon: String,
      dstIo: FileIO): DataFile = {
    val dstAbs = GraftTable.resolveUnder(dstRoot, f.path)
    if (!dstIo.exists(dstAbs)) {
      val srcAbs = GraftTable.resolveUnder(srcRoot, f.path)
      val canon = GraftTable.canonCol(col("file_path"))
      val rewritten = spark.read.schema(deleteSchema).parquet(srcAbs)
        .withColumn("file_path",
          when(canon.startsWith(srcCanon + "/"),
            concat(lit(dstCanon), substring(canon, srcCanon.length + 1, Int.MaxValue)))
            .otherwise(col("file_path")))
      val staging = s"$dstRoot/_staging-replica-${java.util.UUID.randomUUID()}"
      rewritten.coalesce(1).write.parquet(staging)
      val part = dstIo.listNames(staging)
        .find(n => n.startsWith("part-") && n.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(
          s"delete rewrite produced no parquet under $staging"))
      dstIo.mkdirs(dstAbs.substring(0, dstAbs.lastIndexOf('/')))
      dstIo.rename(s"$staging/$part", dstAbs)
      dstIo.deleteRecursive(staging)
    }
    f.copy(bytes = dstIo.size(dstAbs), stats = Map.empty)
  }
}
