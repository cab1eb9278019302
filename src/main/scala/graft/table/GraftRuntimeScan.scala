package graft.table

import java.util
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, Statistics, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.graftglue.ScanGlue
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Runtime-filterable DSv2 batch scan — the JOIN-TIME file-pruning path
  * (Iceberg's `SparkBatchQueryScan implements SupportsRuntimeV2Filtering`
  * role). At plan time the snapshot log prunes files with the statically
  * pushed filters, exactly like the V1 path; at EXECUTION time, when this
  * scan sits on the probe side of a join whose build side was broadcast,
  * Spark's dynamic partition pruning hands the build side's join-key values
  * back through `filter(...)` — and the file list re-prunes against the
  * snapshot log's per-file bounds before any input partition is planned. On
  * a 100 TB fact table joined to a filtered dimension this is the difference
  * between scanning the whole table and scanning the files that can match
  * the surviving dimension keys; no static filter can express it because
  * the key set only exists once the dimension side has run.
  *
  * Reading delegates to Spark's OWN `ParquetScan` over the pruned file list
  * (vectorized, columnar, whole-stage codegen) — this class plans WHICH
  * files, never HOW to read them. Opt-in via
  * `spark.graft.runtime-filtering=true`; [[GraftRuntimeScan.eligible]]
  * restricts it to snapshots the plain parquet scan can serve exactly
  * (no MOR deletes to anti-join, one homogeneous current schema, no
  * bucket-layout fast path to preserve) — everything else keeps the default
  * projection-aware path. */
class GraftRuntimeScan private (t: GraftTable, snap: Snapshot,
    pushed: Array[Filter], required: StructType, dataSchema: StructType)
  extends Scan with Batch with SupportsRuntimeV2Filtering with SupportsReportStatistics {

  // planFiles, not pruneFiles: the runtime-filtering scan is a real read,
  // so it honors `spark.graft.plan-mode=server` like the swap path does
  // (join-time re-prunes below stay LOCAL — they arrive mid-execution and
  // only ever narrow the already-planned list)
  @volatile private var files: Seq[DataFile] = t.planFiles(snap, pushed.toIndexedSeq)
  // inner ParquetScan rebuilt only when the file list changes
  @volatile private var innerFor: (Seq[DataFile], Batch) = null

  private def inner: Batch = {
    val cur = files
    val cached = innerFor
    if (cached != null && (cached._1 eq cur)) cached._2
    else {
      val b = ScanGlue.parquetScan(t.spark, cur.map(f => t.resolve(f.path)),
        dataSchema, required, pushed).toBatch
      innerFor = (cur, b)
      b
    }
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = inner.planInputPartitions()
  override def createReaderFactory(): PartitionReaderFactory = inner.createReaderFactory()

  /** Any top-level column can carry a runtime filter: file pruning falls
    * back to "keep" wherever stats are missing, so declaring broadly is
    * always safe and lets DPP engage on every equi-join key. */
  override def filterAttributes(): Array[NamedReference] =
    dataSchema.fields.map(f => Expressions.column(f.name))

  override def filter(predicates: Array[Predicate]): Unit = {
    val v1 = predicates.flatMap(p => ScanGlue.toV1Filter(p))
    if (v1.nonEmpty)
      files = t.pruneFiles(snap, (pushed ++ v1).toIndexedSeq)
  }

  /** Post-static-pruning manifest numbers (pre-runtime-filter: stats feed
    * PLAN-time decisions like broadcast selection, which happen before any
    * runtime filter value exists). */
  override def estimateStatistics(): Statistics = new Statistics {
    private val fs = files
    override def sizeInBytes(): util.OptionalLong =
      util.OptionalLong.of(fs.map(_.bytes).sum)
    override def numRows(): util.OptionalLong =
      util.OptionalLong.of(fs.map(_.rows).sum)
  }

  /** Files the scan currently plans (test observability: equals the
    * statically pruned set until a runtime filter tightens it). */
  def plannedFileCount: Int = files.size

  override def description(): String =
    s"GraftRuntimeScan ${t.path} v${snap.version} (${files.size} files)"
}

object GraftRuntimeScan {

  /** The snapshots a bare parquet scan serves EXACTLY: no positional or
    * equality deletes (they need the anti-join read), every file written
    * under the current schema by name (no per-file projection, no initial
    * defaults, no footer-id renames), and no bucketed-layout fast path
    * (whose zero-exchange joins beat file pruning on its keys). */
  private[graft] def eligible(t: GraftTable, snap: Snapshot): Boolean =
    snap.deleteFiles.isEmpty && snap.eqDeleteFiles.isEmpty &&
      GraftTable.bucketByOf(snap.properties).isEmpty &&
      snap.files.forall(f => f.schemaId == snap.currentSchemaId && !f.footerIds)

  /** Build the runtime-filterable scan when the snapshot qualifies. */
  private[graft] def forSnapshot(t: GraftTable, snap: Snapshot,
      pushed: Array[Filter], required: StructType): Option[GraftRuntimeScan] =
    if (!eligible(t, snap)) None
    else {
      val data = StructType(t.schemaOf(snap, snap.currentSchemaId).fields
        .map(f => f.copy(metadata = org.apache.spark.sql.types.Metadata.empty)))
      Some(new GraftRuntimeScan(t, snap, pushed, required, data))
    }
}
