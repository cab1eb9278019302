package graft.catalog

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwrite, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{BaseRelation, InsertableRelation, TableScan}
import org.apache.spark.sql.types.{ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.table.GraftTable

/** DSv2 table over a graft snapshot log, optionally pinned to a version or
  * timestamp (time travel — SURVEY.md §2.8). Read and write delegate to the
  * engine's own distributed paths through the V1 fallback hooks (`V1Scan` /
  * `V1Write`), so the scan is still Spark's vectorized parquet reader over
  * the snapshot's file list and a write is an ACID append/overwrite commit —
  * no bespoke row-level IO. */
case class GraftDsv2Table(t: GraftTable, identName: String,
    asOfVersion: Option[Long] = None, asOfTimestampMs: Option[Long] = None,
    branch: Option[String] = None,
    // invoked at write-plan time (INSERT/OVERWRITE/DELETE targets): the
    // catalog splices a MODIFY grant check here so a SELECT-only principal
    // can resolve the table but not commit to it ([[GrantStore]])
    writeGuard: () => Unit = () => (),
    // invoked at scan-plan time: loadTable accepts SELECT-or-MODIFY (a
    // write-only principal must resolve its DML target), so the read
    // privilege proper is enforced here instead (ADVICE r13)
    readGuard: () => Unit = () => ())
  extends Table with SupportsRead with SupportsWrite
  with org.apache.spark.sql.connector.catalog.SupportsDelete {

  /** SQL `DELETE FROM graft.db.t WHERE ...` (and `TRUNCATE TABLE` through
    * the inherited default): translate the pushed filters and run the
    * copy-on-write row-level delete. Refuse (-> Spark errors with a clear
    * message) when any filter shape can't be translated exactly. */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    branch.isEmpty && filters.forall(f => toColumn(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    writeGuard()
    val cond = filters.flatMap(toColumn)
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    t.delete(cond)
  }

  override def name(): String = identName

  override def schema(): StructType = {
    // a branch head may have evolved its schema independently of main
    val base = if (branch.isDefined) t.schemaOfSnapshot(snapshotForRead) else t.schema
    StructType(base.fields.map(_.copy(metadata = org.apache.spark.sql.types.Metadata.empty)))
  }

  /** Deliberately NOT declaring AUTOMATIC_SCHEMA_EVOLUTION: Spark's
    * `ResolveMergeIntoSchemaEvolution` applies the SOURCE type verbatim on
    * mismatch — including narrowings like BIGINT→INT when the source used
    * int literals — and errors if the catalog refuses. MERGE … WITH SCHEMA
    * EVOLUTION instead goes through [[GraftMergeEvolution]], which adds
    * missing columns and applies loss-free widenings only (Iceberg 1.9
    * semantics). */
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER).asJava

  override def properties(): util.Map[String, String] =
    t.log.current.properties.asJava

  /** Scan with pushdown: accepted filters prune whole files from the
    * snapshot log via column bounds (Iceberg-manifest-style, SURVEY.md §4
    * row 1), column pruning narrows the parquet read schema, and both are
    * re-applied on the inner DataFrame so the vectorized parquet reader gets
    * its own row-group-level PushedFilters. Filters are also returned as
    * residuals, so Spark re-checks them — pruning can never lose rows. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    readGuard()
    new ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
      private var pushed: Array[Filter] = Array.empty
      private var required: StructType = schema()

      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        pushed = filters
        filters // conservatively all residual: Spark re-evaluates post-scan
      }
      override def pushedFilters(): Array[Filter] = pushed
      override def pruneColumns(requiredSchema: StructType): Unit =
        if (requiredSchema.nonEmpty) required = requiredSchema

      override def build(): Scan = {
        // Opt-in scale path: a runtime-filterable DSv2 batch scan (join-time
        // file pruning via DPP — see [[graft.table.GraftRuntimeScan]]) for
        // snapshots a bare parquet scan serves exactly; everything else (and
        // the default) takes the projection-aware V1 path below.
        val runtime =
          if (GraftDsv2Table.runtimeFilteringEnabled(t.spark))
            graft.table.GraftRuntimeScan.forSnapshot(t, snapshotForRead, pushed, required)
          else None
        runtime.getOrElse(v1Scan(pushed, required))
      }

      private def v1Scan(pushed: Array[Filter], required: StructType): Scan =
        new V1Scan with SupportsReportStatistics {
        private val filters = pushed
        private val outSchema = required
        override def readSchema(): StructType = outSchema
        /** Exact post-pruning size/row counts from the snapshot log's file
          * stats (the manifest numbers — no file IO). With them the planner
          * auto-broadcasts small graft tables even where the
          * [[graft.plans.GraftNativeScan]] swap isn't installed; without
          * them a V1 relation defaults to `defaultSizeInBytes` (= "huge")
          * and every dim join shuffles. */
        override def estimateStatistics(): Statistics = new Statistics {
          private val snap = snapshotForRead
          private val files = t.pruneFiles(snap, filters.toIndexedSeq)
          override def sizeInBytes(): util.OptionalLong =
            util.OptionalLong.of(files.map(_.bytes).sum)
          override def numRows(): util.OptionalLong =
            util.OptionalLong.of(files.map(_.rows).sum)
          /** Per-COLUMN statistics for the CBO, all metadata-derived:
            * null counts + exact-numeric min/max merge from the per-file
            * manifest bounds; distinct counts come from the `stats.ndv.*`
            * properties an ANALYZE pass ([[GraftTable.computeColumnStats]])
            * recorded. Zero file IO at plan time. */
          override def columnStats(): util.Map[org.apache.spark.sql.connector.expressions.NamedReference,
              org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
            import org.apache.spark.sql.connector.read.colstats.ColumnStatistics
            val nRows = files.map(_.rows).sum
            val out = new util.HashMap[org.apache.spark.sql.connector.expressions.NamedReference, ColumnStatistics]()
            outSchema.fields.foreach { f =>
              val perFile = files.map(_.stats.get(f.name))
              // nullCount only when EVERY file tracks it (a file with no
              // entry is all-null-or-legacy — indeterminate, so skip)
              val nulls: Option[Long] =
                if (files.nonEmpty && perFile.forall(_.exists(_.nullCount >= 0)))
                  Some(perFile.flatMap(_.map(_.nullCount)).sum)
                else None
              // min/max only for exact numerics whose string bounds
              // round-trip losslessly (same rule as GraftMetadataAggregate)
              def merged(pick: graft.table.ColumnStats => String, wantMin: Boolean): Option[AnyRef] = {
                // skip all-null marker entries (empty bounds) — one marker
                // file must not wipe the merged bounds for the column
                // (review r17: the Try below swallowed "".toLong)
                val vals = perFile.flatten.map(pick).filter(_.trim.nonEmpty)
                if (vals.isEmpty) None
                else f.dataType match {
                  case LongType | IntegerType | ShortType | ByteType =>
                    val ls = vals.map(_.toLong)
                    Some(java.lang.Long.valueOf(if (wantMin) ls.min else ls.max))
                  case DoubleType | FloatType =>
                    val ds = vals.map(_.toDouble)
                    Some(java.lang.Double.valueOf(if (wantMin) ds.min else ds.max))
                  case _ => None
                }
              }
              val mn = scala.util.Try(merged(_.min, wantMin = true)).toOption.flatten
              val mx = scala.util.Try(merged(_.max, wantMin = false)).toOption.flatten
              val ndv = snap.properties.get(s"stats.ndv.${f.name}")
                .flatMap(s => scala.util.Try(s.toLong).toOption)
                .map(n => math.min(n, math.max(nRows, 1L))) // NDV can't exceed rows
              if (nulls.nonEmpty || ndv.nonEmpty || mn.nonEmpty)
                out.put(org.apache.spark.sql.connector.expressions.Expressions.column(f.name),
                  new ColumnStatistics {
                  override def distinctCount(): util.OptionalLong =
                    ndv.map(util.OptionalLong.of).getOrElse(util.OptionalLong.empty)
                  override def nullCount(): util.OptionalLong =
                    nulls.map(util.OptionalLong.of).getOrElse(util.OptionalLong.empty)
                  override def min(): util.Optional[Object] =
                    mn.map(util.Optional.of[Object]).getOrElse(util.Optional.empty[Object])
                  override def max(): util.Optional[Object] =
                    mx.map(util.Optional.of[Object]).getOrElse(util.Optional.empty[Object])
                })
            }
            out
          }
        }
        override def toV1TableScan[T <: BaseRelation with TableScan](context: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = context
            override def schema: StructType = outSchema
            override def buildScan(): RDD[Row] = {
              val base = prunedDf(filters)
              val filtered = filters.flatMap(toColumn).foldLeft(base)(_ filter _)
              filtered.select(outSchema.fieldNames.map(org.apache.spark.sql.functions.col): _*).rdd
            }
          }.asInstanceOf[T]
      }
    }
  }

  /** Best-effort translation of pushed filters back to Columns for the inner
    * parquet scan (unsupported shapes are skipped — Spark re-checks all
    * residuals anyway). */
  private def toColumn(f: Filter): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.sources._
    f match {
      case EqualTo(c, v)            => Some(col(c) === v)
      case GreaterThan(c, v)        => Some(col(c) > v)
      case GreaterThanOrEqual(c, v) => Some(col(c) >= v)
      case LessThan(c, v)           => Some(col(c) < v)
      case LessThanOrEqual(c, v)    => Some(col(c) <= v)
      case In(c, vs)                => Some(col(c).isin(vs.toIndexedSeq: _*))
      case IsNull(c)                => Some(col(c).isNull)
      case IsNotNull(c)             => Some(col(c).isNotNull)
      case And(l, r) => for (a <- toColumn(l); b <- toColumn(r)) yield a && b
      case Or(l, r)  => for (a <- toColumn(l); b <- toColumn(r)) yield a || b
      case Not(c)    => toColumn(c).map(!_)
      case AlwaysTrue()  => Some(org.apache.spark.sql.functions.lit(true))
      case AlwaysFalse() => Some(org.apache.spark.sql.functions.lit(false))
      case _ => None
    }
  }

  /** The snapshot this table instance reads (honors time travel and branch
    * identifiers). */
  private[graft] def snapshotForRead: graft.table.Snapshot = branch match {
    case Some(b) =>
      val r = t.log.refs.getOrElse(b, throw new IllegalArgumentException(
        s"$identName: no branch '$b'"))
      require(r.refType == "branch", s"$identName: '$b' is a tag, not a branch")
      t.log.snapshot(r.version)
    case None => (asOfVersion, asOfTimestampMs) match {
      case (Some(v), _)  => t.log.snapshot(v)
      case (_, Some(ts)) => t.log.snapshotAsOf(ts)
      case _             => t.log.current
    }
  }

  private[graft] def prunedDf(filters: Array[Filter]): DataFrame =
    t.readPruned(snapshotForRead, filters.toIndexedSeq)

  /** Catalog-statistics rendering of the (file-pruned) snapshot for plan
    * paths that LEAVE DSv2 — the [[graft.plans.GraftNativeScan]] parquet
    * swap: the same metadata-only numbers `estimateStatistics` reports
    * (manifest row/byte totals, merged null counts and exact-numeric
    * bounds, ANALYZE's `stats.ndv.*` distinct counts), repackaged as a
    * `CatalogStatistics` the spliced `LogicalRelation.computeStats` serves
    * to the CBO. Without this the swap silently drops column statistics
    * and cost-based filter/join estimation never sees an analyzed graft
    * table on the hot (vectorized) read path. Zero file IO. */
  private[graft] def catalogStatistics(filters: Array[Filter]):
      org.apache.spark.sql.catalyst.catalog.CatalogStatistics = {
    import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics}
    val snap = snapshotForRead
    val files = t.pruneFiles(snap, filters.toIndexedSeq)
    val rows = files.map(_.rows).sum
    val colStats = schema().fields.flatMap { f =>
      val perFile = files.map(_.stats.get(f.name))
      val nulls: Option[BigInt] =
        if (files.nonEmpty && perFile.forall(_.exists(_.nullCount >= 0)))
          Some(BigInt(perFile.flatMap(_.map(_.nullCount)).sum))
        else None
      // bounds only for exact numerics whose string form round-trips into
      // CatalogColumnStat's external representation losslessly
      val numeric = f.dataType match {
        case LongType | IntegerType | ShortType | ByteType | DoubleType | FloatType => true
        case _ => false
      }
      def bound(pick: graft.table.ColumnStats => String, wantMin: Boolean): Option[String] =
        if (!numeric) None
        else scala.util.Try {
          // drop all-null marker entries (empty bounds) — they carry no value
          val vals = perFile.flatten.map(pick).filter(_.trim.nonEmpty)
            .map(v => BigDecimal(v.trim))
          if (vals.isEmpty) None
          else Some((if (wantMin) vals.min else vals.max).underlying.toPlainString)
        }.toOption.flatten
      val mn = bound(_.min, wantMin = true)
      val mx = bound(_.max, wantMin = false)
      val ndv = snap.properties.get(s"stats.ndv.${f.name}")
        .flatMap(s => scala.util.Try(s.toLong).toOption)
        .map(n => BigInt(math.max(1L, math.min(n, math.max(rows, 1L)))))
      // ANALYZE's KLL quantile endpoints → Spark equi-height Histogram:
      // range-predicate selectivity from the actual mass distribution
      // (heights are the ANALYZED table's rows/bin; after file pruning
      // they overstate proportionally — same approximation the clamped
      // NDV makes, and strictly better than uniform interpolation)
      val hist = snap.properties.get(s"stats.hist.${f.name}").flatMap { s =>
        scala.util.Try {
          import org.apache.spark.sql.catalyst.plans.logical.{Histogram, HistogramBin}
          val qs = s.split(",").map(_.toDouble)
          val nBins = qs.length - 1
          require(nBins >= 1)
          // KLL endpoints are approximate; the manifest min/max are exact.
          // Spark's estimator ASSERTS the predicate range fits inside the
          // histogram, so the outer edges widen to the exact bounds
          mn.map(_.toDouble).filter(_ < qs(0)).foreach(qs(0) = _)
          mx.map(_.toDouble).filter(_ > qs(nBins)).foreach(qs(nBins) = _)
          val binNdv = math.max(1L,
            ndv.map(_.toLong).getOrElse(nBins.toLong) / nBins)
          Histogram(math.max(rows, 1L).toDouble / nBins,
            Array.tabulate(nBins)(i => HistogramBin(qs(i), qs(i + 1), binNdv)))
        }.toOption
      }
      if (nulls.isEmpty && ndv.isEmpty && mn.isEmpty) None
      else Some(f.name -> CatalogColumnStat(distinctCount = ndv,
        min = mn, max = mx, nullCount = nulls, histogram = hist))
    }.toMap
    CatalogStatistics(BigInt(files.map(_.bytes).sum), Some(BigInt(rows)), colStats)
  }

  /** Writes: plain append, TRUNCATE-overwrite, and Iceberg-style
    * overwrite-by-filter (`df.writeTo(t).overwrite(cond)` / static
    * `INSERT OVERWRITE`): the filter rewrite commits matching-row removal
    * and the new data in ONE snapshot. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    writeGuard()
    new WriteBuilder with SupportsOverwrite {
      private var overwrite = false
      private var overwriteCond: Option[org.apache.spark.sql.Column] = None
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def canOverwrite(filters: Array[Filter]): Boolean =
        filters.forall(f => toColumn(f).isDefined)
      override def overwrite(filters: Array[Filter]): WriteBuilder = {
        val cols = filters.map(f => toColumn(f).getOrElse(
          throw new IllegalArgumentException(s"untranslatable overwrite filter $f")))
        overwriteCond = cols.reduceOption(_ && _)
        if (overwriteCond.isEmpty) overwrite = true // no filters == full overwrite
        this
      }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          (data: DataFrame, overwriteFlag: Boolean) => {
            // write-audit-publish: with `write.wap.enabled=true` on the
            // table and `spark.wap.id` in the session, appends STAGE a
            // detached snapshot instead of publishing (Iceberg WAP flow;
            // audited via VERSION AS OF, released by CALL publish_changes)
            val wapId = data.sparkSession.conf.getOption("spark.wap.id")
              .filter(_ => t.currentProperties.get("write.wap.enabled").contains("true"))
            if (branch.isDefined) {
              // Iceberg branch-identifier write surface: INSERT INTO
              // graft.db.`t$branch_dev` appends to the branch head only —
              // audit/experiment isolation; fast_forward/publish merges back
              require(!(overwrite || overwriteFlag) && overwriteCond.isEmpty &&
                wapId.isEmpty,
                s"$identName: branch writes are append-only (no overwrite/WAP)")
              t.appendToBranch(branch.get, data)
            } else (overwriteCond, wapId) match {
              case (Some(cond), None) => t.overwriteWhere(cond, data)
              case (None, Some(id)) if !(overwrite || overwriteFlag) =>
                t.stageWapAppend(data, id)
              case (_, Some(id)) =>
                throw new UnsupportedOperationException(
                  s"wap.id '$id' is set but only appends can be staged for audit " +
                    "(Iceberg publish_changes replays appends only)")
              case (None, None) =>
                if (overwrite || overwriteFlag) t.overwrite(data) else t.append(data)
            }
          }
      }
    }
  }
}

object GraftDsv2Table {
  /** `spark.graft.runtime-filtering=true` turns on the join-time file
    * pruning scan ([[graft.table.GraftRuntimeScan]]) for eligible
    * snapshots — the star-join scale profile. Off by default: the
    * projection-aware default path serves every snapshot shape. */
  private[graft] def runtimeFilteringEnabled(
      spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.conf.getOption("spark.graft.runtime-filtering").exists(_.toBoolean)
}
