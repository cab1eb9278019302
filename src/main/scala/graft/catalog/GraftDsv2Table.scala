package graft.catalog

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{BaseRelation, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.table.GraftTable

/** DSv2 table over a graft snapshot log, optionally pinned to a version or
  * timestamp (time travel — SURVEY.md §2.8). Read and write delegate to the
  * engine's own distributed paths through the V1 fallback hooks (`V1Scan` /
  * `V1Write`), so the scan is still Spark's vectorized parquet reader over
  * the snapshot's file list and a write is an ACID append/overwrite commit —
  * no bespoke row-level IO. */
case class GraftDsv2Table(t: GraftTable, identName: String,
    asOfVersion: Option[Long] = None, asOfTimestampMs: Option[Long] = None)
  extends Table with SupportsRead with SupportsWrite {

  override def name(): String = identName

  override def schema(): StructType =
    StructType(t.schema.fields.map(_.copy(metadata = org.apache.spark.sql.types.Metadata.empty)))

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def properties(): util.Map[String, String] =
    t.log.current.properties.asJava

  private def snapshotDf(): DataFrame = (asOfVersion, asOfTimestampMs) match {
    case (Some(v), _) => t.readVersion(v)
    case (_, Some(ts)) => t.readAsOf(ts)
    case _ => t.read
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = schema()
        override def toV1TableScan[T <: BaseRelation with TableScan](context: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = context
            override def schema: StructType = GraftDsv2Table.this.schema()
            override def buildScan(): RDD[Row] = snapshotDf().rdd
          }.asInstanceOf[T]
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          (data: DataFrame, overwriteFlag: Boolean) => {
            if (overwrite || overwriteFlag) t.overwrite(data) else t.append(data)
          }
      }
    }
}
