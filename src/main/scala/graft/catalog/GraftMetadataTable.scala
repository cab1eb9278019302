package graft.catalog

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Read-only DSv2 table over a metadata DataFrame — backs the Iceberg-style
  * `SELECT * FROM graft.db.`t$history`` introspection surface (SURVEY.md
  * §2.1 "Metadata tables"; reference `main.tf:803`). */
case class GraftMetadataTable(identName: String, df: DataFrame)
  extends Table with SupportsRead {

  override def name(): String = identName
  override def schema(): StructType = df.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = df.schema
        override def toV1TableScan[T <: BaseRelation with TableScan](context: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = context
            override def schema: StructType = df.schema
            override def buildScan(): RDD[Row] = df.rdd
          }.asInstanceOf[T]
      }
    }
}
