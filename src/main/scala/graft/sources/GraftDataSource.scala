package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.GraftDsv2Table
import graft.table.GraftTable

/** Path-based DSv2 entry — the `spark.read.format("iceberg").load(path)`
  * ergonomic for graft tables, no catalog registration required:
  *
  * {{{
  *   spark.read.format("graft").load("/data/t")                       // head
  *   spark.read.format("graft").option("versionAsOf", 3).load(p)      // time travel
  *   spark.read.format("graft").option("timestampAsOf", ms).load(p)
  *   spark.read.format("graft").option("branch", "dev").load(p)
  *   df.write.format("graft").mode("append").save(p)                  // existing table
  * }}}
  *
  * Reads and writes resolve through the same [[GraftDsv2Table]] the catalog
  * serves (vectorized scan swap, stats, MOR deletes, exactly-once appends
  * all identical); the table must already EXIST — creation stays with
  * `GraftTable.create` / catalog DDL, where schema and properties are
  * explicit rather than inferred from a dataframe. */
class GraftDataSource extends TableProvider with DataSourceRegister
    with org.apache.spark.sql.sources.CreatableRelationProvider {

  override def shortName(): String = "graft"

  /** `df.write.format("graft").save(path)`: Spark's path-based writer only
    * takes the DSv2 route for tables declaring full BATCH_WRITE; graft
    * tables write through the V1WriteBuilder fallback (V1_BATCH_WRITE, the
    * catalog INSERT path), so the writer lands here instead — same
    * snapshot-committing appends/overwrites, same exactly-once CAS. */
  override def createRelation(ctx: org.apache.spark.sql.SQLContext,
      mode: org.apache.spark.sql.SaveMode,
      parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame): org.apache.spark.sql.sources.BaseRelation = {
    import org.apache.spark.sql.SaveMode
    val p = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        """graft source needs a path: df.write.format("graft").save(path)"""))
    val t = GraftTable.load(SparkSession.active, p) // throws if absent: no create-on-write
    mode match {
      case SaveMode.Append        => t.appendWithRetry(data)
      case SaveMode.Overwrite     => t.overwrite(data)
      case SaveMode.Ignore        => () // table exists: by contract, a no-op
      case SaveMode.ErrorIfExists =>
        throw new IllegalArgumentException(
          s"graft table already exists at $p (mode ErrorIfExists); " +
          "use append/overwrite, or GraftTable.create for new tables")
    }
    new org.apache.spark.sql.sources.BaseRelation {
      override def sqlContext: org.apache.spark.sql.SQLContext = ctx
      override def schema: StructType = data.schema
    }
  }

  // schema comes from the table's own snapshot log, never from user input
  override def supportsExternalMetadata(): Boolean = false

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      """graft source needs a path: spark.read.format("graft").load(path)""")
    p
  }

  private def tableFor(options: CaseInsensitiveStringMap): GraftDsv2Table = {
    val t = GraftTable.load(SparkSession.active, pathOf(options))
    GraftDsv2Table(t, pathOf(options),
      asOfVersion = Option(options.get("versionAsOf")).map(_.toLong),
      asOfTimestampMs = Option(options.get("timestampAsOf")).map(_.toLong),
      branch = Option(options.get("branch")))
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    tableFor(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    tableFor(new CaseInsensitiveStringMap(properties))
}
