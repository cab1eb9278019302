package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{Metadata, StructType}
import graft.table.GraftTable

/** Structured Streaming SOURCE over a graft table — the engine's analogue of
  * Iceberg's incremental streaming read (the reference stack streams from
  * Iceberg tables the same way; reference `main.tf:803`, SURVEY.md §2.9).
  *
  * {{{
  *   spark.readStream.format("graft-stream")
  *     .option("path", "/warehouse/db/events")
  *     .option("fromVersion", "3")   // optional: start after snapshot 3
  *     .load()
  * }}}
  *
  * Offsets are snapshot versions, so exactly-once recovery falls out of the
  * checkpoint log: a micro-batch is "the data files snapshot `end` has that
  * snapshot `start` does not", read through the table's schema-evolution
  * projection. File-granular — an increment never rescans old files, which
  * is what makes tailing a 100 TB table cheap: each batch reads only the
  * newly committed files. Rewrites (compaction/DML) add files containing
  * pre-existing rows; like Iceberg's streaming read, consume appends-only
  * tables or pair with dropDuplicates on a key for replay tolerance.
  */
class GraftSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-stream"

  private def strip(s: StructType): StructType =
    StructType(s.fields.map(_.copy(metadata = Metadata.empty)))

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val t = GraftTable.load(ctx.sparkSession, parameters("path"))
    (shortName(), strip(t.schema))
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new GraftStreamSource(ctx, parameters("path"),
      parameters.get("fromVersion").map(_.toLong))
}

class GraftStreamSource(ctx: SQLContext, path: String, fromVersion: Option[Long])
  extends Source {

  private val table = GraftTable.load(ctx.sparkSession, path)
  private val base: Long = fromVersion.getOrElse(-1L)

  override def schema: StructType =
    StructType(table.schema.fields.map(_.copy(metadata = Metadata.empty)))

  override def getOffset: Option[Offset] = {
    val v = table.log.currentVersion
    if (v <= base) None else Some(LongOffset(v))
  }

  private def ver(o: Offset): Long = o match {
    case LongOffset(v) => v
    case other         => other.json.trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(ver).getOrElse(base)
    Bridge.streamingDataFrame(ctx.sparkSession, table.readAppended(from, ver(end)))
  }

  override def stop(): Unit = ()
}
