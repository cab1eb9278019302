package org.apache.spark.sql.graftglue

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.execution.datasources.{FileStatusCache, InMemoryFileIndex}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.internal.connector.PredicateUtils
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Construction glue for the runtime-filterable DSv2 scan
  * ([[graft.catalog.GraftRuntimeScan]]): Spark 4 keeps `ParquetScan`,
  * `InMemoryFileIndex` and the V2→V1 predicate translator `private[sql]`-ish
  * (internal packages), so — like [[Bridge]] — the few reach-ins live in one
  * object inside the sql package hierarchy. */
object ScanGlue {

  /** Spark's own vectorized parquet scan over an explicit file list — the
    * exact scan `spark.read.parquet(paths: _*)` plans, constructed directly
    * so a wrapper can re-plan it after runtime file pruning. */
  def parquetScan(spark: SparkSession, paths: Seq[String], dataSchema: StructType,
      readDataSchema: StructType, pushed: Array[Filter]): ParquetScan = {
    val index = new InMemoryFileIndex(spark, paths.map(new Path(_)),
      Map.empty[String, String], Some(dataSchema),
      FileStatusCache.getOrCreate(spark))
    ParquetScan(spark, spark.sessionState.newHadoopConf(), index,
      dataSchema, readDataSchema, new StructType(), pushed,
      CaseInsensitiveStringMap.empty())
  }

  /** V2 runtime-filter predicate (what `BatchScanExec` hands a
    * `SupportsRuntimeV2Filtering` scan) → V1 `Filter` the snapshot log's
    * file pruner understands. Untranslatable shapes drop to None — runtime
    * filters are an optimization, never a correctness gate. */
  def toV1Filter(p: Predicate): Option[Filter] = PredicateUtils.toV1(p)
}
