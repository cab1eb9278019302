package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Durable materialization of an intermediate DataFrame — the one rule for
  * every iterative / multi-consumer plan that must not replay its upstream
  * lineage per consumer (q41 band table, q62/q100 propagation loops, q119
  * edge list, the dedup-index probe).
  *
  * Master-gated (ADVICE r15): `localCheckpoint` truncates lineage onto
  * NON-REPLICATED executor-local blocks, which is exactly right on
  * `local[*]` (one executor — no executor can be lost without losing the
  * whole app) but unrecoverable on a real cluster, where losing any
  * executor would fail the query outright instead of recomputing. On a
  * cluster master this therefore degrades to an EAGER
  * `persist(MEMORY_AND_DISK)`: same one-materialization cost profile,
  * lineage kept so a lost executor's blocks recompute. (A reliable
  * `checkpoint()` would need a user-provided HDFS checkpoint dir the
  * library cannot assume; callers that have one can set it and Spark's own
  * periodic checkpointing still applies.)
  */
object Mat {

  def checkpoint(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.isLocal) df.localCheckpoint()
    else {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      p.count() // eager, matching localCheckpoint's materialize-now contract
      p
    }

  /** Free the blocks behind a [[checkpoint]]'d frame the moment it is
    * superseded (iterative loops would otherwise accrete one generation of
    * blocks per round until the inter-query sweep / ContextCleaner runs —
    * ADVICE r15 on q62). Safe on any DataFrame: non-checkpointed plans
    * simply have nothing to release. */
  def release(df: DataFrame): Unit = {
    df.unpersist(blocking = false) // the cluster-side persist() form
    df.queryExecution.analyzed.foreach { // the localCheckpoint form
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }
}
