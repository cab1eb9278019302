package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Durable materialization of an intermediate DataFrame — the one rule for
  * every iterative / multi-consumer plan that must not replay its upstream
  * lineage per consumer (q41 band table, q62/q100 propagation loops, q119
  * edge list, the dedup-index probe).
  *
  * Master-gated (ADVICE r15), three tiers:
  *  - local master → `localCheckpoint`: executor-local blocks are safe
  *    when there is exactly one executor (no partial loss is survivable
  *    anyway), and lineage truncation keeps 50-round loop plans flat.
  *  - cluster + checkpoint dir set → reliable `checkpoint()`: truncated
  *    lineage AND executor-loss recovery from replicated storage.
  *  - cluster, no checkpoint dir → eager persist of a COPIED row RDD
  *    (`toRdd` reuses mutable rows), re-rooted as a `LogicalRDD` view so
  *    the LOGICAL plan is truncated — an iterative loop must not nest one
  *    full prior generation of plan per round for the analyzer — while
  *    the RDD DAG underneath stays intact, so a lost executor's blocks
  *    recompute instead of failing the query.
  */
object Mat {

  def checkpoint(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (sc.isLocal) df.localCheckpoint()
    else if (sc.getCheckpointDir.isDefined) df.checkpoint()
    else persistTruncated(df)
  }

  /** Materialization for MULTI-CONSUMER, non-iterative intermediates — the
    * q95 family shape: one per-doc aggregate feeding both a corpus model
    * and a scoring join. Default since r19 is NO materialization: every
    * consumer recomputes the frame and AQE's runtime shuffle-stage reuse
    * dedups the expensive upstream exchanges (the same reason the q43/q82
    * self-joins are deliberately uncached). The strategy stays a session
    * knob so the choice is MEASURABLE per deployment instead of hard-coded
    * (VERDICT r16 #2):
    *
    *   spark.graft.mat.multi-use = none (default) | cache | checkpoint
    *
    * r19 measurement (sf0.1, local[32], within-session A/B, median of 7):
    * "none" ≥ "cache" at EVERY multiUse call site — q95 2.58→1.76 s,
    * q97 2.56→2.26, q98 2.49→2.44, q99 1.23→1.13, q45 1.45→1.23 — the
    * lazy cache's serialize-into-storage cost exceeded the duplicate
    * linear recompute it saved once the r18 spread normalizer made that
    * recompute parallel (r17's cache-vs-checkpoint numbers predate the
    * spread). At 100 TB "none" is also the memory-safe default: nothing
    * competes with execution memory. */
  def multiUse(df: DataFrame): DataFrame =
    scala.util.Try(df.sparkSession.sessionState.conf
      .getConfString("spark.graft.mat.multi-use", "none"))
      .getOrElse("none") match {
      case "checkpoint" => checkpoint(df)
      // "none": no materialization at all — consumers recompute the frame,
      // relying on AQE's runtime shuffle-stage reuse to dedup the expensive
      // upstream exchanges (the q43/q82 self-join rule). Added r19 so the
      // lazy-cache default stays A/B-measurable against plain recompute.
      case "none" => df
      case _ => df.cache()
    }

  /** The no-checkpoint-dir cluster tier; package-visible so MatSpec can
    * exercise it on the local test master too. */
  private[graft] def persistTruncated(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.classic
    val cls = df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
    val rows = cls.queryExecution.toRdd.map(_.copy())
      .persist(StorageLevel.MEMORY_AND_DISK)
    rows.count() // eager, matching localCheckpoint's materialize-now contract
    org.apache.spark.sql.graftglue.Bridge.internalDf(df.sparkSession, rows, df.schema)
  }

  /** Free the blocks behind the frame [[checkpoint]] RETURNED, the moment
    * it is superseded (iterative loops would otherwise accrete one
    * generation of blocks per round until the inter-query sweep /
    * ContextCleaner runs — ADVICE r15 on q62). Matches ONLY the plan
    * ROOT: a frame merely DERIVED from a checkpointed one no-ops, so a
    * careless release can never destroy a still-live upstream
    * checkpoint's blocks (its truncated lineage could not recompute
    * them).
    *
    * RELIABLE-CHECKPOINT tier caveat (ADVICE r17): unlike `unpersist`,
    * deleting the checkpoint directory is UNRECOVERABLE — the frame (and
    * anything lazily derived from it) must be fully materialized before
    * release, or the consumer fails hard instead of recomputing. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false) // local checkpoint / persist forms
        // reliable-checkpoint tier: the RDD was never persisted (unpersist
        // frees nothing) and its blocks live as FILES under the checkpoint
        // dir — delete them, or a 50-round loop accretes one directory per
        // superseded generation until ContextCleaner GC (ADVICE r16)
        l.rdd.getCheckpointFile.foreach { dir =>
          try {
            val p = new org.apache.hadoop.fs.Path(dir)
            p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
              .delete(p, true)
          } catch {
            // best-effort semantics, but an invisible failure = an invisible
            // leak: a flaky FS across a 50-round loop accretes directories
            // with no signal (ADVICE r17) — log it
            case scala.util.control.NonFatal(e) =>
              org.slf4j.LoggerFactory.getLogger(getClass)
                .warn(s"Mat.release: failed to delete checkpoint dir $dir " +
                  s"(leaked until ContextCleaner GC): $e")
          }
        }
      case _ =>
        df.unpersist(blocking = false) // a directly persist()-ed frame
    }
}
