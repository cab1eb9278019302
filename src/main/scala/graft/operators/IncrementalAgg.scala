package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.table.GraftTable

/** INCREMENTAL MATERIALIZED AGGREGATE: maintain a persisted
  * `GROUP BY keys → (count, sums)` table from a graft source table's CDC
  * changelog instead of recomputing it — the materialized-view refresh the
  * reference's Databricks side sells (DLT / `REFRESH MATERIALIZED VIEW`),
  * built on the same changelog machinery `Ann.refreshIndexTable` uses.
  *
  * COUNT and SUM are self-maintainable under inserts AND deletes (delta =
  * +row for an insert, −row for a delete; an update is its delete+insert
  * pair), so a refresh costs O(changed rows + touched groups): the net
  * changelog over `(stampedV, HEAD]` aggregates to per-group deltas FIRST
  * (one shuffle of the changed rows), then a MERGE applies them — only
  * data files containing touched groups rewrite, untouched groups' files
  * are never read. AVG derives as sum/cnt at query time. MIN/MAX (opt-in
  * per column) are maintained hybrid: self-maintained under inserts
  * (fold the insert-side extrema in), recomputed from the post-state
  * source for exactly the groups whose changelog contains a delete —
  * the recompute-on-delete a deleted extremum forces, scoped to a
  * key-semi-joined scan instead of the whole table.
  *
  * Sums accumulate as DECIMAL(28,6), so incremental maintenance is EXACT:
  * old + inserts − deletes equals the full recompute bit-for-bit
  * (IncrementalAggSpec proves ≡ after a random DML workload). The source
  * version stamp rides the SAME commit as the data (merge commit
  * properties), so a crash between steps leaves a consistent
  * (data, stamp) pair and refresh is safely re-runnable — never a
  * double-applied delta.
  *
  * NULL discipline: SQL `sum` ignores NULLs and returns NULL for an
  * all-NULL group, so a maintained sum must track the NON-NULL value
  * count per sum column (hidden `nn_<c>` columns in the materialization).
  * Deltas accumulate `coalesce(c, 0) * sign` (a NULL-only delta batch
  * contributes 0, never clobbers the sum to NULL) and the exposed
  * `sum_<c>` flips back to NULL exactly when `nn_<c>` hits zero — so
  * deleting the last non-null value restores NULL, matching the
  * recompute bit-for-bit (IncrementalAggSpec null-workload test). */
object IncrementalAgg {
  val SourceVersionProp = "incragg.source-version"
  val KeysProp = "incragg.keys"
  val SumsProp = "incragg.sum-cols"
  val MinMaxProp = "incragg.minmax-cols"
  val SourcePathProp = "incragg.source-path"

  // ------------------------------------------------- transparent rewrite
  // source table path -> materialization paths that may answer aggregates
  // over it (consulted by graft.plans.GraftMvRewrite). Session-lifetime
  // state, O(registered MVs); re-attachable after a restart from the MV's
  // own SourcePathProp via `CALL graft.system.register_agg_rewrite`.
  private val rewriteRegistry =
    new java.util.concurrent.ConcurrentHashMap[String, Set[String]]()

  def registerRewrite(sourcePath: String, mvPath: String): Unit =
    rewriteRegistry.merge(sourcePath, Set(mvPath), _ ++ _)

  def deregisterRewrite(mvPath: String): Unit =
    rewriteRegistry.replaceAll((_, s) => s - mvPath)

  def rewriteCandidates(sourcePath: String): Set[String] =
    rewriteRegistry.getOrDefault(sourcePath, Set.empty)

  /** Cheap bail for the optimizer rule: no registrations, no work. */
  def rewriteRegistryEmpty: Boolean = rewriteRegistry.isEmpty

  /** Re-attach a materialization to the rewrite registry from its own
    * stored source-path property (the restart path). */
  def registerRewrite(spark: SparkSession, mvPath: String): Unit = {
    val mat = GraftTable.load(spark, mvPath)
    val src = mat.log.current.properties.getOrElse(SourcePathProp,
      throw new IllegalStateException(
        s"table at $mvPath carries no $SourcePathProp property — not a " +
        "materialized aggregate (IncrementalAgg.materialize)"))
    registerRewrite(src, mat.path)
  }

  /** The maintained aggregate, computed from scratch (also the oracle the
    * spec compares refresh results against). */
  def aggregate(df: DataFrame, keys: Seq[String], sumCols: Seq[String],
      minMaxCols: Seq[String] = Nil): DataFrame = {
    val es = count(lit(1)).as("cnt") +:
      (sumCols.map(c => sum(col(c).cast("decimal(28,6)")).as(s"sum_$c")) ++
        minMaxCols.flatMap(c =>
          Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))))
    df.groupBy(keys.map(col): _*).agg(es.head, es.tail: _*)
  }

  /** The stored shape: `aggregate` plus one hidden non-null value count
    * per sum column (`nn_<c>`), the state that keeps NULL sums exact
    * under deletes. Min/max store in the SOURCE column's own type — no
    * conversion, so their maintenance is exact for any orderable type. */
  private def aggregateWithNn(df: DataFrame, keys: Seq[String],
      sumCols: Seq[String], minMaxCols: Seq[String]): DataFrame = {
    val es = count(lit(1)).as("cnt") +:
      (sumCols.map(c => sum(col(c).cast("decimal(28,6)")).as(s"sum_$c")) ++
        sumCols.map(c => count(col(c)).as(s"nn_$c")) ++
        minMaxCols.flatMap(c =>
          Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))))
    df.groupBy(keys.map(col): _*).agg(es.head, es.tail: _*)
  }

  /** CTAS the materialized aggregate at the source's current version. */
  def materialize(spark: SparkSession, source: GraftTable, path: String,
      keys: Seq[String], sumCols: Seq[String],
      minMaxCols: Seq[String] = Nil): GraftTable = {
    // the stored shape reserves `cnt` / `sum_*` / `nn_*` / `min_*` / `max_*`
    // output names; a KEY column spelled like one of them would collide in
    // the MV schema (toMap last-wins) and let GraftMvRewrite silently bind
    // count(*)/sum rewrites to the wrong column while still type-checking
    val stateNames = "cnt" +: (sumCols.flatMap(c => Seq(s"sum_$c", s"nn_$c")) ++
      minMaxCols.flatMap(c => Seq(s"min_$c", s"max_$c")))
    val clashes = keys.filter(stateNames.contains)
    require(clashes.isEmpty,
      s"materialize: key column(s) ${clashes.mkString(", ")} collide with " +
        "reserved state-column names (cnt/sum_*/nn_*/min_*/max_*) — rename " +
        "the source column or alias it before materializing")
    val v = source.log.currentVersion
    val mat = GraftTable.create(spark, path,
      aggregateWithNn(source.read, keys, sumCols, minMaxCols),
      Map(SourceVersionProp -> v.toString, SourcePathProp -> source.path,
        KeysProp -> keys.mkString(","), SumsProp -> sumCols.mkString(","),
        MinMaxProp -> minMaxCols.mkString(",")))
    registerRewrite(source.path, mat.path)
    mat
  }

  /** Catch the materialized aggregate up to the source's HEAD from the net
    * changelog. No-op if already current; refuses a rolled-back source
    * (the stamp would otherwise re-apply history). */
  def refresh(spark: SparkSession, source: GraftTable, path: String): GraftTable = {
    val mat = GraftTable.load(spark, path)
    val props = mat.log.current.properties
    val fromV = props.getOrElse(SourceVersionProp, throw new IllegalStateException(
      s"table at $path carries no $SourceVersionProp property — not a " +
      "materialized aggregate (IncrementalAgg.materialize)")).toLong
    val keys = props(KeysProp).split(",").toSeq
    val sumCols = props(SumsProp).split(",").toSeq.filter(_.nonEmpty)
    val minMaxCols = props.getOrElse(MinMaxProp, "").split(",").toSeq.filter(_.nonEmpty)
    val curV = source.log.currentVersion
    registerRewrite(source.path, mat.path)
    if (curV == fromV) return mat
    require(curV > fromV,
      s"materialized aggregate at $path stamps source v$fromV but the source " +
      s"is at v$curV (rolled back?) — re-materialize")
    // net CDC between the stamped version and HEAD: +1 weight per insert
    // row, -1 per delete; per-group deltas aggregate BEFORE the merge, so
    // the merge source is |touched groups| rows, not |changed rows|
    val sign = when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L))
    // NULL values contribute 0 to the sum delta (sum ignores NULLs) and 0
    // to the non-null count delta; non-null values carry their sign
    // min/max are NOT self-maintainable under deletes (the deleted row may
    // have held the extremum), but they ARE under pure inserts — so the
    // deltas carry insert-side extrema plus a per-group had-delete flag,
    // and only delete-touched groups recompute their extrema from the
    // post-state source (a key-semi-joined scan: O(affected groups' rows),
    // file-pruned where the layout clusters on the keys)
    val isInsert = col("_change_type") === "insert"
    val deltaExprs = sum(sign).as("d_cnt") +:
      (sumCols.map(c => sum((coalesce(col(c).cast("decimal(28,6)"),
          lit(java.math.BigDecimal.ZERO)) * sign)
        .cast("decimal(28,6)")).as(s"d_sum_$c")) ++
        sumCols.map(c =>
          sum(when(col(c).isNotNull, sign).otherwise(lit(0L))).as(s"d_nn_$c")) ++
        minMaxCols.flatMap(c => Seq(
          min(when(isInsert, col(c))).as(s"d_min_$c"),
          max(when(isInsert, col(c))).as(s"d_max_$c"))) ++
        (if (minMaxCols.nonEmpty)
          Seq(max(when(!isInsert, lit(true)).otherwise(lit(false))).as("had_delete"))
        else Nil))
    val netChanges = source.changelog(fromV, curV)
      .groupBy(keys.map(col): _*).agg(deltaExprs.head, deltaExprs.tail: _*)
    val deltas = if (minMaxCols.isEmpty) netChanges else {
      val delGroups = netChanges.filter(col("had_delete")).select(keys.map(col): _*)
      val recomputeExprs = minMaxCols.flatMap(c =>
        Seq(min(col(c)).as(s"r_min_$c"), max(col(c)).as(s"r_max_$c")))
      // version-PINNED read: `source.read` would see the HEAD at execution
      // time, so a commit landing between capturing curV and running the
      // MERGE would leak later-version extrema into a state stamped
      // `source-version = curV` (which GraftMvRewrite trusts as bit-exact)
      val recomputed = source.readVersion(curV).join(delGroups, keys, "left_semi")
        .groupBy(keys.map(col): _*).agg(recomputeExprs.head, recomputeExprs.tail: _*)
      netChanges.join(recomputed, keys, "left")
    }
    def t(n: String): Column = GraftTable.qref("t", n)
    def s(n: String): Column = GraftTable.qref("s", n)
    val cond = keys.map(k => t(k) === s(k)).reduce(_ && _)
    val updates: Map[String, Column] =
      Map("cnt" -> (t("cnt") + s("d_cnt"))) ++
        sumCols.map { c =>
          val nn = t(s"nn_$c") + s(s"d_nn_$c")
          s"sum_$c" -> when(nn === 0, lit(null))
            .otherwise(coalesce(t(s"sum_$c"), lit(java.math.BigDecimal.ZERO)) +
              s(s"d_sum_$c")).cast("decimal(28,6)")
        } ++
        sumCols.map(c => s"nn_$c" -> (t(s"nn_$c") + s(s"d_nn_$c"))) ++
        minMaxCols.flatMap(c => Seq(
          // insert-only groups fold the delta in (least/greatest skip
          // nulls); delete-touched groups take the recomputed post-state
          s"min_$c" -> when(s("had_delete"), s(s"r_min_$c"))
            .otherwise(least(t(s"min_$c"), s(s"d_min_$c"))),
          s"max_$c" -> when(s("had_delete"), s(s"r_max_$c"))
            .otherwise(greatest(t(s"max_$c"), s(s"d_max_$c")))))
    val inserts: Map[String, Column] =
      keys.map(k => k -> s(k)).toMap ++
        Map("cnt" -> s("d_cnt")) ++
        sumCols.map(c => s"sum_$c" -> when(s(s"d_nn_$c") === 0, lit(null))
          .otherwise(s(s"d_sum_$c")).cast("decimal(28,6)")) ++
        sumCols.map(c => s"nn_$c" -> s(s"d_nn_$c")) ++
        // a not-matched group is all-insert (net CDC: a delete row implies
        // the group pre-existed), so the delta extrema ARE the extrema
        minMaxCols.flatMap(c => Seq(
          s"min_$c" -> s(s"d_min_$c"), s"max_$c" -> s(s"d_max_$c")))
    mat.merge(deltas, cond)
      // a group whose count hits zero left the source entirely
      .whenMatchedDelete(Some(t("cnt") + s("d_cnt") === 0))
      .whenMatchedUpdate(updates)
      .whenNotMatchedInsert(inserts)
      .withCommitProperties(Map(SourceVersionProp -> curV.toString))
      .execute()
    val out = GraftTable.load(spark, path)
    registerRewrite(source.path, out.path)
    out
  }
}
