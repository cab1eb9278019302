package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE INTO builder with full Iceberg/Spark clause semantics (reference
  * `main.tf:803`; SURVEY.md §2.8 row 1): ordered WHEN MATCHED [AND cond]
  * THEN UPDATE/DELETE, WHEN NOT MATCHED [AND cond] THEN INSERT, and WHEN NOT
  * MATCHED BY SOURCE THEN UPDATE/DELETE — executed as one copy-on-write
  * rewrite of only the files containing affected rows.
  *
  * Reference the target as alias `t` and the source as alias `s` in the
  * merge condition, clause conditions, and assignment expressions:
  * {{{
  * table.merge(src, expr("t.id = s.id"))
  *   .whenMatchedUpdate(Map("qty" -> expr("s.qty")), Some(expr("s.qty > 0")))
  *   .whenMatchedDelete()
  *   .whenNotMatchedInsertAll()
  *   .execute()
  * }}}
  *
  * First matching clause wins (SQL-standard order). A target row matched by
  * more than one source row raises the SQL-standard cardinality violation,
  * detected distributedly (groupBy count, no row collect).
  */
class MergeBuilder private[table] (table: GraftTable, source: DataFrame, condition: Column) {

  /** kind: update | delete | insert; set is empty for delete. */
  private case class Clause(kind: String, cond: Column, set: Map[String, Column])

  private var matched = Vector.empty[Clause]
  private var notMatched = Vector.empty[Clause]
  private var bySource = Vector.empty[Clause]

  def whenMatchedUpdate(set: Map[String, Column], cond: Option[Column] = None): this.type = {
    matched :+= Clause("update", cond.getOrElse(lit(true)), set); this
  }
  /** UPDATE SET * — every target column from the like-named source column
    * (quoted via [[GraftTable.qref]]: `a.b` must not parse as a path). */
  def whenMatchedUpdateAll(cond: Option[Column] = None): this.type = {
    matched :+= Clause("update", cond.getOrElse(lit(true)),
      table.schema.fieldNames.map(n => n -> GraftTable.qref("s", n)).toMap); this
  }
  def whenMatchedDelete(cond: Option[Column] = None): this.type = {
    matched :+= Clause("delete", cond.getOrElse(lit(true)), Map.empty); this
  }
  def whenNotMatchedInsert(values: Map[String, Column], cond: Option[Column] = None): this.type = {
    notMatched :+= Clause("insert", cond.getOrElse(lit(true)), values); this
  }
  /** INSERT * — every target column from the like-named source column
    * (quoted, as in [[whenMatchedUpdateAll]]). */
  def whenNotMatchedInsertAll(cond: Option[Column] = None): this.type = {
    notMatched :+= Clause("insert", cond.getOrElse(lit(true)),
      table.schema.fieldNames.map(n => n -> GraftTable.qref("s", n)).toMap); this
  }
  def whenNotMatchedBySourceUpdate(set: Map[String, Column], cond: Option[Column] = None): this.type = {
    bySource :+= Clause("update", cond.getOrElse(lit(true)), set); this
  }
  def whenNotMatchedBySourceDelete(cond: Option[Column] = None): this.type = {
    bySource :+= Clause("delete", cond.getOrElse(lit(true)), Map.empty); this
  }

  private var commitProps: Map[String, String] = Map.empty
  /** Extra table properties recorded ATOMICALLY on the merge's snapshot
    * commit — e.g. the streaming upsert sink's batch id, so exactly-once
    * replay detection and the data change are one CAS. */
  def withCommitProperties(p: Map[String, String]): this.type = { commitProps = p; this }

  /** Runs the merge; a lost commit CAS (concurrent writer) re-executes the
    * whole merge against the new head (Iceberg commit-retry semantics). */
  def execute(): Snapshot = table.retryOnConflict() { executeOnce() }

  /** Single-pass execution: the full-outer join is evaluated exactly ONCE,
    * into a projected cache holding only rows that influence the result
    * (matched rows, clause-affected rows, inserts) with their output image
    * already computed. The cardinality check, touched-file planning, insert
    * set, and MOR delete/append sets all read the cache. The CoW rewrite's
    * second pass rescans only the TOUCHED FILES and splices the cached
    * images in by row identity — at 100 TB that is one target∪source join
    * plus one touched-file scan, vs four full join evaluations before. */
  private def executeOnce(): Snapshot = {
    val head = table.log.current
    val fields = table.schema.fields

    val target = table.readWithMeta(head).withColumn("_t_exists", lit(1)).alias("t")
    val src = source.withColumn("_s_exists", lit(1)).alias("s")
    val joined = target.join(src, condition, "full_outer")

    val isMatched = col("t._t_exists").isNotNull && col("s._s_exists").isNotNull
    val targetOnly = col("t._t_exists").isNotNull && col("s._s_exists").isNull
    val sourceOnly = col("t._t_exists").isNull && col("s._s_exists").isNotNull

    // first applicable clause per row (SQL-standard order), -1 = untouched
    val all = matched.zipWithIndex.map { case (c, i) => (c, isMatched, i) } ++
      bySource.zipWithIndex.map { case (c, i) => (c, targetOnly, i + matched.size) }
    val idxCol = all.reverse.foldLeft(lit(-1): Column) { case (els, (c, base, i)) =>
      when(base && c.cond, lit(i)).otherwise(els)
    }
    val deleteIdxs = all.collect { case (c, _, i) if c.kind == "delete" => i }
    val insIdx = notMatched.zipWithIndex.reverse.foldLeft(lit(-1): Column) {
      case (els, (c, i)) => when(c.cond, lit(i)).otherwise(els)
    }

    // per-field output image: insert values for source-only rows, update
    // values (first matching clause wins) for clause-hit rows, the carried
    // target value otherwise — evaluated once, into the cache
    val img = fields.map { f =>
      val updates = all.collect { case (c, _, i) if c.kind == "update" && c.set.contains(f.name) =>
        (i, c.set(f.name)) }
      val upd = updates.foldRight(GraftTable.qref("t", f.name)) { case ((i, v), els) =>
        when(col("_clause") === i, v.cast(f.dataType)).otherwise(els)
      }
      val ins = notMatched.zipWithIndex.reverse.foldLeft(lit(null).cast(f.dataType): Column) {
        case (els, (c, i)) =>
          when(col("_ins") === i, c.set.getOrElse(f.name, lit(null)).cast(f.dataType)).otherwise(els)
      }
      when(col("_ins") >= 0, ins).otherwise(upd).as(f.name)
    }
    val annotated = joined
      .withColumn("_clause", idxCol)
      .withColumn("_ins", when(sourceOnly, insIdx).otherwise(lit(-1)))
      .withColumn("_m", isMatched)
      .filter(col("_m") || col("_clause") >= 0 || col("_ins") >= 0)
      .select(Seq(col("t._graft_path").as("_path"), col("t._graft_pos").as("_pos"),
        col("_m"), col("_clause"), col("_ins")) ++ img: _*)
      .cache()
    try {
      // SQL-standard cardinality check: a target row hit by >1 source rows
      if (matched.nonEmpty) {
        val dup = annotated.filter(col("_m"))
          .groupBy(col("_path"), col("_pos"))
          .agg(count(lit(1)).as("n")).filter(col("n") > 1).limit(1).count()
        if (dup > 0) throw new IllegalStateException(
          "MERGE cardinality violation: a target row matches multiple source rows")
      }

      val outCols = fields.map(f => GraftTable.qcol(f.name))
      val inserts = annotated.filter(col("_ins") >= 0).select(outCols: _*)

      // CHECK constraints guard every row image the merge will write —
      // update images and inserts alike (delete-clause rows write nothing);
      // runs off the cached `annotated`, before any file is produced
      table.enforceChecks(annotated.filter(
        (col("_clause") >= 0 && !col("_clause").isin(deleteIdxs: _*)) || col("_ins") >= 0)
        .select(outCols: _*), head)

      // Iceberg's per-op mode properties: MERGE honors write.merge.mode and
      // falls back to write.delete.mode (the table-wide MOR switch)
      val morMode = head.properties.get("write.merge.mode")
        .orElse(head.properties.get("write.delete.mode")).contains("merge-on-read")

      if (morMode) {
        // ---- merge-on-read: positional-delete every affected target row,
        // append the update images + inserts — one commit, O(affected rows)
        // write cost instead of O(touched files) (Iceberg v2 MOR merge)
        val affected = annotated.filter(col("_clause") >= 0)
        val newDeletes = table.writeDeleteFiles(affected.select(
          col("_path").as("file_path"), col("_pos").as("pos")))
        val updated = affected.filter(!col("_clause").isin(deleteIdxs: _*)).select(outCols: _*)
        val appendDf =
          if (notMatched.nonEmpty) updated.unionByName(inserts) else updated
        val newFiles = table.writeFiles(appendDf, head.currentSchemaId, head.properties)
        // commitProps must land even for a no-op merge (the streaming upsert
        // sink's batch-id marker rides here — dropping it would un-record a
        // durable batch and break exactly-once replay detection)
        if (newDeletes.isEmpty && newFiles.isEmpty && commitProps.isEmpty) head
        else table.log.commit(head.version, v => head.copy(
          version = v, parent = head.version,
          timestampMs = System.currentTimeMillis(),
          operation = "merge", files = head.files ++ newFiles,
          deleteFiles = head.deleteFiles ++ newDeletes,
          properties = head.properties ++ commitProps))
      } else {
        // ---- copy-on-write: rewrite only the files containing affected
        // rows. Second pass reads the touched files (NOT the join) and
        // splices the cached images in by (path, pos) row identity —
        // unmatched rows carry over, delete-clause rows drop out.
        val touched = annotated.filter(col("_clause") >= 0).select("_path")
          .distinct().collect().map(_.getString(0)).toSeq
        val images = annotated.filter(col("_clause") >= 0).alias("n")
        val rewritten = table.readTouchedWithMeta(head, touched).alias("o")
          .join(images,
            col("o._graft_path") === col("n._path") && col("o._graft_pos") === col("n._pos"),
            "left_outer")
          .filter(col("n._clause").isNull || !col("n._clause").isin(deleteIdxs: _*))
          .select(fields.map(f =>
            when(col("n._clause").isNotNull, GraftTable.qref("n", f.name))
              .otherwise(GraftTable.qref("o", f.name)).as(f.name)): _*)
        table.replaceFiles(head, touched, rewritten, "merge",
          extraRows = if (notMatched.nonEmpty) Some(inserts) else None,
          props = commitProps)
      }
    } finally annotated.unpersist()
  }
}
