package graft

import org.apache.spark.sql.functions._
import graft.table.GraftTable

/** Model-based testing of the table format: drive the table through random
  * sequences of append / DELETE / UPDATE / overwrite-by-filter / MERGE /
  * compaction, mirroring every operation on a plain in-memory model, and
  * assert after EVERY commit that the table reads exactly the model — then
  * replay time travel against the recorded model history. A metadata bug
  * anywhere (file tracking, carryover, manifest chunks, COW rewrites,
  * snapshot lineage) surfaces as a divergence within a few ops. */
class TableModelSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String = java.nio.file.Files
    .createTempDirectory(java.nio.file.Paths.get("target"), "model-").resolve("t").toString

  private type Model = Map[Long, Double] // id -> v (ids unique by construction)

  private def readState(t: GraftTable): Model =
    t.read.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("random op sequences: table state always equals the reference model") {
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 4) {
      // trial 2 runs every DELETE as a merge-on-read positional delete;
      // trial 3 additionally runs every MERGE merge-on-read — the model is
      // oblivious, so divergence-freedom proves MOR ≡ COW for both paths.
      // trial 4 starts from an IMPORTED Iceberg table carrying MOR deletes
      // (rank-compressed NEGATIVE sequence numbers) and runs the same storm
      // on top — post-import DML must scope correctly above imported state.
      val props = trial match {
        case 2 => Map("write.delete.mode" -> "merge-on-read")
        case 3 | 4 => Map("write.delete.mode" -> "merge-on-read",
                          "write.merge.mode"  -> "merge-on-read")
        case _ => Map.empty[String, String]
      }
      val t = if (trial == 4) {
        val baseDir = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get("target"), "model-imp-").toAbsolutePath.toString
        val base = GraftTable.create(spark, s"$baseDir/src",
          Seq((0L, 0.5), (1L, 1.5), (2L, 2.5), (90L, 9.0), (91L, 9.1))
            .toDF("id", "v"), properties = props)
        base.delete(col("id") === 90L)        // positional delete rides the import
        base.deleteByEquality(Seq(91L).toDF("id")) // equality delete too
        val meta = base.exportIcebergMetadata(s"$baseDir/export")
        graft.table.IcebergImport.importTable(spark, meta, s"$baseDir/imported",
          extraProps = props)
      } else GraftTable.create(spark, tmpDir(),
        Seq((0L, 0.5), (1L, 1.5), (2L, 2.5)).toDF("id", "v"), properties = props)
      var model: Model = readState(t)
      assert(model == Map(0L -> 0.5, 1L -> 1.5, 2L -> 2.5),
        s"trial $trial starting state wrong: $model")
      var nextId = 3L
      val history = scala.collection.mutable.Buffer[(Long, Model)]()
      history += ((t.log.currentVersion, model))

      for (step <- 1 to 22) {
        rnd.nextInt(7) match {
          case 0 => // append a small batch
            val k = 1 + rnd.nextInt(4)
            val rows = (0 until k).map(i => (nextId + i, (nextId + i) * 0.25))
            t.append(rows.toDF("id", "v"))
            model ++= rows.toMap
            nextId += k
          case 1 => // row-level delete on a residue class
            val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
            t.delete(col("id") % m === r)
            model = model.filter { case (id, _) => id % m != r }
          case 2 => // row-level update on a residue class
            val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
            t.update(col("id") % m === r, Map("v" -> (col("v") + 100.0)))
            model = model.map { case (id, v) => id -> (if (id % m == r) v + 100.0 else v) }
          case 3 => // overwrite-by-filter: replace a residue class with fresh rows
            val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
            val rows = Seq((nextId, nextId * 0.25))
            t.overwriteWhere(col("id") % m === r, rows.toDF("id", "v"))
            model = model.filter { case (id, _) => id % m != r } ++ rows.toMap
            nextId += 1
          case 4 => // merge: update half the touched ids, insert a fresh one
            val targets = model.keys.toSeq.sorted.take(3)
            val src = targets.map(id => (id, -1.0)) :+ ((nextId, nextId * 0.25))
            t.merge(src.toDF("id", "v"), expr("t.id = s.id"))
              .whenMatchedUpdate(Map("v" -> expr("t.v + 1.0")))
              .whenNotMatchedInsertAll()
              .execute()
            model = model.map { case (id, v) =>
              id -> (if (targets.contains(id)) v + 1.0 else v) }
            model += (nextId -> nextId * 0.25)
            nextId += 1
          case 6 => // equality delete by key rows (no data scan on write)
            val ids = rnd.shuffle(model.keys.toSeq).take(1 + rnd.nextInt(3))
            if (ids.nonEmpty) {
              t.deleteByEquality(ids.toDF("id"))
              model --= ids
            }
          case 5 => // maintenance must never change visible state
            rnd.nextInt(3) match {
              case 0 => t.rewriteDataFiles(1 + rnd.nextInt(3))
              case 1 => t.rewriteSmallFiles(minBytes = 1L << 20, targetBytes = 1L << 26)
              case _ => t.expireSnapshotsOlderThan(
                System.currentTimeMillis() + 1000, retainLast = 1 + rnd.nextInt(3))
            }
        }
        val got = readState(t)
        assert(got == model,
          s"trial $trial step $step diverged: " +
          s"extra=${(got.toSet -- model.toSet).take(5)} missing=${(model.toSet -- got.toSet).take(5)}")
        history += ((t.log.currentVersion, model))
      }

      // time travel must replay every recorded LIVE state exactly (the
      // random expiry op may have dropped older versions — by design)
      val live = t.log.listVersions.toSet
      val liveHistory = history.filter { case (v, _) => live.contains(v) }
      assert(liveHistory.nonEmpty)
      val samples = rnd.shuffle(liveHistory.toSeq).take(5)
      samples.foreach { case (v, m) =>
        val got = t.readVersion(v).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(got == m, s"time travel to v$v diverged")
      }

      // and the per-commit changelog replays the final state from the
      // OLDEST SURVIVING recorded version
      val (first, firstModel) = liveHistory.head
      val last = t.log.currentVersion
      if (last > first) {
        // within a step apply deletes before inserts: an UPDATE emits both
        // for the same id, and the fold keys on id ("delete" < "insert")
        val changes = t.changelogDetailed(first, last)
          .select("id", "v", "_change_type", "_change_ordinal")
          .collect()
          .sortBy(r => (r.getInt(3), r.getString(2)))
        val replayed = changes.foldLeft(firstModel) { (m, r) =>
          if (r.getString(2) == "insert") m + (r.getLong(0) -> r.getDouble(1))
          else m - r.getLong(0)
        }
        assert(replayed == model, "changelog replay diverged from final state")
      }
    }
  }
}
