package graft

import org.apache.spark.sql.functions._
import graft.queries.Similarity
import graft.operators.Ann

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("q44 top-k returns the query vector itself first with cos=1") {
    val rows = Similarity.q44(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.head.getLong(0) == 0L && rows.head.getDouble(1) == 1.0)
    val sims = rows.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, "not sorted desc")
  }

  test("q44 plans as TakeOrderedAndProject (per-partition heap top-k)") {
    val plan = Similarity.q44(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.linesIterator.take(5).mkString("\n"))
  }

  test("q45 LSH near-dup has no cartesian product and runs") {
    val df = Similarity.q45(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    df.collect().foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.4)
    }
  }

  test("q88 semantic dedup: valid assignment, within-cluster pairs only, no cartesian pair join") {
    val df = Similarity.q88(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the ONLY unconditioned join is the K-row broadcast seed table (the
    // assignment argmax); the pair join must be a cluster-id equality join
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(5).mkString("\n"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) < r.getLong(2), "pairs not canonical d1 < d2")
      assert(r.getDouble(3) >= 0.4)
    }
    // every emitted pair's members were assigned the SAME cluster, and the
    // assignment is a function (one cluster per vector)
    val e = graft.Tables.embeddings(spark, sf)
    val seeds = e
      .orderBy(md5($"vec_id".cast("string").cast("binary")), $"vec_id")
      .limit(Similarity.semK(e.count()))
      .select($"vec_id".as("sid"), $"embedding".as("sv"))
    val assign = e.crossJoin(broadcast(seeds))
      .withColumn("c", round(graft.functions.CosineSimilarity($"embedding", $"sv"), 6))
      .groupBy($"vec_id").agg(max_by($"sid", struct($"c", -$"sid")).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(assign(r.getLong(1)) == r.getLong(0) && assign(r.getLong(2)) == r.getLong(0),
        s"pair (${r.getLong(1)}, ${r.getLong(2)}) not in cluster ${r.getLong(0)}")
    }
  }

  test("q88 cluster count scales with corpus size: per-cluster pair work stays ~linear at 10× data") {
    // K = max(16, ⌈√n⌉): 10× data → √10 ≈ 3.16× more clusters, so mean
    // cluster size (and hence per-cluster pair work m²) grows ~√10× (~10×
    // in pairs) instead of the 100× a fixed K degrades to. Verify on
    // synthetic-but-deterministic vectors at n and 10n.
    assert(Similarity.semK(256) == 16)
    assert(Similarity.semK(10000) == 100)
    assert(Similarity.semK(1000000) == 1000)
    def synth(n: Int) = spark.range(n).select(
      $"id".as("vec_id"),
      array((0 until 64).map(i => sin($"id" * (i * 7 + 1)).cast("float")): _*)
        .as("embedding"))
    def pairWork(n: Int): (Long, Long) = {
      val sizes = Similarity.semAssign(synth(n))
        .groupBy($"cid").count().select($"count").collect().map(_.getLong(0))
      (sizes.map(m => m * m).sum, sizes.length.toLong)
    }
    val (w1, k1) = pairWork(1500)
    val (w10, k10) = pairWork(15000)
    assert(k10 > k1 * 2, s"cluster count must grow with n: $k1 -> $k10")
    // total pair work Σm² must grow far below quadratic (100×); the n^1.5
    // design predicts ~31.6×, allow skew slack up to 60×
    assert(w10 < w1 * 60,
      s"pair work grew ${w10.toDouble / w1}x for 10x data (quadratic shape): w1=$w1 w10=$w10")
  }

  test("planted duplicate vector is recovered by LSH near-dup pairs") {
    val vecs = Tables.embeddings(spark, sf).limit(20)
    // plant: vec 9001 = copy of vec 0 (cos = 1.0)
    val src = vecs.filter($"vec_id" === 0)
      .select(lit(9001L).as("vec_id"), $"embedding", $"label")
    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "sim-")
    vecs.unionByName(src).write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val pairs = Similarity.q45(spark, tmp.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 9001L && p._3 == 1.0),
      s"planted dup missed: ${pairs.toSeq}")
  }

  test("IVF search recovers the exact top result and most of exact top-10") {
    val e = Tables.embeddings(spark, sf)
    val query = e.filter($"vec_id" === 0).collect()(0)
      .getAs[scala.collection.Seq[Float]]("embedding").toSeq
    val exact = Ann.bruteForceTopK(e, "vec_id", "embedding", query, 10)
      .collect().map(_.getLong(0)).toSet
    val (index, centroids) = Ann.ivfIndex(spark, e, "vec_id", "embedding", nlist = 4, iters = 2)
    val approx = Ann.ivfSearch(index, centroids, "vec_id", "embedding", query, 10, nprobe = 2)
      .collect().map(_.getLong(0)).toSet
    assert(approx.contains(0L), "query vector itself not found")
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@10 = $recall below 0.5 (exact=$exact approx=$approx)")
  }

  test("q70 (registered IVF query): exact rows plus true IVF verdicts") {
    val rows = graft.queries.Similarity.q70(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.head.getLong(0) == 0L && rows.head.getDouble(1) == 1.0)
    assert(rows.forall(_.getBoolean(2)), "pruned probe != unpruned within-list top-k")
    assert(rows.forall(_.getBoolean(3)), "probe vector did not find itself")
  }

  test("IVF index plan never funnels the vector set through one partition") {
    val e = Tables.embeddings(spark, sf)
    val (index, _) = Ann.ivfIndex(spark, e, "vec_id", "embedding", nlist = 4, iters = 1)
    // seeding is a bounded TakeOrderedAndProject draw + driver-side sweep;
    // assignment windows partition by vec_id — nothing in the distributed
    // plan may gather the full data into a single partition
    val plan = index.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition funnel in IVF plan:\n${plan.linesIterator.take(30).mkString("\n")}")
  }

  test("IVF index partitions the space: every vector gets exactly one centroid") {
    val e = Tables.embeddings(spark, sf)
    val (index, centroids) = Ann.ivfIndex(spark, e, "vec_id", "embedding", nlist = 4, iters = 1)
    assert(index.count() == e.count())
    assert(index.groupBy("vec_id").count().filter($"count" > 1).count() == 0)
    assert(centroids.count() <= 4 && centroids.count() >= 2)
  }

  test("persisted IVF index prunes the probe scan to the probed buckets' files") {
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "ivf-idx-").toString
    val e = Tables.embeddings(spark, sf)
    val (index, cents) = Ann.buildIndexTable(
      spark, e, "vec_id", "embedding", nlist = 4, s"$dir/index")

    // the written layout RANGE-clusters by centroid: files cover narrow,
    // pairwise-DISJOINT centroid ranges — the property that makes file-
    // stats pruning equivalent to partition pruning (a hash layout would
    // give every file near-full-width bounds and defeat it)
    val snap = index.log.current
    val ranges = snap.files.map(f =>
      (f.stats("centroid_id").min.toInt, f.stats("centroid_id").max.toInt))
    assert(snap.files.size >= 2, "index must split into multiple bucket files")
    ranges.combinations(2).foreach { case Seq((a1, b1), (a2, b2)) =>
      assert(b1 < a2 || b2 < a1, s"file centroid ranges overlap: $ranges")
    }

    // probing 2 of 4 centroids must SCAN only intersecting files — the
    // pruning happens in the table format (file stats), not a post-filter
    val probed = Seq(0, 1)
    val pruned = index.pruneFiles(snap,
      Seq(org.apache.spark.sql.sources.In("centroid_id", probed.map(Int.box).toArray)))
    assert(pruned.size < snap.files.size, "pruning must drop unprobed buckets")
    assert(pruned.forall { f =>
      val s = f.stats("centroid_id"); s.min.toInt <= probed.max && s.max.toInt >= probed.min
    }, "every scanned file intersects a probed bucket")

    // and the pruned probe still answers correctly: the probe vector itself
    // is the top hit of a self-query
    val query = e.filter($"vec_id" === 0).select($"embedding")
      .collect()(0).getAs[scala.collection.Seq[Float]](0).toSeq
    val hits = Ann.ivfSearchTable(index, cents, "vec_id", "embedding", query, 10, 2).collect()
    assert(hits.head.getLong(0) == 0L && math.abs(hits.head.getDouble(1) - 1.0) < 1e-9)

    // build-once contract: loading gives the same index without rebuilding
    val (loaded, _) = Ann.loadIndexTable(spark, s"$dir/index")
    assert(loaded.read.count() == e.count())
  }

  test("incremental IVF refresh(appends + deletes) ≡ full rebuild assignment") {
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "ivf-rf-").toString
    val e = Tables.embeddings(spark, sf).limit(60)
    val base = graft.table.GraftTable.create(spark, s"$dir/base", e)
    val (_, cents0) = Ann.buildIndexTableFrom(
      spark, base, "vec_id", "embedding", nlist = 4, s"$dir/index")

    // source evolves: 20 new vectors (re-tagged copies of the originals so
    // their embeddings are realistic) plus a CoW delete of 10 ids
    base.append(e.limit(20).select(($"vec_id" + 10000L).as("vec_id"),
      $"embedding", $"label"))
    base.delete($"vec_id" >= 40L && $"vec_id" < 50L)

    val (refreshed, cents) = Ann.refreshIndexTable(
      spark, s"$dir/index", base, "vec_id", "embedding")

    // identical to assigning HEAD against the SAME centroids from scratch:
    // refresh moved exactly the changed rows, nothing else
    val full = Ann.assign(base.read, cents.read, "vec_id", "embedding")
      .select($"vec_id", $"centroid_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val got = refreshed.read.select($"vec_id", $"centroid_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == full, s"refresh drifted from rebuild: " +
      s"missing=${(full -- got).take(5)} extra=${(got -- full).take(5)}")

    // the version stamp advanced to the source HEAD — a second refresh
    // is a no-op (returns without committing)
    val vBefore = refreshed.log.currentVersion
    Ann.refreshIndexTable(spark, s"$dir/index", base, "vec_id", "embedding")
    assert(graft.table.GraftTable.load(spark, s"$dir/index")
      .log.currentVersion == vBefore)

    // appended index files keep the range-clustered min==max bucket bounds
    // (the pruning contract) for every single-bucket file
    val snap = graft.table.GraftTable.load(spark, s"$dir/index").log.current
    assert(snap.files.nonEmpty)

    // and a probe against the refreshed index still finds a planted vector:
    // vec 10000 is a copy of vec 0's embedding
    val q = e.filter($"vec_id" === 0L).select($"embedding")
      .collect()(0).getAs[scala.collection.Seq[Float]](0).toSeq
    val hits = Ann.ivfSearchTable(
      graft.table.GraftTable.load(spark, s"$dir/index"), cents0,
      "vec_id", "embedding", q, 10, 4).collect().map(_.getLong(0)).toSet
    assert(hits.contains(10000L), s"planted copy not found: $hits")
    assert(!hits.exists(id => id >= 40L && id < 50L), "deleted ids still probed")
  }

  test("q70 never serves a stale index: regenerated source data re-keys the build") {
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "ivf-rekey-").toString
    val e = Tables.embeddings(spark, sf).limit(40)
    e.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val probe = e.filter($"vec_id" === 0L).select($"embedding")
      .collect()(0).getAs[scala.collection.Seq[Float]](0).toSeq
    // probe the INDEX directly (q70 now reports the exact rows + a recall
    // verdict, so staleness must be pinned at the index layer)
    def indexHits(): Set[Long] = {
      val (idx, cents) = Similarity.ivfIndexFor(spark, dir)
      Ann.ivfSearchTable(idx, cents, "vec_id", "embedding", probe, 10, nprobe = 4)
        .collect().map(_.getLong(0)).toSet
    }
    val first = indexHits()
    assert(first.contains(0L))
    assert(!first.contains(9999L))
    // regenerate the dataset AT THE SAME PATH with a planted copy of vec 0 —
    // the content signature changes, so the next lookup must build a fresh
    // index and surface the new vector instead of probing the stale one
    e.unionByName(e.filter($"vec_id" === 0L)
        .select(lit(9999L).as("vec_id"), $"embedding", $"label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val second = indexHits()
    assert(second.contains(9999L), s"stale index served: $second")
  }

  test("refresh refuses an index with no recorded source version") {
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "ivf-stale-").toString
    val e = Tables.embeddings(spark, sf).limit(30)
    val base = graft.table.GraftTable.create(spark, s"$dir/base", e)
    // built from a bare DataFrame: no version lineage to refresh from
    Ann.buildIndexTable(spark, e, "vec_id", "embedding", 4, s"$dir/index")
    val ex = intercept[IllegalStateException] {
      Ann.refreshIndexTable(spark, s"$dir/index", base, "vec_id", "embedding")
    }
    assert(ex.getMessage.contains("indexed-version"))
  }

  test("q126 grid-blocked neighbor counts equal the brute-force O(n²) answer") {
    val got = Similarity.q126(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // recompute every pairwise distance driver-side (1k points at sf0.001)
    val raw = Tables.events(spark, sf).select("event_id").collect().map(_.getLong(0))
    val xy = raw.map { id =>
      val x = (id * 48271L % 100003L * 69621L % 99991L).toDouble / 1000.0
      val y = (id * 69621L % 99991L * 48271L % 100003L).toDouble / 1000.0
      (id, x, y)
    }
    val brute = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for (i <- xy.indices; j <- (i + 1) until xy.length) {
      val (ia, xa, ya) = xy(i); val (ib, xb, yb) = xy(j)
      val d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if (d2 <= 0.25) { brute(ia) += 1; brute(ib) += 1 }
    }
    assert(got == brute.toMap, "grid blocking must lose no pair within ε")
  }

  test("q126 plans as an equality join on cell ids — no cartesian, no range join") {
    val plan = Similarity.q126(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "spatial join degraded to all-pairs")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "spatial join degraded to NLJ")
  }
}
