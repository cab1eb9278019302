package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.table.GraftTable

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]) — the scale path behind the oracle-checked brute-force
  * baseline (`Similarity.q44`).
  *
  * IVF (inverted-file) design, 100 TB shape:
  *  - centroids: tiny (nlist rows) — trained with Lloyd iterations where the
  *    assignment step is a broadcast of the centroid table against the full
  *    vector set (O(n·nlist) map work, zero shuffle for the join) and the
  *    update step is a posexplode + groupBy(centroid, dim) partial→final
  *    aggregation (shuffle carries nlist×dim rows);
  *  - index: each vector tagged with its nearest centroid id — at scale this
  *    is the partition/bucket key, so a probe touches only nprobe/nlist of
  *    the data;
  *  - search: pick nprobe centroids driver-side (centroids are tiny), scan
  *    only their buckets, exact cosine top-k within (TakeOrderedAndProject).
  */
object Ann {

  /** Native codegen'd cosine (graft.functions.CosineSimilarity) — stays
    * inside the whole-stage loop instead of interpreted HOF folds. */
  private def cosine(a: String, b: String) =
    graft.functions.CosineSimilarity(col(a), expr(b))

  /** Exact brute-force cosine top-k (baseline; plans as TakeOrderedAndProject). */
  def bruteForceTopK(vectors: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val q = s"array(${query.map(v => s"CAST($v AS FLOAT)").mkString(",")})"
    vectors.select(col(idCol), cosine(vecCol, q).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** IVF index: (vectors tagged with centroid id, the centroid table).
    * Deterministic init in two bounded steps: (1) draw 8×nlist candidates as
    * the smallest id-hashes — a uniform pseudo-random sample that plans as
    * TakeOrderedAndProject (per-partition heaps; k rows per partition cross
    * the wire, the full vector set never funnels through one task); (2) a
    * driver-side farthest-point sweep (k-means++ shape) over that tiny pool
    * spreads the nlist seeds. Both steps are O(nlist)-sized regardless of
    * table size. `iters` Lloyd rounds refine. */
  def ivfIndex(spark: SparkSession, vectors: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 2): (DataFrame, DataFrame) = {
    // Lloyd reads the full vector set once per iteration (assignment) plus
    // once for the final tagging — cache the scan for the training window.
    // MEMORY_AND_DISK: at 100 TB the executors spill, they never recompute.
    val cached = vectors.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val pool = cached
        .orderBy(xxhash64(col(idCol)), col(idCol)).limit(nlist * 8)
        .select(col(vecCol)).collect()
        .map(_.getAs[scala.collection.Seq[Float]](0).toArray)
      val seeds = farthestPoints(pool, nlist)
      import spark.implicits._
      def toDf(cs: Seq[(Int, Seq[Float])]): DataFrame =
        cs.toDF("centroid_id", "cvec")
          .select(col("centroid_id"), col("cvec").cast("array<float>").as("cvec"))
      var centroids: Seq[(Int, Seq[Float])] =
        seeds.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
      for (_ <- 1 to iters) {
        val assigned = assign(cached, toDf(centroids), idCol, vecCol)
        // update step: element-wise mean per centroid via posexplode, then
        // COLLECT the nlist tiny rows — centroids are driver-side state
        // (O(nlist·dim) floats), which truncates the per-iteration lineage
        // instead of stacking iters× (assign + update) into one lazy plan
        // that every downstream action would re-execute end-to-end.
        centroids = assigned
          .select(col("centroid_id"), posexplode(col(vecCol)).as(Seq("pos", "v")))
          .groupBy(col("centroid_id"), col("pos"))
          .agg(avg(col("v")).as("m"))
          .groupBy(col("centroid_id"))
          .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> CAST(x.m AS FLOAT))").as("cvec"))
          .collect()
          .map(r => (r.getInt(0), r.getAs[scala.collection.Seq[Float]](1).toSeq)).toSeq
      }
      (assign(vectors, toDf(centroids), idCol, vecCol), toDf(centroids))
    } finally {
      // final assign deliberately reads the UNCACHED vectors: the training
      // cache is released here; the one-shot tagging pass streams the scan
      cached.unpersist(blocking = false)
    }
  }

  /** Table property on a persisted index recording WHICH snapshot of its
    * graft-table source the index covers; absent when the index was built
    * from a plain DataFrame (no version to track → no incremental refresh). */
  val IndexedVersionProp = "graft.ivf.indexed-version"

  /** Materialize the IVF index AS A GRAFT TABLE, hidden-partitioned by
    * `centroid_id` (identity transform), plus a sibling `<path>_centroids`
    * table — so probes prune through the table format's file-level stats
    * instead of filtering a full scan, and the index is built ONCE, not per
    * query. At scale this is the difference between touching nprobe/nlist
    * of the files and touching all of them. */
  def buildIndexTable(spark: SparkSession, vectors: DataFrame, idCol: String,
      vecCol: String, nlist: Int, path: String, iters: Int = 2,
      props: Map[String, String] = Map.empty): (GraftTable, GraftTable) = {
    val (indexed, centroids) = ivfIndex(spark, vectors, idCol, vecCol, nlist, iters)
    // RANGE-cluster by centroid id with an explicit partition count: every
    // data file then covers exactly one bucket (min == max in its stats),
    // and AQE can't coalesce the layout away. In(centroid_id, probes)
    // pruning through the table's file stats reads only the probed
    // buckets' files — the partition-pruning machinery every catalog scan
    // already uses. (Range, not hash: hash scatters bucket ids across
    // partition indexes, so any partition merge produces files with WIDE
    // id bounds that defeat pruning; ranges stay contiguous.)
    val shaped = indexed.repartitionByRange(nlist, col("centroid_id"))
    val index = GraftTable.create(spark, path, shaped, props)
    val cents = GraftTable.create(spark, s"${path.stripSuffix("/")}_centroids", centroids)
    (index, cents)
  }

  /** Build the index over a GRAFT-TABLE source, stamping the source version
    * as a table property so [[refreshIndexTable]] can later catch the index
    * up incrementally instead of rebuilding. */
  def buildIndexTableFrom(spark: SparkSession, base: GraftTable, idCol: String,
      vecCol: String, nlist: Int, path: String, iters: Int = 2): (GraftTable, GraftTable) = {
    val v = base.log.currentVersion
    buildIndexTable(spark, base.read, idCol, vecCol, nlist, path, iters,
      Map(IndexedVersionProp -> v.toString))
  }

  /** Incremental index refresh: catch a persisted index up to its source
    * table's HEAD without a rebuild. The source's PER-COMMIT changelog over
    * `(indexedV, HEAD]` reads only the files those commits changed — the
    * refresh costs O(changed data + one index pass), never a base rescan:
    *  - ids carrying any delete row (incl. the delete half of updates) leave
    *    the index through a MERGE on the id key — a distributed anti-join,
    *    never a collected id list. Skipped entirely for pure-append ranges,
    *    so the common case rewrites no existing index file;
    *  - each touched id's final state (last-ordinal insert image, if any) is
    *    assigned to the EXISTING centroids — one broadcast pass over only
    *    the changed rows, O(changed·nlist) — and appended range-clustered by
    *    centroid id, so new files keep the min==max bounds probes prune on.
    * The advanced `indexed-version` stamp rides the SAME commit as the data
    * (merge commit props / append extraProps), so a crash between steps
    * leaves a version the next refresh resumes from, never a lie. Centroids
    * deliberately stay fixed — IVF semantics (Faiss `add` behaves the same):
    * recall drifts only if the data distribution does, and the cure is a
    * periodic full rebuild. Assumes `idCol` is unique per row (the contract
    * an id-keyed vector index already imposes); bag-duplicated ids need a
    * rebuild. */
  def refreshIndexTable(spark: SparkSession, path: String, base: GraftTable,
      idCol: String, vecCol: String): (GraftTable, GraftTable) = {
    val (index, cents) = loadIndexTable(spark, path)
    val indexedV = index.log.current.properties.getOrElse(IndexedVersionProp,
      throw new IllegalStateException(
        s"index at $path carries no $IndexedVersionProp property — it was not " +
        "built from a graft table (buildIndexTableFrom); rebuild to refresh")).toLong
    val curV = base.log.currentVersion
    if (curV == indexedV) return (index, cents)
    require(curV > indexedV,
      s"index at $path was built from v$indexedV but the source is at v$curV " +
      "(rolled back?) — rebuild the index")
    val changes = base.changelogDetailed(indexedV, curV)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val deletedIds = changes.filter(col("_change_type") === "delete")
        .select(col(idCol)).distinct()
      if (!deletedIds.isEmpty)
        index.merge(deletedIds.withColumnRenamed(idCol, "_src_id"),
            GraftTable.qref("t", idCol) === GraftTable.qref("s", "_src_id"))
          .whenMatchedDelete()
          .withCommitProperties(Map(IndexedVersionProp -> curV.toString))
          .execute()
      // last-writer-wins per id: an id's final image is its insert row(s)
      // at the LAST ordinal that touched it — a shuffle of only the changed
      // rows, not the table
      val maxOrd = org.apache.spark.sql.expressions.Window
        .partitionBy(GraftTable.qcol(idCol))
      val alive = changes
        .withColumn("_max_ord", max(col("_change_ordinal")).over(maxOrd))
        .filter(col("_change_ordinal") === col("_max_ord") &&
          col("_change_type") === "insert")
        .drop("_change_type", "_commit_version", "_change_ordinal", "_max_ord")
      val nlist = cents.read.count().toInt
      val assigned = assign(alive, cents.read, idCol, vecCol)
      index.append(assigned.repartitionByRange(math.max(nlist, 1), col("centroid_id")),
        extraProps = Map(IndexedVersionProp -> curV.toString))
    } finally changes.unpersist(blocking = false)
    (GraftTable.load(spark, path), cents)
  }

  /** Load a persisted IVF index (see [[buildIndexTable]]). */
  def loadIndexTable(spark: SparkSession, path: String): (GraftTable, GraftTable) =
    (GraftTable.load(spark, path),
      GraftTable.load(spark, s"${path.stripSuffix("/")}_centroids"))

  /** IVF probe against a PERSISTED index: pick nprobe centroids driver-side
    * (centroid table is tiny), then read only the index files whose
    * centroid_id bounds intersect the probes — log-level pruning through
    * [[GraftTable.readPruned]], the same machinery every catalog scan uses. */
  /** The nprobe centroid ids a query probes, max-cosine first — driver-side
    * over the tiny centroid table (exposed so callers can verify the pruned
    * probe against an unpruned scan of the same lists). */
  def probeLists(centroids: GraftTable, query: Seq[Float], nprobe: Int): Seq[Int] = {
    val q = s"array(${query.map(v => s"CAST($v AS FLOAT)").mkString(",")})"
    centroids.read.select(col("centroid_id"), cosine("cvec", q).as("s"))
      .orderBy(col("s").desc).limit(nprobe)
      .collect().map(_.getInt(0)).toSeq
  }

  def ivfSearchTable(index: GraftTable, centroids: GraftTable, idCol: String,
      vecCol: String, query: Seq[Float], k: Int, nprobe: Int): DataFrame = {
    val q = s"array(${query.map(v => s"CAST($v AS FLOAT)").mkString(",")})"
    val probes = probeLists(centroids, query, nprobe)
    val snap = index.log.current
    val pruned = index.readPruned(snap,
      Seq(org.apache.spark.sql.sources.In("centroid_id", probes.map(Int.box).toArray)))
    pruned.filter(col("centroid_id").isin(probes: _*))
      .select(col(idCol), cosine(vecCol, q).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Greedy farthest-point selection over a small candidate pool: start from
    * the first candidate, repeatedly add the one with the largest minimum
    * cosine distance to the chosen set. O(pool × k) driver work on an
    * O(nlist)-bounded pool. */
  private def farthestPoints(pool: Array[Array[Float]], k: Int): Array[Array[Float]] = {
    if (pool.isEmpty) return Array.empty
    val chosen = scala.collection.mutable.ArrayBuffer(pool.head)
    while (chosen.length < math.min(k, pool.length)) {
      val next = pool.maxBy(v => chosen.map(c => 1.0 - cosineLocal(v, c)).min)
      chosen += next
    }
    chosen.toArray
  }

  private def cosineLocal(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < math.min(a.length, b.length)) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Nearest-centroid assignment: broadcast the tiny centroid table, keep
    * the max-cosine centroid per vector. A partial→final `max(struct)`
    * aggregation, NOT a rank window: the map side combines the nlist
    * candidate rows per vector down to one before the exchange, so the
    * shuffle carries n rows instead of n·nlist sort-shuffled ones — per
    * Lloyd iteration. Ties break to the lowest centroid id (negated id in
    * the struct), matching a deterministic rank. */
  private[graft] def assign(vectors: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val scored = vectors.crossJoin(broadcast(centroids))
      .withColumn("_sim", cosine(vecCol, "cvec"))
    val carried = vectors.columns.filterNot(_ == idCol).toSeq
    scored.groupBy(col(idCol))
      .agg(max(struct(col("_sim"), (-col("centroid_id")).as("nid"))).as("_b"),
        carried.map(c => first(col(c)).as(c)): _*)
      .select(col(idCol) +: carried.map(col) :+
        (-col("_b.nid")).cast("int").as("centroid_id"): _*)
  }

  /** IVF search: probe the `nprobe` centroids nearest the query (driver-side
    * pick over the tiny centroid table), exact top-k within their buckets. */
  def ivfSearch(index: DataFrame, centroids: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, nprobe: Int): DataFrame = {
    val q = s"array(${query.map(v => s"CAST($v AS FLOAT)").mkString(",")})"
    val probes = centroids.select(col("centroid_id"), cosine("cvec", q).as("s"))
      .orderBy(col("s").desc).limit(nprobe)
      .collect().map(_.getInt(0)).toSeq
    index.filter(col("centroid_id").isin(probes: _*))
      .select(col(idCol), cosine(vecCol, q).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }
}
