package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    val pool = vectors
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(nlist * 8)
      .select(col(vecCol)).collect()
      .map(_.getAs[scala.collection.Seq[Float]](0).toArray)
    val seeds = farthestPoints(pool, nlist)
    import spark.implicits._
    var centroids = seeds.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("centroid_id", "cvec")
      .select(col("centroid_id"), col("cvec").cast("array<float>").as("cvec"))
    for (_ <- 1 to iters) {
      val assigned = assign(vectors, centroids, idCol, vecCol)
      // update step: element-wise mean per centroid via posexplode
      centroids = assigned
        .select(col("centroid_id"), posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(avg(col("v")).as("m"))
        .groupBy(col("centroid_id"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> CAST(x.m AS FLOAT))").as("cvec"))
    }
    (assign(vectors, centroids, idCol, vecCol), centroids)
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
  private def assign(vectors: DataFrame, centroids: DataFrame,
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
