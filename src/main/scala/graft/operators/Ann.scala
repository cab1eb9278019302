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
    * Deterministic init: every (n/nlist)-th vector by id order seeds a
    * centroid; `iters` Lloyd rounds refine. */
  def ivfIndex(spark: SparkSession, vectors: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 2): (DataFrame, DataFrame) = {
    val n = vectors.count()
    val stride = math.max(n / nlist, 1L)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(idCol))
    // deterministic seeding without collect: rank by id, take every stride-th
    var centroids = vectors
      .withColumn("_rk", row_number().over(w))
      .filter((col("_rk") - 1) % stride === 0).limit(nlist)
      .select((row_number().over(org.apache.spark.sql.expressions.Window.orderBy(col(idCol))) - 1).as("centroid_id"),
        col(vecCol).as("cvec"))
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

  /** Nearest-centroid assignment: broadcast the tiny centroid table, keep
    * the max-cosine centroid per vector (window over a broadcast join). */
  private def assign(vectors: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val scored = vectors.crossJoin(broadcast(centroids))
      .withColumn("_sim", cosine(vecCol, "cvec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("_sim").desc, col("centroid_id"))
    scored.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .drop("_rn", "_sim", "cvec")
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
