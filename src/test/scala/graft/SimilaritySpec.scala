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

  test("q70 (registered IVF query) finds the probe itself first") {
    val rows = graft.queries.Similarity.q70(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.head.getLong(0) == 0L && rows.head.getDouble(1) == 1.0)
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
}
