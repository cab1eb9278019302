package graft

/** [[Mat]] — the master-gated materialization rule (ADVICE r15): local
  * masters localCheckpoint, cluster masters would persist with lineage
  * kept; release frees blocks immediately in both forms. */
class MatSpec extends SparkSpec {

  test("checkpoint materializes eagerly and release frees the blocks now") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = Mat.checkpoint(spark.range(0, 1000).toDF("n"))
    // local master -> localCheckpoint: blocks exist the moment it returns
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "checkpoint left nothing materialized")
    assert(df.count() == 1000)
    Mat.release(df)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(added.forall(!after.contains(_)),
      s"release left blocks behind: ${added.intersect(after)}")
    // released plans still answer (lineage replay or plan re-execution
    // must not be required for correctness here: the DataFrame is dead)
  }

  test("release on a never-materialized frame is a safe no-op") {
    val df = spark.range(5).toDF("n")
    Mat.release(df)
    assert(df.count() == 5)
  }

  test("checkpoint result is usable across multiple consumers without recompute") {
    val df = Mat.checkpoint(spark.range(0, 100).toDF("n"))
    try {
      assert(df.count() == 100)
      assert(df.filter("n >= 50").count() == 50)
      assert(df.union(df).count() == 200)
    } finally Mat.release(df)
  }
}
