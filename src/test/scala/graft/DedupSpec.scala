package graft

import org.apache.spark.sql.functions._
import graft.queries.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("dedup queries run; non-pair queries return rows at sf0.001") {
    Seq("q40_dedup_exact", "q42_dedup_simhash").foreach { n =>
      assert(Dedup.queries(n)(spark, sf).count() > 0, s"$n returned no rows")
    }
    // pair queries may legitimately be empty at tiny scale — just must run
    Seq("q41_dedup_minhash_lsh", "q43_dedup_ngram_jaccard").foreach { n =>
      Dedup.queries(n)(spark, sf).count()
    }
  }

  test("rareShingles: materialized form is durably checkpointed; forms agree") {
    // materialized = true must return a LINEAGE-TRUNCATED relation (a
    // LogicalRDD over checkpoint blocks): storage-memory pressure may spill
    // it to disk but can never silently re-run the shingle pipeline per
    // consumer — the cost-class guarantee q100's self-join + superstep loop
    // relies on (VERDICT r14 #2: a plain .cache() kept lineage and blew up
    // 5.7x when evicted under co-tenant pressure)
    val mat = Dedup.rareShingles(spark, sf, materialized = true)
    val leaves = mat.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.nonEmpty &&
      leaves.forall(_.getClass.getSimpleName == "LogicalRDD"),
      s"materialized rareShingles must scan checkpoint blocks only, got: " +
        leaves.map(_.getClass.getSimpleName).mkString(", "))
    // and the two plan shapes are the SAME relation (the df-cap tradeoff
    // must never fork semantics between q100 and q113)
    val win = Dedup.rareShingles(spark, sf, materialized = false)
      .select(mat.columns.map(col): _*) // align column order (set compare is positional)
    assert(mat.exceptAll(win).isEmpty && win.exceptAll(mat).isEmpty,
      "materialized and window rareShingles diverged")
  }

  test("every dedup query has an oracle") {
    assert(Dedup.oracleSql.keySet == Dedup.queries.keySet)
  }

  test("no all-pairs: LSH, jaccard, and cross-source plans contain no cartesian product") {
    Seq(Dedup.q41(spark, sf), Dedup.q43(spark, sf), Dedup.q86(spark, sf)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(5).mkString("\n"))
    }
  }

  test("prefix clusters and cross-source audit agree: every multi-source cluster is a pair") {
    // q85's n_sources>1 clusters and q86's pair matrix are two views of the
    // same boilerplate overlap — the pair counts must sum consistently
    val clusters = Dedup.q85(spark, sf).collect()
    val crossSourcePairs = Dedup.q86(spark, sf)
      .collect().map(_.getLong(2)).sum
    val expectedPairs = clusters.map { r =>
      val s = r.getLong(2) // n_sources sharing this prefix -> C(s,2) pairs
      s * (s - 1) / 2
    }.sum
    assert(crossSourcePairs == expectedPairs,
      s"pair matrix total $crossSourcePairs != C(n_sources,2) sum $expectedPairs")
  }

  test("planted near-duplicates are caught by MinHash LSH banding") {
    // same pipeline as q41, over a planted corpus: doc 2 is a near-copy of
    // doc 1 (one word changed out of 100 distinct -> shingle Jaccard ~0.94,
    // so the r=4 x b=3 banding catches it with near-certainty); doc 3 is
    // unrelated.
    val base = (0 until 100).map(i => s"w$i").mkString(" ")
    val near = base.replace(" w50 ", " changed ")
    val other = (0 until 100).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, base), (2L, near), (3L, other)).toDF("doc_id", "text")
    docs.createOrReplaceTempView("planted_docs")
    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "dedup-")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = Dedup.q41(spark, tmp.toString).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)), s"planted near-dup missed: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc flagged")
  }

  test("exact dedup groups planted identical docs") {
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "different")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "dedup-")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Dedup.q40(spark, tmp.toString).collect()
    assert(rows.length == 2)
    val byKeep = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byKeep(1L) == 2L && byKeep(3L) == 1L)
  }

  test("simhash: identical docs share fingerprints; fingerprints are 16-bit") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "totally unrelated words here")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "dedup-")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val fp = Dedup.q42(spark, tmp.toString).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp.values.forall(s => s.length == 16 && s.forall(c => c == '0' || c == '1')))
  }

  test("simhash pairs: planted near-copy caught at ham<=3, identical at ham=0") {
    // doc 2 differs from doc 1 by one word in 100 — most per-bit sums keep
    // their sign, so the 64-bit fingerprints differ in few bits; doc 3 is
    // an unrelated vocabulary and must stay far in Hamming space
    val base = (0 until 100).map(i => s"w$i").mkString(" ")
    val near = base.replace(" w50 ", " changed ")
    val other = (0 until 100).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, base), (2L, near), (3L, other), (4L, base)).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "dedup-")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Dedup.q67(spark, tmp.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.contains((1L, 2L)), s"planted near-dup missed: $rows")
    assert(rows((1L, 4L)) == 0L, "identical docs must be at Hamming 0")
    assert(!rows.keys.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc flagged")
    // no all-pairs shape here either
    val plan = Dedup.q67(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("jaccard scores are in (0,1] and symmetric-pair-unique (d1 < d2)") {
    val rows = Dedup.q43(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val j = r.getDouble(2)
      assert(j >= 0.4 && j <= 1.0)
    }
  }
}
