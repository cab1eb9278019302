package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimization-round A/B harness (guide §1): times named experimental
  * variants of hot queries against the declared implementations, same
  * methodology as Bench (noop sink, warmup, median of N, gc + scratch sweep
  * between samples). NOT part of the driver contract; variants that win are
  * promoted into the declared query (after oracle re-verification) and
  * variants that lose are recorded in OPTIMIZATION_r18.md.
  *
  * Usage: jrun.sh graft.Probe <name1,name2,...> [reps]
  */
object Probe {

  // ------------------------------------------------------------ variants
  // Concluded experiments are recorded in OPTIMIZATION_r18.md with their
  // measurements; only live ones stay here.

  /** Declared query with the narrow-scan spread forced ON/OFF — the
    * within-session A/B for every spreadIfNarrow call site. */
  private def spreadAB(name: String, on: Boolean)(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.graft.spread.narrow", if (on) "on" else "off")
    SparkEntry.queries(name)(spark, dir)
  }

  val variants: Map[String, (SparkSession, String) => DataFrame] = {
    val ab = Seq("q142_tpch_q17_small_qty", "q143_tpch_q18_large_volume",
      "q147_tpch_q2_min_cost_supplier", "q152_tpch_q16_supplier_count",
      "q01_pricing_summary", "q126_grid_neighbors",
      "q13_agg_distinct", "q21_agg_approx_distinct", "q42_dedup_simhash",
      "q67_dedup_simhash_pairs", "q71_variant_extract", "q90_block_dedup",
      "q96_substring_dedup", "q121_robust_outliers", "q125_market_basket",
      "q127_woe_binning", "q129_pareto_share", "q91_resample_interpolate").flatMap { n =>
      val short = n.split("_")(0)
      Seq(s"${short}on" -> (spreadAB(n, on = true) _),
          s"${short}off" -> (spreadAB(n, on = false) _))
    }.toMap
    ab ++ Map(
      "q97v0" -> graft.queries.TextAnalysis.queries("q97_nb_langid"),
      "q97v1" -> ((spark: SparkSession, dir: String) => {
        import spark.implicits._
        val toks = Tables.documentsSpread(spark, dir)
          .select($"doc_id", $"lang",
            explode(expr("filter(split(text, ' '), x -> length(x) > 0)")).as("word"))
        val dw = toks.groupBy($"doc_id", $"lang", $"word")
          .agg(count(lit(1)).as("c")).transform(graft.Mat.multiUse)
        val cw = dw.groupBy($"lang".as("cls"), $"word")
          .agg(sum($"c").as("cw"))
        // per-word class-count MAP: the (cls, word) join of the 5x-expanded
        // candidate stream becomes ONE word-keyed join + a map lookup
        val cwm = cw.groupBy($"word")
          .agg(map_from_entries(collect_list(struct($"cls", $"cw"))).as("m"))
        val ct = cw.groupBy($"cls").agg(sum($"cw").as("ctot"))
        val vocab = dw.agg(countDistinct($"word").as("v"))
        val docs = Tables.documents(spark, dir)
        val pri = docs.groupBy($"lang".as("cls")).agg(count(lit(1)).as("nd"))
        val n = docs.agg(count(lit(1)).as("n"))
        val cls = ct.join(pri, "cls").crossJoin(vocab).crossJoin(n)
          .select($"cls", $"ctot", $"v", log($"nd".cast("double") / $"n").as("prior_ln"))
        val cand = dw.join(cwm, Seq("word"))
          .crossJoin(broadcast(cls))
          .select($"doc_id", $"lang", $"cls", $"prior_ln",
            ($"c" * (log(coalesce(element_at($"m", $"cls"), lit(0L)) + 1) - log($"ctot" + $"v")))
              .cast("decimal(28,12)").as("term"))
        val sc = cand.groupBy($"doc_id", $"lang", $"cls", $"prior_ln")
          .agg(round($"prior_ln" + sum($"term").cast("double"), 4).as("s"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"doc_id").orderBy($"s".desc, $"cls".asc)
        sc.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
          .select($"doc_id", $"lang", $"cls".as("pred_lang"), $"s".as("nb_logp"),
            ($"lang" === $"cls").as("correct"))
          .orderBy($"doc_id")
      }),
      "q95v0" -> graft.queries.TextAnalysis.queries("q95_bigram_lm"),
      "q95v1" -> ((spark: SparkSession, dir: String) => {
        import spark.implicits._
        val toks = Tables.documentsSpread(spark, dir)
          .select($"doc_id", expr("filter(split(text, ' '), x -> length(x) > 0)").as("w"))
          .filter(size($"w") >= 2)
        val docBg = toks
          .select($"doc_id", explode(expr(
            "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1)," +
              " (a, b) -> struct(a AS w1, b AS w2))")).as("p"))
          .select($"doc_id", $"p.w1".as("w1"), $"p.w2".as("w2"))
          .groupBy($"doc_id", $"w1", $"w2").agg(count(lit(1)).as("c"))
          .transform(graft.Mat.multiUse)
        val corpusBg = docBg.groupBy($"w1", $"w2").agg(sum($"c").as("c12"))
        val corpusUni = corpusBg.groupBy($"w1").agg(sum($"c12").as("c1"))
        // model-first: fold c1 into the bigram table BEFORE the wide join,
        // so the doc stream joins ONCE on (w1, w2) instead of twice
        val model = corpusBg.join(corpusUni, Seq("w1"))
          .select($"w1", $"w2", (log($"c12") - log($"c1")).as("lr"))
        docBg
          .join(model, Seq("w1", "w2"))
          .groupBy($"doc_id")
          .agg(
            round(
              sum(($"c" * $"lr").cast("decimal(28,12)"))
                .cast("double") / sum($"c"), 4).as("avg_logp"),
            sum($"c").as("n_bigrams"))
          .orderBy($"doc_id")
      }),
      "q100rare" -> ((s: SparkSession, d: String) =>
        graft.queries.Dedup.rareShingles(s, d, materialized = true)),
      "q100rareU" -> ((s: SparkSession, d: String) =>
        graft.queries.Dedup.rareShingles(s, d, materialized = false)),
      "q100pairs" -> ((s: SparkSession, d: String) => {
        import org.apache.spark.sql.functions._
        val rare = graft.queries.Dedup.rareShingles(s, d, materialized = true)
        rare.as("a").join(rare.as("b"), "shingle")
          .filter(col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
          .agg(count(lit(1)).as("w")).filter(col("w") >= 2)
          .select(col("d1"), col("d2")).transform(graft.Mat.checkpoint)
      }),
      "q100pairsU" -> ((s: SparkSession, d: String) => {
        import org.apache.spark.sql.functions._
        val rare = graft.queries.Dedup.rareShingles(s, d, materialized = false)
        rare.as("a").join(rare.as("b"), "shingle")
          .filter(col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
          .agg(count(lit(1)).as("w")).filter(col("w") >= 2)
          .select(col("d1"), col("d2")).transform(graft.Mat.checkpoint)
      }),
      "q100v0" -> graft.queries.Pipeline.q100 _,
      "q119v0" -> graft.queries.Pipeline.queries("q119_triangles"),
      "q43v0" -> (graft.queries.Dedup.q43 _),
      "q82v0" -> (graft.queries.Dedup.q82 _),
      // q96 as it was before r18 (per-row array_distinct, no spread) — the
      // code-shape A/B the conf lever can't express
      "q96old" -> ((spark: SparkSession, dir: String) => {
        import spark.implicits._
        val W = graft.queries.Dedup.WinLen
        val wins = Tables.documents(spark, dir)
          .select($"doc_id", expr("filter(split(text, ' '), x -> length(x) > 0)").as("w"))
          .filter(size($"w") >= W)
          .select($"doc_id", explode(expr(
            s"array_distinct(transform(sequence(1, size(w) - ${W - 1})," +
              s" i -> array_join(slice(w, i, $W), ' ')))")).as("win"))
        val flagged = wins.withColumn("ndocs", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy($"win")))
        flagged.groupBy($"doc_id")
          .agg(
            sum(when($"ndocs" >= 2, 1L).otherwise(0L)).as("dup_windows"),
            count(lit(1)).as("total_windows"))
          .filter($"dup_windows" > 0)
          .select($"doc_id", $"dup_windows", $"total_windows",
            round($"dup_windows".cast("double") / $"total_windows", 4).as("dup_ratio"))
          .orderBy($"doc_id")
      }))
  }

  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim)
    val reps = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", sys.env.getOrElse("SPARK_UI", "false"))
      .config("spark.graft.mat.multi-use",
        sys.env.getOrElse("SPARK_GRAFT_MAT_MULTI_USE", "cache"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String): Double = {
      System.gc()
      val t0 = System.nanoTime()
      val ok = try {
        variants(name)(spark, sfDir).write.format("noop").mode("overwrite").save(); true
      } catch { case e: Throwable => println(s"[probe] $name ERROR $e"); false }
      val dt = (System.nanoTime() - t0) / 1e9
      SparkEntry.releaseScratch(spark)
      if (ok) dt else -1.0
    }
    names.foreach(run) // warmup
    names.foreach { n =>
      val xs = (1 to reps).map(_ => run(n))
      val med = xs.sorted.apply(xs.length / 2)
      println(f"[probe] $n%-10s median=$med%.3f  samples=${xs.map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
