package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimization-round A/B harness (guide §1): times named experimental
  * variants of hot queries against the declared implementations, same
  * methodology as Bench (noop sink, warmup, median of N, gc + scratch sweep
  * between samples). NOT part of the driver contract; variants that win are
  * promoted into the declared query (after oracle re-verification) and
  * variants that lose are recorded in OPTIMIZATION_r19.md.
  *
  * Usage: jrun.sh graft.Probe <name1,name2,...> [reps]
  */
object Probe {

  // ------------------------------------------------------------ variants
  // Concluded experiments are recorded in OPTIMIZATION_r18.md /
  // OPTIMIZATION_r19.md with their measurements; only live ones stay here.

  /** Declared query with the narrow-scan spread forced ON/OFF — the
    * within-session A/B for every spreadIfNarrow call site. The conf is
    * only read while the DataFrame is CONSTRUCTED, so it is restored
    * immediately after (ADVICE r18: a leaked 'off' silently disabled the
    * spread for every later variant in the same Probe run). */
  private def spreadAB(name: String, on: Boolean)(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.graft.spread.narrow", if (on) "on" else "off")
    try SparkEntry.queries(name)(spark, dir)
    finally spark.conf.set("spark.graft.spread.narrow", "on")
  }

  /** The q43/q82/q100/q113/q119 shared shape: rare-shingle inverted index
    * self-joined into evidence-weighted candidate pairs, parameterized by
    * the df cap, the pair threshold, and the materialization/join strategy
    * under A/B test. `mat`: "none" (declared form — relies on runtime stage
    * reuse), "cache" (rare cached), "sh" (the distinct shingle stream
    * cached). `hint`: "" or "merge"(SMJ, the 100 TB-shaped join: a corpus-
    * sized build side could never broadcast anyway). */
  private def pairsVariant(dfCap: Long, minShared: Long, mat: String, hint: String)(
      spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh0 = graft.queries.Dedup.shingles(spark, dir)
    val sh = if (mat == "sh") sh0.transform(Mat.multiUse) else sh0
    val rare0 = sh.withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"shingle")))
      .filter($"df" <= dfCap).drop("df")
    val rare = if (mat == "cache") rare0.transform(Mat.multiUse) else rare0
    val b = if (hint == "merge") rare.as("b").hint("merge") else rare.as("b")
    rare.as("a").join(b, "shingle")
      .filter($"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .agg(count(lit(1)).as("c")).filter($"c" >= minShared)
      .select($"d1", $"d2")
  }

  /** Declared query with the Mat.multiUse strategy forced — the in-session
    * A/B for the lazy-cache-vs-checkpoint-vs-plain-recompute choice. */
  private def mmuAB(name: String, mode: String)(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.graft.mat.multi-use", mode)
    try SparkEntry.queries(name)(spark, dir)
    finally spark.conf.set("spark.graft.mat.multi-use",
      sys.env.getOrElse("SPARK_GRAFT_MAT_MULTI_USE", "none"))
  }

  val variants: Map[String, (SparkSession, String) => DataFrame] = {
    val ab = Seq("q73_pii_redact").flatMap { n =>
      val short = n.split("_")(0)
      Seq(s"${short}on" -> (spreadAB(n, on = true) _),
          s"${short}off" -> (spreadAB(n, on = false) _))
    }.toMap
    val mm = Seq("q95_bigram_lm", "q97_nb_langid", "q98_dsir_weights",
      "q99_tfidf_keywords", "q63_text_bm25", "q45_embed_neardup_lsh").flatMap { n =>
      val short = n.split("_")(0)
      Seq(s"${short}ca" -> (mmuAB(n, "cache") _),
          s"${short}nc" -> (mmuAB(n, "none") _))
    }.toMap
    ab ++ mm ++ Map(
      // ---- the rare-shingle pair build (noop-sunk through the pair agg)
      "pairs0"  -> (pairsVariant(10, 2, "none", "") _),       // declared shape
      "pairsM"  -> (pairsVariant(10, 2, "none", "merge") _),  // force SMJ
      "pairsC"  -> (pairsVariant(10, 2, "cache", "") _),      // cache rare
      "pairsCM" -> (pairsVariant(10, 2, "cache", "merge") _),
      "pairsS"  -> (pairsVariant(10, 2, "sh", "") _),         // cache shingles
      "pairsSM" -> (pairsVariant(10, 2, "sh", "merge") _),
      // ---- q43-shaped (cap 100, threshold 1) twin
      "p43v0"   -> (pairsVariant(100, 1, "none", "") _),
      "p43M"    -> (pairsVariant(100, 1, "none", "merge") _),
      "p43S"    -> (pairsVariant(100, 1, "sh", "") _),
      "p43SM"   -> (pairsVariant(100, 1, "sh", "merge") _),
      // ---- posting-list pair build: groupBy(shingle) collect_set, pairs
      // expanded inline from the ≤cap set — no window sort, no self-join.
      // The ObjectHashAggregate sort-fallback threshold is raised for the
      // probe (default 128 groups — the reason the r18 typed-agg probe
      // lost); memory stays bounded by cap doc-ids per live group.
      "pairsP" -> ((spark: SparkSession, dir: String) => {
        import spark.implicits._
        spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "8388608")
        val raw = Tables.documentsSpread(spark, dir)
          .select($"doc_id", split($"text", " ").as("w"))
          .filter(size($"w") >= 3)
          .select($"doc_id",
            explode(expr("transform(sequence(0, size(w) - 3), i -> array_join(slice(w, i + 1, 3), ' '))"))
              .as("shingle"))
        val posts = raw.groupBy($"shingle").agg(collect_set($"doc_id").as("ds"))
          .filter(size($"ds").between(2, 10))
          .select(sort_array($"ds").as("s"))
        posts.select(explode(expr(
            "flatten(transform(sequence(0, size(s) - 2), " +
            "i -> transform(slice(s, i + 2, size(s) - i - 1), x -> struct(s[i] AS d1, x AS d2))))"))
            .as("p"))
          .groupBy($"p.d1".as("d1"), $"p.d2".as("d2"))
          .agg(count(lit(1)).as("c")).filter($"c" >= 2)
          .select($"d1", $"d2")
      }),
      // ---- pipeline-stage breakdown for the pair build (guide §1.1)
      "shing" -> ((s: SparkSession, d: String) => graft.queries.Dedup.shingles(s, d)),
      "shingNS" -> ((s: SparkSession, d: String) => {
        // shingles WITHOUT the spreadByDoc exchange (single-task explode)
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id", split($"text", " ").as("w"))
          .filter(size($"w") >= 3)
          .select($"doc_id",
            explode(expr("transform(sequence(0, size(w) - 3), i -> array_join(slice(w, i + 1, 3), ' '))"))
              .as("shingle"))
          .distinct()
      }),
      "rareW" -> ((s: SparkSession, d: String) =>
        graft.queries.Dedup.rareShingles(s, d, materialized = false)),
      // ---- declared queries under test (full shapes)
      "q43v0"  -> (graft.queries.Dedup.q43 _),
      "q82v0"  -> (graft.queries.Dedup.q82 _),
      "q113v0" -> graft.queries.Curation.queries("q113_split_leakage"),
      "q100v0" -> (graft.queries.Pipeline.q100 _),
      "q119v0" -> graft.queries.Pipeline.queries("q119_triangles"),
      "q62v0"  -> graft.queries.Pipeline.queries("q62_dedup_clusters"),
      "q125v0" -> graft.queries.Pipeline.queries("q125_market_basket"),
      "q72v0"  -> graft.queries.Advanced.queries("q72_recursive_cte"),
      "q97v0"  -> graft.queries.TextAnalysis.queries("q97_nb_langid"),
      "q98v0"  -> graft.queries.Sampling.queries("q98_dsir_weights"),
      "q95v0"  -> graft.queries.TextAnalysis.queries("q95_bigram_lm"),
      // ---- q72: recursion over a locally-checkpointed narrow base —
      // each UnionLoop step re-reads a tiny in-memory column instead of
      // re-planning a parquet scan (the step is frontier-join-shaped, so
      // per-step constant costs dominate at any scale)
      "q72ck" -> ((spark: SparkSession, dir: String) => {
        import spark.implicits._
        Tables.documents(spark, dir).select($"doc_id")
          .transform(Mat.checkpoint).createOrReplaceTempView("q72_docs_ck")
        spark.sql("""
          WITH RECURSIVE tree AS (
            SELECT doc_id AS id, CAST(0 AS BIGINT) AS depth FROM q72_docs_ck WHERE doc_id = 0
            UNION ALL
            SELECT d.doc_id AS id, t.depth + 1 AS depth
            FROM q72_docs_ck d JOIN tree t ON (d.doc_id - 1) div 2 = t.id
            WHERE d.doc_id > 0)
          SELECT depth, count(*) AS n_nodes, min(id) AS min_id, max(id) AS max_id,
                 sum(id) AS sum_id
          FROM tree GROUP BY depth ORDER BY depth""")
      }),
      // ---- q62: fold the per-round changed-counter into the label update
      // (one checkpointed frame carries the flag; the count is a cheap scan
      // of materialized blocks) instead of a separate join+count job
      "q62v1" -> ((spark: SparkSession, dir: String) => {
        import spark.implicits._
        val pairs = graft.queries.Dedup.q41(spark, dir).select($"d1", $"d2")
          .transform(Mat.checkpoint)
        val edges = pairs.union(pairs.select($"d2".as("d1"), $"d1".as("d2")))
          .transform(Mat.checkpoint)
        var labels = edges.groupBy($"d1".as("id"))
          .agg(least(min($"d2"), first($"d1")).as("label")).transform(Mat.checkpoint)
        var changed = 1L
        var rounds = 0
        while (changed > 0 && rounds < 50) {
          val nbrMin = edges.join(labels.withColumnRenamed("id", "d2"), "d2")
            .groupBy($"d1".as("id")).agg(min($"label").as("nl"))
          val next = labels.join(nbrMin, Seq("id"), "left")
            .select($"id", least($"label", coalesce($"nl", $"label")).as("label"),
              ($"label" > coalesce($"nl", $"label")).cast("long").as("chg"))
            .transform(Mat.checkpoint)
          changed = next.agg(sum($"chg")).as[Long].head()
          Mat.release(labels)
          labels = next
          rounds += 1
        }
        Seq(pairs, edges).foreach(Mat.release)
        labels.select($"id".as("doc_id"), $"label".as("cluster_id")).orderBy($"doc_id")
      }),
      // ---- q73: spread the customer scan so the 3×regexp_replace +
      // 3×regexp_count projection parallelizes (currently single scan task)
      "q73sp" -> ((spark: SparkSession, dir: String) => {
        import spark.implicits._
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val ssnRe   = "\\d{3}-\\d{2}-\\d{4}"
        val phoneRe = "\\+1-555-\\d{4}"
        Tables.spreadIfNarrow(Tables.customer(spark, dir), $"c_custkey")
          .withColumn("raw", concat(
            $"c_name", lit(" <"),
            lower(regexp_replace($"c_name", "[^A-Za-z0-9]", ".")), lit("@example.com> ssn "),
            lpad(($"c_custkey" % 1000).cast("string"), 3, "0"), lit("-"),
            lpad((($"c_custkey" * 7) % 100).cast("string"), 2, "0"), lit("-"),
            lpad((($"c_custkey" * 13) % 10000).cast("string"), 4, "0"),
            lit(" phone +1-555-"), lpad(($"c_custkey" % 10000).cast("string"), 4, "0")))
          .select($"c_custkey",
            regexp_replace(regexp_replace(regexp_replace($"raw",
              emailRe, "<EMAIL>"), ssnRe, "<SSN>"), phoneRe, "<PHONE>").as("clean"),
            regexp_count($"raw", lit(emailRe)).cast("long").as("n_emails"),
            regexp_count($"raw", lit(ssnRe)).cast("long").as("n_ssn"),
            regexp_count($"raw", lit(phoneRe)).cast("long").as("n_phone"))
          .orderBy($"c_custkey")
      }),
      // ---- q124: tokenize ONCE — per-(doc,tok) counts cached, vocab and
      // the per-doc OOV rollup both derive from the count table (today the
      // token explode runs twice: once for vocab, once for the join)
      "q124v0" -> graft.queries.TextAnalysis.queries("q124_oov_rate"),
      "q124v1" -> ((spark: SparkSession, dir: String) => {
        import spark.implicits._
        val dtf = Tables.documentsSpread(spark, dir)
          .select($"doc_id", explode(split($"text", " ")).as("tok"))
          .filter(length($"tok") > 0)
          .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("c"))
          .transform(Mat.multiUse)
        val vocab = dtf.groupBy($"tok").agg(sum($"c").as("tf"))
          .orderBy($"tf".desc, $"tok").limit(50)
          .select($"tok".as("vtok"))
        dtf.join(broadcast(vocab), $"tok" === $"vtok", "left")
          .groupBy($"doc_id")
          .agg(sum($"c").as("n_tokens"),
            sum(when($"vtok".isNull, $"c").otherwise(0L)).as("n_oov"))
          .select($"doc_id", $"n_tokens", $"n_oov",
            round($"n_oov".cast("double") / $"n_tokens", 6).as("oov_rate"))
          .orderBy($"doc_id")
      }),
      // ---- q95: model-first join (fold c1 into the bigram model BEFORE
      // the wide join, so the doc stream joins once) — r18 leftover
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
          .transform(Mat.multiUse)
        val corpusBg = docBg.groupBy($"w1", $"w2").agg(sum($"c").as("c12"))
        val corpusUni = corpusBg.groupBy($"w1").agg(sum($"c12").as("c1"))
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
      // ---- q126: one 9-way explode of (dx, dy) pairs instead of two
      // nested 3-way explodes (the intermediate Generate copies every row
      // ×3 before the second ×3)
      "q126v0" -> graft.queries.Similarity.queries("q126_grid_neighbors"),
      "q126v1" -> ((spark: SparkSession, dir: String) => {
        import spark.implicits._
        val eps = 0.5
        val cells = Tables.spreadIfNarrow(
          Tables.events(spark, dir).select($"event_id"), $"event_id").select(
          $"event_id",
          ((($"event_id" * 48271L) % 100003L * 69621L) % 99991L).cast("double")
            ./(lit(1000.0)).as("x"),
          ((($"event_id" * 69621L) % 99991L * 48271L) % 100003L).cast("double")
            ./(lit(1000.0)).as("y"))
          .withColumn("cx", floor($"x" / eps).cast("long"))
          .withColumn("cy", floor($"y" / eps).cast("long"))
        val probes = cells
          .select($"event_id".as("id_a"), $"x".as("xa"), $"y".as("ya"), $"cx", $"cy",
            explode(expr(
              "transform(flatten(transform(array(-1L, 0L, 1L), " +
              "dx -> transform(array(-1L, 0L, 1L), dy -> struct(dx, dy)))), p -> p)")).as("d"))
          .select($"id_a", $"xa", $"ya",
            ($"cx" + $"d.dx").as("pcx"), ($"cy" + $"d.dy").as("pcy"))
        probes
          .join(cells, probes("pcx") === cells("cx") && probes("pcy") === cells("cy") &&
            probes("id_a") =!= cells("event_id") &&
            (probes("xa") - cells("x")) * (probes("xa") - cells("x")) +
              (probes("ya") - cells("y")) * (probes("ya") - cells("y")) <= eps * eps)
          .groupBy($"id_a", $"xa", $"ya")
          .agg(count(lit(1)).as("nbrs"))
          .select($"id_a".as("event_id"), $"xa".as("x"), $"ya".as("y"), $"nbrs")
          .orderBy($"event_id")
      }),
      // ---- q100: drop the ewd pre-repartition (pr broadcasts per
      // superstep under AQE, so hash-partitioning the cached edge table by
      // src buys nothing a broadcast probe can use)
      "q100v1" -> ((spark: SparkSession, dir: String) => {
        import spark.implicits._
        val PrScale = 1000000000000L
        val rare = graft.queries.Dedup.rareShingles(spark, dir, materialized = false)
        val pairs = rare.as("a").join(rare.as("b"), "shingle")
          .filter($"a.doc_id" < $"b.doc_id")
          .groupBy($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
          .agg(count(lit(1)).as("w")).filter($"w" >= 2)
          .select($"d1", $"d2").transform(Mat.checkpoint)
        val edges = pairs.union(pairs.select($"d2".as("d1"), $"d1".as("d2")))
          .toDF("src", "dst")
        val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg")).cache()
        val ewd = edges.join(deg, "src").cache()
        val n = deg.count()
        val base = PrScale * 15L / 100L / n
        var pr = deg.select($"src".as("node"), lit(PrScale / n).as("pr"))
        for (it <- 1 to 3) {
          pr = ewd.join(pr, ewd("src") === pr("node"))
            .select($"dst", expr("pr div deg").as("contrib"))
            .groupBy($"dst")
            .agg((lit(base) + expr("sum(contrib) * 85 div 100")).as("pr"))
            .select($"dst".as("node"), $"pr")
          if (it % 3 == 0 || it == 3) pr = pr.transform(Mat.checkpoint)
        }
        Seq(deg, ewd).foreach(_.unpersist())
        pr.select($"node".as("doc_id"), $"pr".as("pr_scaled")).orderBy($"doc_id")
      }),
      // ---- q97: vocab derived from cw (rides cw's exchange, saving one
      // full tokenize pass under the no-cache default)
      "q97v2" -> ((spark: SparkSession, dir: String) => {
        import spark.implicits._
        val toks = Tables.documentsSpread(spark, dir)
          .select($"doc_id", $"lang",
            explode(expr("filter(split(text, ' '), x -> length(x) > 0)")).as("word"))
        val dw = toks.groupBy($"doc_id", $"lang", $"word")
          .agg(count(lit(1)).as("c")).transform(Mat.multiUse)
        val cw = dw.groupBy($"lang".as("cls"), $"word")
          .agg(sum($"c").as("cw"))
        val ct = cw.groupBy($"cls").agg(sum($"cw").as("ctot"))
        val vocab = cw.select($"word").distinct().agg(count(lit(1)).as("v"))
        val docs = Tables.documents(spark, dir)
        val pri = docs.groupBy($"lang".as("cls")).agg(count(lit(1)).as("nd"))
        val n = docs.agg(count(lit(1)).as("n"))
        val cls = ct.join(pri, "cls").crossJoin(vocab).crossJoin(n)
          .select($"cls", $"ctot", $"v", log($"nd".cast("double") / $"n").as("prior_ln"))
        val cand = dw.crossJoin(broadcast(cls))
          .join(cw, Seq("cls", "word"), "left")
          .select($"doc_id", $"lang", $"cls", $"prior_ln",
            ($"c" * (log(coalesce($"cw", lit(0L)) + 1) - log($"ctot" + $"v")))
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
      // ---- q98: ONE fused bucket aggregate feeds target, raw AND totals
      // (three separate db aggregations today = three tokenize passes
      // under the no-cache default; the fused g is ≤1024 rows)
      "q98v1" -> ((spark: SparkSession, dir: String) => {
        import spark.implicits._
        val DsirBuckets = 1024L
        val toks = Tables.documentsSpread(spark, dir)
          .select($"doc_id", $"lang",
            expr("filter(split(text, ' '), x -> length(x) > 0)").as("w"))
          .filter(size($"w") >= 2)
        val bg = toks.select($"doc_id", $"lang", explode(expr(
            "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1), (a, b) -> concat(a, ' ', b))"))
            .as("bgm"))
          .select($"doc_id", $"lang",
            (conv(substring(md5($"bgm".cast("binary")), 1, 4), 16, 10).cast("long") % DsirBuckets).as("b"))
        val db = bg.groupBy($"doc_id", $"lang", $"b").agg(count(lit(1)).as("c"))
          .transform(Mat.multiUse)
        val g = db.groupBy($"b").agg(
          sum(when($"lang" === "en", $"c").otherwise(0L)).as("ct"),
          sum($"c").as("cr"))
        val tot = g.agg(sum($"ct").as("nt"), sum($"cr").as("nr"))
        val model = g.crossJoin(tot)
          .select($"b",
            (log(($"ct" + 1).cast("double") / ($"nt" + DsirBuckets)) -
              log(($"cr" + 1).cast("double") / ($"nr" + DsirBuckets))).as("lr"))
        db.join(broadcast(model), "b")
          .groupBy($"doc_id", $"lang")
          .agg(
            round(sum(($"c" * $"lr").cast("decimal(28,12)")).cast("double") / sum($"c"), 4)
              .as("dsir_logw"),
            sum($"c").as("n_bigrams"))
          .orderBy($"doc_id")
      }),
      // ---- q125: basket table cached across its four consumers
      "q125ca" -> ((spark: SparkSession, dir: String) => {
        import spark.implicits._
        val ob = Tables.spreadIfNarrow(Tables.lineitem(spark, dir)
            .select($"l_orderkey", $"l_partkey"), $"l_orderkey")
          .join(broadcast(Tables.part(spark, dir)), $"l_partkey" === $"p_partkey")
          .select($"l_orderkey".as("okey"), $"p_brand".as("brand"))
          .distinct().transform(Mat.multiUse)
        val n = ob.agg(countDistinct($"okey").as("n_orders"))
        val bc = ob.groupBy($"brand").agg(count(lit(1)).as("cnt"))
        val pairs = ob.as("a")
          .join(ob.as("b"), $"a.okey" === $"b.okey" && $"a.brand" < $"b.brand")
          .groupBy($"a.brand".as("brand_a"), $"b.brand".as("brand_b"))
          .agg(count(lit(1)).as("co"))
        pairs
          .join(broadcast(bc.select($"brand".as("brand_a"), $"cnt".as("cnt_a"))), "brand_a")
          .join(broadcast(bc.select($"brand".as("brand_b"), $"cnt".as("cnt_b"))), "brand_b")
          .crossJoin(broadcast(n))
          .filter($"co".cast("double") / $"n_orders" >= 0.015)
          .select($"brand_a", $"brand_b", $"co",
            round($"co".cast("double") / $"n_orders", 6).as("support"),
            round($"co".cast("double") / $"cnt_a", 6).as("confidence"),
            round($"co".cast("double") * $"n_orders" / ($"cnt_a".cast("double") * $"cnt_b"), 6)
              .as("lift"))
          .orderBy($"brand_a", $"brand_b")
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
        sys.env.getOrElse("SPARK_GRAFT_MAT_MULTI_USE", "none"))
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
