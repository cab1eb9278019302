package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Mat
import graft.Tables._

/** Training-data deduplication operators over `documents` (north-star surface;
  * SURVEY.md §2.10 / §7 phase C): exact, MinHash+LSH banded near-dup,
  * SimHash fingerprints, and n-gram Jaccard via an inverted-index join.
  *
  * Every hash is md5 (identical bytes in Spark and DuckDB), so the oracle
  * verifies the *same* signature/bucket computation — not just row counts.
  *
  * 100 TB discipline: there is no all-pairs comparison anywhere. Candidate
  * generation is always a key-equality shuffle join (LSH bucket or shared
  * shingle), so cost scales with Σ bucket² over colliding docs, not n².
  * At production scale the shared-shingle join (q43) additionally wants
  * prefix filtering / hot-shingle salting — noted inline.
  */
object Dedup {

  /** Distinct 3-word shingles per document: (doc_id, shingle). The
    * post-explode DISTINCT partial-aggregates map-side, so consumers that
    * immediately re-aggregate (q41's signature groupBy, q49's fingerprint
    * groupBy) pay almost nothing extra for it — measured FASTER than the
    * [[shinglesN]] per-row array_distinct for those shapes. */
  private[graft] def shingles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir)
      .select($"doc_id", split($"text", " ").as("w"))
      .filter(size($"w") >= 3)
      // Parallelism normalizer for few-split inputs: the shingle explode +
      // per-shingle hashing is the pipeline's CPU hot loop, and a corpus
      // that arrives as a handful of parquet row groups would otherwise run
      // it on a handful of tasks. The shuffled bytes are the raw projected
      // text — ~1/3 of the exploded-shingle volume the distinct() below
      // shuffles anyway — so this costs little at any scale and also spreads
      // skewed long documents. (spreadByDoc pins the partition count so AQE
      // can't coalesce the spread away.)
      .transform(graft.Tables.spreadByDoc)
      .select($"doc_id",
        explode(expr("transform(sequence(0, size(w) - 3), i -> array_join(slice(w, i + 1, 3), ' '))"))
          .as("shingle"))
      .distinct()
  }

  // NOTE (r18 optimization round): the per-row `array_distinct` + size
  // helper that used to live here (`shinglesN`) was REMOVED after
  // re-measurement at sf0.1/local[32]: Spark's ArrayDistinct compares
  // string elements pairwise — O(k²) per document — and the "distinctness
  // without a shuffle" it bought cost 2.36 s where [[shingles]]'s
  // post-explode DISTINCT (partial-aggregating, one narrow exchange) costs
  // 0.48 s; the per-doc-count-riding prefilters it enabled in q43/q82 are
  // implied by those queries' final thresholds anyway (see q43/q82 notes).
  // At 100 TB the quadratic per-row scan only gets worse (long documents),
  // so the aggregate form wins at every scale.

  private[queries] val shinglesSql: String =
    """SELECT DISTINCT doc_id, w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS shingle
      |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      |CROSS JOIN UNNEST(range(greatest(len(w) - 2, 0))) AS t(i)""".stripMargin

  /** RARE shingles — document frequency ≤ [[RareDfCap]] — the inverted-index
    * candidate relation both q100 (PageRank similarity graph) and q113
    * (split-leakage audit) self-join on. The df-cap is what bounds the
    * self-join fanout (never all-pairs; the RefinedWeb stop-shingle rule).
    *
    * ONE helper, TWO plan shapes. r18: BOTH remaining callers (q100, q113)
    * now use `materialized = false` — the count-over-shingle window whose
    * hash(shingle) exchange the pair self-join reuses (ReuseExchange).
    * The materialized groupBy+join+localCheckpoint form was re-measured
    * after the r18 shingle-base change and LOST (1.83 s vs 1.19 s through
    * the pair build at sf0.1): q100's `pairs` checkpoint immediately
    * downstream is already the durable multi-consumer barrier, so a second
    * materialization here bought nothing. The materialized branch is kept
    * (DedupSpec pins both forms agree) for consumers that need a DURABLE
    * rare-shingle relation itself — none of the declared queries today. */
  private[graft] val RareDfCap = 10

  private[graft] def rareShingles(
      spark: SparkSession, dir: String, materialized: Boolean): DataFrame = {
    import spark.implicits._
    val sh = shingles(spark, dir)
    if (materialized) {
      val df_ = sh.groupBy($"shingle").agg(count(lit(1)).as("df"))
        .filter($"df" <= RareDfCap).select($"shingle")
      sh.join(df_, Seq("shingle")).transform(Mat.checkpoint)
    } else {
      sh.withColumn("df", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy($"shingle")))
        .filter($"df" <= RareDfCap).drop("df")
    }
  }

  /** Oracle twin of [[rareShingles]] (window form — DuckDB has no cache
    * semantics to trade against). Kept next to [[shinglesSql]] so the df-cap
    * can never drift between engines or between q100/q113. */
  private[queries] val rareShinglesSql: String =
    s"""SELECT doc_id, shingle FROM
       |         (SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df FROM sh)
       |         WHERE df <= $RareDfCap""".stripMargin

  // ---------------------------------------------------------------- q40
  /** Exact dedup: hash-groupBy on content — one representative (min doc_id)
    * per distinct text. Partial→final HashAggregate; the md5 keeps the
    * compared column narrow. */
  def q40(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir)
      .groupBy(md5($"text".cast("binary")).as("text_hash"))
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select($"keep_id", $"n_copies", $"text_hash")
      .orderBy($"keep_id")
  }

  val q40Sql: String =
    """SELECT min(doc_id) AS keep_id, COUNT(*) AS n_copies, md5(text) AS text_hash
      |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin

  // ---------------------------------------------------------------- q41
  /** MinHash + LSH near-dup candidates: 12 min-hash signatures (min of
    * md5(seed|shingle) — a min-wise family), banded r=4 × b=3; docs sharing
    * any band bucket are candidates. Bucket join = key shuffle, never n². */
  def q41(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = shingles(spark, dir)
    // one-pass sketch: the TypedImperativeAggregate keeps all 12 salted-md5
    // minima per doc in a single traversal (map-side combinable) instead of
    // exploding every shingle 12× — same hash family, same answer
    // (graft.functions.MinHashSignature; SURVEY.md §2.10)
    val sig = sh.groupBy($"doc_id")
      .agg(graft.functions.MinHashSignature($"shingle", 12).as("sigs"))
      .select($"doc_id", posexplode($"sigs").as(Seq("i", "s")))
    // localCheckpoint: the band table is TINY (docs x 3 rows), so AQE plans
    // the self-join as a BROADCAST join — and a broadcast side shares no
    // exchange with the probe side, so without durable materialization the
    // whole shingle->signature pipeline runs once per side (measured
    // 0.6 -> 1.0 s uncached at sf0.1; the ReuseExchange dedup that makes
    // q43/q82's SHUFFLE self-joins safely uncached does not fire here).
    // Checkpoint, not cache: same single-computation win, but lineage
    // truncation also removes the eviction-recompute hazard (q100 rule)
    val band = sig.groupBy($"doc_id", expr("i div 4").as("b"))
      .agg(expr("md5(cast(array_join(transform(array_sort(collect_list(struct(i, s))), x -> x.s), '') as binary))")
        .as("bucket"))
      .transform(Mat.checkpoint)
    band.as("a").join(band.as("c"),
        $"a.b" === $"c.b" && $"a.bucket" === $"c.bucket" && $"a.doc_id" < $"c.doc_id")
      .select($"a.doc_id".as("d1"), $"c.doc_id".as("d2"))
      .distinct()
      .orderBy($"d1", $"d2")
  }

  val q41Sql: String =
    s"""WITH sh AS ($shinglesSql),
       |sig AS (SELECT doc_id, i, min(md5(i::VARCHAR || '|' || shingle)) AS s
       |        FROM sh CROSS JOIN UNNEST(range(12)) AS r(i) GROUP BY doc_id, i),
       |band AS (SELECT doc_id, i // 4 AS b, md5(string_agg(s, '' ORDER BY i)) AS bucket
       |         FROM sig GROUP BY doc_id, i // 4)
       |SELECT DISTINCT a.doc_id AS d1, c.doc_id AS d2
       |FROM band a JOIN band c ON a.b = c.b AND a.bucket = c.bucket AND a.doc_id < c.doc_id
       |ORDER BY d1, d2""".stripMargin

  // ---------------------------------------------------------------- q42
  /** SimHash: 16-bit fingerprint from the high bit of each md5 hex digit of
    * every token, summed ±1 — identical docs get identical fingerprints,
    * near-identical docs differ in few bits (Hamming). Pure groupBy+sum.
    *
    * Bit extraction is integer arithmetic, not string matching: the first
    * 16 hex digits parse into two 32-bit words (conv once per half), and
    * "high bit of digit j" is a shift+mask — 2 parses + 16 shifts per token
    * instead of 16 substring×8-way IN comparisons. Same semantics, same
    * oracle (DuckDB keeps the readable CASE form — the driver compares
    * RESULTS, not expressions). */
  def q42(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // spreadIfNarrow (guide §2.5): the per-token md5 + conv otherwise run
    // inside the single-task scan stage; the groupBy(doc_id) below reuses
    // the spread's hash(doc_id) partitioning — no extra exchange
    val words = spreadIfNarrow(
        documents(spark, dir).select($"doc_id", $"text"), $"doc_id")
      .select($"doc_id", explode(split($"text", " ")).as("wd"))
      .filter(length($"wd") > 0)
      .withColumn("h", md5($"wd".cast("binary")))
      // digits 1-8 / 9-16 as two unsigned 32-bit values (each fits a long)
      .withColumn("v1", conv(substring($"h", 1, 8), 16, 10).cast("long"))
      .withColumn("v2", conv(substring($"h", 9, 8), 16, 10).cast("long"))
    // hex digit j occupies bits (35-4j)..(32-4j) of its word; its high bit
    // sits at 35-4j — shift, mask, map {1,0} -> {+1,-1} via 2*bit-1
    def bit(v: Column, j: Int): Column =
      shiftrightunsigned(v, 35 - 4 * j).bitwiseAND(lit(1L)) * 2 - 1
    val sums = (1 to 16).map { j =>
      val b = if (j <= 8) bit($"v1", j) else bit($"v2", j - 8)
      sum(b).as(s"b$j")
    }
    words.groupBy($"doc_id")
      .agg(sums.head, sums.tail: _*)
      .select($"doc_id",
        concat((1 to 16).map(j => when(col(s"b$j") > 0, lit("1")).otherwise(lit("0"))): _*).as("simhash"))
      .orderBy($"doc_id")
  }

  val q42Sql: String = {
    val bits = (1 to 16).map { j =>
      s"""CASE WHEN sum(CASE WHEN substr(md5(wd), $j, 1) IN ('8','9','a','b','c','d','e','f')
         | THEN 1 ELSE -1 END) > 0 THEN '1' ELSE '0' END""".stripMargin.replaceAll("\n", "")
    }.mkString(", ")
    s"""SELECT doc_id, concat($bits) AS simhash
       |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS wd FROM documents)
       |WHERE length(wd) > 0
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q43
  /** Max docs a shingle may appear in before the inverted index drops it: a
    * stop-shingle shared by f docs contributes f²/2 candidate pairs and ~no
    * Jaccard signal, so without this cap one hot 3-gram across 10⁶ docs
    * would explode the self-join to 10¹² pairs. Sizes (the union term) stay
    * exact — only the hot shingles' intersection contribution is forfeited,
    * the standard prefix-filtering trade. */
  private[graft] val HotShingleCap = 100L

  /** N-gram Jaccard near-dup: inverted-index join on shared shingles (docs
    * sharing >=1 rare shingle), then |A∩B| / |A∪B| >= 0.4. The shape —
    * shuffle on shingle, aggregate on pair, hot keys capped — is the one
    * that survives 100 TB; join cost is Σ_shingle df² with df <= the cap. */
  def q43(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // r18: [[shingles]] base (post-explode partial-aggregating DISTINCT),
    // not the removed per-row array_distinct form — measured 3.65 s →
    // 1.88 s at sf0.1/local[32] for the whole query; ArrayDistinct's
    // pairwise string scan was the hot loop, not the join. Per-doc sizes
    // become one narrow aggregate of the SAME distinct stream, joined onto
    // the pair AGGREGATE (hundreds of rows), not the candidate stream. The
    // old size-ratio prefilter is dropped as redundant: c ≤ min(n1,n2)
    // gives J ≤ min/max, so the final jaccard ≥ 0.4 filter implies
    // min·10 ≥ max·4 — same output, proven against the oracle.
    //
    // inverted-index frequency cap: drop stop-shingles before the self-join.
    // A count-over-shingle window (not groupBy+join) computes the frequency
    // in the SAME hash(shingle) shuffle the self-join needs — the window's
    // output partitioning satisfies the join requirement, so the cap adds
    // zero extra exchanges. NOT materialized: the self-join's sides are
    // identical subplans over that one exchange, so ReuseExchange tokenizes
    // once (measured equal to cached AND to localCheckpoint'd at sf0.1,
    // r15) — and with no cache there is no eviction-recompute hazard and
    // no checkpoint write; the q100 materialization rule applies only when
    // a relation feeds DIFFERENT downstream plans, not a self-join.
    val sh = shingles(spark, dir)
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val rare = sh
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"shingle")))
      .filter($"df" <= HotShingleCap).drop("df")
    rare.as("a").join(rare.as("b"), "shingle")
      .filter($"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .agg(count(lit(1)).as("c"))
      .join(sizes.toDF("d1", "n1"), "d1")
      .join(sizes.toDF("d2", "n2"), "d2")
      .withColumn("jaccard", round($"c".cast("double") / ($"n1" + $"n2" - $"c"), 4))
      .filter($"jaccard" >= 0.4)
      .select($"d1", $"d2", $"jaccard")
      .orderBy($"d1", $"d2")
  }

  val q43Sql: String =
    s"""WITH sh AS ($shinglesSql),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |rare AS (SELECT doc_id, shingle FROM
       |         (SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df FROM sh)
       |         WHERE df <= $HotShingleCap),
       |shared AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
       |           FROM rare a JOIN rare b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT d1, d2, round(c::DOUBLE / (s1.n + s2.n - c), 4) AS jaccard
       |FROM shared JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
       |WHERE round(c::DOUBLE / (s1.n + s2.n - c), 4) >= 0.4
       |ORDER BY d1, d2""".stripMargin

  // ---------------------------------------------------------------- q67
  /** SimHash NEAR-DUP PAIRS: q42 stops at fingerprints; the dedup decision
    * needs the pairs within Hamming distance ≤ 3. 64-bit SimHash (two
    * 32-bit halves — no sign-bit overflow, exact oracle math) banded into
    * 4×16 bits: by pigeonhole, any pair with ham ≤ 3 shares at least one
    * band, so candidate generation is a band-equality shuffle join — never
    * all-pairs — and the exact `bit_count(xor)` check runs only on
    * colliding docs. The 64 per-bit conditional sums are one map-side-
    * combinable aggregate over the token scan. */
  def q67(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // spreadIfNarrow: the q42 rationale — per-token md5/conv parallelize,
    // groupBy(doc_id) reuses the partitioning
    val words = spreadIfNarrow(
        documents(spark, dir).select($"doc_id", $"text"), $"doc_id")
      .select($"doc_id", explode(split($"text", " ")).as("wd"))
      .filter(length($"wd") > 0)
      .withColumn("h", md5($"wd".cast("binary")))
      .withColumn("v_hi", conv(substring($"h", 1, 8), 16, 10).cast("long"))
      .withColumn("v_lo", conv(substring($"h", 9, 8), 16, 10).cast("long"))
    def bitSums(v: Column): Seq[Column] = (0 until 32).map { p =>
      sum(shiftrightunsigned(v, p).bitwiseAND(lit(1L)) * 2 - 1)
    }
    def packed(half: String): Column = (0 until 32).map { p =>
      when(col(s"${half}_$p") > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    val aggs = bitSums($"v_hi").zipWithIndex.map { case (c, p) => c.as(s"hi_$p") } ++
               bitSums($"v_lo").zipWithIndex.map { case (c, p) => c.as(s"lo_$p") }
    val fps = words.groupBy($"doc_id")
      .agg(aggs.head, aggs.tail: _*)
      .select($"doc_id", packed("hi").as("f_hi"), packed("lo").as("f_lo"))
    val band = fps.select($"doc_id", $"f_hi", $"f_lo",
        posexplode(array(
          shiftrightunsigned($"f_hi", 16).bitwiseAND(lit(65535L)),
          $"f_hi".bitwiseAND(lit(65535L)),
          shiftrightunsigned($"f_lo", 16).bitwiseAND(lit(65535L)),
          $"f_lo".bitwiseAND(lit(65535L)))).as(Seq("i", "v")))
      // localCheckpoint (q41 rule): tiny band table -> AQE broadcasts the
      // self-join, whose sides share no exchange — materialize the
      // fingerprint pipeline once, durably
      .transform(Mat.checkpoint)
    band.as("a").join(band.as("b"),
        $"a.i" === $"b.i" && $"a.v" === $"b.v" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"),
        (bit_count($"a.f_hi".bitwiseXOR($"b.f_hi")) +
         bit_count($"a.f_lo".bitwiseXOR($"b.f_lo"))).cast("long").as("ham"))
      .filter($"ham" <= 3)
      .distinct()
      .orderBy($"d1", $"d2")
  }

  val q67Sql: String = {
    def half(col: String): String = (0 until 32).map { p =>
      s"(CASE WHEN sum((($col >> $p) & 1) * 2 - 1) > 0 THEN 1 ELSE 0 END) * ${1L << p}::BIGINT"
    }.mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS wd FROM documents),
       |h AS (SELECT doc_id,
       |        ('0x' || substr(md5(wd), 1, 8))::BIGINT AS v_hi,
       |        ('0x' || substr(md5(wd), 9, 8))::BIGINT AS v_lo
       |      FROM tok WHERE length(wd) > 0),
       |fps AS (SELECT doc_id, (${half("v_hi")}) AS f_hi, (${half("v_lo")}) AS f_lo
       |        FROM h GROUP BY doc_id),
       |band AS (SELECT doc_id, f_hi, f_lo, i,
       |                CASE i WHEN 0 THEN (f_hi >> 16) & 65535 WHEN 1 THEN f_hi & 65535
       |                       WHEN 2 THEN (f_lo >> 16) & 65535 ELSE f_lo & 65535 END AS v
       |         FROM fps CROSS JOIN UNNEST([0,1,2,3]) AS t(i))
       |SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
       |       (bit_count(xor(a.f_hi, b.f_hi)) + bit_count(xor(a.f_lo, b.f_lo)))::BIGINT AS ham
       |FROM band a JOIN band b ON a.i = b.i AND a.v = b.v AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.f_hi, b.f_hi)) + bit_count(xor(a.f_lo, b.f_lo)) <= 3
       |ORDER BY d1, d2""".stripMargin
  }

  // ---------------------------------------------------------------- q82
  /** Prefix length for the exact edit-distance check: levenshtein is
    * O(len²) per pair, so production pipelines verify on a bounded prefix
    * (near-dups diverge early; a 400-char window catches boilerplate +
    * template dups without quadratic blowup on long docs). */
  private val EditPrefix = 400

  /** COUNT FILTERING for the edit-distance verifier: a pair is a candidate
    * only if it shares at least this many rare shingles. One shared shingle
    * admits ~n·df/2 incidental pairs (1.1M at sf0.1 — each then paying an
    * O(len²) exact check); genuine near-dups share MOST of their shingles,
    * so a small absolute floor cuts candidates by ~4000× while keeping
    * every pair that could clear the 0.8 similarity bar. */
  private val MinSharedShingles = 5

  /** Edit-distance VERIFIED near-dup (the RefinedWeb/CCNet two-stage
    * pattern): cheap candidate generation first — docs sharing ≥
    * [[MinSharedShingles]] rare shingles, the q43 inverted-index join with
    * count filtering on the pair aggregate the join's shuffle already pays
    * — then the expensive exact check (levenshtein similarity ≥ 0.8) runs
    * ONLY on surviving candidates. At 100 TB the candidate join is a
    * key-equality shuffle bounded by the hot-shingle cap; the O(len²) edit
    * distance never sees a non-candidate pair, and texts join back to pairs
    * by doc id (broadcast-or-shuffle by stats), never carried through the
    * shingle explosion. */
  def q82(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // r18: [[shingles]] base, not the removed per-row array_distinct form
    // (measured 3.81 s → 1.83 s at sf0.1/local[32] — the q43 finding). The
    // old least(n) ≥ threshold prefilter is dropped as redundant: c ≤
    // min(n1, n2), so the HAVING c ≥ MinSharedShingles below already
    // implies it — same output, proven against the oracle, and n no longer
    // needs to ride the exploded stream at all.
    val sh = shingles(spark, dir)
    // deliberately NOT materialized (measured 2.8 s -> 3.3 s with a
    // localCheckpoint here): the self-join's two sides are identical
    // subplans over the same hash(shingle) exchange, so ReuseExchange
    // tokenizes ONCE and the checkpoint write would be pure overhead —
    // the q43 cache-vs-recompute hazard doesn't apply to this shape
    val rare = sh
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"shingle")))
      .filter($"df" <= HotShingleCap).drop("df")
    val cand = rare.as("a").join(rare.as("b"), "shingle")
      .filter($"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .agg(count(lit(1)).as("c"))
      .filter($"c" >= MinSharedShingles)
      .select($"d1", $"d2")
    val t = documents(spark, dir)
      .select($"doc_id", substring($"text", 1, EditPrefix).as("t"))
    cand
      .join(t.toDF("d1", "t1"), "d1")
      .join(t.toDF("d2", "t2"), "d2")
      .withColumn("edit_sim", round(
        lit(1.0) - levenshtein($"t1", $"t2").cast("double") /
          greatest(length($"t1"), length($"t2")), 4))
      .filter($"edit_sim" >= 0.8)
      .select($"d1", $"d2", $"edit_sim")
      .orderBy($"d1", $"d2")
  }

  val q82Sql: String =
    s"""WITH sh AS ($shinglesSql),
       |rare AS (SELECT doc_id, shingle FROM
       |         (SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df FROM sh)
       |         WHERE df <= $HotShingleCap),
       |cand AS (SELECT a.doc_id AS d1, b.doc_id AS d2
       |         FROM rare a JOIN rare b USING (shingle) WHERE a.doc_id < b.doc_id
       |         GROUP BY 1, 2 HAVING COUNT(*) >= $MinSharedShingles),
       |t AS (SELECT doc_id, substr(text, 1, $EditPrefix) AS t FROM documents)
       |SELECT d1, d2,
       |       round(1.0 - levenshtein(t1.t, t2.t)::DOUBLE / greatest(len(t1.t), len(t2.t)), 4) AS edit_sim
       |FROM cand JOIN t t1 ON d1 = t1.doc_id JOIN t t2 ON d2 = t2.doc_id
       |WHERE round(1.0 - levenshtein(t1.t, t2.t)::DOUBLE / greatest(len(t1.t), len(t2.t)), 4) >= 0.8
       |ORDER BY d1, d2""".stripMargin

  // ---------------------------------------------------------------- q85
  /** Boilerplate prefix clusters (CCNet/RefinedWeb-style header dedup):
    * documents sharing a whitespace-normalized 50-char prefix are one
    * boilerplate family — the signal behind "strip the repeated site
    * header before near-dup". Hash-groupBy on the md5 of the normalized
    * prefix: partial→final aggregate, shuffle key is 16 bytes per doc
    * regardless of document size. */
  def q85(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir)
      .select($"doc_id", $"source",
        md5(regexp_replace(lower(substring($"text", 1, 50)), "\\s+", " ")
          .cast("binary")).as("prefix_hash"))
      .groupBy($"prefix_hash")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"source").as("n_sources"),
        min($"doc_id").as("first_doc"))
      .filter($"n_docs" > 1)
      .orderBy($"first_doc")
  }

  val q85Sql: String =
    """SELECT md5(regexp_replace(lower(substr(text, 1, 50)), '\s+', ' ', 'g')) AS prefix_hash,
      |       COUNT(*) AS n_docs, COUNT(DISTINCT source) AS n_sources,
      |       min(doc_id) AS first_doc
      |FROM documents
      |GROUP BY 1 HAVING COUNT(*) > 1
      |ORDER BY first_doc""".stripMargin

  // ---------------------------------------------------------------- q86
  /** Cross-source duplication audit: for every pair of sources, how many
    * boilerplate prefixes they share — the contamination matrix a corpus
    * curator reads before mixing crawls (a hot pair means one crawl
    * re-scraped the other). Inverted-index shape: distinct (prefix-hash,
    * source) rows self-join on the HASH — a key-equality shuffle whose
    * per-key fan-out is bounded by the source count, never all-pairs over
    * docs. */
  def q86(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hs = documents(spark, dir)
      .select(md5(regexp_replace(lower(substring($"text", 1, 50)), "\\s+", " ")
        .cast("binary")).as("h"), $"source")
      .distinct()
    hs.as("a").join(hs.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src1"), col("b.source").as("src2"))
      .agg(count(lit(1)).as("shared_prefixes"))
      .orderBy($"src1", $"src2")
  }

  val q86Sql: String =
    """WITH hs AS (
      |  SELECT DISTINCT md5(regexp_replace(lower(substr(text, 1, 50)), '\s+', ' ', 'g')) AS h,
      |         source
      |  FROM documents)
      |SELECT a.source AS src1, b.source AS src2, COUNT(*) AS shared_prefixes
      |FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
      |GROUP BY 1, 2
      |ORDER BY src1, src2""".stripMargin

  // ---------------------------------------------------------------- q90
  /** Fixed-offset block length for aligned exact-substring dedup. */
  private[graft] val BlockLen = 40
  /** Stop-block frequency cap, same role as [[HotShingleCap]]. */
  private[graft] val HotBlockCap = 50L

  /** ALIGNED-BLOCK exact-substring dedup (the fixed-offset block dedup
    * big web-corpus pipelines run as the cheap first pass of exact
    * substring dedup a la Lee et al.): each document is cut into
    * consecutive [[BlockLen]]-char blocks at fixed offsets (ragged tail
    * dropped), and any two documents sharing an identical complete block
    * are reported with the count of distinct shared blocks. Catches exact
    * duplicates and shared boilerplate prefixes that token-level Jaccard
    * (q43) blurs and MinHash (q41) only catches probabilistically.
    *
    * Scale shape: identical to q43 — explode to (doc, block), ONE shuffle
    * on the block, stop-block cap bounds the self-join fanout at
    * Σ_block df² with df <= [[HotBlockCap]]; never all-pairs. */
  def q90(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // r18: a spreadIfNarrow here was A/B-measured WORSE (0.97 vs 0.84 s) —
    // fixed-offset substring blocks are cheap to build, so the spread
    // exchange outweighs the parallelized explode.
    val blocks = documents(spark, dir)
      .filter(length($"text") >= BlockLen)
      .select($"doc_id", explode(expr(
        s"transform(sequence(0, CAST(floor(length(text) / $BlockLen) AS INT) - 1)," +
          s" i -> substring(text, i * $BlockLen + 1, $BlockLen))")).as("block"))
      .distinct() // a block repeated inside one doc counts once
    // stop-block cap rides the same hash(block) shuffle the self-join
    // needs; not materialized — identical self-join sides dedup through
    // ReuseExchange (the q43 rule)
    val rare = blocks
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"block")))
      .filter($"df" <= HotBlockCap).drop("df")
    rare.as("a").join(rare.as("b"), "block")
      .filter($"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .agg(count(lit(1)).as("shared_blocks"))
      .orderBy($"d1", $"d2")
  }

  val q90Sql: String =
    s"""WITH blk AS (
       |  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT) * $BlockLen + 1, $BlockLen) AS block
       |  FROM documents CROSS JOIN UNNEST(range(CAST(floor(length(text) / $BlockLen) AS BIGINT))) AS t(i)
       |  WHERE length(text) >= $BlockLen),
       |rare AS (SELECT doc_id, block FROM
       |         (SELECT doc_id, block, COUNT(*) OVER (PARTITION BY block) AS df FROM blk)
       |         WHERE df <= $HotBlockCap)
       |SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS shared_blocks
       |FROM rare a JOIN rare b USING (block)
       |WHERE a.doc_id < b.doc_id
       |GROUP BY 1, 2
       |ORDER BY d1, d2""".stripMargin

  // ---------------------------------------------------------------- q96
  /** Sliding-window length (tokens) for any-offset exact-substring dedup. */
  private[graft] val WinLen = 8

  /** ANY-OFFSET exact-substring duplication coverage (the full
    * suffix-array-style pass of Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better", re-expressed relationally): emit
    * every [[WinLen]]-token sliding window (stride 1) of every document,
    * mark windows that occur in >= 2 distinct documents, and report per
    * document how much of it is covered by cross-document duplicated
    * substrings. Unlike q90's fixed-offset blocks this catches duplicated
    * spans at ANY alignment — the metric pipelines threshold on to drop or
    * trim documents.
    *
    * Scale shape: strictly better than a pair join — there is NO pair
    * generation at all. Per-doc window distinctness is map-local
    * (`array_distinct` before the explode, the q43 lesson), the
    * document-frequency count rides ONE shuffle on the window key, and the
    * coverage rollup is one more shuffle on doc_id. Total work is
    * O(tokens × WinLen) bytes shuffled, linear in corpus size — the paper
    * needs a distributed suffix array for the same result only because it
    * wants arbitrary-length matches; fixing the window length makes the
    * problem a hash aggregation. */
  def q96(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // r18: per-row array_distinct removed (the q43 finding — Spark's
    // ArrayDistinct is a pairwise O(k^2) scan per document, quadratic in
    // document length at any scale); per-(doc, win) distinctness is the
    // post-explode partial-aggregating DISTINCT instead, and the explode
    // runs off a spread scan rather than the single input task.
    val wins = spreadIfNarrow(documents(spark, dir)
        .select($"doc_id", $"text"), $"doc_id")
      .select($"doc_id", expr("filter(split(text, ' '), x -> length(x) > 0)").as("w"))
      .filter(size($"w") >= WinLen)
      .select($"doc_id", explode(expr(
        s"transform(sequence(1, size(w) - ${WinLen - 1})," +
          s" i -> array_join(slice(w, i, $WinLen), ' '))")).as("win"))
      .distinct()
    // (doc_id, win) is distinct, so a plain COUNT over the win partition is
    // the window's document frequency — no COUNT(DISTINCT) needed
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
  }

  val q96Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> length(x) > 0) AS w
       |  FROM documents),
       |win AS (
       |  SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i + ${WinLen - 1}), ' ') AS win
       |  FROM (SELECT * FROM toks WHERE len(w) >= $WinLen)
       |  CROSS JOIN UNNEST(range(1, len(w) - ${WinLen - 2})) AS t(i)),
       |flag AS (SELECT doc_id, win, COUNT(*) OVER (PARTITION BY win) AS ndocs FROM win),
       |cov AS (
       |  SELECT doc_id,
       |    SUM(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END)::BIGINT AS dup_windows,
       |    COUNT(*)::BIGINT AS total_windows
       |  FROM flag GROUP BY doc_id)
       |SELECT doc_id, dup_windows, total_windows,
       |  round(dup_windows::DOUBLE / total_windows, 4) AS dup_ratio
       |FROM cov WHERE dup_windows > 0 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q117
  /** Fuzzy entity-resolution dedup: Jaro-Winkler similarity over document
    * keys (first 60 chars), candidates generated by PREFIX BLOCKING (first
    * 12 chars) — never all-pairs. The scorer is the engine's own codegen
    * [[graft.functions.JaroWinkler]] expression; the oracle prices the
    * same pairs with DuckDB's built-in `jaro_winkler_similarity`, so the
    * conventions (match window, integer-halved transpositions, 0.7 boost
    * threshold, 4-char prefix cap) are cross-engine verified bit-for-bit.
    *
    * 100 TB shape: one equality-shuffle join on the block key; block sizes
    * follow prefix cardinality (hot prefixes would take the q61 salting
    * treatment). The ≥0.9→jaro≥0.83 implication keeps every emitted score
    * inside the boost region where all known conventions agree. */
  def q117(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = documents(spark, dir).select($"doc_id",
      substring($"text", 1, 60).as("key"), substring($"text", 1, 12).as("blk"))
    val jw = graft.functions.JaroWinkler(col("a.key"), col("b.key"))
    k.as("a").join(k.as("b"),
        col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
      .filter(jw >= 0.9)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        round(jw, 4).as("jw_sim"))
      .orderBy($"id_a", $"id_b")
  }

  val q117Sql: String =
    """WITH k AS (SELECT doc_id, substr(text, 1, 60) AS key,
      |                  substr(text, 1, 12) AS blk FROM documents)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |       round(jaro_winkler_similarity(a.key, b.key), 4) AS jw_sim
      |FROM k a JOIN k b ON a.blk = b.blk AND a.doc_id < b.doc_id
      |WHERE jaro_winkler_similarity(a.key, b.key) >= 0.9
      |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- q155
  /** INCREMENTAL near-dup probe (operators.DedupIndex): treat one source
    * slice (`src0`) as the arriving ingest batch and the rest of the corpus
    * as the standing index — the "check each crawl batch against everything
    * already kept" workflow. The engine path computes the batch's MinHash
    * signatures ONCE, joins the index's band rows on (band, bucket), and
    * scores candidates by signature agreement (est. Jaccard ≥ 0.5) — never
    * |batch|×|corpus|, never a corpus re-sketch. The oracle reproduces the
    * identical md5 sketch family in SQL, so the pairs AND the agreement
    * scores hash-match. (Persistence + CDC refresh of the index table are
    * DedupIndexSpec's surface — a verify query stays side-effect-free.) */
  def q155(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = documents(spark, dir)
    val batch = docs.filter($"source" === "src0")
    val corpus = docs.filter($"source" =!= "src0")
    val idx = graft.operators.DedupIndex.bandTable(corpus, "doc_id", "text")
    graft.operators.DedupIndex.probe(idx, batch, "doc_id", "text", minJaccard = 0.5)
      .withColumn("est_jaccard", round($"est_jaccard", 4))
      .orderBy($"new_id", $"dup_of")
  }

  val q155Sql: String =
    """WITH sh AS (
      |  SELECT DISTINCT doc_id, source, w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS shingle
      |  FROM (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents)
      |  CROSS JOIN UNNEST(range(greatest(len(w) - 2, 0))) AS t(i)),
      |sig AS (
      |  SELECT doc_id, any_value(source) AS source,
      |    list(s ORDER BY i) AS sigs
      |  FROM (SELECT doc_id, source, i, min(md5(i::VARCHAR || '|' || shingle)) AS s
      |        FROM sh CROSS JOIN UNNEST(range(12)) AS r(i) GROUP BY doc_id, source, i)
      |  GROUP BY doc_id),
      |band AS (
      |  SELECT doc_id, source, b,
      |    md5(sigs[b*4+1] || sigs[b*4+2] || sigs[b*4+3] || sigs[b*4+4]) AS bucket
      |  FROM sig CROSS JOIN UNNEST(range(3)) AS t(b)),
      |cand AS (
      |  SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS dup_of
      |  FROM band n JOIN band c ON n.b = c.b AND n.bucket = c.bucket
      |  WHERE n.source = 'src0' AND c.source <> 'src0' AND n.doc_id <> c.doc_id)
      |SELECT cand.new_id, cand.dup_of,
      |  round(len(list_filter(range(12), i -> a.sigs[i+1] = d.sigs[i+1])) / 12.0, 4) AS est_jaccard
      |FROM cand
      |JOIN sig a ON a.doc_id = cand.new_id
      |JOIN sig d ON d.doc_id = cand.dup_of
      |WHERE len(list_filter(range(12), i -> a.sigs[i+1] = d.sigs[i+1])) / 12.0 >= 0.5
      |ORDER BY new_id, dup_of""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_dedup_exact"         -> q40,
    "q41_dedup_minhash_lsh"   -> q41,
    "q42_dedup_simhash"       -> q42,
    "q43_dedup_ngram_jaccard" -> q43,
    "q67_dedup_simhash_pairs" -> q67,
    "q82_dedup_editdist"      -> q82,
    "q85_prefix_clusters"     -> q85,
    "q86_cross_source_dups"   -> q86,
    "q90_block_dedup"         -> q90,
    "q96_substring_dedup"     -> q96,
    "q117_fuzzy_match"        -> q117,
    "q155_dedup_index_probe"  -> q155)

  val oracleSql: Map[String, String] = Map(
    "q40_dedup_exact"         -> q40Sql,
    "q41_dedup_minhash_lsh"   -> q41Sql,
    "q42_dedup_simhash"       -> q42Sql,
    "q43_dedup_ngram_jaccard" -> q43Sql,
    "q67_dedup_simhash_pairs" -> q67Sql,
    "q82_dedup_editdist"      -> q82Sql,
    "q85_prefix_clusters"     -> q85Sql,
    "q86_cross_source_dups"   -> q86Sql,
    "q90_block_dedup"         -> q90Sql,
    "q96_substring_dedup"     -> q96Sql,
    "q117_fuzzy_match"        -> q117Sql,
    "q155_dedup_index_probe"  -> q155Sql)
}
