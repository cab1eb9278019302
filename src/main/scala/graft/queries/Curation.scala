package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Corpus-curation operators a pretraining pipeline runs between raw crawl
  * and the data loader (north-star surface, beyond [[Pipeline]]'s assembly
  * steps): PII redaction, benchmark decontamination, and intra-document
  * repetition scoring (the Gopher-style quality signals).
  *
  * All three are scan- or bucket-shaped — no all-pairs joins, no global
  * windows — the shapes that survive a 100 TB corpus.
  */
object Curation {

  // ---------------------------------------------------------------- q73
  /** PII REDACTION: regex scrub of emails, SSNs, and phone numbers, with
    * per-row redaction counts. The fixture corpus is synthetic and carries
    * no real PII, so the op first DERIVES a deterministic contact string per
    * customer (email + SSN-shaped id + phone) and then redacts it — the
    * redaction pass itself is exactly what runs over a real crawl. Pure
    * projection: one codegen'd pass, zero shuffle, the patterns are the
    * standard Presidio/CommonCrawl-style regexes. Redaction order is
    * email → SSN → phone so no earlier placeholder can feed a later
    * pattern. */
  def q73(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ssnRe   = "\\d{3}-\\d{2}-\\d{4}"
    val phoneRe = "\\+1-555-\\d{4}"
    // spreadIfNarrow (guide §2.5): the 3× regexp_replace + 3× regexp_count
    // projection is per-row-expensive regex work that otherwise runs inside
    // the single-row-group scan task (r19 A/B at sf0.1/local[32]: 1.17 s →
    // 0.87 s); no-op once the scan has real splits
    graft.Tables.spreadIfNarrow(customer(spark, dir), $"c_custkey")
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
  }

  val q73Sql: String =
    """WITH raw AS (SELECT c_custkey,
      |  c_name || ' <' || lower(regexp_replace(c_name, '[^A-Za-z0-9]', '.', 'g')) ||
      |  '@example.com> ssn ' || lpad((c_custkey % 1000)::VARCHAR, 3, '0') || '-' ||
      |  lpad(((c_custkey * 7) % 100)::VARCHAR, 2, '0') || '-' ||
      |  lpad(((c_custkey * 13) % 10000)::VARCHAR, 4, '0') ||
      |  ' phone +1-555-' || lpad((c_custkey % 10000)::VARCHAR, 4, '0') AS raw
      |  FROM customer)
      |SELECT c_custkey,
      |  regexp_replace(regexp_replace(regexp_replace(raw,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '\d{3}-\d{2}-\d{4}', '<SSN>', 'g'),
      |    '\+1-555-\d{4}', '<PHONE>', 'g') AS clean,
      |  len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
      |  len(regexp_extract_all(raw, '\d{3}-\d{2}-\d{4}'))::BIGINT AS n_ssn,
      |  len(regexp_extract_all(raw, '\+1-555-\d{4}'))::BIGINT AS n_phone
      |FROM raw ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q74
  /** BENCHMARK DECONTAMINATION: flag training documents that share ≥3
    * distinct word n-grams with any held-out eval document (eval =
    * deterministic doc_id % 97 slice). Real pipelines use 8–13-gram overlap
    * (GPT-3 / PaLM decontamination); the tiny synthetic vocabulary here
    * makes 3-grams the discriminative width, and n is a constant in one
    * place.
    *
    * 100 TB shape: shingle → distinct → inner join on the gram key. The
    * eval side is a benchmark suite — thousands of docs, not billions — so
    * its distinct-gram set broadcasts and the train side never shuffles:
    * contamination checking is a broadcast-semi-join-shaped scan, the same
    * plan at any corpus size. */
  def q74(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val grams = documentsSpread(spark, dir)
      .select($"doc_id", split($"text", " ").as("t"))
      .filter(size($"t") >= 3)
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(t) - 3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))")).as("gram"))
      .distinct()
    val evalGrams = grams.filter($"doc_id" % 97 === 0).select($"gram").distinct()
    grams.filter($"doc_id" % 97 =!= 0)
      .join(broadcast(evalGrams), "gram")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_shared_grams"))
      .filter($"n_shared_grams" >= 3)
      .orderBy($"doc_id")
  }

  val q74Sql: String =
    """WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
      |g0 AS (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(t)-2, 0)),
      |         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram FROM toks),
      |grams AS (SELECT DISTINCT doc_id, gram FROM g0),
      |ev AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0)
      |SELECT doc_id, COUNT(*) AS n_shared_grams
      |FROM grams JOIN ev USING (gram)
      |WHERE doc_id % 97 <> 0
      |GROUP BY doc_id HAVING COUNT(*) >= 3 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q75
  /** REPETITION METRICS (Gopher-style quality filters): per document, the
    * fraction of bigrams taken by the single most frequent bigram, the
    * fraction of bigram occurrences that are repeats, and the duplicate-word
    * fraction. High values mark boilerplate/spam for the quality gate.
    * Two partial→final aggregations keyed by doc_id — both shuffles are on
    * the document key, so the op scales linearly with the corpus and a
    * pathological single document only ever skews its own key. */
  def q75(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = documentsSpread(spark, dir)
      .select($"doc_id", split($"text", " ").as("t"))
      .filter(size($"t") >= 2)
    val perBigram = base
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i+1]))")).as("bg"))
      .groupBy($"doc_id", $"bg").agg(count(lit(1)).as("c"))
    val bigramStats = perBigram.groupBy($"doc_id")
      .agg(max($"c").as("top_c"), sum($"c").as("tot"), count(lit(1)).as("nd"))
    val wordStats = base.select($"doc_id", explode($"t").as("w"))
      .groupBy($"doc_id").agg(count(lit(1)).as("nw"), countDistinct($"w").as("ndw"))
    bigramStats.join(wordStats, "doc_id")
      .select($"doc_id",
        round($"top_c" / $"tot", 4).as("top_bigram_frac"),
        round(lit(1.0) - $"nd" / $"tot", 4).as("dup_bigram_frac"),
        round(lit(1.0) - $"ndw" / $"nw", 4).as("dup_word_frac"))
      .orderBy($"doc_id")
  }

  val q75Sql: String =
    """WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents
      |              WHERE len(string_split(text,' ')) >= 2),
      |bg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-1),
      |         i -> t[i] || ' ' || t[i+1])) AS bg FROM toks),
      |pb AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY doc_id, bg),
      |bs AS (SELECT doc_id, max(c) AS top_c, sum(c)::BIGINT AS tot, COUNT(*) AS nd FROM pb GROUP BY doc_id),
      |w AS (SELECT doc_id, unnest(t) AS w FROM toks),
      |ws AS (SELECT doc_id, COUNT(*) AS nw, COUNT(DISTINCT w) AS ndw FROM w GROUP BY doc_id)
      |SELECT doc_id, round(top_c / tot, 4) AS top_bigram_frac,
      |       round(1.0 - nd / tot, 4) AS dup_bigram_frac,
      |       round(1.0 - ndw / nw, 4) AS dup_word_frac
      |FROM bs JOIN ws USING (doc_id) ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q113
  /** SPLIT-LEAKAGE AUDIT: near-duplicate pairs that STRADDLE the
    * train/eval boundary of q57's deterministic hash split — the
    * evaluation-integrity check every pretraining pipeline must run
    * (a test document whose near-duplicate sits in train inflates every
    * benchmark number; Lee et al. 2022 §6 measure exactly this leak).
    * Candidate pairs come from the rare-shingle inverted index (q43/q100
    * shape: document-frequency cap bounds the self-join fanout — never
    * all-pairs), evidence-weighted by shared-shingle count (≥ 2 to drop
    * single-collision noise), then each side joins its split label and
    * only train↔{val,test} pairs survive.
    *
    * Scale shape: one window over shingles (df cap), one key-equality
    * self-join on the capped index, two broadcast-sized split joins
    * (split labels derive from doc_id — computed inline, no extra scan).
    * Output is train_doc × leaked eval doc with the evidence count. */
  def q113(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // materialized = false: single consumer pair-join, so the one-pass
    // count-over-shingle window beats paying a checkpoint write for one
    // read — the shape tradeoff is documented once, at Dedup.rareShingles
    // (q100 is the materialized groupBy+join twin).
    val rare = Dedup.rareShingles(spark, dir, materialized = false)
    val pairs = rare.as("a").join(rare.as("b"), "shingle")
      .filter($"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .agg(count(lit(1)).as("shared_shingles"))
      .filter($"shared_shingles" >= 2)
    def splitOf(c: org.apache.spark.sql.Column) = {
      val h2 = substring(md5(concat(lit("split|"), c.cast("string")).cast("binary")), 1, 2)
      when(h2 < "cc", "train").when(h2 < "e6", "val").otherwise("test")
    }
    pairs
      .withColumn("s1", splitOf($"d1"))
      .withColumn("s2", splitOf($"d2"))
      .filter(($"s1" === "train") =!= ($"s2" === "train"))
      .select(
        when($"s1" === "train", $"d1").otherwise($"d2").as("train_doc"),
        when($"s1" === "train", $"d2").otherwise($"d1").as("eval_doc"),
        when($"s1" === "train", $"s2").otherwise($"s1").as("eval_split"),
        $"shared_shingles")
      .orderBy($"train_doc", $"eval_doc")
  }

  val q113Sql: String =
    s"""WITH sh AS (${Dedup.shinglesSql}),
       |rare AS (${Dedup.rareShinglesSql}),
       |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS shared_shingles
       |          FROM rare a JOIN rare b USING (shingle) WHERE a.doc_id < b.doc_id
       |          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |lab AS (SELECT d1, d2, shared_shingles,
       |          CASE WHEN substr(md5('split|' || d1), 1, 2) < 'cc' THEN 'train'
       |               WHEN substr(md5('split|' || d1), 1, 2) < 'e6' THEN 'val'
       |               ELSE 'test' END AS s1,
       |          CASE WHEN substr(md5('split|' || d2), 1, 2) < 'cc' THEN 'train'
       |               WHEN substr(md5('split|' || d2), 1, 2) < 'e6' THEN 'val'
       |               ELSE 'test' END AS s2
       |        FROM pairs)
       |SELECT CASE WHEN s1 = 'train' THEN d1 ELSE d2 END AS train_doc,
       |       CASE WHEN s1 = 'train' THEN d2 ELSE d1 END AS eval_doc,
       |       CASE WHEN s1 = 'train' THEN s2 ELSE s1 END AS eval_split,
       |       shared_shingles
       |FROM lab WHERE (s1 = 'train') != (s2 = 'train')
       |ORDER BY train_doc, eval_doc""".stripMargin

  // ---------------------------------------------------------------- q114
  /** PER-LANGUAGE QUALITY CALIBRATION: rank every document's type-token
    * ratio WITHIN its language (percent_rank) and cut the bottom 20% per
    * language — the language-fair form of a global quality threshold (a
    * single global cutoff on any score systematically guts low-resource
    * languages whose score distribution sits lower; per-language
    * calibration is the standard fix in multilingual curation). Ties
    * break on doc_id so the rank is deterministic on both engines.
    *
    * Scale shape: one per-doc aggregation (token counts partial-aggregate
    * map-side), one window partitioned by language — no global sort, no
    * single-partition window. */
  def q114(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = documentsSpread(spark, dir)
      .select($"doc_id", $"lang", explode(expr(
        "filter(split(text, ' '), x -> length(x) > 0)")).as("w"))
      .groupBy($"doc_id", $"lang")
      .agg(countDistinct($"w").as("ndw"), count(lit(1)).as("nw"))
      .select($"doc_id", $"lang",
        round($"ndw".cast("double") / $"nw", 6).as("ttr"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"ttr".asc, $"doc_id".asc)
    scored.withColumn("pct", round(percent_rank().over(w), 6))
      .withColumn("kept", $"pct" >= 0.2)
      .orderBy($"doc_id")
  }

  val q114Sql: String =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |         unnest(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS w
      |  FROM documents),
      |scored AS (
      |  SELECT doc_id, lang, round(COUNT(DISTINCT w)::DOUBLE / COUNT(*), 6) AS ttr
      |  FROM t GROUP BY doc_id, lang),
      |ranked AS (
      |  SELECT doc_id, lang, ttr,
      |         round(percent_rank() OVER (PARTITION BY lang ORDER BY ttr ASC, doc_id ASC), 6) AS pct
      |  FROM scored)
      |SELECT doc_id, lang, ttr, pct, pct >= 0.2 AS kept
      |FROM ranked ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q73_pii_redact"          -> q73,
    "q74_decontaminate"       -> q74,
    "q75_repetition"          -> q75,
    "q113_split_leakage"      -> q113,
    "q114_quality_calibration" -> q114)

  val oracleSql: Map[String, String] = Map(
    "q73_pii_redact"          -> q73Sql,
    "q74_decontaminate"       -> q74Sql,
    "q75_repetition"          -> q75Sql,
    "q113_split_leakage"      -> q113Sql,
    "q114_quality_calibration" -> q114Sql)
}
