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
    customer(spark, dir)
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
    val grams = documents(spark, dir)
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
    val base = documents(spark, dir)
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q73_pii_redact"    -> q73,
    "q74_decontaminate" -> q74,
    "q75_repetition"    -> q75)

  val oracleSql: Map[String, String] = Map(
    "q73_pii_redact"    -> q73Sql,
    "q74_decontaminate" -> q74Sql,
    "q75_repetition"    -> q75Sql)
}
