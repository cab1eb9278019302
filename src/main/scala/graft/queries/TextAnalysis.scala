package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Mat
import graft.Tables._

/** Text-analysis operators over `documents.text` (north-star training-data
  * pipeline surface): quality scoring, n-gram-heuristic language ID, token
  * counting (whitespace + regex-BPE-ish), and shingle fingerprinting.
  *
  * All pure built-ins → whole-stage codegen'd projections/aggregations: a
  * single scan-shaped pass at any scale, no shuffle except the final
  * fingerprint groupBy. */
object TextAnalysis {

  private val stopEn = Seq("the", "a", "and", "of", "to", "in", "is", "it", "for", "on")

  private def inList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")

  // ---------------------------------------------------------------- q46
  /** Quality stats: char/word counts, average word length, punctuation
    * ratio, stopword ratio, and a composite quality score. */
  def q46(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir)
      .withColumn("words", split($"text", " "))
      .withColumn("n_words", size($"words"))
      .withColumn("stop_hits",
        expr(s"size(filter(words, w -> w IN (${inList(stopEn)})))"))
      .select(
        $"doc_id",
        length($"text").as("n_chars_calc"),
        $"n_words",
        round(length(regexp_replace($"text", " ", "")).cast("double") / $"n_words", 3).as("avg_word_len"),
        round(length(regexp_replace($"text", "[A-Za-z0-9 ]", "")).cast("double") / length($"text"), 4).as("punct_ratio"),
        round($"stop_hits".cast("double") / $"n_words", 4).as("stop_ratio"),
        round(
          least($"n_words".cast("double") / 100.0, lit(1.0)) * 0.5 +
          least($"stop_hits".cast("double") / $"n_words" * 10.0, lit(1.0)) * 0.5, 4).as("quality_score"))
      .orderBy($"doc_id")
  }

  val q46Sql: String =
    s"""SELECT doc_id,
       |  CAST(length(text) AS INT) AS n_chars_calc,
       |  CAST(len(string_split(text, ' ')) AS INT) AS n_words,
       |  round(length(replace(text, ' ', ''))::DOUBLE / len(string_split(text, ' ')), 3) AS avg_word_len,
       |  round(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE / length(text), 4) AS punct_ratio,
       |  round(len(list_filter(string_split(text, ' '), w -> w IN (${inList(stopEn)})))::DOUBLE
       |        / len(string_split(text, ' ')), 4) AS stop_ratio,
       |  round(least(len(string_split(text, ' '))::DOUBLE / 100.0, 1.0) * 0.5 +
       |        least(len(list_filter(string_split(text, ' '), w -> w IN (${inList(stopEn)})))::DOUBLE
       |              / len(string_split(text, ' ')) * 10.0, 1.0) * 0.5, 4) AS quality_score
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q47
  /** Language ID via stopword-list hit counting (n-gram heuristic): count
    * list hits per language, argmax with a fixed priority order. */
  private val langLists: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "de", "et", "les"),
    "de" -> Seq("der", "die", "und", "das", "ist"))

  def q47(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val withHits = langLists.foldLeft(
      documents(spark, dir).withColumn("words", split($"text", " "))) {
      case (df, (lang, ws)) =>
        df.withColumn(s"${lang}_hits",
          expr(s"size(filter(words, w -> w IN (${inList(ws)})))").cast("long"))
    }
    val best = langLists.map { case (l, _) => col(s"${l}_hits") }.reduce(greatest(_, _))
    val pred = langLists.foldRight(lit("und"): org.apache.spark.sql.Column) {
      case ((l, _), els) => when(col(s"${l}_hits") === best && best > 0, lit(l)).otherwise(els)
    }
    withHits.select(
      ($"doc_id" +: langLists.map { case (l, _) => col(s"${l}_hits") }) :+ pred.as("pred_lang"): _*)
      .orderBy($"doc_id")
  }

  val q47Sql: String = {
    val hits = langLists.map { case (l, ws) =>
      s"len(list_filter(string_split(text, ' '), w -> w IN (${inList(ws)})))::BIGINT AS ${l}_hits"
    }.mkString(",\n  ")
    val best = "greatest(en_hits, es_hits, fr_hits, de_hits)"
    val pred = langLists.map { case (l, _) =>
      s"WHEN ${l}_hits = $best AND $best > 0 THEN '$l'"
    }.mkString(" ")
    s"""SELECT doc_id, en_hits, es_hits, fr_hits, de_hits,
       |  CASE $pred ELSE 'und' END AS pred_lang
       |FROM (SELECT doc_id, $hits FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q48
  /** Token counting: whitespace tokens vs a BPE-ish regex tokenizer
    * (letter-runs | digit-runs | single punctuation). */
  def q48(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir)
      .select(
        $"doc_id",
        size(split($"text", " ")).as("ws_tokens"),
        expr("size(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0))").as("re_tokens"),
        round(length($"text").cast("double") /
          expr("size(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0))"), 3)
          .as("chars_per_token"))
      .orderBy($"doc_id")
  }

  val q48Sql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS INT) AS re_tokens,
      |  round(length(text)::DOUBLE /
      |        len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')), 3) AS chars_per_token
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q49
  /** Document fingerprinting: min-hash style winnowing over 3-word shingles
    * (two salted md5 families + distinct-shingle count). */
  def q49(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup.shingles(spark, dir)
      .groupBy($"doc_id")
      .agg(
        min(md5($"shingle".cast("binary"))).as("fp1"),
        min(md5(concat(lit("s2|"), $"shingle").cast("binary"))).as("fp2"),
        count(lit(1)).as("n_shingles"))
      .orderBy($"doc_id")
  }

  val q49Sql: String =
    """WITH sh AS (SELECT DISTINCT doc_id, w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS shingle
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      |  CROSS JOIN UNNEST(range(greatest(len(w) - 2, 0))) AS t(i))
      |SELECT doc_id, min(md5(shingle)) AS fp1, min(md5('s2|' || shingle)) AS fp2,
      |  COUNT(*) AS n_shingles
      |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q69
  /** Unicode NFC normalization ([[graft.functions.NormalizeText]], a native
    * codegen'd expression — SURVEY.md §2.10): the fixture text is ASCII, so
    * the query PLANTS decomposed sequences (e+U+0301, A+U+0300) on every
    * row and verifies both engines compose them identically — md5 over the
    * normalized UTF-8 bytes, plus the codepoint-count contraction (2 fewer
    * after composing 2 pairs). Scan-shaped, zero shuffle before the output
    * sort. */
  def q69(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // combining acute/grave as \u escapes — Spark's chr() is ASCII-only
    val raw = concat(substring($"text", 1, 40),
      lit(" Cafe"), lit("\u0301"), lit(" A"), lit("\u0300"))
    documents(spark, dir)
      .select($"doc_id", raw.as("raw"))
      .select($"doc_id",
        length($"raw").cast("long").as("len_raw"),
        length(graft.functions.NormalizeText($"raw")).cast("long").as("len_nfc"),
        md5(graft.functions.NormalizeText($"raw").cast("binary")).as("h"))
      .orderBy($"doc_id")
  }

  val q69Sql: String =
    """SELECT doc_id,
      |       length(raw) AS len_raw,
      |       length(nfc_normalize(raw)) AS len_nfc,
      |       md5(nfc_normalize(raw)) AS h
      |FROM (SELECT doc_id,
      |        substr(text, 1, 40) || ' Cafe' || chr(769) || ' A' || chr(768) AS raw
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q84
  /** Corpus vocabulary induction: top-k tokens by term frequency with
    * document frequency and corpus share — the frequency table a
    * BPE/unigram tokenizer trainer starts from. 100 TB shape: one
    * token-keyed partial→final aggregate over the token scan (the heavy
    * step, map-side combinable), a scalar total broadcast back, and the
    * top-k plans as TakeOrderedAndProject — per-partition heaps, never a
    * global sort of the vocabulary. Ties at the cut break on the token
    * itself, so the selected set is deterministic on both engines. */
  def q84(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = documentsSpread(spark, dir)
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
      .filter(length($"tok") > 0)
    val stats = toks.groupBy($"tok")
      .agg(count(lit(1)).as("tf"), countDistinct($"doc_id").as("df"))
    val total = stats.agg(sum($"tf").as("total"))
    stats.crossJoin(broadcast(total))
      .withColumn("share", round($"tf".cast("double") / $"total", 6))
      .select($"tok", $"tf", $"df", $"share")
      .orderBy($"tf".desc, $"tok")
      .limit(200)
  }

  val q84Sql: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |stats AS (SELECT tok, count(*) AS tf, count(DISTINCT doc_id) AS df
      |          FROM toks WHERE length(tok) > 0 GROUP BY tok),
      |total AS (SELECT sum(tf)::DOUBLE AS total FROM stats)
      |SELECT tok, tf, df, round(tf::DOUBLE / total, 6) AS share
      |FROM stats, total
      |ORDER BY tf DESC, tok LIMIT 200""".stripMargin

  // ---------------------------------------------------------------- q124
  /** Per-doc OUT-OF-VOCABULARY rate against the corpus-induced top-50
    * vocabulary — the tokenizer-coverage signal a training mix is filtered
    * on (high OOV = the tokenizer will shred the document into bytes).
    *
    * Scale shape: the vocab is a TakeOrderedAndProject top-K (deterministic
    * tf-desc/tok tie-break, never a global sort) BROADCAST into a left join
    * on the token stream; the per-doc agg is partial→final. One data-sized
    * shuffle total. */
  def q124(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = documentsSpread(spark, dir)
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
      .filter(length($"tok") > 0)
    val vocab = toks.groupBy($"tok").agg(count(lit(1)).as("tf"))
      .orderBy($"tf".desc, $"tok").limit(50)
      .select($"tok".as("vtok"))
    toks.join(broadcast(vocab), $"tok" === $"vtok", "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when($"vtok".isNull, 1L).otherwise(0L)).as("n_oov"))
      .select($"doc_id", $"n_tokens", $"n_oov",
        round($"n_oov".cast("double") / $"n_tokens", 6).as("oov_rate"))
      .orderBy($"doc_id")
  }

  val q124Sql: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |clean AS (SELECT doc_id, tok FROM toks WHERE length(tok) > 0),
      |vocab AS (SELECT tok AS vtok FROM
      |          (SELECT tok, count(*) AS tf FROM clean GROUP BY tok)
      |          ORDER BY tf DESC, tok LIMIT 50)
      |SELECT doc_id, count(*)::BIGINT AS n_tokens,
      |  sum(CASE WHEN v.vtok IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
      |  round(sum(CASE WHEN v.vtok IS NULL THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS oov_rate
      |FROM clean c LEFT JOIN vocab v ON c.tok = v.vtok
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q87
  /** BPE merge-pair counting — the inner loop of byte-pair-encoding
    * tokenizer training: fold the corpus to a word-frequency table first
    * (BPE trains on (word, freq), never re-scanning raw text per round),
    * then count adjacent symbol pairs weighted by word frequency and rank
    * them — the top pair IS the next merge. Restricted to ASCII-lowercase
    * words so the char semantics match the oracle exactly. Scan-shaped:
    * word-freq groupBy, then a zip_with pair explode (no window, no
    * self-join) into the final groupBy — two shuffles total at any scale. */
  def q87(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wf = documentsSpread(spark, dir)
      .select(explode(split($"text", " ")).as("w"))
      .filter($"w".rlike("^[a-z]+$") && length($"w") >= 2)
      .groupBy($"w").agg(count(lit(1)).as("freq"))
    wf.withColumn("cs", split($"w", ""))
      .withColumn("pair", explode(zip_with(
        slice($"cs", lit(1), size($"cs") - 1),
        slice($"cs", lit(2), size($"cs") - 1),
        (a, b) => concat(a, b))))
      .groupBy($"pair").agg(sum($"freq").as("pair_count"))
      .orderBy($"pair_count".desc, $"pair")
      .limit(100)
  }

  val q87Sql: String =
    """WITH words AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |wf AS (SELECT w, count(*) AS freq FROM words
      |       WHERE regexp_full_match(w, '[a-z]+') AND length(w) >= 2 GROUP BY w),
      |idx AS (SELECT w, freq, unnest(generate_series(1, length(w) - 1)) AS i FROM wf),
      |pairs AS (SELECT substring(w, i, 2) AS pair, freq FROM idx)
      |SELECT pair, sum(freq)::BIGINT AS pair_count
      |FROM pairs GROUP BY pair
      |ORDER BY pair_count DESC, pair LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q95
  /** CORPUS BIGRAM LANGUAGE-MODEL SCORING (the KenLM-style perplexity
    * filter of web-corpus pipelines, self-trained): estimate P(w2|w1) =
    * c(w1,w2)/c(w1·) from the whole corpus, then score each document by
    * its mean bigram log-likelihood — documents whose word sequences are
    * atypical for the corpus score low and become filter candidates.
    *
    * Scale shape: per-doc bigram counts aggregate BEFORE the model join
    * (the join key stream is distinct (doc,bigram), not every token), the
    * model is two further aggregations of that same stream, and scoring is
    * one equality join on the bigram — no per-doc model state, no driver
    * collection. The log-likelihood terms are summed as DECIMAL so the
    * total is independent of aggregation order (a double sum would differ
    * in the last ulp between engines and partitionings). */
  def q95(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = documentsSpread(spark, dir)
      .select($"doc_id", expr("filter(split(text, ' '), x -> length(x) > 0)").as("w"))
      .filter(size($"w") >= 2)
    val docBg = toks
      .select($"doc_id", explode(expr(
        "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1)," +
          " (a, b) -> struct(a AS w1, b AS w2))")).as("p"))
      .select($"doc_id", $"p.w1".as("w1"), $"p.w2".as("w2"))
      .groupBy($"doc_id", $"w1", $"w2").agg(count(lit(1)).as("c"))
      // feeds the model build AND the scoring join. Lazy cache, NOT
      // localCheckpoint (measured 1.4 -> 1.9 s checkpointed at sf0.1): the
      // first consumer materializes the cache inside its own job, so the
      // checkpoint's separate eager write is pure overhead; and unlike
      // q100, an eviction recompute here is one linear tokenize pass —
      // same cost class, no plan-shape cliff. Strategy measurable via
      // spark.graft.mat.multi-use (VERDICT r16 #2).
      .transform(Mat.multiUse)
    val corpusBg = docBg.groupBy($"w1", $"w2").agg(sum($"c").as("c12"))
    val corpusUni = corpusBg.groupBy($"w1").agg(sum($"c12").as("c1"))
    // r19: MODEL-FIRST join — fold c1 into the (much smaller) bigram model
    // before the scoring join, so the doc-keyed stream joins ONCE on
    // (w1, w2) instead of twice ((w1, w2) then (w1) — a second full
    // shuffle of the scored stream at any scale). Same rows, same term
    // values (log(c12) − log(c1) computed per model row instead of per
    // scored row — identical doubles), oracle-proven; A/B: 1.93→1.73 s
    // and 2.48→2.32 s across two sessions at sf0.1/local[32].
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
  }

  val q95Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> length(x) > 0) AS w
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
      |  FROM (SELECT * FROM toks WHERE len(w) >= 2)
      |  CROSS JOIN UNNEST(range(1, len(w))) AS t(i)),
      |docbg AS (SELECT doc_id, w1, w2, COUNT(*) AS c FROM bg GROUP BY 1, 2, 3),
      |cbg AS (SELECT w1, w2, SUM(c)::BIGINT AS c12 FROM docbg GROUP BY 1, 2),
      |cuni AS (SELECT w1, SUM(c12)::BIGINT AS c1 FROM cbg GROUP BY 1)
      |SELECT d.doc_id,
      |  round(CAST(SUM(CAST(d.c * (ln(m.c12) - ln(u.c1)) AS DECIMAL(28,12))) AS DOUBLE)
      |        / SUM(d.c), 4) AS avg_logp,
      |  SUM(d.c)::BIGINT AS n_bigrams
      |FROM docbg d JOIN cbg m USING (w1, w2) JOIN cuni u USING (w1)
      |GROUP BY d.doc_id
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q97
  /** SELF-TRAINED MULTICLASS NAIVE BAYES language classifier (the in-
    * pipeline analogue of the fastText lang-ID pass big corpus pipelines
    * run; here both trained and applied on the corpus itself): per-language
    * word likelihoods with Laplace smoothing, log-prior from language
    * frequency, argmax over classes. Closed-form training — counts only,
    * no gradient loop — which is exactly what makes it expressible as four
    * aggregations and two joins, and verifiable against the SQL oracle.
    *
    * Scale shape: the model is aggregates of the token stream — class-word
    * counts (vocab × |classes| rows, key-equality join back on
    * (class, word)) and a |classes|-row prior/total table that BROADCASTS.
    * The only expansion is per-doc-word × |classes| (bounded factor 5), and
    * scoring re-aggregates immediately. Log-likelihood terms sum as DECIMAL
    * (the q95 rule: order-independent totals) and the argmax ranks the
    * ROUNDED score with a class-name tie-break, so the winner is identical
    * across engines and partitionings. */
  def q97(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = documentsSpread(spark, dir)
      .select($"doc_id", $"lang",
        explode(expr("filter(split(text, ' '), x -> length(x) > 0)")).as("word"))
    // per-doc word counts (true lang rides along — no join back later).
    // Cached (the q95 lazy-cache rationale), and cw/vocab are DERIVED from
    // dw by algebra (sum of per-doc counts = corpus count; distinct word
    // set identical) so the corpus tokenizes exactly ONCE instead of 3x
    val dw = toks.groupBy($"doc_id", $"lang", $"word")
      .agg(count(lit(1)).as("c")).transform(Mat.multiUse)
    val cw = dw.groupBy($"lang".as("cls"), $"word")
      .agg(sum($"c").as("cw"))
    val ct = cw.groupBy($"cls").agg(sum($"cw").as("ctot"))
    // r19: vocab DERIVES from cw (same distinct word set by construction),
    // riding cw's (cls, word) exchange instead of re-tokenizing the corpus
    // a third time under the no-cache multiUse default (A/B at sf0.1:
    // mins 2.13 → 1.77 s for the whole query; same value, oracle-proven)
    val vocab = cw.select($"word").distinct().agg(count(lit(1)).as("v"))
    val docs = documents(spark, dir)
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
  }

  val q97Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang, unnest(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS word
      |  FROM documents),
      |dw AS (SELECT doc_id, lang, word, COUNT(*) AS c FROM toks GROUP BY 1, 2, 3),
      |cw AS (SELECT lang AS cls, word, COUNT(*) AS cw FROM toks GROUP BY 1, 2),
      |ct AS (SELECT cls, SUM(cw)::BIGINT AS ctot FROM cw GROUP BY 1),
      |voc AS (SELECT COUNT(DISTINCT word) AS v FROM toks),
      |pri AS (SELECT lang AS cls, COUNT(*) AS nd FROM documents GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n FROM documents),
      |cls AS (SELECT ct.cls, ctot, v, ln(nd::DOUBLE / n.n) AS prior_ln
      |        FROM ct JOIN pri USING (cls) CROSS JOIN voc CROSS JOIN n),
      |cand AS (
      |  SELECT dw.doc_id, dw.lang, cls.cls, cls.prior_ln,
      |         CAST(dw.c * (ln(COALESCE(cw.cw, 0) + 1) - ln(cls.ctot + cls.v)) AS DECIMAL(28,12)) AS term
      |  FROM dw CROSS JOIN cls
      |  LEFT JOIN cw ON cw.cls = cls.cls AND cw.word = dw.word),
      |sc AS (SELECT doc_id, lang, cls, round(prior_ln + CAST(SUM(term) AS DOUBLE), 4) AS s
      |       FROM cand GROUP BY doc_id, lang, cls, prior_ln),
      |best AS (SELECT doc_id, lang, cls, s,
      |                ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s DESC, cls ASC) AS rn
      |         FROM sc)
      |SELECT doc_id, lang, cls AS pred_lang, s AS nb_logp, (lang = cls) AS correct
      |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q99
  /** Keywords kept per document. */
  private[graft] val TfIdfTopK = 3

  /** TF-IDF KEYWORD EXTRACTION: score every (doc, word) by
    * tf × ln(N / df) and keep the top-[[TfIdfTopK]] terms per document —
    * the classic per-document topic signature used for corpus exploration,
    * domain tagging, and cluster labeling. Ranking uses the ROUNDED score
    * with a lexicographic tie-break so the kept set is engine- and
    * partitioning-independent (round-tied words are common: every word
    * appearing once in one doc with equal df ties exactly).
    *
    * Scale shape: tf is the per-doc word aggregate, df is a second
    * aggregate OF that stream (never re-reads the corpus), the join back is
    * key-equality on the word, and the per-doc top-k is a window over the
    * doc partition — thousands of small partitions, no global sort, no
    * single-partition funnel. */
  def q99(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dw = documentsSpread(spark, dir)
      .select($"doc_id",
        explode(expr("filter(split(text, ' '), x -> length(x) > 0)")).as("word"))
      .groupBy($"doc_id", $"word").agg(count(lit(1)).as("tf"))
      // feeds df AND the score join (lazy multi-use: the q95 rationale)
      .transform(Mat.multiUse)
    val df = dw.groupBy($"word").agg(count(lit(1)).as("df"))
    val n = documents(spark, dir).agg(count(lit(1)).as("n"))
    val scored = dw.join(df, "word").crossJoin(broadcast(n))
      .select($"doc_id", $"word",
        round($"tf" * log($"n".cast("double") / $"df"), 4).as("tfidf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"tfidf".desc, $"word".asc)
    scored.withColumn("rk", row_number().over(w))
      .filter($"rk" <= TfIdfTopK)
      .select($"doc_id", $"rk".cast("long").as("rk"), $"word", $"tfidf")
      .orderBy($"doc_id", $"rk")
  }

  val q99Sql: String =
    s"""WITH dw AS (
       |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS word
       |  FROM documents),
       |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM dw GROUP BY 1, 2),
       |df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n FROM documents),
       |scored AS (
       |  SELECT doc_id, word, round(tf * ln(n.n::DOUBLE / df), 4) AS tfidf
       |  FROM tf JOIN df USING (word) CROSS JOIN n),
       |ranked AS (
       |  SELECT doc_id, word, tfidf,
       |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word ASC) AS rk
       |  FROM scored)
       |SELECT doc_id, rk, word, tfidf FROM ranked
       |WHERE rk <= $TfIdfTopK ORDER BY doc_id, rk""".stripMargin

  // ---------------------------------------------------------------- q103
  /** CHARACTER-ENTROPY quality signal: Shannon entropy of the per-doc
    * character distribution, H = ln(n) − (Σ c·ln c)/n nats. Low-entropy
    * documents are repeated-character junk / padding / template spam (a
    * C4-style heuristic filter axis complementary to q75's word-level
    * repetition metrics); implausibly high entropy flags binary-ish noise.
    * The algebraic form avoids per-char probabilities: only counts are
    * divided, ONCE, after the DECIMAL sum (q95 rule — order-independent
    * totals, engine-exact to 4 decimals).
    *
    * Scale shape: chars explode to |text| rows but immediately collapse to
    * per-(doc, char) counts — partial aggregation eats the expansion
    * map-side; then one per-doc rollup. Two shuffles of count-sized rows,
    * linear in corpus bytes. */
  def q103(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // CODE-POINT walk: Java regex `.` consumes one code point (a surrogate
    // pair stays one match), so this agrees with DuckDB's code-point substr
    // on non-BMP text where split(text, '') would emit two code-UNIT rows
    // per emoji. Still one linear pass per doc (the indexed-substring form
    // re-scans the UTF-8 prefix per position — O(len²), measured 2.4 s vs
    // 1.5 s at sf0.1)
    val cc = documentsSpread(spark, dir)
      .select($"doc_id", explode(expr(
        "regexp_extract_all(text, '(?s).', 0)")).as("ch"))
      .groupBy($"doc_id", $"ch").agg(count(lit(1)).as("c"))
    cc.groupBy($"doc_id")
      .agg(
        sum($"c").as("n"),
        sum(($"c" * log($"c")).cast("decimal(28,12)")).as("s"),
        count(lit(1)).as("distinct_chars"))
      .select($"doc_id",
        round(log($"n") - $"s".cast("double") / $"n", 4).as("char_entropy"),
        $"distinct_chars", $"n".as("n_chars_total"))
      .orderBy($"doc_id")
  }

  val q103Sql: String =
    """WITH ch AS (
      |  SELECT doc_id, substr(text, CAST(i AS INT), 1) AS ch
      |  FROM documents CROSS JOIN UNNEST(range(1, length(text) + 1)) AS t(i)),
      |cc AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY 1, 2),
      |agg AS (SELECT doc_id, SUM(c)::BIGINT AS n,
      |               SUM(CAST(c * ln(c) AS DECIMAL(28,12))) AS s,
      |               COUNT(*)::BIGINT AS distinct_chars
      |        FROM cc GROUP BY doc_id)
      |SELECT doc_id, round(ln(n) - CAST(s AS DOUBLE) / n, 4) AS char_entropy,
      |       distinct_chars, n AS n_chars_total
      |FROM agg ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q105
  /** FULL BPE TOKENIZER LIFECYCLE ([[graft.operators.Bpe]]): train 200
    * merges over the corpus word-frequency table (ONE distributed
    * aggregation; the bounded top-2000-word slice trains driver-side,
    * exactly how production tokenizer trainers work), then tokenize every
    * document with the learned merges through a codegen'd native
    * expression. This is what q87's pair counting is FOR — the applied
    * tokenizer yields the real token counts that q66's packing and every
    * token-budget decision consume.
    *
    * ORACLE (new r12): training is deterministic (lexicographic
    * tie-break), so the learned merge list IS data — after the Spark run
    * trains it, [[q105Sql]] renders the ranked merges inline as a VALUES
    * list and DuckDB re-applies them with the SAME greedy loop
    * (leftmost lowest-rank adjacent pair per step) as a recursive CTE
    * over per-word symbol lists — distinct words only, then token counts
    * join back per doc. Self-contained SQL: no file handoff between the
    * engines, and the oracle always matches the SF the verify run
    * trained on. BpeSpec still pins the merge algebra independently. */
  def q105(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val model = graft.operators.Bpe.trainFromCorpus(documents(spark, dir), 2000, 200)
    q105Model.set(model)
    documentsSpread(spark, dir)
      .select($"doc_id",
        length($"text").cast("long").as("n_chars_calc"),
        expr("size(filter(split(text, ' '), x -> length(x) > 0))").cast("long").as("ws_tokens"),
        graft.operators.Bpe.tokenCount($"text", model).cast("long").as("bpe_tokens"))
      .withColumn("chars_per_bpe_token",
        round($"n_chars_calc".cast("double") / expr("nullif(bpe_tokens, 0)"), 4))
      .orderBy($"doc_id")
  }

  /** Model trained by the last [[q105]] run in this JVM — Verify runs
    * every query BEFORE serializing oracleSql, so the oracle renders from
    * exactly the merge list the compared result used. */
  private val q105Model =
    new java.util.concurrent.atomic.AtomicReference[graft.operators.Bpe.Model]()

  /** DuckDB twin of the BPE encode: the trained merges inlined by rank,
    * applied per distinct word via a recursive CTE (merge the leftmost
    * lowest-rank adjacent symbol pair until none applies — bit-for-bit
    * the [[graft.operators.Bpe.Model.encodeWord]] loop; symbols pair-key
    * with a chr(1) separator to mirror the model's NUL keying). */
  private def q105Sql(model: graft.operators.Bpe.Model): String = {
    def esc(s: String) = s.replace("'", "''")
    val vals = model.merges.zipWithIndex
      .map { case ((a, b), i) => s"('${esc(a)}','${esc(b)}',$i)" }.mkString(",")
    s"""WITH RECURSIVE
       |m(a, b, rnk) AS (VALUES $vals),
       |mk AS (SELECT list(a || chr(1) || b ORDER BY rnk) AS keys FROM m),
       |dw AS (
       |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS word
       |  FROM documents),
       |words AS (SELECT DISTINCT word FROM dw),
       |enc AS (
       |  SELECT word, list_transform(range(1, length(word) + 1), i -> substr(word, i, 1)) AS syms
       |  FROM words
       |  UNION ALL
       |  SELECT word, syms[1:pos-1] || [syms[pos] || syms[pos+1]] || syms[pos+2:len(syms)] AS syms
       |  FROM (
       |    SELECT word, syms, list_position(rks, list_aggregate(rks, 'min')) AS pos
       |    FROM (
       |      SELECT word, syms,
       |        list_transform(range(1, len(syms)),
       |          i -> nullif(list_position(mk.keys, syms[i] || chr(1) || syms[i+1]), 0)) AS rks
       |      FROM enc, mk
       |      WHERE len(syms) > 1))
       |  WHERE pos IS NOT NULL AND pos > 0),
       |final AS (
       |  SELECT word, len(syms)::BIGINT AS ntok
       |  FROM enc, mk
       |  WHERE len(syms) = 1
       |     OR list_aggregate(list_transform(range(1, len(syms)),
       |          i -> nullif(list_position(mk.keys, syms[i] || chr(1) || syms[i+1]), 0)), 'min') IS NULL),
       |bpe AS (
       |  SELECT dw.doc_id, SUM(f.ntok)::BIGINT AS bpe_tokens
       |  FROM dw JOIN final f USING (word) GROUP BY 1)
       |SELECT d.doc_id,
       |  length(d.text)::BIGINT AS n_chars_calc,
       |  len(list_filter(string_split(d.text, ' '), x -> length(x) > 0))::BIGINT AS ws_tokens,
       |  coalesce(b.bpe_tokens, 0) AS bpe_tokens,
       |  round(length(d.text)::DOUBLE / nullif(coalesce(b.bpe_tokens, 0), 0), 4) AS chars_per_bpe_token
       |FROM documents d LEFT JOIN bpe b USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q108
  /** HEAVY-HITTER WORDS PER LANGUAGE through the Misra–Gries sketch
    * ([[graft.functions.FreqSketch]] — SURVEY.md §2.10): the one-pass,
    * bounded-memory form of q84's exact vocabulary top-k. The exact form
    * must aggregate every (group, word) pair before ranking; the sketch
    * ships ≤ k (word, count) pairs per language through the partial→final
    * combine — the shape that holds when the vocabulary itself no longer
    * fits a shuffle. FreqSketchSpec pins the deterministic n/(k+1) MG
    * guarantee on adversarial streams.
    *
    * ORACLE-VERIFIED (VERDICT r12 #4): the MG guarantee IS deterministic —
    * every word with true count > n/(k+1) survives any update/merge order
    * (Misra–Gries 1982; Agarwal et al. 2013 mergeability) — so the query
    * emits, per language, the count of truly-heavy words (one exact
    * aggregate pass) and a verdict that ALL of them appear in the sketch's
    * candidate set. DuckDB computes the same token totals and heavy counts
    * and hashes literal TRUE verdicts. */
  def q108(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.FreqSketch
    val tok = documentsSpread(spark, dir)
      .select($"lang",
        explode(expr("filter(split(text, ' '), x -> length(x) > 0)")).as("word"))
    val sk = tok.groupBy($"lang")
      .agg(FreqSketch($"word").as("sk"), count(lit(1)).as("n_tokens"))
      .select($"lang", $"n_tokens",
        // the FULL k=64 candidate set as an ARRAY of "item:count" strings —
        // separator-safe: a token containing ',' can't fragment the set
        // (ADVICE r13)
        FreqSketch.topArray($"sk", FreqSketch.DefaultK).as("cand"))
    // exact per-word counts (the verification pass), heavy = c > n/(k+1)
    val heavy = tok.groupBy($"lang", $"word").agg(count(lit(1)).as("c"))
      .join(broadcast(sk), "lang")
      .filter($"c" > $"n_tokens" / lit((FreqSketch.DefaultK + 1).toDouble))
    val heavyStats = heavy.groupBy($"lang").agg(
      count(lit(1)).as("n_heavy"),
      // word ∈ candidates: strip the ":count" suffix at the LAST colon so
      // words containing ':' can't split wrong
      bool_and(array_contains(
        expr("transform(cand, x -> regexp_extract(x, '^(.*):[0-9]+$', 1))"),
        $"word")).as("all_found"))
    sk.join(heavyStats, Seq("lang"), "left")
      .select($"lang", $"n_tokens",
        coalesce($"n_heavy", lit(0L)).as("n_heavy"),
        coalesce($"all_found", lit(true)).as("guarantee_ok"))
      .orderBy($"lang")
  }

  val q108Sql: String =
    """WITH tok AS (
      |  SELECT lang, unnest(list_filter(string_split(text, ' '),
      |                      x -> length(x) > 0)) AS word
      |  FROM documents),
      |tot AS (SELECT lang, count(*) AS n_tokens FROM tok GROUP BY lang),
      |cnt AS (SELECT lang, word, count(*) AS c FROM tok GROUP BY lang, word),
      |heavy AS (
      |  SELECT c.lang, count(*) AS n_heavy
      |  FROM cnt c JOIN tot t ON c.lang = t.lang
      |  WHERE c.c > t.n_tokens / 65.0
      |  GROUP BY c.lang)
      |SELECT t.lang, t.n_tokens,
      |  coalesce(h.n_heavy, 0)::BIGINT AS n_heavy,
      |  TRUE AS guarantee_ok
      |FROM tot t LEFT JOIN heavy h ON t.lang = h.lang
      |ORDER BY t.lang""".stripMargin

  // ---------------------------------------------------------------- q111
  /** HEAPS'-LAW FIT via SQL:2016 linear-regression aggregates (the regr_*
    * family — §2.4's last uncovered aggregate group): regress
    * ln(distinct words) on ln(tokens) across documents. Heaps' law says
    * types ≈ K·tokens^β, so the slope IS β and the intercept is ln K —
    * the corpus-statistics sanity check (β far from ~0.4-0.6 flags
    * synthetic/degenerate text) computed in ONE partial→final aggregate
    * pass, no per-doc state. Rounded to 4 decimals (q20's float rule). */
  def q111(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir)
      .select(expr("filter(split(text, ' '), x -> length(x) > 0)").as("w"))
      .filter(size($"w") >= 1)
      .select(log(size($"w").cast("double")).as("lx"),
        log(expr("size(array_distinct(w))").cast("double")).as("ly"))
      .agg(
        round(expr("regr_slope(ly, lx)"), 4).as("heaps_beta"),
        round(expr("regr_intercept(ly, lx)"), 4).as("heaps_ln_k"),
        round(expr("regr_r2(ly, lx)"), 4).as("r2"),
        expr("regr_count(ly, lx)").cast("long").as("n_docs"))
  }

  val q111Sql: String =
    """WITH d AS (
      |  SELECT ln(len(w)::DOUBLE) AS lx, ln(len(list_distinct(w))::DOUBLE) AS ly
      |  FROM (SELECT list_filter(string_split(text, ' '), x -> length(x) > 0) AS w
      |        FROM documents)
      |  WHERE len(w) >= 1)
      |SELECT round(regr_slope(ly, lx), 4) AS heaps_beta,
      |       round(regr_intercept(ly, lx), 4) AS heaps_ln_k,
      |       round(regr_r2(ly, lx), 4) AS r2,
      |       regr_count(ly, lx)::BIGINT AS n_docs
      |FROM d""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q46_text_stats"       -> q46,
    "q47_text_langid"      -> q47,
    "q48_text_tokens"      -> q48,
    "q49_text_fingerprint" -> q49,
    "q69_text_nfc"         -> q69,
    "q84_token_vocab"      -> q84,
    "q124_oov_rate"        -> q124,
    "q87_bpe_pairs"        -> q87,
    "q95_bigram_lm"        -> q95,
    "q97_nb_langid"        -> q97,
    "q99_tfidf_keywords"   -> q99,
    "q103_char_entropy"    -> q103,
    "q105_bpe_encode"      -> q105,
    "q108_heavy_hitters"   -> q108,
    "q111_heaps_law"       -> q111)

  /** `def`, not `val`: the q105 entry exists only once a q105 run has
    * trained a model in this JVM (Verify's flow), rendered from that
    * exact model; before that the driver's rows-only fallback applies. */
  def oracleSql: Map[String, String] = Option(q105Model.get())
    .map(m => Map("q105_bpe_encode" -> q105Sql(m))).getOrElse(Map.empty) ++ Map(
    "q46_text_stats"       -> q46Sql,
    "q47_text_langid"      -> q47Sql,
    "q48_text_tokens"      -> q48Sql,
    "q49_text_fingerprint" -> q49Sql,
    "q69_text_nfc"         -> q69Sql,
    "q84_token_vocab"      -> q84Sql,
    "q124_oov_rate"        -> q124Sql,
    "q87_bpe_pairs"        -> q87Sql,
    "q95_bigram_lm"        -> q95Sql,
    "q97_nb_langid"        -> q97Sql,
    "q99_tfidf_keywords"   -> q99Sql,
    "q103_char_entropy"    -> q103Sql,
    "q108_heavy_hitters"   -> q108Sql,
    "q111_heaps_law"       -> q111Sql)
}
