package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Pin.PinSyntax

/** Text-analysis operators for a training-data pipeline over `documents`:
  * stopword-heuristic language ID, quality scoring, token counting, and
  * content fingerprinting. All single-pass narrow transforms — no shuffle
  * at all except where a groupBy is the point; these run at scan speed on
  * 100 TB.
  */
object TextQueries {

  private def viewDocs(spark: SparkSession, dir: String): Unit =
    spark.read.parquet(s"$dir/documents.parquet").createOrReplaceTempView("documents")

  // ── text_langid ★ — stopword-list scoring; highest count wins, ties
  // resolved in fixed language order (en, es, de, fr).
  private val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "was", "for"),
    "es" -> Seq("el", "la", "de", "que", "en", "los", "se", "por"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "ist", "von", "mit"),
    "fr" -> Seq("le", "les", "et", "des", "un", "une", "dans", "pour"))

  private def scoreSpark(words: Seq[String]) =
    s"size(filter(ws, w -> array_contains(array(${words.map("'" + _ + "'").mkString(",")}), w)))"
  private def scoreDuck(words: Seq[String]) =
    s"len(list_filter(ws, w -> list_contains([${words.map("'" + _ + "'").mkString(",")}], w)))"

  def textLangid(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    val scores = stopwords.map { case (l, w) => s"${scoreSpark(w)} AS s_$l" }.mkString(",\n  ")
    val caseChain = stopwords.map { case (l, _) =>
      s"WHEN s_$l >= greatest(${stopwords.map("s_" + _._1).mkString(", ")}) THEN '$l'"
    }.mkString(" ")
    spark.sql(
      s"""WITH scored AS (
         |  SELECT doc_id, $scores
         |  FROM (SELECT doc_id, split(text, ' ') AS ws FROM documents))
         |SELECT doc_id, s_en, s_es, s_de, s_fr,
         |       CASE $caseChain ELSE 'und' END AS predicted_lang
         |FROM scored""".stripMargin)
  }

  val textLangidSql: String = {
    val scores = stopwords.map { case (l, w) => s"${scoreDuck(w)} AS s_$l" }.mkString(",\n  ")
    val caseChain = stopwords.map { case (l, _) =>
      s"WHEN s_$l >= greatest(${stopwords.map("s_" + _._1).mkString(", ")}) THEN '$l'"
    }.mkString(" ")
    s"""WITH scored AS (
       |  SELECT doc_id, $scores
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents))
       |SELECT doc_id, s_en, s_es, s_de, s_fr,
       |       CASE $caseChain ELSE 'und' END AS predicted_lang
       |FROM scored""".stripMargin
  }

  // ── text_quality ★ — length / repetition / digit-ratio features folded
  // into a bounded quality score.
  //
  // The score formula is the SINGLE SOURCE OF TRUTH for document
  // admission: `pipe_curation` and the streaming gate
  // (graft.streaming.CorpusIngest) evaluate these exact builders, so a
  // document admitted by the stream matches what the batch funnel keeps.
  // Both engines evaluate the same arithmetic in the same order → the
  // doubles agree bit-for-bit.

  /** Spark SQL quality expression over a raw text column. */
  private[graft] def qualitySpark(t: String): String =
    s"""0.4 * least(CAST(size(split($t, ' ')) AS DOUBLE) / 100.0, 1.0)
       |  + 0.3 * (CAST(size(array_distinct(split($t, ' '))) AS DOUBLE)
       |             / size(split($t, ' ')))
       |  + 0.3 * (1.0 - CAST(length($t) -
       |             length(regexp_replace($t, '[0-9]', '')) AS DOUBLE)
       |             / length($t))""".stripMargin

  /** DuckDB quality expression — same arithmetic, dialect-translated. */
  private[graft] def qualityDuck(t: String): String =
    s"""0.4 * least(CAST(len(string_split($t, ' ')) AS DOUBLE) / 100.0, 1.0)
       |  + 0.3 * (CAST(len(list_distinct(string_split($t, ' '))) AS DOUBLE)
       |             / len(string_split($t, ' ')))
       |  + 0.3 * (1.0 - CAST(length($t) -
       |             length(regexp_replace($t, '[0-9]', '', 'g')) AS DOUBLE)
       |             / length($t))""".stripMargin

  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      s"""SELECT doc_id,
         |       size(split(text, ' ')) AS n_words,
         |       CAST(size(array_distinct(split(text, ' '))) AS DOUBLE)
         |         / size(split(text, ' ')) AS distinct_ratio,
         |       CAST(length(text) - length(regexp_replace(text, '[0-9]', ''))
         |         AS DOUBLE) / length(text) AS digit_ratio,
         |       ${qualitySpark("text")} AS quality
         |FROM documents""".stripMargin)
  }

  val textQualitySql: String =
    s"""SELECT doc_id,
       |       CAST(len(string_split(text, ' ')) AS INT) AS n_words,
       |       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |         / len(string_split(text, ' ')) AS distinct_ratio,
       |       CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
       |         AS DOUBLE) / length(text) AS digit_ratio,
       |       ${qualityDuck("text")} AS quality
       |FROM documents""".stripMargin

  // ── text_token_count ★ — whitespace tokens, a BPE-ish regex token
  // count (letter runs / digit runs / single punctuation), and the
  // chars/4 estimate.
  def textTokenCount(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      """SELECT doc_id,
        |       size(split(trim(text), '\\s+')) AS ws_tokens,
        |       size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)) AS bpe_tokens,
        |       cast(ceil(length(text) / 4.0) as bigint) AS est_tokens
        |FROM documents""".stripMargin)
  }

  val textTokenCountSql: String =
    """SELECT doc_id,
      |       CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS ws_tokens,
      |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS bpe_tokens,
      |       CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens
      |FROM documents""".stripMargin

  // ── text_fingerprint ★ — polynomial (Horner) rolling hash over the
  // character stream, mod 1e9+7; plus the same over the lowercased text.
  // Left fold in both engines → identical values.
  def textFingerprint(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      """SELECT doc_id,
        |  aggregate(transform(sequence(1, length(text)),
        |      i -> cast(ascii(substring(text, i, 1)) as bigint)),
        |    0L, (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint,
        |  aggregate(transform(sequence(1, length(text)),
        |      i -> cast(ascii(substring(lower(text), i, 1)) as bigint)),
        |    0L, (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint_lower
        |FROM documents""".stripMargin)
  }

  val textFingerprintSql: String =
    """SELECT doc_id,
      |  list_reduce([0] || list_transform(range(1, strlen(text) + 1),
      |      i -> ascii(substr(text, i, 1))::BIGINT),
      |    (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint,
      |  list_reduce([0] || list_transform(range(1, strlen(text) + 1),
      |      i -> ascii(substr(lower(text), i, 1))::BIGINT),
      |    (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint_lower
      |FROM documents""".stripMargin

  // ── text_ngram_topk ★ — most frequent word bigrams per language:
  // explode → partial-aggregated count → per-group top-k window. The
  // classic corpus-statistics shape; the groupBy count is map-side
  // combined so the shuffle carries (lang, gram) partials, not rows.
  def textNgramTopk(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      """WITH grams AS (
        |  SELECT lang, gram
        |  FROM (SELECT lang, split(text, ' ') AS ws FROM documents)
        |  LATERAL VIEW explode(transform(sequence(1, greatest(size(ws) - 1, 1)),
        |    i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))) AS gram
        |  WHERE size(ws) >= 2),
        |counts AS (
        |  SELECT lang, gram, count(*) AS cnt FROM grams GROUP BY lang, gram),
        |ranked AS (
        |  SELECT lang, gram, cnt,
        |         row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, gram) AS rnk
        |  FROM counts)
        |SELECT lang, gram, cnt, cast(rnk as int) AS rnk
        |FROM ranked WHERE rnk <= 3""".stripMargin)
  }

  val textNgramTopkSql: String =
    """WITH grams AS (
      |  SELECT lang,
      |         unnest(list_transform(range(1, greatest(len(ws) - 1, 1) + 1),
      |           i -> ws[i] || ' ' || ws[i + 1])) AS gram
      |  FROM (SELECT lang, string_split(text, ' ') AS ws FROM documents)
      |  WHERE len(ws) >= 2),
      |counts AS (
      |  SELECT lang, gram, count(*) AS cnt FROM grams GROUP BY lang, gram),
      |ranked AS (
      |  SELECT lang, gram, cnt,
      |         row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, gram) AS rnk
      |  FROM counts)
      |SELECT lang, gram, cnt, CAST(rnk AS INT) AS rnk
      |FROM ranked WHERE rnk <= 3""".stripMargin

  // ── text_collocations ★ (r11) — statistical phrase mining: the
  // bigrams whose observed frequency most exceeds what their parts
  // predict (unnormalized LIFT — the PMI exponent without the log, so
  // the score stays integer-exact: c_ab·N·1e6 / (c_a·c_b), staged as two
  // bounded integer divisions to keep headroom at any corpus size). The
  // collocation list is what phrase-aware tokenizers and stopword-phrase
  // filters train from. Min support 5 cuts hapax noise; ties break on
  // the bigram text.
  // Shape: explode → two map-side-combined counts → equi-joins on the
  // word; the ranking window partitions by lang over candidate bigrams
  // (vocab²-bounded, tiny) — never raw tokens.
  def textCollocations(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      """WITH words AS (
        |  SELECT lang, w
        |  FROM (SELECT lang, split(text, ' ') AS ws FROM documents)
        |  LATERAL VIEW explode(ws) AS w),
        |uni AS (
        |  SELECT lang, w, CAST(count(*) AS BIGINT) AS c FROM words
        |  GROUP BY lang, w),
        |totals AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS nw FROM words GROUP BY lang),
        |grams AS (
        |  SELECT lang, element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2
        |  FROM (SELECT lang, split(text, ' ') AS ws FROM documents)
        |  LATERAL VIEW explode(sequence(1, greatest(size(ws) - 1, 1))) AS i
        |  WHERE size(ws) >= 2),
        |big AS (
        |  SELECT lang, w1, w2, CAST(count(*) AS BIGINT) AS c_ab FROM grams
        |  GROUP BY lang, w1, w2),
        |scored AS (
        |  SELECT b.lang, concat(b.w1, ' ', b.w2) AS bigram, b.c_ab,
        |         CAST((b.c_ab * 1000000 div u1.c) * t.nw div u2.c AS BIGINT)
        |           AS lift_micro
        |  FROM big b
        |  JOIN uni u1 ON b.lang = u1.lang AND b.w1 = u1.w
        |  JOIN uni u2 ON b.lang = u2.lang AND b.w2 = u2.w
        |  JOIN totals t ON b.lang = t.lang
        |  WHERE b.c_ab >= 5),
        |ranked AS (
        |  SELECT lang, bigram, c_ab, lift_micro,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY lift_micro DESC, bigram) AS rnk
        |  FROM scored)
        |SELECT lang, bigram, c_ab, lift_micro, CAST(rnk AS INT) AS rnk
        |FROM ranked WHERE rnk <= 10""".stripMargin)
  }

  val textCollocationsSql: String =
    """WITH words AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
      |uni AS (
      |  SELECT lang, w, CAST(count(*) AS BIGINT) AS c FROM words
      |  GROUP BY lang, w),
      |totals AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS nw FROM words GROUP BY lang),
      |grams AS (
      |  SELECT lang,
      |         unnest(list_transform(range(1, greatest(len(ws) - 1, 0) + 1),
      |           i -> ws[i])) AS w1,
      |         unnest(list_transform(range(1, greatest(len(ws) - 1, 0) + 1),
      |           i -> ws[i + 1])) AS w2
      |  FROM (SELECT lang, string_split(text, ' ') AS ws FROM documents)
      |  WHERE len(ws) >= 2),
      |big AS (
      |  SELECT lang, w1, w2, CAST(count(*) AS BIGINT) AS c_ab FROM grams
      |  GROUP BY lang, w1, w2),
      |scored AS (
      |  SELECT b.lang, b.w1 || ' ' || b.w2 AS bigram, b.c_ab,
      |         CAST((b.c_ab * 1000000 // u1.c) * t.nw // u2.c AS BIGINT)
      |           AS lift_micro
      |  FROM big b
      |  JOIN uni u1 ON b.lang = u1.lang AND b.w1 = u1.w
      |  JOIN uni u2 ON b.lang = u2.lang AND b.w2 = u2.w
      |  JOIN totals t ON b.lang = t.lang
      |  WHERE b.c_ab >= 5),
      |ranked AS (
      |  SELECT lang, bigram, c_ab, lift_micro,
      |         row_number() OVER (PARTITION BY lang
      |           ORDER BY lift_micro DESC, bigram) AS rnk
      |  FROM scored)
      |SELECT lang, bigram, c_ab, lift_micro, CAST(rnk AS INT) AS rnk
      |FROM ranked WHERE rnk <= 10""".stripMargin

  // ── sample_stratified ★ — deterministic stratified sampling: a
  // hash-gated 20% Bernoulli sample (reproducible across runs/engines,
  // unlike rand()), then a per-source quota of 10 via ranked window — the
  // standard "cap per domain" mix-building step.
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      """WITH sampled AS (
        |  SELECT doc_id, source, n_chars
        |  FROM documents
        |  WHERE cast(conv(substr(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint) % 100 < 20),
        |ranked AS (
        |  SELECT doc_id, source, n_chars,
        |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rnk
        |  FROM sampled)
        |SELECT doc_id, source, n_chars FROM ranked WHERE rnk <= 10""".stripMargin)
  }

  val sampleStratifiedSql: String =
    """WITH sampled AS (
      |  SELECT doc_id, source, n_chars
      |  FROM documents
      |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 20),
      |ranked AS (
      |  SELECT doc_id, source, n_chars,
      |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rnk
      |  FROM sampled)
      |SELECT doc_id, source, n_chars FROM ranked WHERE rnk <= 10""".stripMargin

  // ── text_length_histogram ★ — corpus length distribution in 50-char
  // buckets: the single-pass profiling aggregate run before filtering
  // decisions.
  def textLengthHistogram(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      """SELECT cast(floor(n_chars / 50) as int) AS bucket,
        |       count(*) AS docs,
        |       min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY 1""".stripMargin)
  }

  val textLengthHistogramSql: String =
    """SELECT CAST(n_chars // 50 AS INT) AS bucket,
      |       count(*) AS docs,
      |       min(n_chars) AS min_chars, max(n_chars) AS max_chars
      |FROM documents GROUP BY 1""".stripMargin

  // ── text_length_quantiles ★ — EXACT p25/p50/p75 of document length,
  // computed the way a 100 TB job must: no global sort. Phase 1 is a
  // bucket histogram (one map-side-combined agg) with a prefix sum over
  // the BUCKET table (tiny — keyspan/64 rows, the GlobalOrder trick);
  // phase 2 ranks only inside each quantile's target bucket. The quantile
  // is discrete (element at global index floor((n-1)·q) under
  // (n_chars, doc_id) order), so the answer is a real corpus value and
  // the whole computation is engine-exact — unlike interpolated
  // percentile built-ins, whose float blends differ across engines. The
  // oracle ranks the full relation directly; matching it bit-for-bit
  // proves the two-phase selection exact.
  def textLengthQuantiles(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      """WITH t AS (SELECT doc_id, n_chars FROM documents),
        |n AS (SELECT count(*) AS n FROM t),
        |targets AS (
        |  SELECT q, CAST(floor((n.n - 1) * q) AS BIGINT) AS idx
        |  FROM (SELECT explode(array(CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
        |                             CAST(0.75 AS DOUBLE))) AS q) CROSS JOIN n),
        |buckets AS (
        |  SELECT CAST(n_chars div 64 AS BIGINT) AS b, count(*) AS c
        |  FROM t GROUP BY 1),
        |cum AS (
        |  SELECT b, c, sum(c) OVER (ORDER BY b
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end
        |  FROM buckets),
        |located AS (
        |  SELECT g.q, g.idx, min(cum.b) AS target_b
        |  FROM targets g JOIN cum ON cum.cum_end > g.idx
        |  GROUP BY g.q, g.idx),
        |ranked AS (
        |  SELECT l.q, l.idx, t.n_chars, c2.cum_end - c2.c AS cum_before,
        |         row_number() OVER (PARTITION BY l.q
        |           ORDER BY t.n_chars, t.doc_id) AS r
        |  FROM located l
        |  JOIN t ON CAST(t.n_chars div 64 AS BIGINT) = l.target_b
        |  JOIN cum c2 ON c2.b = l.target_b)
        |SELECT q, n_chars AS value
        |FROM ranked WHERE cum_before + r - 1 = idx""".stripMargin)
  }

  val textLengthQuantilesSql: String =
    """WITH t AS (SELECT doc_id, n_chars FROM documents),
      |n AS (SELECT count(*) AS n FROM t),
      |targets AS (
      |  SELECT q::DOUBLE AS q, CAST(floor((n.n - 1) * q::DOUBLE) AS BIGINT) AS idx
      |  FROM (VALUES (0.25), (0.5), (0.75)) qs(q) CROSS JOIN n),
      |ranked AS (
      |  SELECT n_chars,
      |         row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS gidx
      |  FROM t)
      |SELECT g.q, r.n_chars AS value
      |FROM targets g JOIN ranked r ON r.gidx = g.idx""".stripMargin

  // ── text_scrub ★ — redaction pass: mask digit runs (the stand-in for
  // PII patterns like phone numbers), report how much was redacted. A
  // narrow regexp transform — scan-speed at any scale.
  def textScrub(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      """SELECT doc_id,
        |       regexp_replace(text, '[0-9]+', '<NUM>') AS scrubbed,
        |       size(regexp_extract_all(text, '[0-9]+', 0)) AS redactions
        |FROM documents WHERE doc_id % 5 = 0""".stripMargin)
  }

  val textScrubSql: String =
    """SELECT doc_id,
      |       regexp_replace(text, '[0-9]+', '<NUM>', 'g') AS scrubbed,
      |       CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS redactions
      |FROM documents WHERE doc_id % 5 = 0""".stripMargin

  // ── text_repetition ★ — Gopher-style repetition signal: the fraction
  // of word trigrams that are repeats of an earlier trigram in the same
  // document. High values flag boilerplate / TV-static text that survives
  // per-word distinct ratios. Narrow per-row array work — scan speed.
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      """WITH tri AS (
        |  SELECT doc_id,
        |         transform(sequence(1, size(ws) - 2),
        |           i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1),
        |                       ' ', element_at(ws, i + 2))) AS g
        |  FROM (SELECT doc_id, split(text, ' ') AS ws FROM documents)
        |  WHERE size(ws) >= 3)
        |SELECT doc_id, size(g) AS n_trigrams,
        |       size(array_distinct(g)) AS n_distinct_trigrams,
        |       1.0 - CAST(size(array_distinct(g)) AS DOUBLE) / size(g)
        |         AS rep_ratio
        |FROM tri""".stripMargin)
  }

  val textRepetitionSql: String =
    """WITH tri AS (
      |  SELECT doc_id,
      |         list_transform(range(1, len(ws) - 1),
      |           i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]) AS g
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      |  WHERE len(ws) >= 3)
      |SELECT doc_id, CAST(len(g) AS INT) AS n_trigrams,
      |       CAST(len(list_distinct(g)) AS INT) AS n_distinct_trigrams,
      |       1.0::DOUBLE - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)
      |         AS rep_ratio
      |FROM tri""".stripMargin

  // ── pipe_curation ★ — the end-to-end curation funnel a training-data
  // pipeline runs: exact-dedup (keeper = min doc_id per content hash)
  // → quality gate (text_quality's score ≥ 0.5) → per-language kept-token
  // accounting. One aggregation over one join against the tiny keeper
  // side; the whole funnel is a single shuffle on the content hash plus a
  // map-side-combined groupBy — the shape that matters when "documents"
  // is 100 TB. Demonstrates that the individual operators compose.
  private val curationCorpus =
    """SELECT doc_id, text, lang FROM documents
      |UNION ALL
      |SELECT doc_id + 100000 AS doc_id, text, lang
      |FROM documents WHERE doc_id % 5 = 0""".stripMargin

  def pipeCuration(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      s"""WITH corpus AS ($curationCorpus),
         |feats AS (
         |  SELECT doc_id, lang, md5(text) AS h,
         |         cast(ceil(length(text) / 4.0) as bigint) AS est_tokens,
         |         ${qualitySpark("text")} AS quality
         |  FROM corpus),
         |keepers AS (SELECT h, min(doc_id) AS keeper FROM feats GROUP BY h),
         |flagged AS (
         |  SELECT f.lang, f.est_tokens, f.quality,
         |         CASE WHEN f.doc_id = k.keeper THEN 1 ELSE 0 END AS is_keeper
         |  FROM feats f JOIN keepers k ON f.h = k.h)
         |SELECT lang,
         |       count(*) AS docs_in,
         |       CAST(sum(CASE WHEN is_keeper = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS dropped_dup,
         |       CAST(sum(CASE WHEN is_keeper = 1 AND quality < 0.5 THEN 1 ELSE 0 END)
         |         AS BIGINT) AS dropped_quality,
         |       CAST(sum(CASE WHEN is_keeper = 1 AND quality >= 0.5 THEN 1 ELSE 0 END)
         |         AS BIGINT) AS docs_kept,
         |       CAST(sum(CASE WHEN is_keeper = 1 AND quality >= 0.5 THEN est_tokens
         |                     ELSE 0 END) AS BIGINT) AS tokens_kept
         |FROM flagged GROUP BY lang""".stripMargin)
  }

  val pipeCurationSql: String =
    s"""WITH corpus AS ($curationCorpus),
       |feats AS (
       |  SELECT doc_id, lang, md5(text) AS h,
       |         CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens,
       |         ${qualityDuck("text")} AS quality
       |  FROM corpus),
       |keepers AS (SELECT h, min(doc_id) AS keeper FROM feats GROUP BY h),
       |flagged AS (
       |  SELECT f.lang, f.est_tokens, f.quality,
       |         CASE WHEN f.doc_id = k.keeper THEN 1 ELSE 0 END AS is_keeper
       |  FROM feats f JOIN keepers k ON f.h = k.h)
       |SELECT lang,
       |       count(*) AS docs_in,
       |       CAST(sum(CASE WHEN is_keeper = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS dropped_dup,
       |       CAST(sum(CASE WHEN is_keeper = 1 AND quality < 0.5 THEN 1 ELSE 0 END)
       |         AS BIGINT) AS dropped_quality,
       |       CAST(sum(CASE WHEN is_keeper = 1 AND quality >= 0.5 THEN 1 ELSE 0 END)
       |         AS BIGINT) AS docs_kept,
       |       CAST(sum(CASE WHEN is_keeper = 1 AND quality >= 0.5 THEN est_tokens
       |                     ELSE 0 END) AS BIGINT) AS tokens_kept
       |FROM flagged GROUP BY lang""".stripMargin

  // ── text_ngram_novelty ★ — corpus-frequency novelty score: the
  // fraction of a document's DISTINCT word bigrams that are corpus-rare
  // (total count ≤ 2). Boilerplate-heavy documents (license headers, nav
  // chrome, template spam) score near 0 because their grams repeat across
  // the corpus; genuinely novel text scores near 1 — the cheap
  // cross-document quality signal data-pruning recipes cut on (the
  // count-based stand-in for an LM perplexity filter; no transcendentals
  // so the score is engine-exact). Shape: explode distinct grams → one
  // map-side-combined corpus count keyed on the gram → join doc grams
  // back on the gram → per-doc agg. Three shuffles, all hash-keyed on
  // high-cardinality keys (gram, then doc_id) — no all-pairs, no skew
  // hotspot beyond an ordinary hot gram, which the count agg absorbs
  // map-side.
  def textNgramNovelty(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      """WITH grams AS (
        |  SELECT doc_id, gram
        |  FROM (SELECT doc_id, split(text, ' ') AS ws FROM documents)
        |  LATERAL VIEW explode(array_distinct(
        |    transform(sequence(1, greatest(size(ws) - 1, 1)),
        |      i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1))))) AS gram
        |  WHERE size(ws) >= 2),
        |freq AS (
        |  SELECT gram, count(*) AS cnt FROM grams GROUP BY gram)
        |SELECT g.doc_id,
        |       CAST(count(*) AS BIGINT) AS n_grams,
        |       CAST(sum(CASE WHEN f.cnt <= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_rare,
        |       CAST(sum(CASE WHEN f.cnt <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(count(*) AS DOUBLE) AS novelty
        |FROM grams g JOIN freq f ON g.gram = f.gram
        |GROUP BY g.doc_id""".stripMargin)
  }

  val textNgramNoveltySql: String =
    """WITH grams AS (
      |  SELECT doc_id,
      |         unnest(list_distinct(list_transform(
      |           range(1, greatest(len(ws) - 1, 1) + 1),
      |           i -> ws[i] || ' ' || ws[i + 1]))) AS gram
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      |  WHERE len(ws) >= 2),
      |freq AS (
      |  SELECT gram, count(*) AS cnt FROM grams GROUP BY gram)
      |SELECT g.doc_id,
      |       CAST(count(*) AS BIGINT) AS n_grams,
      |       CAST(sum(CASE WHEN f.cnt <= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_rare,
      |       CAST(sum(CASE WHEN f.cnt <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
      |         / CAST(count(*) AS DOUBLE) AS novelty
      |FROM grams g JOIN freq f ON g.gram = f.gram
      |GROUP BY g.doc_id""".stripMargin

  // ── text_heavy_hitters (r8) — exact heavy-hitter word bigrams per
  // language (frequency > n/1024: the dominant-collocation report a
  // stopword/boilerplate induction pass starts from). The naive plan is a
  // full `GROUP BY gram` — at 100 TB that shuffles the entire gram
  // vocabulary (billions of keys) to find a few hundred survivors. The
  // scale path is a two-pass sketch-then-verify:
  //   1. `mg_candidates(gram, 4096)` — the Misra–Gries summary as a
  //      TypedImperativeAggregate (expr/MisraGries.scala): each executor
  //      folds its partitions into a ≤4096-counter buffer, the shuffle
  //      carries ≤4096 entries per language, and the MG bound guarantees
  //      every gram with count > n/4096 ⊇ every heavy hitter survives.
  //   2. Exact recount of ONLY the candidates (broadcast semi-join —
  //      candidate set is ≤ 4096·langs rows by construction) and the
  //      exact threshold filter.
  // The summary's surviving SET is fold-order dependent, but recall is
  // total at 4x headroom (threshold n/1024 vs bound n/4096), so the
  // post-verify output is deterministic and engine-exact — the same
  // sketch-prefilter-exact-verify discipline as pipe_decontaminate_bloom.
  // The DuckDB oracle is the naive exact plan; MisraGriesSpec pins the
  // MG guarantee itself on a skewed stream whose vocabulary exceeds K.
  // The gram relation is recomputed per consumer (scan-speed narrow
  // explode) rather than pinned: at 100 TB the exploded grams dwarf the
  // corpus, so a checkpoint would cost more than the extra scans.
  def textHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    graft.expr.GraftFunctions.register(spark)
    // Pass 1 computes the gram total AND the MG summary in ONE
    // aggregation (they share the grams scan), pinned as a
    // langs-count-sized table — Catalyst would otherwise inline the CTE
    // into each of its two consumers and run the summary twice. Pass 2
    // is the exact recount of the broadcast candidates. Two corpus
    // scans total; the gram explode itself is never pinned (at 100 TB
    // the exploded grams dwarf the corpus, so a checkpoint would cost
    // more than the second scan).
    spark.sql(
      """WITH grams AS (
        |  SELECT lang, gram
        |  FROM documents LATERAL VIEW explode(word_bigrams(text)) AS gram)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_grams,
        |       mg_candidates(gram, 4096) AS mg
        |FROM grams GROUP BY lang""".stripMargin)
      .pinned()
      .createOrReplaceTempView("hh_summary_t")
    spark.sql(
      """WITH grams AS (
        |  SELECT lang, gram
        |  FROM documents LATERAL VIEW explode(word_bigrams(text)) AS gram),
        |cand AS (
        |  SELECT lang, n_grams, gram
        |  FROM hh_summary_t LATERAL VIEW explode(mg) AS gram),
        |exact AS (
        |  SELECT /*+ BROADCAST(c) */ g.lang, g.gram, c.n_grams,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM grams g JOIN cand c ON g.lang = c.lang AND g.gram = c.gram
        |  GROUP BY g.lang, g.gram, c.n_grams)
        |SELECT lang, gram, cnt,
        |       CAST(cnt AS DOUBLE) / n_grams AS share
        |FROM exact WHERE cnt * 1024 > n_grams""".stripMargin)
  }

  val textHeavyHittersSql: String =
    """WITH ws AS (SELECT lang, string_split(text, ' ') AS w FROM documents),
      |grams AS (
      |  SELECT lang, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])) AS gram
      |  FROM ws WHERE len(w) >= 2),
      |tot AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_grams FROM grams GROUP BY lang),
      |exact AS (
      |  SELECT lang, gram, CAST(count(*) AS BIGINT) AS cnt
      |  FROM grams GROUP BY lang, gram)
      |SELECT e.lang, e.gram, e.cnt,
      |       CAST(e.cnt AS DOUBLE) / t.n_grams AS share
      |FROM exact e JOIN tot t ON e.lang = t.lang
      |WHERE e.cnt * 1024 > t.n_grams""".stripMargin

  // ── text_encoding_quality ★ — encoding-damage detection (the validity
  // filter C4-style pipelines run before any content scoring): count
  // C0 control characters (minus tab/LF/CR, which legitimate text
  // carries), U+FFFD replacement characters (the scar mis-decoded bytes
  // leave), and report the clean-character ratio + a binary verdict.
  // Narrow single-pass regexp/replace arithmetic — scan speed at any
  // scale; counts are exact integers, the one ratio a single IEEE
  // division. The fixture corpus is clean (all rows verdict 1), which
  // the oracle proves; `TextEncodingSpec` pins DETECTION on a bespoke
  // mojibake fixture the driver data can't provide.
  // NOTE the per-engine regex escaping: Spark's SQL parser processes
  // backslash escapes in string literals (so the regex `\x00` must be
  // written `\\x00` in the SQL text); DuckDB single-quoted literals pass
  // backslashes through verbatim.
  // The U+FFFD needle is an embedded literal, NOT chr(65533): Spark's
  // char()/chr() wraps its argument mod 256, so chr(65533) is 'ý' there
  // while DuckDB's chr() yields the real replacement character.
  private val Replacement = "\uFFFD"

  private def encodingSql(pat: String, replaceAllFlag: String): String =
    s"""SELECT doc_id,
       |  CAST(length(text) AS BIGINT) AS n_chars,
       |  CAST(length(text) - length(regexp_replace(text,
       |    '$pat', ''$replaceAllFlag)) AS BIGINT)
       |    AS ctrl_chars,
       |  CAST(length(text) - length(replace(text, '$Replacement', ''))
       |    AS BIGINT) AS replacement_chars,
       |  CAST(length(regexp_replace(text,
       |    '$pat', ''$replaceAllFlag)) -
       |    (length(text) - length(replace(text, '$Replacement', '')))
       |    AS DOUBLE) / length(text) AS clean_ratio,
       |  CASE WHEN length(text) = length(regexp_replace(text,
       |         '$pat', ''$replaceAllFlag))
       |        AND length(text) = length(replace(text, '$Replacement', ''))
       |       THEN 1 ELSE 0 END AS verdict
       |FROM documents WHERE length(text) > 0""".stripMargin

  private[graft] val textEncodingQualitySparkSql =
    encodingSql("[\\\\x00-\\\\x08\\\\x0b\\\\x0c\\\\x0e-\\\\x1f]", "")

  def textEncodingQuality(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(textEncodingQualitySparkSql)
  }

  val textEncodingQualitySql: String =
    encodingSql("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", ", 'g'")

  // ── text_spell_pairs ★ (r11) — bounded EDIT-DISTANCE similarity join
  // over the corpus vocabulary (the typo/variant-mining operator): all
  // distinct word pairs with Levenshtein ≤ 2, WITHOUT the all-pairs
  // vocabulary join. Candidates come from the FastSS deletion
  // neighborhood (Bocek et al. 2007): ed(x, y) ≤ k ⟹ the ≤k-deletion
  // neighborhoods of x and y intersect (factor an optimal edit script
  // into ≤k deletions from each side onto the common matched
  // subsequence), so an equi-join on D≤2 variants has EXACT recall and
  // the exact levenshtein verifies the survivors — same
  // filter-and-refine discipline as dd_prefix_jaccard, for the edit
  // metric. The oracle is the naive all-pairs definition: the hash match
  // is the machine-checked losslessness proof.
  //
  // Scale shape (100 TB): everything is VOCAB-sized, never corpus-sized
  // — one map-side-combined word count, then a ≤(1+L+L²/2)-wide variant
  // explode (L capped at 24) and an equi-join on the variant key. The
  // "" variant key (reachable only from words of length ≤ 2) is the one
  // super-node and is alphabet-bounded (≤ 26+26² members) by
  // construction. At production vocabularies the usual trims (document-
  // frequency floor, per-variant fan-out cap) bolt onto the same plan.
  private def d1Expr(w: String): String =
    s"transform(sequence(1, length($w)), i -> " +
      s"concat(substring($w, 1, i - 1), substring($w, i + 1)))"

  def textSpellPairs(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      s"""WITH vocab AS (
         |  SELECT word, CAST(count(*) AS BIGINT) AS freq
         |  FROM (SELECT explode(regexp_extract_all(lower(text), '[a-z]+', 0)) AS word
         |        FROM documents)
         |  WHERE length(word) <= 24
         |  GROUP BY word),
         |d1 AS (
         |  SELECT word, freq, u
         |  FROM vocab
         |  LATERAL VIEW explode(array_distinct(
         |    concat(array(word), ${d1Expr("word")}))) AS u),
         |d2 AS (
         |  SELECT DISTINCT word, freq, v
         |  FROM d1
         |  LATERAL VIEW explode(array_distinct(
         |    CASE WHEN length(u) >= 1 THEN concat(array(u), ${d1Expr("u")})
         |         ELSE array(u) END)) AS v),
         |cand AS (
         |  SELECT DISTINCT a.word AS word_a, a.freq AS freq_a,
         |                  b.word AS word_b, b.freq AS freq_b
         |  FROM d2 a JOIN d2 b ON a.v = b.v AND a.word < b.word)
         |SELECT word_a, word_b,
         |       CAST(levenshtein(word_a, word_b) AS BIGINT) AS edit_dist,
         |       freq_a, freq_b
         |FROM cand WHERE levenshtein(word_a, word_b) <= 2""".stripMargin)
  }

  /** The NAIVE definition — all vocabulary pairs, no deletion-
    * neighborhood filter: matching this IS the losslessness proof. */
  val textSpellPairsSql: String =
    """WITH vocab AS (
      |  SELECT word, CAST(count(*) AS BIGINT) AS freq
      |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
      |        FROM documents)
      |  WHERE length(word) <= 24
      |  GROUP BY word)
      |SELECT a.word AS word_a, b.word AS word_b,
      |       CAST(levenshtein(a.word, b.word) AS BIGINT) AS edit_dist,
      |       a.freq AS freq_a, b.freq AS freq_b
      |FROM vocab a JOIN vocab b ON a.word < b.word
      |WHERE levenshtein(a.word, b.word) <= 2""".stripMargin

  // ── text_spell_cluster ★ (r11) — VARIANT CLUSTERS over the edit-
  // distance pair graph: connected components of text_spell_pairs'
  // ed ≤ 2 graph (min-label propagation to fixpoint — the dd_cluster
  // machinery applied to the edit metric), each word labeled with its
  // cluster representative (component-min word — deterministic in both
  // engines), cluster size, and the cluster's total corpus frequency —
  // the "canonicalize spelling variants before counting" table a corpus
  // pipeline folds rare variants with. The DuckDB oracle recomputes
  // components by recursive reachability over the NAIVE pair graph, so
  // the compare proves candidate generation AND clustering at once.
  //
  // Scale shape: the propagation loop runs over the PAIR graph (sparse —
  // most vocabulary has no ed-2 neighbor), rounds ≤ component diameter;
  // per round one equi-join + one map-side-combined min. Cluster stats
  // are one vocab-sized agg.
  def textSpellCluster(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val pairs = textSpellPairs(spark, dir)
      .select(col("word_a"), col("word_b"), col("freq_a"), col("freq_b"))
      .pinned()
    val freqs = pairs.select(col("word_a").as("word"), col("freq_a").as("freq"))
      .unionByName(pairs.select(col("word_b").as("word"), col("freq_b").as("freq")))
      .distinct()
    val edges = pairs.select(col("word_a").as("src"), col("word_b").as("dst"))
      .unionByName(pairs.select(col("word_b").as("src"), col("word_a").as("dst")))
      .pinned()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).pinned()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 20) {
      val prop = edges.join(labels, edges("dst") === labels("node"))
        .groupBy(col("src")).agg(min(col("label")).as("nmin"))
      val next = labels.join(prop, labels("node") === prop("src"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
          (coalesce(col("nmin"), col("label")) < col("label")).as("chg"))
        .pinned()
      changed = next.filter(col("chg")).count()
      labels = next.select(col("node"), col("label"))
      rounds += 1
    }
    // The 20-round cap bounds driver iterations, but a variant-chain
    // component with diameter > 20 would exit the loop UNCONVERGED and
    // silently return wrong cluster labels. Fail loudly instead — the
    // dd_cluster discipline: a label-propagation result is only a result
    // if the fixpoint was reached.
    require(changed == 0,
      s"text_spell_cluster: min-label propagation not converged after $rounds " +
        "rounds (a component has diameter > 20); raise the round cap")
    labels.createOrReplaceTempView("spell_labels_t")
    freqs.createOrReplaceTempView("spell_freqs_t")
    spark.sql(
      """WITH stats AS (
        |  SELECT l.label AS rep, CAST(count(*) AS BIGINT) AS cluster_size,
        |         CAST(sum(f.freq) AS BIGINT) AS cluster_freq
        |  FROM spell_labels_t l JOIN spell_freqs_t f ON f.word = l.node
        |  GROUP BY l.label)
        |SELECT l.node AS word, f.freq, l.label AS rep,
        |       s.cluster_size, s.cluster_freq,
        |       CAST(CASE WHEN l.node = l.label THEN 1 ELSE 0 END AS INT)
        |         AS is_rep
        |FROM spell_labels_t l
        |JOIN spell_freqs_t f ON f.word = l.node
        |JOIN stats s ON s.rep = l.label""".stripMargin)
  }

  /** Recursive-reachability oracle over the NAIVE pair graph. */
  val textSpellClusterSql: String =
    """WITH RECURSIVE vocab AS (
      |  SELECT word, CAST(count(*) AS BIGINT) AS freq
      |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
      |        FROM documents)
      |  WHERE length(word) <= 24
      |  GROUP BY word),
      |cand AS (
      |  SELECT a.word AS wa, b.word AS wb
      |  FROM vocab a JOIN vocab b ON a.word < b.word
      |  WHERE levenshtein(a.word, b.word) <= 2),
      |edges AS (
      |  SELECT wa AS src, wb AS dst FROM cand
      |  UNION ALL SELECT wb, wa FROM cand),
      |nodes AS (SELECT DISTINCT src AS node FROM edges),
      |reach(node, peer) AS (
      |  SELECT node, node FROM nodes
      |  UNION
      |  SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.peer),
      |labels AS (SELECT node, min(peer) AS rep FROM reach GROUP BY node),
      |stats AS (
      |  SELECT l.rep, CAST(count(*) AS BIGINT) AS cluster_size,
      |         CAST(sum(v.freq) AS BIGINT) AS cluster_freq
      |  FROM labels l JOIN vocab v ON v.word = l.node
      |  GROUP BY l.rep)
      |SELECT l.node AS word, v.freq, l.rep,
      |       s.cluster_size, s.cluster_freq,
      |       CAST(CASE WHEN l.node = l.rep THEN 1 ELSE 0 END AS INT) AS is_rep
      |FROM labels l
      |JOIN vocab v ON v.word = l.node
      |JOIN stats s ON s.rep = l.rep""".stripMargin

  /** RAKE delimiter set: the en stopword list + the bare article (the
    * fixture's dominant function words; RAKE splits candidate phrases at
    * stopwords — Rose et al. 2010). */
  private val rakeStops: Seq[String] =
    stopwords.head._2 :+ "a"
  /** Longest candidate phrase (words). */
  val RakeMaxPhrase = 4

  // ── text_rake ★ (r11) — RAKE keyword extraction (Rose et al. 2010 —
  // the unsupervised keyphrase classic): candidate phrases are the
  // maximal stopword-free word runs (the cdc-chunk running-sum grouping
  // pattern: runs split where a delimiter increments the run id), each
  // word scores degree/frequency over candidate members (degree = Σ
  // phrase length over its occurrences — co-occurrence credit), and a
  // phrase scores the sum of its members — top-10 phrases by score.
  // Engine-exact: integer micro-unit word scores (deg·1e6 div freq),
  // phrase scores are BIGINT sums, ties break on the phrase text.
  //
  // Scale shape (100 TB): one position explode + one doc-partitioned
  // running-sum window + vocabulary-sized aggregations; the phrase/word
  // joins are equi-joins on (doc, run) and word keys. TakeOrderedAnd-
  // Project for the cut.
  private def rakeBody(idiv: String, stopList: String,
      phraseAgg: String): String =
    s"""marked AS (
       |  SELECT doc_id, i, w,
       |         CASE WHEN w IN ($stopList) THEN 1 ELSE 0 END AS stop
       |  FROM wordsp),
       |cids AS (
       |  SELECT doc_id, i, w, stop,
       |         coalesce(sum(stop) OVER (PARTITION BY doc_id ORDER BY i
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           AS runid
       |  FROM marked),
       |runs AS (SELECT doc_id, runid, i, w FROM cids WHERE stop = 0),
       |ph AS (
       |  SELECT doc_id, runid, CAST(count(*) AS BIGINT) AS len,
       |         $phraseAgg AS phrase
       |  FROM runs GROUP BY doc_id, runid
       |  HAVING count(*) <= $RakeMaxPhrase),
       |ms AS (
       |  SELECT r.doc_id, r.runid, r.w, p.len, p.phrase
       |  FROM runs r
       |  JOIN ph p ON p.doc_id = r.doc_id AND p.runid = r.runid),
       |wstats AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq,
       |         CAST(sum(len) AS BIGINT) AS deg
       |  FROM ms GROUP BY w),
       |wscore AS (
       |  SELECT w, CAST(deg * 1000000 $idiv freq AS BIGINT) AS ws
       |  FROM wstats),
       |occ AS (
       |  SELECT m.doc_id, m.runid, m.phrase, m.len,
       |         CAST(sum(s.ws) AS BIGINT) AS score
       |  FROM ms m JOIN wscore s ON s.w = m.w
       |  GROUP BY m.doc_id, m.runid, m.phrase, m.len)
       |SELECT phrase, CAST(min(len) AS BIGINT) AS n_words,
       |       CAST(count(*) AS BIGINT) AS n_occurrences,
       |       CAST(min(score) AS BIGINT) AS score_micro
       |FROM occ GROUP BY phrase
       |ORDER BY score_micro DESC, phrase LIMIT 10""".stripMargin

  def textRake(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    val stops = rakeStops.map("'" + _ + "'").mkString(", ")
    spark.sql(
      s"""WITH wordsp AS (
         |  SELECT doc_id, i, element_at(ws, i) AS w
         |  FROM (SELECT doc_id, split(text, ' ') AS ws FROM documents)
         |  LATERAL VIEW explode(sequence(1, size(ws))) AS i),
         |${rakeBody("div", stops,
        "array_join(transform(array_sort(collect_list(struct(i, w))), x -> x.w), ' ')")}"""
        .stripMargin)
  }

  val textRakeSql: String = {
    val stops = rakeStops.map("'" + _ + "'").mkString(", ")
    s"""WITH wordsp AS (
       |  SELECT doc_id, i, ws[i] AS w
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |       unnest(range(1, len(ws) + 1)) AS t(i)),
       |${rakeBody("//", stops, "string_agg(w, ' ' ORDER BY i)")}""".stripMargin
  }

  // ── text_textrank ★ (r11) — TextRank keyword scoring (Mihalcea &
  // Tarau 2004): integer PageRank over the word CO-OCCURRENCE graph
  // (undirected adjacency edges between consecutive words), the
  // graph_pagerank machinery applied to text — RAKE's degree/frequency
  // heuristic upgraded to the eigenvector centrality the paper made
  // famous. Same engine-exact discipline: ranks in 1e12 micro-units,
  // damping as the exact rational 17/20, five fixed rounds, zero
  // doubles — the DuckDB oracle RERUNS all five rounds as a generated
  // CTE chain, so the fixed-point iteration itself passes the binary
  // gate.
  //
  // Scale shape (100 TB): the adjacency build is one scan + DISTINCT
  // (vocab²-bounded, tiny in practice); per round ONE equi-join (ranks ⋈
  // edges) + ONE map-side-combined sum — the Pregel shape, with the
  // edge+degree relation cached and only the rank vector moving.
  def textTextrank(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    viewDocs(spark, dir)
    val scale = GraphQueries.Scale
    val iters = GraphQueries.Iterations
    val half = spark.sql(
      """SELECT DISTINCT least(w1, w2) AS src, greatest(w1, w2) AS dst
        |FROM (SELECT element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2
        |      FROM (SELECT split(text, ' ') AS ws FROM documents)
        |      LATERAL VIEW explode(sequence(1, size(ws) - 1)) AS i)
        |WHERE w1 != w2""".stripMargin).persist()
    val edges = half.unionByName(
      half.select(col("dst").as("src"), col("src").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d")).persist()
    val edgeDeg = edges.join(deg, "src")
      .select(col("src"), col("dst"), col("d"))
      .repartition(col("src")).sortWithinPartitions("src")
      .persist()
    val n = deg.count()
    val r0 = scale / n
    val base = (3L * r0) / 20L
    var ranks = deg.select(col("src").as("node"), lit(r0).as("r"))
    for (_ <- 1 to iters) {
      ranks = edgeDeg
        .join(ranks, edgeDeg("src") === ranks("node"))
        .groupBy(col("dst"))
        .agg(sum(expr("(17 * r) div (20 * d)")).as("contrib"))
        .select(col("dst").as("node"), (lit(base) + col("contrib")).as("r"))
    }
    ranks.join(deg, ranks("node") === deg("src"))
      .select(col("node").as("word"), col("d").as("degree"),
        col("r").as("rank_micro"))
  }

  val textTextrankSql: String = {
    val scale = GraphQueries.Scale
    val rounds = (1 to GraphQueries.Iterations).map { i =>
      s"""r$i AS (
         |  SELECT e.dst AS node,
         |         b.base + sum((17 * r.r) // (20 * e.d)) AS r
         |  FROM edge_deg e JOIN r${i - 1} r ON e.src = r.node
         |  CROSS JOIN consts b
         |  GROUP BY e.dst, b.base)""".stripMargin
    }.mkString(",\n")
    s"""WITH half AS (
       |  SELECT DISTINCT least(w1, w2) AS src, greatest(w1, w2) AS dst
       |  FROM (SELECT ws[i] AS w1, ws[i + 1] AS w2
       |        FROM (SELECT string_split(text, ' ') AS ws FROM documents),
       |             unnest(range(1, len(ws))) AS t(i))
       |  WHERE w1 != w2),
       |edges AS (
       |  SELECT src, dst FROM half
       |  UNION ALL
       |  SELECT dst AS src, src AS dst FROM half),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src),
       |edge_deg AS (
       |  SELECT e.src, e.dst, d.d FROM edges e JOIN deg d ON e.src = d.src),
       |consts AS (
       |  SELECT CAST($scale // count(*) AS BIGINT) AS r0,
       |         CAST((3 * ($scale // count(*))) // 20 AS BIGINT) AS base
       |  FROM deg),
       |r0 AS (SELECT d.src AS node, c.r0 AS r FROM deg d CROSS JOIN consts c),
       |$rounds
       |SELECT r.node AS word, d.d AS degree, CAST(r.r AS BIGINT) AS rank_micro
       |FROM r${GraphQueries.Iterations} r JOIN deg d ON r.node = d.src"""
      .stripMargin
  }

  // ── text_lix ★ (r11) — LIX readability index (Björnsson 1968: the
  // classic corpus-curation difficulty score; unlike Flesch it needs no
  // syllable model, so it stays EXACT-integer): LIX = words/sentences +
  // 100·longwords/words, long = length ≥ 7 chars. Both terms are floored
  // integer milli-unit divisions, identical in both engines; sentence
  // count is the period count floored at 1 (a fragment with no '.' is
  // one sentence, not a division error). The band column is the
  // published reading-level cut (LIX < 25 easy … ≥ 55 academic) — the
  // curriculum-bucketing feature pipe_curriculum-style mixes key on.
  //
  // Scale shape (100 TB): pure per-row scan work — no shuffle, no joins;
  // every feature folds inside whole-stage codegen over one pass of the
  // text column.
  /** One body text for both engines — only the feature CTE (split/
    * filter spellings) and the integer-division token differ. */
  private def lixBody(idiv: String): String =
    s"""SELECT doc_id, w AS n_words, s AS n_sents, lg AS n_long,
       |       CAST(w * 1000 $idiv s + lg * 100000 $idiv w AS BIGINT)
       |         AS lix_milli,
       |       CASE WHEN w * 1000 $idiv s + lg * 100000 $idiv w < 25000
       |              THEN 'easy'
       |            WHEN w * 1000 $idiv s + lg * 100000 $idiv w < 40000
       |              THEN 'standard'
       |            WHEN w * 1000 $idiv s + lg * 100000 $idiv w < 55000
       |              THEN 'hard'
       |            ELSE 'academic' END AS band
       |FROM f""".stripMargin

  def textLix(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      s"""WITH f AS (
         |  SELECT doc_id,
         |         CAST(size(split(text, ' ')) AS BIGINT) AS w,
         |         CAST(greatest(length(text) - length(replace(text, '.', '')), 1)
         |           AS BIGINT) AS s,
         |         CAST(size(filter(split(text, ' '), x -> length(x) >= 7))
         |           AS BIGINT) AS lg
         |  FROM documents)
         |${lixBody("div")}""".stripMargin)
  }

  val textLixSql: String =
    s"""WITH f AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
       |         CAST(greatest(length(text) - length(replace(text, '.', '')), 1)
       |           AS BIGINT) AS s,
       |         CAST(len(list_filter(string_split(text, ' '),
       |                              x -> length(x) >= 7)) AS BIGINT) AS lg
       |  FROM documents)
       |${lixBody("//")}""".stripMargin

  // ── text_bm25 ★ (r12) — BM25 retrieval over an inverted postings view:
  // fixed probe queries (the ANN fixed-probe convention) against the
  // (doc, term, tf) postings relation, Okapi scoring with the standard
  // k1 = 1.2 / b = 0.75 saturation, top-10 documents per query. The
  // retrieval scorer every RAG / hard-negative-mining pipeline runs next
  // to the ANN family — tfidf ranks terms WITHIN a document; BM25 ranks
  // DOCUMENTS for a query, with tf saturation and length normalization.
  //
  // Engine-exactness: idf is the LINEAR Robertson odds
  // (N - df + 0.5)/(df + 0.5) — the same per-term ordering as
  // log-idf but built only from correctly-rounded IEEE ops (the
  // text_tfidf_topk precedent: ln() is libm-dependent and cannot land in
  // a binary oracle). Each per-term contribution is quantized to integer
  // micro-units (floor(c·1e6)) BEFORE the per-document sum, so the
  // aggregation is order-independent BIGINT addition — a raw double sum
  // would depend on partition visit order. Both engines evaluate the
  // identical expression tree on identical doubles, so the quantized
  // integers match bit-for-bit.
  //
  // Scale shape (100 TB): tf/dl/df are map-side-combined aggregates; the
  // probe-term join hits the postings on the term key (at production the
  // postings are bucketed by term — the inverted-index layout); the only
  // broadcast constants are the 1-row N / avgdl scalars; ranking is a
  // per-query window over the matched set. Nothing is all-pairs; the
  // candidate set is Σ df over the QUERY's terms, exactly an inverted
  // index probe.
  private val bm25Probes: Seq[(Int, String)] = Seq(
    0 -> "spark", 0 -> "join", 0 -> "window",
    1 -> "dup", 1 -> "vector",
    2 -> "customer", 2 -> "order", 2 -> "line")

  /** The shared BM25 body; engine differences are confined to the word
    * explode (`split`+LATERAL VIEW vs `string_split`+unnest) and the
    * floor-div spelling, injected by the callers. */
  private def bm25Body(valuesRow: String): String =
    s"""tf AS (
       |  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
       |  FROM words GROUP BY doc_id, word),
       |dl AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
       |  FROM words GROUP BY doc_id),
       |dfr AS (
       |  SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       |  FROM words GROUP BY word),
       |consts AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
       |avgl AS (
       |  SELECT CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
       |  FROM dl),
       |probes AS (SELECT * FROM $valuesRow AS q(q_id, term)),
       |contrib AS (
       |  SELECT p.q_id, t.doc_id,
       |         CAST(floor(
       |           (((c.n - CAST(d.df AS DOUBLE)) + 0.5)
       |              / (CAST(d.df AS DOUBLE) + 0.5))
       |           * ((CAST(t.tf AS DOUBLE) * 2.2)
       |              / (CAST(t.tf AS DOUBLE)
       |                 + 1.2 * (0.25 + (0.75 * CAST(l.dl AS DOUBLE)) / a.avgdl)))
       |           * 1000000.0) AS BIGINT) AS c_micro
       |  FROM probes p
       |  JOIN tf t ON t.word = p.term
       |  JOIN dfr d ON d.word = p.term
       |  JOIN dl l ON l.doc_id = t.doc_id
       |  CROSS JOIN consts c CROSS JOIN avgl a),
       |scored AS (
       |  SELECT q_id, doc_id,
       |         CAST(count(*) AS INT) AS n_terms,
       |         CAST(sum(c_micro) AS BIGINT) AS score_micro
       |  FROM contrib GROUP BY q_id, doc_id),
       |ranked AS (
       |  SELECT q_id, doc_id, n_terms, score_micro,
       |         row_number() OVER (PARTITION BY q_id
       |           ORDER BY score_micro DESC, doc_id) AS rnk
       |  FROM scored)
       |SELECT CAST(q_id AS INT) AS q_id, doc_id, n_terms, score_micro,
       |       CAST(rnk AS INT) AS rnk
       |FROM ranked WHERE rnk <= 10""".stripMargin

  private def bm25Values: String =
    bm25Probes.map { case (q, t) => s"($q, '$t')" }.mkString(", ")

  def textBm25(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      s"""WITH words AS (
         |  SELECT doc_id, word
         |  FROM (SELECT doc_id, split(text, ' ') AS w FROM documents)
         |  LATERAL VIEW explode(w) AS word),
         |${bm25Body(s"VALUES $bm25Values")}""".stripMargin)
  }

  val textBm25Sql: String =
    s"""WITH words AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |  FROM documents),
       |${bm25Body(s"(VALUES $bm25Values)")}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bm25" -> (textBm25 _),
    "text_lix" -> (textLix _),
    "text_textrank" -> (textTextrank _),
    "text_rake" -> (textRake _),
    "text_spell_cluster" -> (textSpellCluster _),
    "text_spell_pairs" -> (textSpellPairs _),
    "text_encoding_quality" -> (textEncodingQuality _),
    "text_heavy_hitters" -> (textHeavyHitters _),
    "text_ngram_novelty" -> (textNgramNovelty _),
    "text_scrub" -> (textScrub _),
    "sample_stratified" -> (sampleStratified _),
    "text_length_histogram" -> (textLengthHistogram _),
    "text_length_quantiles" -> (textLengthQuantiles _),
    "text_langid" -> (textLangid _),
    "text_quality" -> (textQuality _),
    "text_repetition" -> (textRepetition _),
    "text_token_count" -> (textTokenCount _),
    "text_fingerprint" -> (textFingerprint _),
    "text_ngram_topk" -> (textNgramTopk _),
    "text_collocations" -> (textCollocations _),
    "pipe_curation" -> (pipeCuration _))

  val oracle: Map[String, String] = Map(
    "text_bm25" -> textBm25Sql,
    "text_lix" -> textLixSql,
    "text_textrank" -> textTextrankSql,
    "text_rake" -> textRakeSql,
    "text_spell_cluster" -> textSpellClusterSql,
    "text_spell_pairs" -> textSpellPairsSql,
    "text_encoding_quality" -> textEncodingQualitySql,
    "text_heavy_hitters" -> textHeavyHittersSql,
    "text_ngram_novelty" -> textNgramNoveltySql,
    "text_scrub" -> textScrubSql,
    "sample_stratified" -> sampleStratifiedSql,
    "text_length_histogram" -> textLengthHistogramSql,
    "text_length_quantiles" -> textLengthQuantilesSql,
    "text_langid" -> textLangidSql,
    "text_quality" -> textQualitySql,
    "text_repetition" -> textRepetitionSql,
    "text_token_count" -> textTokenCountSql,
    "text_fingerprint" -> textFingerprintSql,
    "text_ngram_topk" -> textNgramTopkSql,
    "text_collocations" -> textCollocationsSql,
    "pipe_curation" -> pipeCurationSql)
}
