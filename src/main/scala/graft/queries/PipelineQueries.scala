package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Pin.PinSyntax

/** Corpus-assembly operators for a training-data pipeline over `documents`:
  * eval-set decontamination, token-budget sequence packing, domain-mixture
  * sampling, rare-term extraction, and deterministic shard assignment.
  *
  * These are the steps BETWEEN curation (dedup + quality, see
  * [[TextQueries]] / [[DedupQueries]]) and the trainer: remove eval
  * overlap, weight the domain mixture, pack documents into fixed token
  * budgets, and split the result into reproducible shards. Every operator
  * here is a hash-partitioned aggregate, an equi-join, or a window
  * partitioned by a high-cardinality key — no all-pairs work, no
  * single-reducer stage — so each survives a 100× scale-up unchanged.
  *
  * Engine parity notes (the oracle gate hashes binary values): all float
  * arithmetic is single-multiply/single-divide IEEE DOUBLE (no libm
  * transcendentals, whose last-ulp behavior differs between JVM and C),
  * every literal divisor is cast to DOUBLE on both engines (DuckDB
  * otherwise treats `10000.0` as DECIMAL), and every aggregate is cast to
  * BIGINT (DuckDB sums integers into HUGEINT).
  */
object PipelineQueries {

  private def viewDocs(spark: SparkSession, dir: String): Unit =
    spark.read.parquet(s"$dir/documents.parquet").createOrReplaceTempView("documents")

  /** 5-word shingle list over a split-words column — THE contamination
    * unit. One definition shared by the batch gate, the Bloom variant,
    * and the streaming gate ([[graft.streaming.StreamingDecontaminate]]):
    * the streaming path's correctness argument is "same plan as the batch
    * operator", which only holds while this cannot drift. */
  private[graft] def shingleSpark(w: String): String =
    s"transform(sequence(1, size($w) - 4), i -> concat_ws(' ', slice($w, i, 5)))"

  /** The DuckDB spelling of the same 5-word shingle list — the oracle
    * half of the shared definition above; every duck-side consumer must
    * use this so a shingle-width change cannot drift between the gates
    * and their oracles. */
  private[graft] def shingleDuck(w: String): String =
    s"list_transform(range(1, len($w) - 3), i -> array_to_string($w[i:i+4], ' '))"

  // ── pipe_decontaminate ★ — benchmark/eval decontamination: flag every
  // training document that shares at least one 5-word shingle with the
  // held-out eval slice (doc_id % 11 = 0 stands in for the benchmark set).
  // The industry-standard n-gram overlap test (GPT-3 appendix C / PaLM
  // style). Shape: explode eval shingles → DISTINCT (small set) → semi
  // join from the training shingles on the shingle string. At 100 TB the
  // eval set is fixed-size, so the semi join broadcasts; the training side
  // streams through map-side — no shuffle of the corpus at all.
  def pipeDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      s"""WITH ws AS (SELECT doc_id, source, split(text, ' ') AS w FROM documents),
        |eligible AS (SELECT doc_id, source, w FROM ws WHERE size(w) >= 5),
        |eval_sh AS (
        |  SELECT DISTINCT sh
        |  FROM eligible
        |  LATERAL VIEW explode(${shingleSpark("w")}) AS sh
        |  WHERE doc_id % 11 = 0),
        |train_sh AS (
        |  SELECT doc_id, sh
        |  FROM eligible
        |  LATERAL VIEW explode(${shingleSpark("w")}) AS sh
        |  WHERE doc_id % 11 <> 0),
        |hits AS (
        |  SELECT DISTINCT doc_id FROM train_sh
        |  WHERE sh IN (SELECT sh FROM eval_sh)),
        |train AS (SELECT doc_id, source FROM ws WHERE doc_id % 11 <> 0)
        |SELECT t.source,
        |       count(*) AS train_docs,
        |       CAST(count(h.doc_id) AS BIGINT) AS contaminated_docs,
        |       CAST(count(*) - count(h.doc_id) AS BIGINT) AS clean_docs
        |FROM train t LEFT JOIN hits h ON t.doc_id = h.doc_id
        |GROUP BY t.source""".stripMargin)
  }

  val pipeDecontaminateSql: String =
    s"""WITH ws AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
      |eligible AS (SELECT doc_id, source, w FROM ws WHERE len(w) >= 5),
      |eval_sh AS (
      |  SELECT DISTINCT unnest(${shingleDuck("w")}) AS sh
      |  FROM eligible WHERE doc_id % 11 = 0),
      |train_sh AS (
      |  SELECT doc_id, unnest(${shingleDuck("w")}) AS sh
      |  FROM eligible WHERE doc_id % 11 <> 0),
      |hits AS (
      |  SELECT DISTINCT doc_id FROM (SELECT * FROM train_sh) t
      |  WHERE t.sh IN (SELECT sh FROM eval_sh)),
      |train AS (SELECT doc_id, source FROM ws WHERE doc_id % 11 <> 0)
      |SELECT t.source,
      |       count(*) AS train_docs,
      |       CAST(count(h.doc_id) AS BIGINT) AS contaminated_docs,
      |       CAST(count(*) - count(h.doc_id) AS BIGINT) AS clean_docs
      |FROM train t LEFT JOIN hits h ON t.doc_id = h.doc_id
      |GROUP BY t.source""".stripMargin

  // ── pipe_decontaminate_bloom ★ — the 100 TB path for the same
  // decontamination: when the benchmark suite's shingle set no longer
  // broadcasts as a hash relation (10⁹ shingles ≈ tens of GB of strings),
  // collapse it into a Bloom filter (~1.2 GB at 10⁹ keys / 1% fpp), ship
  // THAT to every executor, and prefilter the training shingles with a
  // narrow mightContain scan — no shuffle of the corpus. False positives
  // are then removed by an exact join, but only over the tiny candidate
  // set, so the output is BIT-IDENTICAL to `pipe_decontaminate` and shares
  // its oracle. Two driver jobs build the filter (count + aggregate);
  // that's the price of admission and is independent of corpus size.
  def pipeDecontaminateBloom(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val ws = docs.select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
    val eligible = ws.where(size(col("w")) >= 5)
    val shingled = eligible.select(col("doc_id"), col("source"),
      explode(expr(shingleSpark("w"))).as("sh"))
    // Materialize the (small) eval shingle set ONCE: count(), the bloom
    // build, and the exact-verify join below would otherwise each re-run
    // the corpus scan + shingle explode (three jobs, three scans).
    val evalSh = shingled.where(col("doc_id") % 11 === 0).select(col("sh"))
      .distinct().pinned()

    val nEval = evalSh.count()
    val bloom = evalSh.stat.bloomFilter("sh", math.max(nEval, 1L), 0.01)
    val bBloom = spark.sparkContext.broadcast(bloom)

    val trainSh = shingled.where(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"), col("sh")).distinct()
    // Codegen'd prefilter (graft.expr.BloomMightContainString), not a
    // closure UDF: the corpus-wide scan stage stays in whole-stage codegen.
    val candidates = trainSh.where(
      graft.expr.BloomMightContainString(col("sh"), bBloom))
    val hits = candidates.join(evalSh, "sh")
      .select(col("doc_id").as("hid")).distinct()

    val train = ws.where(col("doc_id") % 11 =!= 0).select(col("doc_id"), col("source"))
    train.join(hits, train("doc_id") === hits("hid"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("train_docs"),
        count(col("hid")).cast("long").as("contaminated_docs"),
        (count(lit(1)) - count(col("hid"))).cast("long").as("clean_docs"))
  }

  // ── pipe_pack ★ — sequence packing: concatenate each source's documents
  // in doc_id order and cut the stream into 512-token chunks; a document
  // lands in the chunk where it STARTS (chunk = prefix-sum-before-doc div
  // budget — the greedy concat-and-chunk packing every pretraining loader
  // uses). Shape: one window partitioned by source (high cardinality at
  // corpus scale → parallel) + one map-side-combined groupBy. No global
  // sort; each source packs independently, which is exactly how a 1000-
  // executor packing job is sharded.
  def pipePack(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      """WITH toks AS (
        |  SELECT doc_id, source,
        |         cast(ceil(length(text) / 4.0) as bigint) AS est_tokens
        |  FROM documents),
        |packed AS (
        |  SELECT doc_id, source, est_tokens,
        |         sum(est_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM toks)
        |SELECT source, CAST((cum - est_tokens) div 512 AS BIGINT) AS chunk,
        |       count(*) AS docs,
        |       CAST(sum(est_tokens) AS BIGINT) AS chunk_tokens,
        |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM packed
        |GROUP BY source, chunk""".stripMargin)
  }

  val pipePackSql: String =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |         CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens
      |  FROM documents),
      |packed AS (
      |  SELECT doc_id, source, est_tokens,
      |         sum(est_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM toks)
      |SELECT source, CAST((cum - est_tokens) // 512 AS BIGINT) AS chunk,
      |       count(*) AS docs,
      |       CAST(sum(est_tokens) AS BIGINT) AS chunk_tokens,
      |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM packed
      |GROUP BY source, chunk""".stripMargin

  // ── pipe_pack_bestfit ★ (r14) — NO-SPLIT sequence packing by
  // first-fit-decreasing (the §8 corpus-assembly family's missing
  // production variant): where pipe_pack's concat-and-chunk SPLITS
  // documents across 512-token chunks (zero padding, fractured
  // documents), this packs each document WHOLE into the first bin with
  // room, processing per source in (tokens DESC, doc_id) order — FFD,
  // the 11/9·OPT + 6/9 classic (Johnson 1973; next-fit, the arrival-
  // order loader baseline it beats, is only 2·OPT). Oversize documents
  // (> 512 estimated tokens) open their own bin, which never fits
  // anything else (its residual goes negative) — the standard
  // convention. Emitted per source: the bin-count/padding-waste ledger
  // against BOTH the next-fit baseline and the splitting lower bound
  // ⌈total/512⌉ — the fill-rate numbers a pretraining loader reads to
  // choose split vs no-split packing. All integers; the DuckDB oracle
  // replays both folds rank-by-rank as one recursive CTE, so the hash
  // gate proves the whole packing trajectory.
  //
  // Scale shape (100 TB): one map-side token estimate, one groupBy
  // (source) collect into the fold — each source's fold is bounded by
  // its doc count (a production run packs per (source, shard), keeping
  // groups bounded; the fold is O(docs·bins) with bins ≈ tokens/512).
  // No corpus-sized shuffle beyond the per-source grouping — the same
  // sharding story as pipe_pack's window.
  def pipePackBestfit(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    // FFD fold: bins = residual-capacity array; first fit by index
    // probe (bins are small — tokens/512 per source — so the inline
    // position re-evaluation inside the update transform stays cheap).
    val ffdFold =
      """aggregate(fsz, CAST(array() AS ARRAY<BIGINT>),
        |  (bins, s) -> CASE
        |    WHEN size(filter(bins, b -> b >= s)) = 0
        |    THEN concat(bins, array(CAST(512 AS BIGINT) - s))
        |    ELSE transform(zip_with(bins, sequence(1, size(bins)),
        |                            (b, i) -> struct(b AS b, i AS i)),
        |      t -> CASE WHEN t.i = element_at(
        |                   filter(sequence(1, size(bins)),
        |                          j -> element_at(bins, j) >= s), 1)
        |                THEN t.b - s ELSE t.b END)
        |    END)""".stripMargin
    val nfFold =
      """aggregate(nsz, CAST(array() AS ARRAY<BIGINT>),
        |  (bins, s) -> CASE
        |    WHEN size(bins) > 0 AND element_at(bins, size(bins)) >= s
        |    THEN concat(slice(bins, 1, size(bins) - 1),
        |                array(element_at(bins, size(bins)) - s))
        |    ELSE concat(bins, array(CAST(512 AS BIGINT) - s))
        |    END)""".stripMargin
    spark.sql(
      s"""WITH toks AS (
        |  SELECT doc_id, source,
        |         cast(ceil(length(text) / 4.0) as bigint) AS est_tokens
        |  FROM documents),
        |grouped AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(est_tokens) AS BIGINT) AS total_tokens,
        |         transform(array_sort(collect_list(
        |             struct(-est_tokens AS neg, doc_id))),
        |           t -> -t.neg) AS fsz,
        |         transform(array_sort(collect_list(
        |             struct(doc_id, est_tokens AS sz))),
        |           t -> t.sz) AS nsz
        |  FROM toks GROUP BY source),
        |packed AS (
        |  SELECT source, n_docs, total_tokens,
        |         $ffdFold AS fb,
        |         $nfFold AS nb
        |  FROM grouped)
        |SELECT source, n_docs, total_tokens,
        |       CAST((total_tokens + 511) div 512 AS BIGINT) AS bins_lb,
        |       CAST(size(fb) AS BIGINT) AS bins_ffd,
        |       CAST(size(nb) AS BIGINT) AS bins_nextfit,
        |       aggregate(fb, CAST(0 AS BIGINT),
        |         (a, b) -> a + greatest(b, CAST(0 AS BIGINT)))
        |         AS waste_ffd,
        |       aggregate(nb, CAST(0 AS BIGINT),
        |         (a, b) -> a + greatest(b, CAST(0 AS BIGINT)))
        |         AS waste_nextfit,
        |       CAST(total_tokens * 1000 div (size(fb) * 512) AS BIGINT)
        |         AS fill_ffd_milli,
        |       CAST(total_tokens * 1000 div (size(nb) * 512) AS BIGINT)
        |         AS fill_nextfit_milli
        |FROM packed""".stripMargin)
  }

  val pipePackBestfitSql: String =
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id, source,
      |         CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens
      |  FROM documents),
      |rffd AS (
      |  SELECT source, est_tokens AS s,
      |         row_number() OVER (PARTITION BY source
      |           ORDER BY est_tokens DESC, doc_id) AS rk
      |  FROM toks),
      |rnf AS (
      |  SELECT source, est_tokens AS s,
      |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
      |  FROM toks),
      |rec AS (
      |  SELECT source, 0 AS r,
      |         CAST([] AS BIGINT[]) AS fb, CAST([] AS BIGINT[]) AS nb
      |  FROM (SELECT DISTINCT source FROM toks)
      |  UNION ALL
      |  SELECT rec.source, rec.r + 1,
      |         CASE
      |           WHEN len(list_filter(rec.fb, b -> b >= f.s)) = 0
      |           THEN list_append(rec.fb, CAST(512 AS BIGINT) - f.s)
      |           ELSE list_transform(range(1, len(rec.fb) + 1),
      |             i -> CASE WHEN i = list_filter(range(1, len(rec.fb) + 1),
      |                              j -> rec.fb[j] >= f.s)[1]
      |                       THEN rec.fb[i] - f.s ELSE rec.fb[i] END)
      |           END,
      |         CASE
      |           WHEN len(rec.nb) > 0 AND rec.nb[len(rec.nb)] >= g.s
      |           THEN list_append(rec.nb[1 : len(rec.nb) - 1],
      |                            rec.nb[len(rec.nb)] - g.s)
      |           ELSE list_append(rec.nb, CAST(512 AS BIGINT) - g.s)
      |           END
      |  FROM rec
      |  JOIN rffd f ON f.source = rec.source AND f.rk = rec.r + 1
      |  JOIN rnf g ON g.source = rec.source AND g.rk = rec.r + 1),
      |cnt AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(sum(est_tokens) AS BIGINT) AS total_tokens
      |  FROM toks GROUP BY source),
      |final AS (
      |  SELECT r.source, r.fb, r.nb
      |  FROM rec r JOIN cnt c ON c.source = r.source AND r.r = c.n_docs)
      |SELECT c.source, c.n_docs, c.total_tokens,
      |       CAST((c.total_tokens + 511) // 512 AS BIGINT) AS bins_lb,
      |       CAST(len(f.fb) AS BIGINT) AS bins_ffd,
      |       CAST(len(f.nb) AS BIGINT) AS bins_nextfit,
      |       CAST(coalesce(list_sum(list_transform(f.fb,
      |              b -> greatest(b, CAST(0 AS BIGINT)))), 0)
      |         AS BIGINT) AS waste_ffd,
      |       CAST(coalesce(list_sum(list_transform(f.nb,
      |              b -> greatest(b, CAST(0 AS BIGINT)))), 0)
      |         AS BIGINT) AS waste_nextfit,
      |       CAST(c.total_tokens * 1000 // (len(f.fb) * 512) AS BIGINT)
      |         AS fill_ffd_milli,
      |       CAST(c.total_tokens * 1000 // (len(f.nb) * 512) AS BIGINT)
      |         AS fill_nextfit_milli
      |FROM cnt c JOIN final f ON f.source = c.source""".stripMargin

  // ── pipe_mix ★ — domain-mixture sampling: given per-source target
  // weights (derived here from the source id; in production a config
  // table), compute each source's admission rate so the KEPT corpus
  // approximates the target mixture, then admit documents through the
  // same deterministic md5 gate `sample_stratified` uses (reproducible
  // across runs and engines, unlike rand()). Sources above their target
  // share are downsampled; sources below keep everything (rate capped at
  // 1.0 — this operator never upsamples). Shape: tiny per-source aggregate
  // (20 rows) broadcast back onto the corpus scan + one map-side-combined
  // groupBy — the corpus itself is never shuffled.
  def pipeMix(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      s"""WITH stats AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS docs,
        |         CAST(cast(substr(source, 4) as int) % 4 + 1 AS DOUBLE) AS w
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(docs) AS DOUBLE) AS n, CAST(sum(w) AS DOUBLE) AS sw
        |        FROM stats),
        |rates AS (
        |  SELECT s.source, s.docs, s.w / t.sw AS target_share,
        |         least(CAST(1.0 AS DOUBLE),
        |               (s.w / t.sw) * t.n / CAST(s.docs AS DOUBLE)) AS rate
        |  FROM stats s CROSS JOIN tot t),
        |gated AS (
        |  SELECT d.source,
        |         cast(ceil(length(d.text) / 4.0) as bigint) AS est_tokens,
        |         CAST(${DedupQueries.hSpark("cast(d.doc_id as string)")}
        |              % 10000 AS DOUBLE) / CAST(10000 AS DOUBLE) AS u
        |  FROM documents d)
        |SELECT r.source, r.docs, r.target_share, r.rate,
        |       CAST(sum(CASE WHEN g.u < r.rate THEN 1 ELSE 0 END) AS BIGINT)
        |         AS kept_docs,
        |       CAST(sum(CASE WHEN g.u < r.rate THEN g.est_tokens ELSE 0 END)
        |         AS BIGINT) AS kept_tokens
        |FROM gated g JOIN rates r ON g.source = r.source
        |GROUP BY r.source, r.docs, r.target_share, r.rate""".stripMargin)
  }

  val pipeMixSql: String =
    s"""WITH stats AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS docs,
      |         CAST(CAST(substr(source, 4) AS INT) % 4 + 1 AS DOUBLE) AS w
      |  FROM documents GROUP BY source),
      |tot AS (SELECT CAST(sum(docs) AS DOUBLE) AS n, CAST(sum(w) AS DOUBLE) AS sw
      |        FROM stats),
      |rates AS (
      |  SELECT s.source, s.docs, s.w / t.sw AS target_share,
      |         least(CAST(1.0 AS DOUBLE),
      |               (s.w / t.sw) * t.n / CAST(s.docs AS DOUBLE)) AS rate
      |  FROM stats s CROSS JOIN tot t),
      |gated AS (
      |  SELECT d.source,
      |         CAST(ceil(length(d.text) / 4.0) AS BIGINT) AS est_tokens,
      |         CAST(${DedupQueries.hDuck("CAST(d.doc_id AS VARCHAR)")}
      |              % 10000 AS DOUBLE) / CAST(10000 AS DOUBLE) AS u
      |  FROM documents d)
      |SELECT r.source, r.docs, r.target_share, r.rate,
      |       CAST(sum(CASE WHEN g.u < r.rate THEN 1 ELSE 0 END) AS BIGINT)
      |         AS kept_docs,
      |       CAST(sum(CASE WHEN g.u < r.rate THEN g.est_tokens ELSE 0 END)
      |         AS BIGINT) AS kept_tokens
      |FROM gated g JOIN rates r ON g.source = r.source
      |GROUP BY r.source, r.docs, r.target_share, r.rate""".stripMargin

  // ── pipe_upsample ★ — domain UPSAMPLING to target weights: the
  // complement of pipe_mix (which caps at rate 1.0 and only ever
  // downsamples). Low-resource sources whose target share exceeds their
  // natural share get REPEATED — floor(rate) full copies plus one more
  // admitted through the same deterministic md5 gate with probability
  // frac(rate) — the multi-epoch treatment training recipes give scarce
  // high-value domains, with the standard cap (4 epochs here) so no
  // source repeats unboundedly. Shape: the tiny rate table broadcasts
  // onto the corpus scan, each row fans out through a BOUNDED
  // explode(sequence(1, n_copies)) (≤ cap, a design constant), and the
  // ledger is one map-side-combined aggregate — the corpus is never
  // shuffled. The guard `WHERE n_copies >= 1` matters: Spark's sequence
  // runs DESCENDING when start > stop, so an unguarded sequence(1, 0)
  // would emit 2 phantom copies rather than none.
  def pipeUpsample(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      s"""WITH stats AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS docs,
        |         CAST(cast(substr(source, 4) as int) % 4 + 1 AS DOUBLE) AS w
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(docs) AS DOUBLE) AS n, CAST(sum(w) AS DOUBLE) AS sw
        |        FROM stats),
        |rates AS (
        |  SELECT s.source, s.docs, s.w / t.sw AS target_share,
        |         least(CAST(4.0 AS DOUBLE),
        |               (s.w / t.sw) * t.n / CAST(s.docs AS DOUBLE)) AS rate
        |  FROM stats s CROSS JOIN tot t),
        |copies AS (
        |  SELECT d.source,
        |         cast(ceil(length(d.text) / 4.0) as bigint) AS est_tokens,
        |         cast(floor(r.rate) as int) +
        |           CASE WHEN CAST(${DedupQueries.hSpark("cast(d.doc_id as string)")}
        |                     % 10000 AS DOUBLE) / CAST(10000 AS DOUBLE)
        |                     < r.rate - floor(r.rate) THEN 1 ELSE 0 END AS n_copies
        |  FROM documents d JOIN rates r ON d.source = r.source),
        |repeated AS (
        |  SELECT source, est_tokens
        |  FROM copies LATERAL VIEW explode(sequence(1, n_copies)) AS copy_idx
        |  WHERE n_copies >= 1)
        |SELECT r.source, r.docs, r.target_share, r.rate,
        |       CAST(count(e.source) AS BIGINT) AS emitted_docs,
        |       CAST(coalesce(sum(e.est_tokens), 0) AS BIGINT) AS emitted_tokens
        |FROM rates r LEFT JOIN repeated e ON r.source = e.source
        |GROUP BY r.source, r.docs, r.target_share, r.rate""".stripMargin)
  }

  val pipeUpsampleSql: String =
    s"""WITH stats AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS docs,
      |         CAST(CAST(substr(source, 4) AS INT) % 4 + 1 AS DOUBLE) AS w
      |  FROM documents GROUP BY source),
      |tot AS (SELECT CAST(sum(docs) AS DOUBLE) AS n, CAST(sum(w) AS DOUBLE) AS sw
      |        FROM stats),
      |rates AS (
      |  SELECT s.source, s.docs, s.w / t.sw AS target_share,
      |         least(CAST(4.0 AS DOUBLE),
      |               (s.w / t.sw) * t.n / CAST(s.docs AS DOUBLE)) AS rate
      |  FROM stats s CROSS JOIN tot t),
      |copies AS (
      |  SELECT d.source,
      |         CAST(ceil(length(d.text) / 4.0) AS BIGINT) AS est_tokens,
      |         CAST(floor(r.rate) AS INT) +
      |           CASE WHEN CAST(${DedupQueries.hDuck("CAST(d.doc_id AS VARCHAR)")}
      |                     % 10000 AS DOUBLE) / CAST(10000 AS DOUBLE)
      |                     < r.rate - floor(r.rate) THEN 1 ELSE 0 END AS n_copies
      |  FROM documents d JOIN rates r ON d.source = r.source),
      |repeated AS (
      |  SELECT source, est_tokens
      |  FROM copies, LATERAL unnest(range(1, n_copies + 1)) AS t(copy_idx)
      |  WHERE n_copies >= 1)
      |SELECT r.source, r.docs, r.target_share, r.rate,
      |       CAST(count(e.source) AS BIGINT) AS emitted_docs,
      |       CAST(coalesce(sum(e.est_tokens), 0) AS BIGINT) AS emitted_tokens
      |FROM rates r LEFT JOIN repeated e ON r.source = e.source
      |GROUP BY r.source, r.docs, r.target_share, r.rate""".stripMargin

  // ── pipe_quota_sample ★ — token-BUDGET sampling: each source gets a
  // token quota (derived here from the source id; in production a config
  // table) and admits documents in a deterministic md5-hash order until
  // the quota fills — the "take N tokens of each domain" corpus-assembly
  // step, complementing pipe_mix's RATE-based admission (rates need the
  // corpus re-scanned when sizes drift; quotas are absolute). A document
  // is admitted iff its tokens START within budget (prefix-sum-before <
  // quota), so the boundary document is kept — quota fills, never
  // truncates a document. Shape: one tiny per-source aggregate broadcast
  // back + one window PARTITION BY source (high cardinality → parallel;
  // the hash order also makes the sample reproducible across runs and
  // engines, unlike rand()). Nothing global.
  def pipeQuotaSample(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      s"""WITH toks AS (
         |  SELECT doc_id, source,
         |         cast(ceil(length(text) / 4.0) as bigint) AS est_tokens,
         |         ${DedupQueries.hSpark("cast(doc_id as string)")} AS h
         |  FROM documents),
         |quotas AS (
         |  SELECT source,
         |         CAST((cast(substr(source, 4) as int) % 4 + 1) * 800 AS BIGINT)
         |           AS quota
         |  FROM documents GROUP BY source),
         |ordered AS (
         |  SELECT t.source, t.est_tokens, q.quota,
         |         sum(t.est_tokens) OVER (PARTITION BY t.source
         |           ORDER BY t.h, t.doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM toks t JOIN quotas q ON t.source = q.source)
         |SELECT source, quota,
         |       CAST(count(*) AS BIGINT) AS total_docs,
         |       CAST(sum(CASE WHEN cum - est_tokens < quota THEN 1 ELSE 0 END)
         |         AS BIGINT) AS kept_docs,
         |       CAST(sum(CASE WHEN cum - est_tokens < quota THEN est_tokens
         |                     ELSE 0 END) AS BIGINT) AS kept_tokens
         |FROM ordered
         |GROUP BY source, quota""".stripMargin)
  }

  val pipeQuotaSampleSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |         CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens,
       |         ${DedupQueries.hDuck("CAST(doc_id AS VARCHAR)")} AS h
       |  FROM documents),
       |quotas AS (
       |  SELECT source,
       |         CAST((CAST(substr(source, 4) AS INT) % 4 + 1) * 800 AS BIGINT)
       |           AS quota
       |  FROM documents GROUP BY source),
       |ordered AS (
       |  SELECT t.source, t.est_tokens, q.quota,
       |         sum(t.est_tokens) OVER (PARTITION BY t.source
       |           ORDER BY t.h, t.doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM toks t JOIN quotas q ON t.source = q.source)
       |SELECT source, quota,
       |       CAST(count(*) AS BIGINT) AS total_docs,
       |       CAST(sum(CASE WHEN cum - est_tokens < quota THEN 1 ELSE 0 END)
       |         AS BIGINT) AS kept_docs,
       |       CAST(sum(CASE WHEN cum - est_tokens < quota THEN est_tokens
       |                     ELSE 0 END) AS BIGINT) AS kept_tokens
       |FROM ordered
       |GROUP BY source, quota""".stripMargin

  // ── text_tfidf_topk ★ — rare-term extraction: per-document top-3 terms
  // by tf·idf with a LINEAR idf (tf × N / df). Linear instead of log(N/df)
  // on purpose: same ordering for fixed tf, but multiply+divide are
  // correctly-rounded IEEE ops that agree bit-for-bit across engines,
  // while ln() is libm-dependent — the scores land in the oracle hash.
  // Shape: two map-side-combined aggregates (tf keyed by doc, df keyed by
  // word) + an equi-join on word + a per-doc top-k window. The df table is
  // the corpus vocabulary (~100M rows at 100 TB) — it hash-joins against
  // the filtered tf side; nothing here is quadratic.
  def textTfidfTopk(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      """WITH words AS (
        |  SELECT doc_id, word
        |  FROM (SELECT doc_id, split(text, ' ') AS w FROM documents)
        |  LATERAL VIEW explode(w) AS word),
        |tf AS (
        |  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
        |  FROM words WHERE doc_id % 25 = 0 GROUP BY doc_id, word),
        |df AS (
        |  SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |  FROM words GROUP BY word),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        |scored AS (
        |  SELECT t.doc_id, t.word, t.tf, d.df,
        |         CAST(t.tf AS DOUBLE) * n.n / CAST(d.df AS DOUBLE) AS score
        |  FROM tf t JOIN df d ON t.word = d.word CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, word, tf, df, score,
        |         row_number() OVER (PARTITION BY doc_id
        |           ORDER BY score DESC, word) AS rnk
        |  FROM scored)
        |SELECT doc_id, word, tf, df, score, CAST(rnk AS INT) AS rnk
        |FROM ranked WHERE rnk <= 3""".stripMargin)
  }

  val textTfidfTopkSql: String =
    """WITH words AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      |tf AS (
      |  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
      |  FROM words WHERE doc_id % 25 = 0 GROUP BY doc_id, word),
      |df AS (
      |  SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      |  FROM words GROUP BY word),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
      |scored AS (
      |  SELECT t.doc_id, t.word, t.tf, d.df,
      |         CAST(t.tf AS DOUBLE) * n.n / CAST(d.df AS DOUBLE) AS score
      |  FROM tf t JOIN df d ON t.word = d.word CROSS JOIN n),
      |ranked AS (
      |  SELECT doc_id, word, tf, df, score,
      |         row_number() OVER (PARTITION BY doc_id
      |           ORDER BY score DESC, word) AS rnk
      |  FROM scored)
      |SELECT doc_id, word, tf, df, score, CAST(rnk AS INT) AS rnk
      |FROM ranked WHERE rnk <= 3""".stripMargin

  // ── pipe_shard ★ — deterministic shard assignment: route every document
  // to one of 16 training shards by the same md5 hash gate used for
  // sampling, and report per-shard document/token balance. This is the
  // "global shuffle" a trainer needs, done WITHOUT a global sort: the hash
  // is uniform, so shards are balanced by construction, and the assignment
  // is a narrow map — the only shuffle is the 16-group aggregate of
  // partials. Reproducible across runs, engines, and cluster sizes.
  def pipeShard(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      s"""WITH hashed AS (
        |  SELECT doc_id, source,
        |         cast(ceil(length(text) / 4.0) as bigint) AS est_tokens,
        |         ${DedupQueries.hSpark("cast(doc_id as string)")} % 16 AS shard
        |  FROM documents)
        |SELECT CAST(shard AS INT) AS shard,
        |       count(*) AS docs,
        |       CAST(sum(est_tokens) AS BIGINT) AS tokens,
        |       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM hashed GROUP BY shard""".stripMargin)
  }

  val pipeShardSql: String =
    s"""WITH hashed AS (
      |  SELECT doc_id, source,
      |         CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens,
      |         ${DedupQueries.hDuck("CAST(doc_id AS VARCHAR)")} % 16 AS shard
      |  FROM documents)
      |SELECT CAST(shard AS INT) AS shard,
      |       count(*) AS docs,
      |       CAST(sum(est_tokens) AS BIGINT) AS tokens,
      |       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
      |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM hashed GROUP BY shard""".stripMargin

  // ── sk_kmv_distinct ★ — KMV (k-minimum-values / bottom-k) distinct-count
  // sketch over the corpus vocabulary, per language. The sketch: hash every
  // distinct value uniformly into [0,1), keep the K smallest hashes; with
  // u_K the Kth smallest, distinct ≈ (K-1)/u_K (Bar-Yossef et al. 2002,
  // the mergeable bottom-k used by production engines for set-size
  // estimation). Unlike HLL implementations, this sketch is DETERMINISTIC
  // given the hash — md5 here — so the estimate itself is oracle-checked
  // bit-for-bit, alongside the exact count it approximates.
  //
  // Scale shape: bottom-k is a semilattice (bottom-k of a union = bottom-k
  // of bottom-ks), so it runs as [[graft.expr.KmvBottomK]] — a custom
  // Catalyst TypedImperativeAggregate with TRUE partial aggregation:
  // executors fold their partitions into K-bounded buffers and the
  // shuffle carries ≤ K longs per language, the same wire cost as an HLL
  // but deterministic. Per-lang vocabulary skew never concentrates: the
  // heavy fold happens map-side before the exchange. K=256 ⇒ ~6% std err.
  private val kmvNorm = "1152921504606846976" // 2^60: 15 hex chars of md5

  def skKmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    graft.expr.GraftFunctions.register(spark)
    spark.sql(
      s"""WITH words AS (
         |  SELECT DISTINCT lang, word
         |  FROM (SELECT lang, split(text, ' ') AS w FROM documents)
         |  LATERAL VIEW explode(w) AS word),
         |hashed AS (
         |  SELECT lang, ${DedupQueries.hSpark("word")} AS h
         |  FROM words),
         |sk AS (
         |  SELECT lang, kmv_bottomk(h, 256) AS bk FROM hashed GROUP BY lang),
         |kth AS (
         |  SELECT lang, CAST(size(bk) AS BIGINT) AS k_used,
         |         element_at(bk, -1) AS hk
         |  FROM sk),
         |exact AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS exact_distinct
         |  FROM words GROUP BY lang)
         |SELECT e.lang, e.exact_distinct, k.k_used,
         |       CASE WHEN k.k_used < 256 THEN CAST(k.k_used AS DOUBLE)
         |            ELSE CAST(k.k_used - 1 AS DOUBLE)
         |                 / (CAST(k.hk AS DOUBLE) / CAST($kmvNorm AS DOUBLE))
         |       END AS kmv_estimate
         |FROM exact e JOIN kth k ON e.lang = k.lang""".stripMargin)
  }

  // The oracle spells the sketch as a ranked window (DuckDB has no custom
  // aggregates) — bottom-k of the whole relation. That this matches the
  // partial-merged KmvBottomK output bit-for-bit IS the mergeability
  // claim under test.
  val skKmvDistinctSql: String =
    s"""WITH words AS (
       |  SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS word
       |  FROM documents),
       |hashed AS (
       |  SELECT lang, ${DedupQueries.hDuck("word")} AS h
       |  FROM words),
       |bottomk AS (
       |  SELECT lang, h
       |  FROM (SELECT lang, h,
       |          row_number() OVER (PARTITION BY lang ORDER BY h) AS rnk
       |        FROM hashed)
       |  WHERE rnk <= 256),
       |kth AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS k_used, max(h) AS hk
       |  FROM bottomk GROUP BY lang),
       |exact AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS exact_distinct
       |  FROM words GROUP BY lang)
       |SELECT e.lang, e.exact_distinct, k.k_used,
       |       CASE WHEN k.k_used < 256 THEN CAST(k.k_used AS DOUBLE)
       |            ELSE CAST(k.k_used - 1 AS DOUBLE)
       |                 / (CAST(k.hk AS DOUBLE) / CAST($kmvNorm AS DOUBLE))
       |       END AS kmv_estimate
       |FROM exact e JOIN kth k ON e.lang = k.lang""".stripMargin

  // ── pipe_canonicalize ★ — keeper selection for near-dup clusters: after
  // MinHash/LSH clustering (`dd_cluster`), each cluster keeps its
  // best-quality member (ties → lowest doc_id, so originals beat
  // re-crawls of identical text). This is the step real pipelines run
  // between "find the duplicate sets" and "write the corpus": dedup that
  // keeps the BEST copy, not an arbitrary one. Composition proof: the
  // cluster operator, the shared quality formula, and a per-cluster
  // argmax window all snap together — one extra window partitioned by
  // cluster id (parallel; clusters are tiny) on top of dd_cluster's cost.
  def pipeCanonicalize(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    DedupQueries.ddCluster(spark, dir).createOrReplaceTempView("nd_clusters")
    spark.sql(
      s"""WITH corpus AS (${DedupQueries.corpusSparkSql}),
         |q AS (SELECT doc_id, ${TextQueries.qualitySpark("text")} AS quality
         |      FROM corpus),
         |ranked AS (
         |  SELECT c.cluster_id, c.doc_id, c.cluster_size, q.quality,
         |         row_number() OVER (PARTITION BY c.cluster_id
         |           ORDER BY q.quality DESC, c.doc_id) AS rnk
         |  FROM nd_clusters c JOIN q ON c.doc_id = q.doc_id)
         |SELECT cluster_id, doc_id AS keeper_doc,
         |       CAST(cluster_size AS BIGINT) AS cluster_size,
         |       quality AS keeper_quality,
         |       CAST(cluster_size - 1 AS BIGINT) AS dropped_docs
         |FROM ranked WHERE rnk = 1""".stripMargin)
  }

  // Oracle embeds dd_cluster's recursive-CTE oracle as a subquery (DuckDB
  // allows WITH RECURSIVE inside a parenthesized derived table).
  val pipeCanonicalizeSql: String =
    s"""WITH clusters AS (SELECT * FROM (${DedupQueries.ddClusterSql})),
       |corpus AS (${DedupQueries.corpusDuckSql}),
       |q AS (SELECT doc_id, ${TextQueries.qualityDuck("text")} AS quality
       |      FROM corpus),
       |ranked AS (
       |  SELECT c.cluster_id, c.doc_id, c.cluster_size, q.quality,
       |         row_number() OVER (PARTITION BY c.cluster_id
       |           ORDER BY q.quality DESC, c.doc_id) AS rnk
       |  FROM clusters c JOIN q ON c.doc_id = q.doc_id)
       |SELECT cluster_id, doc_id AS keeper_doc,
       |       CAST(cluster_size AS BIGINT) AS cluster_size,
       |       quality AS keeper_quality,
       |       CAST(cluster_size - 1 AS BIGINT) AS dropped_docs
       |FROM ranked WHERE rnk = 1""".stripMargin

  // ── text_gopher_filters ★ — the published-rule-set document filter
  // (Gopher/MassiveText-style): word-count bounds, mean-word-length
  // bounds, minimum stopword fraction, symbol-character ceiling — each
  // signal surfaced plus the combined verdict. All integer folds + one
  // IEEE division per ratio (no transcendentals) ⇒ engine-exact. Narrow
  // single-pass transform — scan speed at any scale.
  def textGopherFilters(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      """WITH feats AS (
        |  SELECT doc_id,
        |         size(split(text, ' ')) AS n_words,
        |         aggregate(transform(split(text, ' '), w -> length(w)),
        |           0, (a, b) -> a + b) AS word_chars,
        |         size(filter(split(text, ' '), w -> array_contains(
        |           array('the','and','of','to','in','is','was','for'), w)))
        |           AS stop_hits,
        |         length(text) -
        |           length(regexp_replace(text, '[^A-Za-z0-9 ]', '')) AS n_symbols,
        |         length(text) AS n_chars
        |  FROM documents)
        |SELECT doc_id, n_words,
        |       CAST(word_chars AS DOUBLE) / n_words AS mean_word_len,
        |       CAST(stop_hits AS DOUBLE) / n_words AS stop_frac,
        |       CASE WHEN n_chars = 0 THEN CAST(0.0 AS DOUBLE)
        |            ELSE CAST(n_symbols AS DOUBLE) / n_chars END AS symbol_frac,
        |       CAST(CASE WHEN n_words >= 20 AND n_words <= 1000
        |                  AND CAST(word_chars AS DOUBLE) / n_words >= 3.0
        |                  AND CAST(word_chars AS DOUBLE) / n_words <= 10.0
        |                  AND CAST(stop_hits AS DOUBLE) / n_words >= 0.01
        |                  AND n_chars > 0
        |                  AND CAST(n_symbols AS DOUBLE) / n_chars <= 0.1
        |             THEN 1 ELSE 0 END AS INT) AS passes
        |FROM feats""".stripMargin)
  }

  val textGopherFiltersSql: String =
    """WITH feats AS (
      |  SELECT doc_id,
      |         CAST(len(string_split(text, ' ')) AS INT) AS n_words,
      |         list_reduce([0] || list_transform(string_split(text, ' '),
      |           w -> CAST(length(w) AS INT)), (a, b) -> a + b) AS word_chars,
      |         CAST(len(list_filter(string_split(text, ' '), w -> list_contains(
      |           ['the','and','of','to','in','is','was','for'], w))) AS INT)
      |           AS stop_hits,
      |         length(text) -
      |           length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS n_symbols,
      |         length(text) AS n_chars
      |  FROM documents)
      |SELECT doc_id, n_words,
      |       CAST(word_chars AS DOUBLE) / n_words AS mean_word_len,
      |       CAST(stop_hits AS DOUBLE) / n_words AS stop_frac,
      |       CASE WHEN n_chars = 0 THEN CAST(0.0 AS DOUBLE)
      |            ELSE CAST(n_symbols AS DOUBLE) / n_chars END AS symbol_frac,
      |       CAST(CASE WHEN n_words >= 20 AND n_words <= 1000
      |                  AND CAST(word_chars AS DOUBLE) / n_words >= 3.0
      |                  AND CAST(word_chars AS DOUBLE) / n_words <= 10.0
      |                  AND CAST(stop_hits AS DOUBLE) / n_words >= 0.01
      |                  AND n_chars > 0
      |                  AND CAST(n_symbols AS DOUBLE) / n_chars <= 0.1
      |             THEN 1 ELSE 0 END AS INT) AS passes
      |FROM feats""".stripMargin

  // ── pipe_shuffle (r7) — deterministic distributed TRAINING-ORDER
  // shuffle: every document gets a dense global position in md5-hash
  // order. Shuffling the corpus before training is the last pipeline
  // step before sharding, and the naive spelling — ORDER BY hash with
  // row_number() — funnels 100 TB through one reducer. This reuses
  // [[graft.operators.GlobalOrder]]'s TeraSort-style rank instead:
  // range-partition on the hash, rank within partitions, add broadcast
  // per-partition offsets. Deterministic across runs, engines, and
  // cluster sizes (hash order + doc_id tiebreak), so the assignment
  // itself is oracle-checked.
  def pipeShuffle(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    val keyed = spark.sql(
      s"""SELECT doc_id, source,
         |       ${DedupQueries.hSpark("concat('shuffle:', cast(doc_id as string))")} AS h
         |FROM documents""".stripMargin)
    graft.operators.GlobalOrder
      .withGlobalRank(keyed, Seq(col("h"), col("doc_id")), "train_order")
      .select(col("doc_id"), col("source"), col("train_order"))
  }

  val pipeShuffleSql: String =
    s"""WITH keyed AS (
      |  SELECT doc_id, source,
      |         ${DedupQueries.hDuck("concat('shuffle:', CAST(doc_id AS VARCHAR))")} AS h
      |  FROM documents)
      |SELECT doc_id, source,
      |       row_number() OVER (ORDER BY h, doc_id) AS train_order
      |FROM keyed""".stripMargin

  // ── pipe_curriculum (r8) — quality-annealed TRAINING ORDER: documents
  // are staged so the highest-quality phase lands at the END of training
  // (the data-annealing recipe: bulk web data early, highest-quality
  // material in the final phase where it shapes the converged model
  // most), with a deterministic hash shuffle WITHIN each phase (the
  // pipe_shuffle discipline — phase boundaries must not introduce
  // within-phase order bias). Phases come from FIXED quality thresholds
  // (design constants; a production deployment reads them from config),
  // not quantiles — a global ntile would need a distribution pass and a
  // sort; thresholds are one narrow projection.
  //
  // Scale shape: quality + phase + hash are narrow map-side expressions;
  // the only wide operation is GlobalOrder's TeraSort-style rank
  // (range-partition on (phase, h), rank within partitions, broadcast
  // offsets) — no single-reducer row_number, deterministic across
  // cluster sizes, so the assignment itself is oracle-checked.
  def pipeCurriculum(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    val keyed = spark.sql(
      s"""SELECT doc_id, quality,
         |       CAST(CASE WHEN quality < 0.58 THEN 0
         |                 WHEN quality < 0.64 THEN 1
         |                 WHEN quality < 0.70 THEN 2
         |                 ELSE 3 END AS INT) AS phase,
         |       ${DedupQueries.hSpark("concat('curriculum:', cast(doc_id as string))")} AS h
         |FROM (SELECT doc_id, ${TextQueries.qualitySpark("text")} AS quality
         |      FROM documents)""".stripMargin)
    graft.operators.GlobalOrder
      .withGlobalRank(keyed, Seq(col("phase"), col("h"), col("doc_id")), "train_order")
      .select(col("doc_id"), col("quality"), col("phase"), col("train_order"))
  }

  val pipeCurriculumSql: String =
    s"""WITH q AS (
       |  SELECT doc_id, ${TextQueries.qualityDuck("text")} AS quality FROM documents),
       |keyed AS (
       |  SELECT doc_id, quality,
       |         CAST(CASE WHEN quality < 0.58 THEN 0
       |                   WHEN quality < 0.64 THEN 1
       |                   WHEN quality < 0.70 THEN 2
       |                   ELSE 3 END AS INT) AS phase,
       |         ${DedupQueries.hDuck("concat('curriculum:', CAST(doc_id AS VARCHAR))")} AS h
       |  FROM q)
       |SELECT doc_id, quality, phase,
       |       row_number() OVER (ORDER BY phase, h, doc_id) AS train_order
       |FROM keyed""".stripMargin

  // ── pipe_contamination_rate (r8) — per-document contamination
  // FRACTION: what share of a training document's distinct 5-word
  // shingles appear in the eval set. `pipe_decontaminate` answers the
  // binary question (any overlap at all — the drop rule); this is the
  // graded one behind partial-contamination policies ("dirty" = ≥N%
  // overlap, GPT-3 appendix C's per-document dirtiness) and the number a
  // contamination report ranks offenders by.
  //
  // Scale shape identical to pipe_decontaminate: the eval shingle set is
  // fixed-size → broadcasts — pinned with an explicit hint (r10) so the
  // plan cannot drift to a shuffle join when size estimates are off (in
  // this fixture the eval slice is carved from the corpus and grows with
  // it; in production it is a fixed eval suite); the training side
  // streams map-side through the explode; both counts are
  // map-side-combined aggs keyed by doc_id.
  // Only contaminated documents reach the output (the HAVING filter on
  // the hit count), so the result is report-sized, not corpus-sized.
  def pipeContaminationRate(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      s"""WITH ws AS (SELECT doc_id, split(text, ' ') AS w FROM documents),
         |eligible AS (SELECT doc_id, w FROM ws WHERE size(w) >= 5),
         |eval_sh AS (
         |  SELECT DISTINCT sh
         |  FROM eligible
         |  LATERAL VIEW explode(${shingleSpark("w")}) AS sh
         |  WHERE doc_id % 11 = 0),
         |train_sh AS (
         |  SELECT doc_id, sh
         |  FROM (SELECT doc_id, array_distinct(${shingleSpark("w")}) AS shs
         |        FROM eligible WHERE doc_id % 11 <> 0)
         |  LATERAL VIEW explode(shs) AS sh)
         |SELECT /*+ BROADCAST(e) */ t.doc_id,
         |       count(*) AS total_shingles,
         |       count(e.sh) AS hit_shingles,
         |       CAST(count(e.sh) AS DOUBLE) / count(*) AS contamination_rate
         |FROM train_sh t LEFT JOIN eval_sh e ON t.sh = e.sh
         |GROUP BY t.doc_id
         |HAVING count(e.sh) > 0""".stripMargin)
  }

  val pipeContaminationRateSql: String =
    s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |eligible AS (SELECT doc_id, w FROM ws WHERE len(w) >= 5),
      |eval_sh AS (
      |  SELECT DISTINCT unnest(${shingleDuck("w")}) AS sh
      |  FROM eligible WHERE doc_id % 11 = 0),
      |train_sh AS (
      |  SELECT doc_id, unnest(list_distinct(${shingleDuck("w")})) AS sh
      |  FROM eligible WHERE doc_id % 11 <> 0)
      |SELECT t.doc_id,
      |       count(*) AS total_shingles,
      |       count(e.sh) AS hit_shingles,
      |       CAST(count(e.sh) AS DOUBLE) / count(*) AS contamination_rate
      |FROM train_sh t LEFT JOIN eval_sh e ON t.sh = e.sh
      |GROUP BY t.doc_id
      |HAVING count(e.sh) > 0""".stripMargin

  // ── pipe_dataset_diff (r10) — corpus SNAPSHOT DIFF: the dataset-
  // versioning audit ("what changed between yesterday's corpus and
  // today's") every managed training dataset publishes alongside a new
  // version — additions, takedown removals, re-crawl changes, and the
  // per-source token delta that shifts the mixture weights.
  //
  // The fixture carves two versions deterministically: v1 lacks the
  // doc_id % 13 = 0 documents (they are v2's ADDITIONS), v1 carries the
  // doc_id % 11 = 0 documents that v2 drops (REMOVALS — the takedown
  // case), and the doc_id % 17 = 0 survivors gain a revision suffix in
  // v2 (CHANGED). The diff itself is content-based (md5), not
  // flag-based: a "re-crawl" that reproduces identical bytes correctly
  // reports unchanged.
  //
  // Scale shape (100 TB): one full-outer equi-join on the doc key —
  // the canonical snapshot-diff plan, hash-partitioned on doc_id with
  // both sides pruned to (id, source, hash, token count) at the scan —
  // then one map-side-combined (source, status) aggregate; the report is
  // sources × 4 rows. Document text never shuffles (only its md5).
  def pipeDatasetDiff(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      """WITH v1 AS (
        |  SELECT doc_id, source, md5(text) AS h,
        |         CAST(size(split(text, ' ')) AS BIGINT) AS toks
        |  FROM documents WHERE doc_id % 13 <> 0),
        |v2 AS (
        |  SELECT doc_id, source,
        |         md5(CASE WHEN doc_id % 17 = 0 THEN concat(text, ' rev2')
        |                  ELSE text END) AS h,
        |         CAST(size(split(CASE WHEN doc_id % 17 = 0
        |                              THEN concat(text, ' rev2')
        |                              ELSE text END, ' ')) AS BIGINT) AS toks
        |  FROM documents WHERE doc_id % 11 <> 0),
        |diff AS (
        |  SELECT coalesce(a.source, b.source) AS source,
        |         CASE WHEN a.doc_id IS NULL THEN 'added'
        |              WHEN b.doc_id IS NULL THEN 'removed'
        |              WHEN a.h <> b.h THEN 'changed'
        |              ELSE 'unchanged' END AS status,
        |         coalesce(b.toks, CAST(0 AS BIGINT))
        |           - coalesce(a.toks, CAST(0 AS BIGINT)) AS tok_delta
        |  FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
        |SELECT source, status,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(tok_delta) AS BIGINT) AS token_delta
        |FROM diff GROUP BY source, status""".stripMargin)
  }

  val pipeDatasetDiffSql: String =
    """WITH v1 AS (
      |  SELECT doc_id, source, md5(text) AS h,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
      |  FROM documents WHERE doc_id % 13 <> 0),
      |v2 AS (
      |  SELECT doc_id, source,
      |         md5(CASE WHEN doc_id % 17 = 0 THEN concat(text, ' rev2')
      |                  ELSE text END) AS h,
      |         CAST(len(string_split(CASE WHEN doc_id % 17 = 0
      |                                    THEN concat(text, ' rev2')
      |                                    ELSE text END, ' ')) AS BIGINT) AS toks
      |  FROM documents WHERE doc_id % 11 <> 0),
      |diff AS (
      |  SELECT coalesce(a.source, b.source) AS source,
      |         CASE WHEN a.doc_id IS NULL THEN 'added'
      |              WHEN b.doc_id IS NULL THEN 'removed'
      |              WHEN a.h <> b.h THEN 'changed'
      |              ELSE 'unchanged' END AS status,
      |         coalesce(b.toks, CAST(0 AS BIGINT))
      |           - coalesce(a.toks, CAST(0 AS BIGINT)) AS tok_delta
      |  FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
      |SELECT source, status,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(tok_delta) AS BIGINT) AS token_delta
      |FROM diff GROUP BY source, status""".stripMargin

  // ── pipe_pii_scrub ★ (r11) — multi-category PII redaction: emails,
  // phone numbers, SSN-shaped ids, 16-digit card numbers, and IPv4
  // addresses masked with typed placeholder tokens, counted per category,
  // and audited (re-running every detector over the scrubbed text must
  // find zero residual matches — the property a compliance review asks
  // for). The C4/Dolma-style pre-training scrub pass.
  //
  // The synthetic corpus contains no organic PII, so the fixture INJECTS
  // it deterministically (pure integer/string functions of doc_id —
  // identical in both engines): every 7th doc an email, 11th a phone,
  // 13th an IPv4, 17th a card, 19th an SSN. Patterns use [0-9]/[.]
  // classes only — the portable subset of Java regex and DuckDB's RE2.
  // Category shapes are mutually exclusive by construction (3-2-4 vs
  // 3-3-4 dash groups, @ vs dots vs bare digit run), so per-category
  // counts are order-independent and the replace chain cannot cascade.
  //
  // Shape: narrow per-row regex work, no shuffle, scan speed — the 100 TB
  // cost is exactly one pass over the text column.
  private val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("ip", "([0-9]{1,3}[.]){3}[0-9]{1,3}", "<IP>"),
    ("card", "4[0-9]{15}", "<CARD>"),
    ("ssn", "[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    ("phone", "[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"))

  /** PII-injected corpus: the SQL `ptext` expression (engine param picks
    * the cast spelling; everything else is common SQL). */
  private def piiInject(castStr: String): String =
    s"""concat(text,
       |  CASE WHEN doc_id % 7 = 0 THEN concat(' contact user',
       |    CAST(doc_id AS $castStr), '@mail', CAST(doc_id % 17 AS $castStr),
       |    '.example.com') ELSE '' END,
       |  CASE WHEN doc_id % 11 = 0 THEN concat(' call 555-',
       |    lpad(CAST(doc_id % 1000 AS $castStr), 3, '0'), '-',
       |    lpad(CAST(doc_id % 10000 AS $castStr), 4, '0')) ELSE '' END,
       |  CASE WHEN doc_id % 13 = 0 THEN concat(' from 10.',
       |    CAST(doc_id % 256 AS $castStr), '.',
       |    CAST((doc_id * 7) % 256 AS $castStr), '.',
       |    CAST((doc_id * 3) % 256 AS $castStr)) ELSE '' END,
       |  CASE WHEN doc_id % 17 = 0 THEN concat(' card 4',
       |    lpad(CAST(doc_id % 1000000 AS $castStr), 15, '0')) ELSE '' END,
       |  CASE WHEN doc_id % 19 = 0 THEN concat(' ssn ',
       |    lpad(CAST(doc_id % 1000 AS $castStr), 3, '0'), '-',
       |    lpad(CAST(doc_id % 100 AS $castStr), 2, '0'), '-',
       |    lpad(CAST(doc_id % 10000 AS $castStr), 4, '0')) ELSE '' END)""".stripMargin

  def pipePiiScrub(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    val chain = piiPatterns.foldLeft("ptext") { case (acc, (_, pat, tok)) =>
      s"regexp_replace($acc, '$pat', '$tok')" }
    val counts = piiPatterns.map { case (name, pat, _) =>
      s"size(regexp_extract_all(ptext, '$pat', 0)) AS n_$name" }.mkString(",\n  ")
    val residual = piiPatterns.map { case (_, pat, _) =>
      s"size(regexp_extract_all(scrubbed, '$pat', 0))" }.mkString(" + ")
    spark.sql(
      s"""WITH pii AS (
         |  SELECT doc_id, source, ${piiInject("STRING")} AS ptext
         |  FROM documents),
         |scrubbed AS (
         |  SELECT doc_id, source, $chain AS scrubbed,
         |  $counts
         |  FROM pii)
         |SELECT doc_id, source, scrubbed,
         |       n_email, n_ip, n_card, n_ssn, n_phone,
         |       n_email + n_ip + n_card + n_ssn + n_phone AS n_redactions,
         |       $residual AS residual
         |FROM scrubbed""".stripMargin)
  }

  val pipePiiScrubSql: String = {
    val chain = piiPatterns.foldLeft("ptext") { case (acc, (_, pat, tok)) =>
      s"regexp_replace($acc, '$pat', '$tok', 'g')" }
    val counts = piiPatterns.map { case (name, pat, _) =>
      s"CAST(len(regexp_extract_all(ptext, '$pat')) AS INT) AS n_$name" }
      .mkString(",\n  ")
    val residual = piiPatterns.map { case (_, pat, _) =>
      s"CAST(len(regexp_extract_all(scrubbed, '$pat')) AS INT)" }.mkString(" + ")
    s"""WITH pii AS (
       |  SELECT doc_id, source, ${piiInject("VARCHAR")} AS ptext
       |  FROM documents),
       |scrubbed AS (
       |  SELECT doc_id, source, $chain AS scrubbed,
       |  $counts
       |  FROM pii)
       |SELECT doc_id, source, scrubbed,
       |       n_email, n_ip, n_card, n_ssn, n_phone,
       |       n_email + n_ip + n_card + n_ssn + n_phone AS n_redactions,
       |       $residual AS residual
       |FROM scrubbed""".stripMargin
  }

  // ── pipe_split ★ (r11) — LEAKAGE-SAFE train/validation split: the
  // split decision is a pure function of the document's CONTENT hash,
  // not its id — so byte-identical documents (exact dups, re-crawls,
  // cross-source mirrors) land on the SAME side by construction, the
  // property that keeps a validation set honest (id-hash splits leak
  // every duplicated document across the boundary and inflate eval).
  // ~10% validation via content-hash mod 10; group sizes reported so the
  // split can be audited against the dup structure.
  //
  // Shape: the split itself is a NARROW scan-speed map (no shuffle —
  // that is the point of deciding on content rather than cluster id);
  // the group-size audit adds one map-side-combined agg + an equi-join
  // on the content hash with fanout = dup-group size.
  def pipeSplit(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      s"""WITH hashed AS (
         |  SELECT doc_id, source, ${DedupQueries.hSpark("text")} AS grp
         |  FROM documents),
         |sizes AS (
         |  SELECT grp, CAST(count(*) AS BIGINT) AS group_size
         |  FROM hashed GROUP BY grp)
         |SELECT h.doc_id, h.source, h.grp AS group_id, s.group_size,
         |       CASE WHEN h.grp % 10 = 0 THEN 'val' ELSE 'train' END AS split
         |FROM hashed h JOIN sizes s ON h.grp = s.grp""".stripMargin)
  }

  val pipeSplitSql: String =
    s"""WITH hashed AS (
       |  SELECT doc_id, source, ${DedupQueries.hDuck("text")} AS grp
       |  FROM documents),
       |sizes AS (
       |  SELECT grp, CAST(count(*) AS BIGINT) AS group_size
       |  FROM hashed GROUP BY grp)
       |SELECT h.doc_id, h.source, h.grp AS group_id, s.group_size,
       |       CASE WHEN h.grp % 10 = 0 THEN 'val' ELSE 'train' END AS split
       |FROM hashed h JOIN sizes s ON h.grp = s.grp""".stripMargin

  // ── pipe_mix_temperature ★ (r11) — TEMPERATURE-based mixture
  // reweighting (the multilingual/multi-source rebalancing mT5/XLM-R
  // style: sample rate ∝ share^α flattens the head and lifts the tail):
  // α = 1/2 via INTEGER sqrt — floor(sqrt(n)) over BIGINT counts, so
  // every weight is an integer, the normalizer is an integer sum (no
  // order-sensitive float accumulation), and the rates are exact
  // micro-unit divisions both engines compute bit-identically. Emits
  // proportional share vs temperature rate so the flattening is visible
  // (low-resource sources get temp_rate > share).
  // Shape: one map-side-combined per-source count + one 1-row total —
  // report-sized output at any corpus scale.
  def pipeMixTemperature(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      """WITH skewed AS (
        |  -- The driver corpus is uniform per source; derive the skewed
        |  -- sub-corpus (source srcK keeps ~(K+1)/23 of its docs) so the
        |  -- flattening is observable: without it share == temp_rate and
        |  -- the operator demonstrates nothing.
        |  SELECT source FROM documents
        |  WHERE doc_id % 23 <= CAST(substring(source, 4) AS INT)),
        |counts AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n FROM skewed
        |  GROUP BY source),
        |weighted AS (
        |  SELECT source, n,
        |         CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w
        |  FROM counts),
        |totals AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS total_n,
        |         CAST(sum(w) AS BIGINT) AS total_w
        |  FROM weighted)
        |SELECT w.source, w.n AS n_docs,
        |       CAST(w.n * 1000000 div t.total_n AS BIGINT) AS share_micro,
        |       w.w AS weight,
        |       CAST(w.w * 1000000 div t.total_w AS BIGINT) AS temp_rate_micro
        |FROM weighted w CROSS JOIN totals t""".stripMargin)
  }

  val pipeMixTemperatureSql: String =
    """WITH skewed AS (
      |  SELECT source FROM documents
      |  WHERE doc_id % 23 <= CAST(substring(source, 4) AS INT)),
      |counts AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n FROM skewed
      |  GROUP BY source),
      |weighted AS (
      |  SELECT source, n,
      |         CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w
      |  FROM counts),
      |totals AS (
      |  SELECT CAST(sum(n) AS BIGINT) AS total_n,
      |         CAST(sum(w) AS BIGINT) AS total_w
      |  FROM weighted)
      |SELECT w.source, w.n AS n_docs,
      |       CAST(w.n * 1000000 // t.total_n AS BIGINT) AS share_micro,
      |       w.w AS weight,
      |       CAST(w.w * 1000000 // t.total_w AS BIGINT) AS temp_rate_micro
      |FROM weighted w CROSS JOIN totals t""".stripMargin

  // ── pipe_zorder ★ (r11) — SPACE-FILLING-CURVE data layout (the
  // OPTIMIZE ZORDER BY story): interleave the low 16 bits of two join/
  // filter dimensions (l_partkey, l_suppkey) into a 32-bit Morton code,
  // bucket rows into 1,024 z-ranges (≈files), and emit each bucket's
  // per-dimension extents next to the same-count INSERTION-ORDER layout
  // (l_orderkey ranges — what a naive append produces). The per-bucket
  // (xmax−xmin+1)·(ymax−ymin+1) area IS the file-skipping witness: a
  // min/max-zone-map scan with a predicate on EITHER dimension prunes
  // proportionally to the summed extents, and z-order shrinks them by
  // orders of magnitude while insertion order leaves every file
  // full-width. ZorderSpec asserts the win; the oracle pins both
  // layouts' exact extents (bit-spreading is pure integer &/|/shift —
  // engine-identical).
  //
  // Scale shape (100 TB): the Morton code is a narrow per-row
  // expression at scan speed; the layout itself would be one
  // repartitionByRange(z) write — no extra shuffle beyond the write's
  // own range exchange, which is the price of any clustered layout. The
  // 1-row max-orderkey scalar rides a broadcast (allowlisted).
  private def zorderBody(shl: (String, Int) => String, idiv: String): String = {
    def spread(v: String): String = {
      val s1 = s"(($v | ${shl(v, 8)}) & 16711935)"
      val s2 = s"(($s1 | ${shl(s1, 4)}) & 252645135)"
      val s3 = s"(($s2 | ${shl(s2, 2)}) & 858993459)"
      s"(($s3 | ${shl(s3, 1)}) & 1431655765)"
    }
    val z = s"(${spread("x")} | ${shl(spread("y"), 1)})"
    s"""dims AS (
       |  SELECT CAST(l_orderkey AS BIGINT) AS ok,
       |         CAST(l_partkey AS BIGINT) & 65535 AS x,
       |         CAST(l_suppkey AS BIGINT) & 65535 AS y
       |  FROM lineitem),
       |mx AS (SELECT max(ok) AS m FROM dims),
       |coded AS (
       |  SELECT ok, x, y, CAST($z AS BIGINT) AS z FROM dims),
       |mz AS (SELECT max(z) AS m FROM coded),
       |both_layouts AS (
       |  SELECT 'zorder' AS layout, c.z * 1024 $idiv (m.m + 1) AS bucket,
       |         c.x, c.y
       |  FROM coded c CROSS JOIN mz m
       |  UNION ALL
       |  SELECT 'insertion' AS layout, c.ok * 1024 $idiv (m.m + 1) AS bucket,
       |         c.x, c.y
       |  FROM coded c CROSS JOIN mx m)
       |SELECT layout, CAST(bucket AS BIGINT) AS bucket,
       |       CAST(count(*) AS BIGINT) AS cnt,
       |       min(x) AS xmin, max(x) AS xmax, min(y) AS ymin, max(y) AS ymax,
       |       CAST((max(x) - min(x) + 1) * (max(y) - min(y) + 1) AS BIGINT)
       |         AS area
       |FROM both_layouts GROUP BY layout, bucket""".stripMargin
  }

  def pipeZorder(spark: SparkSession, dir: String): DataFrame = {
    spark.read.parquet(s"$dir/lineitem.parquet")
      .createOrReplaceTempView("lineitem")
    spark.sql("WITH " + zorderBody((v, n) => s"shiftleft($v, $n)", "div"))
  }

  val pipeZorderSql: String =
    "WITH " + zorderBody((v, n) => s"($v << $n)", "//")

  // ── pipe_bloom_skip ★ (r11) — FILE-LEVEL BLOOM-FILTER SKIPPING (the
  // pipe_zorder sibling on the point-lookup axis: zone maps prune range
  // predicates, blooms prune equality predicates on high-cardinality
  // keys where min/max is useless): the order-key domain splits into 32
  // range "files", each builds a 4096-bit / 4-hash Bloom filter from the
  // engine-shared md5-top-60 hash, and 20 probes (10 present keys, 10
  // past-the-max absent keys) report how many candidate files survive
  // and whether the true file is among them. No-false-negative is
  // STRUCTURAL (a present key set every bit it probes); the false-
  // positive skip ratio is the measured payoff — absent keys touch ~0
  // of 32 files. `BloomSkipSpec` asserts both properties; the oracle
  // pins every bit of the filter and every candidate count (pure
  // integer hash/shift/mask arithmetic — engine-identical).
  //
  // Scale shape (100 TB): the build is one map-side-combined
  // (file, word) bit_or over k rows per key — the Parquet bloom-filter
  // write path's exact shape; probing touches K·files candidate rows
  // per probe, never data. At production the bits table IS the index
  // (collected per file into footer-sized arrays). Sizing: ~10 bits/key
  // per file is the standard knob; the fixture constant (4096 bits for
  // ≤500 keys/file at sf0.1) deliberately saturates ~10× past that —
  // like any bloom, capacity is a BUILD-time parameter, not a property
  // the filter degrades around gracefully.
  private val BloomBuckets = 32
  private val BloomBits = 4096
  private val BloomK = 4

  private def bloomBody(idiv: String, shl: (String, String) => String,
      str: String => String, h: String => String,
      explode10: String,
      explodeSel: (String, String, String) => String): String = {
    def pos(i: Int, key: String) =
      s"${h(s"concat('bf$i:', ${str(key)})")} % $BloomBits"
    val kposArr = (0 until BloomK).map(pos(_, "k")).mkString(", ")
    val pposArr = (0 until BloomK).map(pos(_, "pk")).mkString(", ")
    s"""keys AS (SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS k FROM lineitem),
       |mx AS (SELECT max(k) AS m FROM keys),
       |kb AS (SELECT k, k * $BloomBuckets $idiv (m + 1) AS bucket
       |       FROM keys CROSS JOIN mx),
       |kpos AS (${explodeSel("bucket", kposArr, "kb")}),
       |bits AS (
       |  SELECT bucket, pos $idiv 32 AS word,
       |         bit_or(${shl("CAST(1 AS BIGINT)", "CAST(pos % 32 AS INT)")})
       |           AS mask
       |  FROM kpos GROUP BY bucket, pos $idiv 32),
       |probes AS (
       |  SELECT k AS pk, 1 AS present, bucket AS true_bucket
       |  FROM (SELECT k, bucket FROM kb ORDER BY k LIMIT 10)
       |  UNION ALL
       |  SELECT m + off AS pk, 0 AS present, CAST(-1 AS BIGINT) AS true_bucket
       |  FROM mx $explode10),
       |praw AS (${explodeSel("pk, present, true_bucket", pposArr, "probes")}),
       |ppos AS (
       |  SELECT pk, present, true_bucket, pos $idiv 32 AS word,
       |         ${shl("CAST(1 AS BIGINT)", "CAST(pos % 32 AS INT)")} AS pmask
       |  FROM praw),
       |cand AS (
       |  SELECT p.pk, p.present, p.true_bucket, b.bucket
       |  FROM ppos p JOIN bits b
       |    ON b.word = p.word AND (b.mask & p.pmask) != 0
       |  GROUP BY p.pk, p.present, p.true_bucket, b.bucket
       |  HAVING count(*) = $BloomK)
       |SELECT p.pk AS probe_key, CAST(p.present AS INT) AS present,
       |       CAST(coalesce(c.nb, 0) AS BIGINT) AS candidate_buckets,
       |       CAST(coalesce(c.hit, 0) AS INT) AS true_hit
       |FROM (SELECT DISTINCT pk, present FROM ppos) p
       |LEFT JOIN (
       |  SELECT pk, count(*) AS nb,
       |         max(CASE WHEN bucket = true_bucket THEN 1 ELSE 0 END) AS hit
       |  FROM cand GROUP BY pk) c ON c.pk = p.pk""".stripMargin
  }

  def pipeBloomSkip(spark: SparkSession, dir: String): DataFrame = {
    spark.read.parquet(s"$dir/lineitem.parquet")
      .createOrReplaceTempView("lineitem")
    spark.sql("WITH " + bloomBody(
      "div",
      (v, n) => s"shiftleft($v, $n)",
      k => s"CAST($k AS STRING)",
      e => s"cast(conv(substr(md5($e), 1, 15), 16, 10) as bigint)",
      "LATERAL VIEW explode(sequence(1, 10)) AS off",
      (cols, arr, src) =>
        s"SELECT $cols, pos FROM $src LATERAL VIEW explode(array($arr)) AS pos"))
  }

  val pipeBloomSkipSql: String =
    "WITH " + bloomBody(
      "//",
      (v, n) => s"($v << ($n))",
      k => s"CAST($k AS VARCHAR)",
      e => s"('0x' || substr(md5($e), 1, 15))::BIGINT",
      "CROSS JOIN (SELECT unnest(range(1, 11)) AS off)",
      (cols, arr, src) => s"SELECT $cols, unnest([$arr]) AS pos FROM $src")

  // ── pipe_source_divergence ★ (r11) — pairwise VOCABULARY divergence
  // between sources (the mixture-design question "which corpora are
  // near-duplicates of each other, which add diversity" — the
  // source-level sibling of pipe_drift_report's time-window compare).
  // Each source's unigram distribution is projected onto 256 shared hash
  // buckets (the md5-top-60 kernel mod 256 — engine-identical), shares
  // are exact micro-units, and each source PAIR reports the triangular
  // discrepancy Σ (p−q)²/(p+q) — the same integer-exact f-divergence as
  // the drift report (ln-free, finite when a bucket is one-sided), plus
  // the count of one-sided buckets (vocabulary a source has that the
  // other lacks).
  //
  // Scale shape (100 TB): token explosion feeds ONE map-side-combined
  // (source, bucket) agg — ≤ |sources|·256 rows cross the shuffle; the
  // pairwise compare is a self-join on bucket over that tiny relation
  // (|sources|²·256 rows at worst, dozens of sources in practice); per-
  // source totals ride a broadcast. The corpus is scanned exactly once.
  val DivBuckets = 256

  /** One query text for both engines — only the word-explode spelling,
    * the hash kernel, and the integer-division token differ. Buckets
    * whose share floors to 0 micro-units carry no distribution mass and
    * are treated as absent vocabulary (identically in both engines).
    * The algebra completes the inner bucket join losslessly:
    * tri = Σ_shared (p−q)²/(p+q) + (mass_a − shared_mass_a)
    *     + (mass_b − shared_mass_b), because a one-sided bucket's term
    * is p²/p = p. Pair universe comes from the tiny source list so even
    * a pair with NO shared vocabulary reports (as maximal divergence). */
  private def divergenceCtes(idiv: String, split: String, explodeWs: String,
      h: String => String): String =
    s"""toks AS (
       |  SELECT source, ${h("w")} % $DivBuckets AS b
       |  FROM (SELECT source, $split AS ws FROM documents) d $explodeWs),
       |counts AS (
       |  SELECT source, b, CAST(count(*) AS BIGINT) AS n
       |  FROM toks GROUP BY source, b),
       |tots AS (
       |  SELECT source, CAST(sum(n) AS BIGINT) AS tot
       |  FROM counts GROUP BY source),
       |shares AS (
       |  SELECT c.source, c.b,
       |         CAST(c.n * 1000000 $idiv t.tot AS BIGINT) AS p
       |  FROM counts c JOIN tots t ON t.source = c.source
       |  WHERE c.n * 1000000 $idiv t.tot > 0),
       |bcount AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS nb,
       |         CAST(sum(p) AS BIGINT) AS mass
       |  FROM shares GROUP BY source),
       |matched AS (
       |  SELECT a.source AS src_a, b2.source AS src_b,
       |         CAST(sum((a.p - b2.p) * (a.p - b2.p) $idiv (a.p + b2.p))
       |           AS BIGINT) AS tri_shared,
       |         CAST(count(*) AS BIGINT) AS n_shared,
       |         CAST(sum(a.p) AS BIGINT) AS mass_a,
       |         CAST(sum(b2.p) AS BIGINT) AS mass_b
       |  FROM shares a
       |  JOIN shares b2 ON b2.b = a.b AND a.source < b2.source
       |  GROUP BY a.source, b2.source)
       |SELECT ca.source AS src_a, cb.source AS src_b,
       |       coalesce(m.n_shared, CAST(0 AS BIGINT)) AS n_shared,
       |       CAST(coalesce(m.tri_shared, CAST(0 AS BIGINT))
       |            + (ca.mass - coalesce(m.mass_a, CAST(0 AS BIGINT)))
       |            + (cb.mass - coalesce(m.mass_b, CAST(0 AS BIGINT)))
       |         AS BIGINT) AS tri_micro,
       |       CAST((ca.nb - coalesce(m.n_shared, CAST(0 AS BIGINT)))
       |            + (cb.nb - coalesce(m.n_shared, CAST(0 AS BIGINT)))
       |         AS BIGINT) AS one_sided
       |FROM bcount ca
       |JOIN bcount cb ON ca.source < cb.source
       |LEFT JOIN matched m ON m.src_a = ca.source AND m.src_b = cb.source""".stripMargin

  def pipeSourceDivergence(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql("WITH " + divergenceCtes("div", "split(text, ' ')",
      "LATERAL VIEW explode(ws) t AS w", DedupQueries.hSpark))
  }

  val pipeSourceDivergenceSql: String =
    "WITH " + divergenceCtes("//", "string_split(text, ' ')",
      ", unnest(ws) AS t(w)", DedupQueries.hDuck)

  // ── pipe_dsir_weights ★ (r12) — DATA SELECTION VIA IMPORTANCE
  // RESAMPLING weights (DSIR, Xie et al. 2023): the domain-targeting
  // step a pretraining mixture runs to up-weight raw documents that
  // look like a target domain. Features are hashed word unigrams into
  // [[DsirBuckets]] buckets (the paper's hashed n-gram trick — feature
  // space constant, never vocabulary-sized); the per-bucket importance
  // is the log-likelihood ratio log2(p_target/p_raw), add-one smoothed
  // and computed in DETERMINISTIC FIXED-POINT: Q10 (1/1024-bit) units
  // via lg(x) = (bitlen(x)−1)·1024 + (x·1024 div 2^(bitlen(x)−1)) −
  // 1024 — integer part from length(bin(x)) (the HLL rho trick),
  // fractional part by linear mantissa interpolation (max ≈0.086-bit
  // approximation error, identical in both engines; plain floor-log2
  // has NO resolution here — hash buckets mix languages, so ratios sit
  // within one octave of 1 and every bucket floors to 0, measured).
  // A document's weight is the sum of its tokens' bucket scores. The
  // target here is lang = 'en'; emitting the PER-LANGUAGE weight means
  // the query is self-evaluating — the target language must surface
  // with the highest mean per-token weight (DsirSpec pins it). The
  // per-token mean uses a +2^16 shift so the floor division runs on
  // non-negative operands in both engines (div vs // disagree on
  // negatives).
  //
  // Scale shape (100 TB): one token-stream pass computes buckets
  // map-side; bucket stats are a 256-row aggregate; scoring joins the
  // 256-row broadcast back onto the stream; everything after is
  // per-doc/per-lang aggregation. No vocabulary-sized state anywhere —
  // the point of hashed features.
  /** Hashed feature buckets (constant feature space). */
  val DsirBuckets = 256
  /** Per-token score shift making the mean's dividend non-negative
    * (|score| ≤ ~40·1024 Q10 units). */
  private val DsirShift = 65536L

  /** Q10 fixed-point log2 of a positive BIGINT expression: integer part
    * from the binary length, fractional part by linear mantissa
    * interpolation. `idiv`/`shl` inject the dialect's integer division
    * and left-shift. */
  private def dsirLg(x: String, idiv: String,
      shl: (String, String) => String): String =
    s"((length(bin($x)) - 1) * 1024 + ($x * 1024 $idiv " +
      s"${shl("CAST(1 AS BIGINT)", s"length(bin($x)) - 1")}) - 1024)"

  private def dsirCtes(idiv: String, split: String, explode: String,
      h: String => String, shl: (String, String) => String): String = {
    // The log-ratio is computed as a DIFFERENCE of two lg's over
    // REDUCED Q10 rationals — lg((c_t+1)·1024 div (c_r+1)) −
    // lg(n_t·1024 div n_r) — never as lg((c_t+1)·n_r) −
    // lg((c_r+1)·n_t) (ADVICE r12): those products overflow 2^63 at
    // ~3e9 corpus tokens with a hot bucket — silently and identically
    // in both engines, so the oracle gate could never catch it.
    // Reduced, each operand stays in range up to ~9e15 tokens (≈
    // 100 TB of text). The STRUCTURE matters as much as the range: the
    // interpolation UNDERESTIMATES each lg by up to 0.086 bits, so the
    // two biases must sit on opposite signs — a neutral bucket
    // (c_t/c_r = n_t/n_r) has near-identical mantissas on both sides
    // and its score cancels to ~0 exactly. (A 4-separate-lg split and
    // a sum form were both tried; their additive ±0.17–0.35-bit biases
    // drowned the within-octave signal — DsirSpec's sign contract
    // caught it.) Both ratios are ≤ 1024 (c_t ≤ c_r, n_t ≤ n_r); the
    // greatest(…, 1) guards floor them at −10 bits when a hot bucket
    // exceeds 2^10·(c_t+1) — documented saturation, not overflow.
    val lgT = dsirLg(
      s"greatest(((c_t + 1) * 1024) $idiv (c_r + 1), CAST(1 AS BIGINT))",
      idiv, shl)
    val lgR = dsirLg(
      s"greatest((t.n_t * 1024) $idiv t.n_r, CAST(1 AS BIGINT))", idiv, shl)
    s"""words AS (
       |  SELECT doc_id, lang, ${h("w")} % $DsirBuckets AS b
       |  FROM (SELECT doc_id, lang, $split AS ws FROM documents) d
       |  $explode),
       |tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_r,
       |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_t
       |  FROM words),
       |bstats AS (
       |  SELECT b, CAST(count(*) AS BIGINT) AS c_r,
       |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
       |           AS c_t
       |  FROM words GROUP BY b),
       |scores AS (
       |  SELECT b, CAST($lgT - $lgR AS BIGINT) AS score
       |  FROM bstats CROSS JOIN tot t),
       |docw AS (
       |  SELECT w.doc_id, w.lang, CAST(count(*) AS BIGINT) AS toks,
       |         CAST(sum(s.score) AS BIGINT) AS w_q10
       |  FROM words w JOIN scores s ON s.b = w.b
       |  GROUP BY w.doc_id, w.lang)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(toks) AS BIGINT) AS tokens,
       |       CAST(sum(w_q10) AS BIGINT) AS w_q10_sum,
       |       CAST((sum(w_q10) + $DsirShift * sum(toks))
       |              $idiv sum(toks) - $DsirShift AS BIGINT)
       |         AS mean_q10_bits
       |FROM docw GROUP BY lang""".stripMargin
  }

  def pipeDsirWeights(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql("WITH " + dsirCtes("div", "split(text, ' ')",
      "LATERAL VIEW explode(ws) t AS w", DedupQueries.hSpark,
      (a, b) => s"shiftleft($a, $b)"))
  }

  val pipeDsirWeightsSql: String =
    "WITH " + dsirCtes("//", "string_split(text, ' ')",
      ", unnest(ws) AS t(w)", DedupQueries.hDuck,
      (a, b) => s"($a << ($b))")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_dsir_weights" -> (pipeDsirWeights _),
    "pipe_source_divergence" -> (pipeSourceDivergence _),
    "pipe_bloom_skip" -> (pipeBloomSkip _),
    "pipe_zorder" -> (pipeZorder _),
    "pipe_mix_temperature" -> (pipeMixTemperature _),
    "pipe_split" -> (pipeSplit _),
    "pipe_pii_scrub" -> (pipePiiScrub _),
    "pipe_dataset_diff" -> (pipeDatasetDiff _),
    "pipe_curriculum" -> (pipeCurriculum _),
    "pipe_contamination_rate" -> (pipeContaminationRate _),
    "sk_kmv_distinct" -> (skKmvDistinct _),
    "pipe_canonicalize" -> (pipeCanonicalize _),
    "text_gopher_filters" -> (textGopherFilters _),
    "pipe_decontaminate" -> (pipeDecontaminate _),
    "pipe_decontaminate_bloom" -> (pipeDecontaminateBloom _),
    "pipe_pack" -> (pipePack _),
    "pipe_pack_bestfit" -> (pipePackBestfit _),
    "pipe_mix" -> (pipeMix _),
    "pipe_upsample" -> (pipeUpsample _),
    "pipe_quota_sample" -> (pipeQuotaSample _),
    "text_tfidf_topk" -> (textTfidfTopk _),
    "pipe_shard" -> (pipeShard _),
    "pipe_shuffle" -> (pipeShuffle _))

  val oracle: Map[String, String] = Map(
    "pipe_dsir_weights" -> pipeDsirWeightsSql,
    "pipe_source_divergence" -> pipeSourceDivergenceSql,
    "pipe_bloom_skip" -> pipeBloomSkipSql,
    "pipe_zorder" -> pipeZorderSql,
    "pipe_mix_temperature" -> pipeMixTemperatureSql,
    "pipe_split" -> pipeSplitSql,
    "pipe_pii_scrub" -> pipePiiScrubSql,
    "pipe_dataset_diff" -> pipeDatasetDiffSql,
    "pipe_curriculum" -> pipeCurriculumSql,
    "pipe_contamination_rate" -> pipeContaminationRateSql,
    "sk_kmv_distinct" -> skKmvDistinctSql,
    "pipe_canonicalize" -> pipeCanonicalizeSql,
    "text_gopher_filters" -> textGopherFiltersSql,
    "pipe_decontaminate" -> pipeDecontaminateSql,
    // Bloom path exact-verifies its candidates → identical output, same oracle.
    "pipe_decontaminate_bloom" -> pipeDecontaminateSql,
    "pipe_pack" -> pipePackSql,
    "pipe_pack_bestfit" -> pipePackBestfitSql,
    "pipe_mix" -> pipeMixSql,
    "pipe_upsample" -> pipeUpsampleSql,
    "pipe_quota_sample" -> pipeQuotaSampleSql,
    "text_tfidf_topk" -> textTfidfTopkSql,
    "pipe_shard" -> pipeShardSql,
    "pipe_shuffle" -> pipeShuffleSql)
}
