package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Pin.PinSyntax

/** Document REWRITE operators — the catalog's dedup family detects
  * duplicate pairs and picks keeper documents; these two operators change
  * the documents themselves, which is what the C4 / "Deduplicating
  * Training Data" (Lee et al. 2022) pipelines actually ship:
  *
  *  - `dd_span_rewrite`: excise corpus-duplicated word spans from every
  *    document, keeping exactly the first occurrence corpus-wide (the
  *    ExactSubstr-removal variant of substring dedup — `dd_substring`
  *    only REPORTS the duplicated-passage pairs).
  *  - `pipe_chunk`: split documents into overlapping fixed-width token
  *    windows (the pretraining/RAG chunking step between curation and
  *    packing).
  *
  * Both are engine-exact: block/chunk boundaries are integer word
  * arithmetic, content keys are md5 strings, and the rebuilt document is
  * reduced to its md5 + exact word counts so no float or large-text
  * column reaches the compare.
  */
object CorpusRewriteQueries {

  private def viewDocs(spark: SparkSession, dir: String): Unit =
    spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
      .createOrReplaceTempView("documents")

  // ── dd_span_rewrite ★ — corpus-duplicated span excision ──────────────
  //
  // Spans are ALIGNED B-word blocks (B = 16): alignment makes the block
  // set linear in corpus size (vs every-offset windows) and the rewrite
  // well-defined — each word belongs to exactly one block, so excision
  // never splits or double-drops. The keeper rule is global first
  // occurrence: min (doc_id, block_idx) as a lexicographic STRUCT min
  // (both engines order structs field-by-field), so no packed-BIGINT
  // encoding exists to collide — a 10^5-block document (1.6M words,
  // plausible in web corpora) resolves its keeper correctly.
  //
  // Scale shape (100 TB): one bounded explode (n_words / B rows per
  // doc), one map-side-combined aggregate keyed by the block hash (the
  // hottest key — a boilerplate block — collapses map-side to one row
  // per task), one hash equi-join back, one per-doc re-aggregation.
  // Never all-pairs, no window over the corpus, document text never
  // shuffles twice (blocks carry only B-word slices).
  val SpanBlock = 16

  def ddSpanRewrite(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    // Materialize the block explode ONCE and pin it: `firsts` and
    // `marked` both consume it, and Catalyst inlines CTEs — without the
    // pin the most expensive stage (split + slice + md5 over every
    // document) runs twice (the dd_substring precedent). Transient pin;
    // Verify/Bench sweep it after the query. The btext slice is spelled
    // once and the hash derives from the projected column.
    spark.sql(
      s"""SELECT doc_id, bidx, md5(btext) AS h, btext,
         |       CAST(size(split(btext, ' ')) AS BIGINT) AS bwords
         |FROM (
         |  SELECT doc_id, bidx,
         |         array_join(slice(ws, bidx * $SpanBlock + 1, $SpanBlock), ' ') AS btext
         |  FROM (SELECT doc_id, split(text, ' ') AS ws FROM documents)
         |  LATERAL VIEW explode(sequence(0,
         |    CAST(ceil(size(ws) / $SpanBlock.0) AS INT) - 1)) AS bidx)""".stripMargin)
      .pinned()
      .createOrReplaceTempView("span_blocks_t")
    spark.sql(
      s"""WITH blocks AS (SELECT * FROM span_blocks_t),
         |firsts AS (
         |  SELECT h, min(named_struct('d', doc_id, 'b', bidx)) AS first_key
         |  FROM blocks GROUP BY h),
         |marked AS (
         |  SELECT b.doc_id, b.bidx, b.btext, b.bwords,
         |         CASE WHEN named_struct('d', b.doc_id, 'b', b.bidx) = f.first_key
         |              THEN 1 ELSE 0 END AS keep
         |  FROM blocks b JOIN firsts f ON b.h = f.h)
         |SELECT doc_id,
         |       CAST(count(*) AS BIGINT) AS n_blocks,
         |       CAST(sum(keep) AS BIGINT) AS kept_blocks,
         |       CAST(sum(CASE WHEN keep = 1 THEN bwords ELSE 0 END) AS BIGINT)
         |         AS new_n_words,
         |       md5(array_join(transform(
         |             array_sort(collect_list(
         |               CASE WHEN keep = 1 THEN struct(bidx, btext) END)),
         |             x -> x.btext), ' ')) AS new_hash
         |FROM marked GROUP BY doc_id""".stripMargin)
  }

  val ddSpanRewriteSql: String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |blocks AS (
       |  SELECT doc_id, CAST(j AS BIGINT) AS bidx,
       |         md5(array_to_string(ws[(j * $SpanBlock + 1):((j + 1) * $SpanBlock)], ' ')) AS h,
       |         array_to_string(ws[(j * $SpanBlock + 1):((j + 1) * $SpanBlock)], ' ') AS btext,
       |         CAST(len(ws[(j * $SpanBlock + 1):((j + 1) * $SpanBlock)]) AS BIGINT) AS bwords
       |  FROM w, LATERAL unnest(range(0,
       |         CAST(ceil(len(ws) / $SpanBlock.0) AS BIGINT))) AS t(j)),
       |firsts AS (
       |  SELECT h, min(struct_pack(d := doc_id, b := bidx)) AS first_key
       |  FROM blocks GROUP BY h),
       |marked AS (
       |  SELECT b.doc_id, b.bidx, b.btext, b.bwords,
       |         CASE WHEN struct_pack(d := b.doc_id, b := b.bidx) = f.first_key
       |              THEN 1 ELSE 0 END AS keep
       |  FROM blocks b JOIN firsts f ON b.h = f.h)
       |SELECT doc_id,
       |       CAST(count(*) AS BIGINT) AS n_blocks,
       |       CAST(sum(keep) AS BIGINT) AS kept_blocks,
       |       CAST(sum(CASE WHEN keep = 1 THEN bwords ELSE 0 END) AS BIGINT)
       |         AS new_n_words,
       |       md5(coalesce(string_agg(CASE WHEN keep = 1 THEN btext END, ' '
       |                               ORDER BY bidx), '')) AS new_hash
       |FROM marked GROUP BY doc_id""".stripMargin

  // ── pipe_chunk ★ — overlapping token-window chunking ─────────────────
  //
  // Fixed window W = 48 words, stride S = 32 (W - S = 16 words of
  // overlap, the context-bridging margin). Chunk starts are the stride
  // grid below n_words, so the tail chunk may be short but no text is
  // dropped; every chunk carries its provenance (doc_id, start_word) —
  // what a RAG store or packing stage joins back on.
  //
  // Scale shape: ONE bounded explode (ceil(n/S) rows per doc) and
  // nothing else — no shuffle, no window; chunk text leaves the operator
  // as md5 + exact word count.
  val ChunkWindow = 48
  val ChunkStride = 32

  /** The chunk explode as a batch-to-batch transform over (doc_id, text)
    * rows — the ONE spelling of the window/stride/provenance expressions,
    * consumed by the catalog query below AND by the streaming ingest
    * composition ([[graft.streaming.CorpusIngest.runWithChunks]]), so the
    * two paths cannot drift. */
  def chunksOf(docs: DataFrame): DataFrame = docs
    .selectExpr("doc_id", "split(text, ' ') AS ws")
    .selectExpr("doc_id", "ws",
      s"explode(sequence(0, size(ws) - 1, $ChunkStride)) AS s")
    .selectExpr("doc_id",
      "CAST(s AS BIGINT) AS start_word",
      s"CAST(s DIV $ChunkStride AS BIGINT) AS chunk_idx",
      s"CAST(size(slice(ws, s + 1, $ChunkWindow)) AS BIGINT) AS chunk_words",
      s"md5(array_join(slice(ws, s + 1, $ChunkWindow), ' ')) AS chunk_hash")

  def pipeChunk(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    chunksOf(spark.table("documents"))
  }

  val pipeChunkSql: String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
       |SELECT doc_id,
       |       CAST(j AS BIGINT) AS start_word,
       |       CAST(j // $ChunkStride AS BIGINT) AS chunk_idx,
       |       CAST(len(ws[(j + 1):(j + $ChunkWindow)]) AS BIGINT) AS chunk_words,
       |       md5(array_to_string(ws[(j + 1):(j + $ChunkWindow)], ' ')) AS chunk_hash
       |FROM w, LATERAL unnest(range(0, len(ws), $ChunkStride)) AS t(j)""".stripMargin

  /** CDC rolling-hash window (words) and boundary mask (avg chunk =
    * CdcMask words). */
  val CdcWin = 4
  val CdcMask = 32

  // ── pipe_cdc_chunk ★ (r11) — CONTENT-DEFINED CHUNKING (the
  // rsync/LBFS rolling-hash trick, and the modern RAG-ingest upgrade
  // over fixed-stride windows): a chunk boundary falls AFTER word i
  // exactly when the hash of the last 4 words ≡ 0 (mod 32), so
  // boundaries are properties of the CONTENT, not of positions — insert
  // a paragraph at the top of a document and every chunk past the first
  // resynchronization point keeps its identity (hash), where
  // `pipe_chunk`'s fixed stride invalidates every chunk downstream.
  // `CdcChunkSpec` pins exactly that contrast. Engine-exact: the
  // boundary hash is the engine-shared md5-top-60; chunking is a
  // doc-partitioned running sum; chunk hashes recompute from the
  // original word array.
  //
  // Scale shape (100 TB): one explode to word positions, one
  // doc-partitioned window (the per-key running sum), one group-by —
  // scan-shaped, no joins beyond the final doc-array fetch; the dedup
  // payoff is that shifted near-identical crawls now share chunk hashes
  // and every downstream exact/LSH dedup operator sees them.
  def cdcChunksOf(spark: SparkSession, docsView: String): DataFrame = {
    val h = DedupQueries.hSpark(s"array_join(slice(ws, i - ${CdcWin - 1}, $CdcWin), ' ')")
    spark.sql(
      s"""WITH w AS (SELECT doc_id, split(text, ' ') AS ws FROM $docsView),
         |pos AS (SELECT doc_id, ws, i
         |        FROM w LATERAL VIEW explode(sequence(1, size(ws))) AS i),
         |bnd AS (
         |  SELECT doc_id, i,
         |         CASE WHEN i >= $CdcWin AND $h % $CdcMask = 0
         |              THEN 1 ELSE 0 END AS b
         |  FROM pos),
         |cids AS (
         |  SELECT doc_id, i,
         |         1 + coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY i
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS cid
         |  FROM bnd),
         |chunks AS (
         |  SELECT doc_id, cid, CAST(min(i) AS BIGINT) AS start_word,
         |         CAST(count(*) AS BIGINT) AS chunk_words
         |  FROM cids GROUP BY doc_id, cid)
         |SELECT c.doc_id, CAST(c.cid AS BIGINT) AS chunk_idx, c.start_word,
         |       c.chunk_words,
         |       md5(array_join(slice(w.ws, CAST(c.start_word AS INT),
         |                            CAST(c.chunk_words AS INT)), ' '))
         |         AS chunk_hash
         |FROM chunks c JOIN w ON w.doc_id = c.doc_id""".stripMargin)
  }

  def pipeCdcChunk(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    cdcChunksOf(spark, "documents")
  }

  val pipeCdcChunkSql: String = {
    val h = DedupQueries.hDuck(s"array_to_string(ws[(i - ${CdcWin - 1}):i], ' ')")
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |pos AS (SELECT doc_id, ws, i
       |        FROM w, unnest(range(1, len(ws) + 1)) AS t(i)),
       |bnd AS (
       |  SELECT doc_id, i,
       |         CASE WHEN i >= $CdcWin AND $h % $CdcMask = 0
       |              THEN 1 ELSE 0 END AS b
       |  FROM pos),
       |cids AS (
       |  SELECT doc_id, i,
       |         1 + coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY i
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           AS cid
       |  FROM bnd),
       |chunks AS (
       |  SELECT doc_id, cid, CAST(min(i) AS BIGINT) AS start_word,
       |         CAST(count(*) AS BIGINT) AS chunk_words
       |  FROM cids GROUP BY doc_id, cid)
       |SELECT c.doc_id, CAST(c.cid AS BIGINT) AS chunk_idx, c.start_word,
       |       c.chunk_words,
       |       md5(array_to_string(
       |         w.ws[CAST(c.start_word AS BIGINT)
       |              :(c.start_word + c.chunk_words - 1)], ' '))
       |         AS chunk_hash
       |FROM chunks c JOIN w ON w.doc_id = c.doc_id""".stripMargin
  }

  // ── dd_chunk_dedup ★ (r11) — the CDC-chunking dedup PAYOFF measured:
  // content-defined chunks dedupe across documents exactly where
  // fixed-stride chunks cannot (shifted near-copies re-synchronize to
  // the same boundaries — CdcChunkSpec's 12/13-vs-0/13 contrast), so
  // this report is the number a storage/RAG deployment sizes its
  // chunk-store by: per source, total chunk mass, distinct chunk
  // hashes, the DUPLICATED mass (chunks whose hash occurs more than
  // once corpus-wide — cross-source duplicates count everywhere they
  // appear), and the micro-unit dup rate.
  //
  // Scale shape: pipe_cdc_chunk's scan-shaped plan + one corpus-wide
  // (hash → count) agg + one broadcast-back equi-join + a ≤#sources
  // report agg.
  private def chunkDedupBody(idiv: String): String =
    s"""hcnt AS (
       |  SELECT chunk_hash, CAST(count(*) AS BIGINT) AS occ
       |  FROM chunks GROUP BY chunk_hash),
       |joined AS (
       |  SELECT c.doc_id, c.chunk_hash, c.chunk_words, h.occ
       |  FROM chunks c JOIN hcnt h ON h.chunk_hash = c.chunk_hash),
       |bysrc AS (
       |  SELECT d.source,
       |         CAST(count(*) AS BIGINT) AS n_chunks,
       |         CAST(count(DISTINCT j.chunk_hash) AS BIGINT) AS distinct_hashes,
       |         CAST(sum(j.chunk_words) AS BIGINT) AS chunk_mass,
       |         CAST(sum(CASE WHEN j.occ > 1 THEN j.chunk_words
       |                       ELSE 0 END) AS BIGINT) AS dup_mass
       |  FROM joined j JOIN documents d ON d.doc_id = j.doc_id
       |  GROUP BY d.source)
       |SELECT source, n_chunks, distinct_hashes, chunk_mass, dup_mass,
       |       CAST(dup_mass * 1000000 $idiv chunk_mass AS BIGINT)
       |         AS dup_rate_micro
       |FROM bysrc""".stripMargin

  def ddChunkDedup(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    cdcChunksOf(spark, "documents").createOrReplaceTempView("chunks")
    spark.sql(s"WITH ${chunkDedupBody("div")}")
  }

  val ddChunkDedupSql: String =
    s"""WITH chunks AS (
       |$pipeCdcChunkSql),
       |${chunkDedupBody("//")}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_span_rewrite" -> (ddSpanRewrite _),
    "pipe_chunk" -> (pipeChunk _),
    "pipe_cdc_chunk" -> (pipeCdcChunk _),
    "dd_chunk_dedup" -> (ddChunkDedup _))

  val oracle: Map[String, String] = Map(
    "dd_span_rewrite" -> ddSpanRewriteSql,
    "pipe_chunk" -> pipeChunkSql,
    "pipe_cdc_chunk" -> pipeCdcChunkSql,
    "dd_chunk_dedup" -> ddChunkDedupSql)
}
