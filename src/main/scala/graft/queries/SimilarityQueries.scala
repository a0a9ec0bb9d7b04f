package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Pin.PinSyntax
import DedupQueries.{hSpark, hDuck}

/** Approximate-nearest-neighbor search over the `embeddings` table:
  * brute-force cosine top-k as the correctness baseline, and a
  * random-hyperplane-LSH bucketed variant as the 100 TB scale path.
  *
  * Scale notes: brute-force is O(Q·N) with the query side broadcast — the
  * N side never shuffles and the top-k is a per-partition partial top-k
  * (TakeOrdered pattern via window on a small Q·N product here; at real
  * scale Q is batched and the window is per-query). The LSH variant cuts
  * the candidate set to one bucket per query: candidates shuffle once on
  * the bucket id, which is the IVF/LSH routing join.
  *
  * All dot products are explicit left-to-right double folds in BOTH
  * engines so float results agree bit-for-bit; outputs round to 6 dp.
  */
object SimilarityQueries {

  private def viewEmb(spark: SparkSession, dir: String): Unit =
    spark.read.parquet(s"$dir/embeddings.parquet").createOrReplaceTempView("embeddings")

  // Session memos (now [[graft.operators.SessionMemo]], which evicts
  // stopped sessions — ADVICE r12): the graph-ANN build is shared by
  // the three nsw/hnsw/diverse pipelines, and every report-evaluated
  // method's SERVED output is shared so ann_recall_report consumes the
  // standalone queries' materialized results instead of re-serving
  // (r12's 6.2× report regression). Bench clears between passes so
  // every pass pays real cost.
  private[graft] def clearSessionMemos(): Unit =
    graft.operators.SessionMemo.clear()

  /** Memoized served output: each method's final (q_id, vec_id, …)
    * relation — a few dozen rows — checkpointed SHARED so it survives
    * Bench's between-query transient sweep within a pass. */
  private def served(name: String, f: (SparkSession, String) => DataFrame)(
      spark: SparkSession, dir: String): DataFrame =
    graft.operators.SessionMemo.cached(spark, s"served/$name/$dir")(
      graft.operators.PinnedStages.sharedCheckpoint(f(spark, dir)))

  /** (alln, normed, gsc): all vectors with their duplicate-class rep,
    * the distinct-vector index nodes, and the scored crnk ≤ 2 co-list
    * pair relation every graph-ANN variant re-ranks. */
  private def nswBuild(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) =
    graft.operators.SessionMemo.cached(spark, s"nswBuild/$dir") {
        viewEmb(spark, dir)
        graft.expr.GraftFunctions.register(spark)
        val alln = graft.operators.PinnedStages.sharedCheckpoint(spark.sql(
          s"""SELECT vec_id, embedding, nrm,
             |       min(vec_id) OVER (PARTITION BY embedding) AS rep_id
             |FROM (SELECT vec_id, embedding,
             |             sqrt(${dotS("embedding", "embedding")}) AS nrm
             |      FROM embeddings)""".stripMargin))
        alln.createOrReplaceTempView("nswb_all_t")
        val normed = graft.operators.PinnedStages.sharedCheckpoint(spark.sql(
          "SELECT vec_id, embedding, nrm FROM nswb_all_t WHERE vec_id = rep_id"))
        normed.createOrReplaceTempView("nswb_normed_t")
        val gsc = graft.operators.PinnedStages.sharedCheckpoint(spark.sql(
          s"""WITH cents AS (
             |  SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm
             |  FROM nswb_normed_t WHERE vec_id BETWEEN 100 AND 115),
             |memb AS (
             |  SELECT vec_id, c_id FROM (
             |    SELECT n.vec_id, c.c_id,
             |           row_number() OVER (PARTITION BY n.vec_id
             |             ORDER BY ${dotS("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) DESC,
             |                      c.c_id) AS crnk
             |    FROM nswb_normed_t n CROSS JOIN cents c) WHERE crnk <= 2),
             |cand AS (
             |  SELECT DISTINCT a.vec_id, b.vec_id AS nbr_id
             |  FROM memb a JOIN memb b
             |    ON a.c_id = b.c_id AND a.vec_id <> b.vec_id)
             |SELECT c.vec_id, c.nbr_id,
             |       CAST(round(${dotS("x.embedding", "y.embedding")}
             |             / (x.nrm * y.nrm) * 1000000, 0) AS BIGINT) AS sim_micro
             |FROM cand c
             |JOIN nswb_normed_t x ON x.vec_id = c.vec_id
             |JOIN nswb_normed_t y ON y.vec_id = c.nbr_id""".stripMargin))
        (alln, normed, gsc)
      }

  // Codegen'd custom expression (graft.expr.FloatDotProduct) — the
  // interpreted aggregate(zip_with(...)) equivalent is ~4x slower on the
  // quadratic scoring stage.
  private def dotS(a: String, b: String) = s"float_dot($a, $b)" 

  private def dotD(a: String, b: String, range: String = "range(1, 65)") =
    s"""list_reduce([0.0] || list_transform($range,
       |      i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x, y) -> x + y)""".stripMargin

  // ── ann_bruteforce_topk ★ — exact cosine top-5 for each query vector
  // (vec_id < 3), ties broken by vec_id.
  def annBruteforce(spark: SparkSession, dir: String): DataFrame = {
    viewEmb(spark, dir)
    graft.expr.GraftFunctions.register(spark)
    // Materialize the norm pass ONCE — the CTE is referenced by both join
    // sides and Catalyst would inline (recompute) it into each. The query
    // side is a handful of rows by construction: broadcast it explicitly,
    // because the checkpoint hides the size statistics the planner would
    // need to choose that itself. The candidate side never shuffles.
    spark.sql(
      s"""SELECT vec_id, embedding,
         |       sqrt(${dotS("embedding", "embedding")}) AS nrm
         |FROM embeddings""".stripMargin)
      .pinned()
      .createOrReplaceTempView("bf_normed_t")
    spark.sql(
      s"""WITH queries AS (SELECT * FROM bf_normed_t WHERE vec_id < 3),
         |scored AS (
         |  SELECT /*+ BROADCAST(q) */ q.vec_id AS q_id, c.vec_id AS vec_id,
         |         ${dotS("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cs
         |  FROM queries q JOIN bf_normed_t c ON q.vec_id <> c.vec_id),
         |ranked AS (
         |  SELECT q_id, vec_id, cs,
         |         row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rnk
         |  FROM scored)
         |SELECT q_id, vec_id, cast(rnk as int) AS rnk, cs AS cos_sim
         |FROM ranked WHERE rnk <= 5""".stripMargin)
  }

  val annBruteforceSql: String =
    s"""WITH normed AS (
       |  SELECT vec_id, embedding,
       |         sqrt(list_reduce([0.0] || list_transform(embedding,
       |           x -> x::DOUBLE * x::DOUBLE), (a, b) -> a + b)) AS nrm
       |  FROM embeddings),
       |queries AS (SELECT * FROM normed WHERE vec_id < 3),
       |scored AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
       |         ${dotD("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cs
       |  FROM queries q JOIN normed c ON q.vec_id <> c.vec_id),
       |ranked AS (
       |  SELECT q_id, vec_id, cs,
       |         row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rnk
       |  FROM scored)
       |SELECT q_id, vec_id, CAST(rnk AS INT) AS rnk, cs AS cos_sim
       |FROM ranked WHERE rnk <= 5""".stripMargin

  // ── ann_lsh_topk ★ — 8 deterministic pseudo-random hyperplanes (LCG
  // over plane×dim index) hash every vector to an 8-bit bucket; queries
  // only score candidates in their own bucket, top-3 each.
  //
  // Plane value for plane j, dim d (0-based):
  //   ((1103515245*(j*64+d) + 12345) % 2001 - 1000) / 1000.0
  // Spark side computes it via the fused codegen'd `hyperplane_bucket`
  // kernel (graft.expr.HyperplaneBucket) — the interpreted HOF
  // formulation re-allocated the plane array per row per plane and, being
  // a CTE referenced from both join sides, was inlined and computed twice
  // over the full table (round-1 verdict: 17.8 s). The bucketed relation
  // is materialized ONCE via localCheckpoint for the same reason.
  private val bucketDuck =
    """list_sum(list_transform(range(0, 8), j ->
      |    CASE WHEN list_reduce([0.0] || list_transform(range(1, 65), d ->
      |           embedding[d]::DOUBLE *
      |           ((((1103515245*(j*64 + d - 1) + 12345) % 2001) - 1000) / 1000.0)),
      |         (x, y) -> x + y) > 0.0
      |    THEN (1 << j) ELSE 0 END))""".stripMargin

  def annLshTopk(spark: SparkSession, dir: String): DataFrame = {
    viewEmb(spark, dir)
    graft.expr.GraftFunctions.register(spark)
    spark.sql(
      s"""SELECT vec_id, embedding,
         |       sqrt(${dotS("embedding", "embedding")}) AS nrm,
         |       hyperplane_bucket(embedding) AS bucket
         |FROM embeddings""".stripMargin)
      .pinned()
      .createOrReplaceTempView("ann_bucketed_t")
    spark.sql(
      s"""WITH bucketed AS (SELECT * FROM ann_bucketed_t),
         |queries AS (SELECT * FROM bucketed WHERE vec_id < 3),
         |scored AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id, q.bucket AS bucket,
         |         ${dotS("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cs
         |  FROM queries q JOIN bucketed c
         |    ON q.bucket = c.bucket AND q.vec_id <> c.vec_id),
         |ranked AS (
         |  SELECT q_id, vec_id, bucket, cs,
         |         row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rnk
         |  FROM scored)
         |SELECT q_id, vec_id, cast(bucket as int) AS bucket, cast(rnk as int) AS rnk,
         |       cs AS cos_sim
         |FROM ranked WHERE rnk <= 3""".stripMargin)
  }

  val annLshTopkSql: String =
    s"""WITH bucketed AS (
       |  SELECT vec_id, embedding,
       |         sqrt(list_reduce([0.0] || list_transform(embedding,
       |           x -> x::DOUBLE * x::DOUBLE), (a, b) -> a + b)) AS nrm,
       |         $bucketDuck AS bucket
       |  FROM embeddings),
       |queries AS (SELECT * FROM bucketed WHERE vec_id < 3),
       |scored AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id, q.bucket AS bucket,
       |         ${dotD("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cs
       |  FROM queries q JOIN bucketed c
       |    ON q.bucket = c.bucket AND q.vec_id <> c.vec_id),
       |ranked AS (
       |  SELECT q_id, vec_id, bucket, cs,
       |         row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rnk
       |  FROM scored)
       |SELECT q_id, vec_id, CAST(bucket AS INT) AS bucket, CAST(rnk AS INT) AS rnk,
       |       cs AS cos_sim
       |FROM ranked WHERE rnk <= 3""".stripMargin

  // ── ann_ivf_topk ★ — IVF (inverted-file) ANN: a small set of coarse
  // centroids partitions the vectors into posting lists; a query probes
  // only its `nprobe` nearest centroids' lists. This is the other half of
  // the survey's "IVF or LSH-bucketed variant as the scale path" — LSH
  // buckets by hash geometry, IVF by data geometry. Centroids are picked
  // deterministically (vec_id 100..115 → 16 lists) so both engines build
  // the identical index without a k-means dependency; a production build
  // drops [[graft.tools.KMeansTrainer]] centroids into the same CTE (the
  // trainer exists and is spec-verified; it isn't used HERE because the
  // DuckDB oracle must construct the identical index without running it).
  //
  // Scale shape: the assignment stage is a broadcast nested-loop over the
  // 16-row centroid table (the N side never shuffles); posting lists then
  // shuffle ONCE on centroid id, and each query routes to nprobe=2 of the
  // 16 lists — the IVF routing join, identical in shape to the LSH bucket
  // join. Assignment ties break by centroid id, score ties by vec_id, so
  // the result is fully deterministic.
  private val ivfNprobe = 2

  def annIvfTopk(spark: SparkSession, dir: String): DataFrame = {
    viewEmb(spark, dir)
    graft.expr.GraftFunctions.register(spark)
    // Materialize the norm pass ONCE: it is consumed by the assignment
    // query and by BOTH scoring join sides below, and Catalyst's CTE
    // inlining would otherwise run the O(N·dim) float_dot+sqrt scan
    // three times over.
    spark.sql(
      s"""SELECT vec_id, embedding,
         |       sqrt(${dotS("embedding", "embedding")}) AS nrm
         |FROM embeddings""".stripMargin)
      .pinned()
      .createOrReplaceTempView("ivf_normed_t")
    // Materialize the assignment ONCE too — and carry (embedding, nrm)
    // through it: a real IVF index stores the VECTORS in the posting
    // lists, so the scoring stage below is a single join of the tiny
    // probe side against the lists, with no re-join back to the corpus
    // (the earlier formulation re-joined `normed` twice, and since a
    // checkpoint has no size statistics, those joins planned as
    // full-table sort-merge joins).
    spark.sql(
      s"""WITH cents AS (
         |  SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm
         |  FROM ivf_normed_t WHERE vec_id BETWEEN 100 AND 115),
         |assign AS (
         |  SELECT n.vec_id, c.c_id, n.embedding, n.nrm,
         |         row_number() OVER (PARTITION BY n.vec_id
         |           ORDER BY ${dotS("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) DESC,
         |                    c.c_id) AS crnk
         |  FROM ivf_normed_t n CROSS JOIN cents c)
         |SELECT vec_id, c_id, crnk, embedding, nrm
         |FROM assign WHERE crnk <= $ivfNprobe""".stripMargin)
      .pinned()
      .createOrReplaceTempView("ivf_assign_t")
    // The probe side is a handful of (query × nprobe) rows BY DESIGN —
    // broadcast it explicitly (the checkpoint hides the statistics that
    // would let the planner see that).
    spark.sql(
      s"""WITH lists AS (
         |  SELECT vec_id, c_id, embedding, nrm FROM ivf_assign_t WHERE crnk = 1),
         |qprobe AS (
         |  SELECT vec_id AS q_id, c_id, embedding AS q_emb, nrm AS q_nrm
         |  FROM ivf_assign_t WHERE vec_id < 3 AND crnk <= $ivfNprobe),
         |scored AS (
         |  SELECT /*+ BROADCAST(qp) */ qp.q_id, l.vec_id, l.c_id,
         |         ${dotS("qp.q_emb", "l.embedding")} / (qp.q_nrm * l.nrm) AS cs
         |  FROM qprobe qp
         |  JOIN lists l ON l.c_id = qp.c_id AND l.vec_id <> qp.q_id),
         |ranked AS (
         |  SELECT q_id, vec_id, c_id, cs,
         |         row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rnk
         |  FROM scored)
         |SELECT q_id, vec_id, cast(c_id as int) AS centroid_id, cast(rnk as int) AS rnk,
         |       cs AS cos_sim
         |FROM ranked WHERE rnk <= 3""".stripMargin)
  }

  val annIvfTopkSql: String =
    s"""WITH normed AS (
       |  SELECT vec_id, embedding,
       |         sqrt(list_reduce([0.0] || list_transform(embedding,
       |           x -> x::DOUBLE * x::DOUBLE), (a, b) -> a + b)) AS nrm
       |  FROM embeddings),
       |cents AS (
       |  SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm
       |  FROM normed WHERE vec_id BETWEEN 100 AND 115),
       |assign AS (
       |  SELECT n.vec_id, c.c_id,
       |         row_number() OVER (PARTITION BY n.vec_id
       |           ORDER BY ${dotD("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) DESC,
       |                    c.c_id) AS crnk
       |  FROM normed n CROSS JOIN cents c),
       |lists AS (SELECT vec_id, c_id FROM assign WHERE crnk = 1),
       |qprobe AS (
       |  SELECT vec_id AS q_id, c_id FROM assign
       |  WHERE vec_id < 3 AND crnk <= $ivfNprobe),
       |scored AS (
       |  SELECT qp.q_id, l.vec_id, l.c_id,
       |         ${dotD("qn.embedding", "cn.embedding")} / (qn.nrm * cn.nrm) AS cs
       |  FROM qprobe qp
       |  JOIN lists l ON l.c_id = qp.c_id AND l.vec_id <> qp.q_id
       |  JOIN normed qn ON qn.vec_id = qp.q_id
       |  JOIN normed cn ON cn.vec_id = l.vec_id),
       |ranked AS (
       |  SELECT q_id, vec_id, c_id, cs,
       |         row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rnk
       |  FROM scored)
       |SELECT q_id, vec_id, CAST(c_id AS INT) AS centroid_id, CAST(rnk AS INT) AS rnk,
       |       cs AS cos_sim
       |FROM ranked WHERE rnk <= 3""".stripMargin

  // ── ann_range_search ★ — THRESHOLD retrieval: every neighbor with
  // cosine ≥ τ, not a fixed top-k (the dedup/recall-sweep form of vector
  // search — "find everything this similar", where k is unknowable a
  // priori). Same broadcast shape as brute-force top-k: the query side is
  // tiny and broadcast, the candidate side never shuffles, and the τ
  // filter replaces the window — so this plan has NO shuffle at all
  // (filter + project on the scan), strictly cheaper than top-k at any
  // scale. At 100 TB the same query runs against the IVF/LSH-bucketed
  // relation to cut the scanned candidate set.
  private val rangeTau = 0.2

  def annRangeSearch(spark: SparkSession, dir: String): DataFrame = {
    viewEmb(spark, dir)
    graft.expr.GraftFunctions.register(spark)
    // Materialize the norm pass ONCE — same reason as annBruteforce: the
    // CTE is referenced by both join sides and Catalyst would inline
    // (recompute) the O(N·dim) scan into each.
    spark.sql(
      s"""SELECT vec_id, embedding,
         |       sqrt(${dotS("embedding", "embedding")}) AS nrm
         |FROM embeddings""".stripMargin)
      .pinned()
      .createOrReplaceTempView("rs_normed_t")
    // The τ predicate in the WHERE becomes the join condition (evaluated
    // once per candidate pair, necessarily); the SELECT's copy evaluates
    // only for the few surviving rows.
    spark.sql(
      s"""WITH queries AS (SELECT * FROM rs_normed_t WHERE vec_id < 3)
         |SELECT /*+ BROADCAST(q) */ q.vec_id AS q_id, c.vec_id AS vec_id,
         |       ${dotS("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cos_sim
         |FROM queries q JOIN rs_normed_t c ON q.vec_id <> c.vec_id
         |WHERE ${dotS("q.embedding", "c.embedding")} / (q.nrm * c.nrm) >= $rangeTau
         |""".stripMargin)
  }

  val annRangeSearchSql: String =
    s"""WITH normed AS (
       |  SELECT vec_id, embedding,
       |         sqrt(list_reduce([0.0] || list_transform(embedding,
       |           x -> x::DOUBLE * x::DOUBLE), (a, b) -> a + b)) AS nrm
       |  FROM embeddings),
       |queries AS (SELECT * FROM normed WHERE vec_id < 3)
       |SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
       |       ${dotD("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cos_sim
       |FROM queries q JOIN normed c ON q.vec_id <> c.vec_id
       |WHERE ${dotD("q.embedding", "c.embedding")} / (q.nrm * c.nrm) >= $rangeTau""".stripMargin

  // ── emb_centroid_by_label ★ — per-label mean embedding (class
  // centroids: the seed step for k-means / IVF list training and for
  // label-cluster diagnostics). Shape: posexplode to (label, dim, x) and
  // one map-side-combined groupBy(label, dim) — fully parallel partial
  // aggregation, no window, no join; at 100 TB this is the canonical
  // "train coarse centroids" pass. Float sums are NOT reproducible across
  // engines (association order), so the sum runs in EXACT integer space:
  // components scale to micro-units (round(x·10⁶) — exact for float
  // inputs), the BIGINT sum is order-independent, and the final divide by
  // a constant is one correctly-rounded IEEE op — the centroid itself
  // passes the binary oracle.
  def embCentroidByLabel(spark: SparkSession, dir: String): DataFrame = {
    viewEmb(spark, dir)
    // `1000000.0` would parse as a DECIMAL literal in Spark SQL (exact
    // decimal division ≠ the oracle's IEEE double division) — cast
    // explicitly on BOTH sides so the one divide is the same double op.
    spark.sql(
      """SELECT label, cast(pos + 1 as int) AS dim,
        |       CAST(sum(cast(round(cast(x as double) * 1000000) as bigint))
        |         AS BIGINT) AS sum_micro,
        |       CAST(count(*) AS BIGINT) AS n,
        |       sum(cast(round(cast(x as double) * 1000000) as bigint))
        |         / (cast(1000000 as double) * count(*)) AS centroid
        |FROM embeddings
        |LATERAL VIEW posexplode(embedding) e AS pos, x
        |WHERE pos < 8
        |GROUP BY label, pos""".stripMargin)
  }

  val embCentroidByLabelSql: String =
    """WITH exploded AS (
      |  SELECT label,
      |         unnest(range(1, len(embedding) + 1)) AS dim,
      |         unnest(list_transform(embedding, x -> x::DOUBLE)) AS x
      |  FROM embeddings)
      |SELECT label, CAST(dim AS INT) AS dim,
      |       CAST(sum(CAST(round(x * 1000000) AS BIGINT)) AS BIGINT) AS sum_micro,
      |       count(*) AS n,
      |       CAST(sum(CAST(round(x * 1000000) AS BIGINT)) AS BIGINT)
      |         / (CAST(1000000 AS DOUBLE) * count(*)) AS centroid
      |FROM exploded WHERE dim <= 8
      |GROUP BY label, dim""".stripMargin

  // ── emb_normalize ★ — unit-norm embeddings (the pre-index step every
  // vector store wants); norm emitted alongside for the oracle. Purely
  // narrow per-row arithmetic: scan speed at any scale.
  def embNormalize(spark: SparkSession, dir: String): DataFrame = {
    viewEmb(spark, dir)
    graft.expr.GraftFunctions.register(spark)
    spark.sql(
      s"""SELECT vec_id,
         |       round(sqrt(${dotS("embedding", "embedding")}), 6) AS norm,
         |       round(element_at(embedding, 1) / sqrt(${dotS("embedding", "embedding")}), 6)
         |         AS first_component_normed,
         |       size(embedding) AS dim
         |FROM embeddings WHERE vec_id % 7 = 0""".stripMargin)
  }

  val embNormalizeSql: String =
    s"""SELECT vec_id,
       |       round(sqrt(${dotD("embedding", "embedding", "range(1, len(embedding) + 1)")}), 6) AS norm,
       |       round(embedding[1] / sqrt(${dotD("embedding", "embedding", "range(1, len(embedding) + 1)")}), 6)
       |         AS first_component_normed,
       |       CAST(len(embedding) AS INT) AS dim
       |FROM embeddings WHERE vec_id % 7 = 0""".stripMargin

  // ── emb_quantize ★ — symmetric int8 quantization: per-vector scale =
  // max|x| / 127; components round half-away-from-zero to [-127, 127].
  // The compression step before shipping vectors to an index.
  def embQuantize(spark: SparkSession, dir: String): DataFrame = {
    viewEmb(spark, dir)
    spark.sql(
      """WITH scaled AS (
        |  SELECT vec_id,
        |         aggregate(embedding, cast(0.0 as double),
        |           (acc, x) -> greatest(acc, abs(cast(x as double)))) / 127.0 AS scale,
        |         embedding
        |  FROM embeddings WHERE vec_id % 11 = 0)
        |SELECT vec_id, round(scale, 9) AS scale,
        |       cast(round(cast(element_at(embedding, 1) as double) / scale, 0) as int) AS q1,
        |       cast(round(cast(element_at(embedding, 2) as double) / scale, 0) as int) AS q2,
        |       cast(round(cast(element_at(embedding, 3) as double) / scale, 0) as int) AS q3
        |FROM scaled""".stripMargin)
  }

  val embQuantizeSql: String =
    """WITH scaled AS (
      |  SELECT vec_id,
      |         list_reduce([0.0] || list_transform(embedding,
      |           x -> abs(x::DOUBLE)), (a, b) -> greatest(a, b)) / 127.0 AS scale,
      |         embedding
      |  FROM embeddings WHERE vec_id % 11 = 0)
      |SELECT vec_id, round(scale, 9) AS scale,
      |       CAST(round(embedding[1]::DOUBLE / scale, 0) AS INT) AS q1,
      |       CAST(round(embedding[2]::DOUBLE / scale, 0) AS INT) AS q2,
      |       CAST(round(embedding[3]::DOUBLE / scale, 0) AS INT) AS q3
      |FROM scaled""".stripMargin

  // ── emb_outlier ★ — prototypicality scoring: each vector's cosine to
  // its own label centroid (the self-supervised-prototypes pruning metric
  // of Sorscher et al. 2022, "Beyond neural scaling laws" — outliers =
  // far-from-prototype examples, the first candidates a data-pruning
  // pass drops or a quality audit inspects). Shape: the per-(label, dim)
  // centroid is ONE map-side-combined aggregate in exact integer
  // micro-units (the emb_centroid_by_label trick — order-independent
  // BIGINT sums, one IEEE divide), collected into a per-label ARRAY so
  // the per-vector dot is a left-to-right fold (bit-equal across
  // engines); the 10-row centroid-array table broadcasts onto a narrow
  // scan of the vectors. No window, no pair join — linear at any scale.
  def embOutlier(spark: SparkSession, dir: String): DataFrame = {
    viewEmb(spark, dir)
    graft.expr.GraftFunctions.register(spark)
    spark.sql(
      """WITH sums AS (
        |  SELECT label, pos,
        |         sum(cast(round(cast(x as double) * 1000000) as bigint)) AS sm,
        |         count(*) AS n
        |  FROM embeddings LATERAL VIEW posexplode(embedding) e AS pos, x
        |  GROUP BY label, pos),
        |cent AS (
        |  SELECT label,
        |         transform(array_sort(collect_list(named_struct(
        |           'p', pos, 'v', sm / (cast(1000000 as double) * n)))),
        |           s -> s.v) AS c_arr
        |  FROM sums GROUP BY label),
        |scored AS (
        |  SELECT v.vec_id, v.label,
        |         aggregate(zip_with(v.embedding, c.c_arr,
        |           (a, b) -> cast(a as double) * b), cast(0 as double),
        |           (acc, x) -> acc + x) /
        |         (sqrt(float_dot(v.embedding, v.embedding)) *
        |          sqrt(aggregate(c.c_arr, cast(0 as double),
        |            (acc, x) -> acc + x * x))) AS cos_centroid
        |  FROM embeddings v JOIN cent c ON v.label = c.label)
        |SELECT vec_id, label, cos_centroid,
        |       CASE WHEN cos_centroid < cast(0.05 as double) THEN 1 ELSE 0 END
        |         AS is_outlier
        |FROM scored""".stripMargin)
  }

  val embOutlierSql: String =
    """WITH exploded AS (
      |  SELECT label,
      |         unnest(range(0, len(embedding))) AS pos,
      |         unnest(list_transform(embedding, x -> x::DOUBLE)) AS x
      |  FROM embeddings),
      |sums AS (
      |  SELECT label, pos,
      |         sum(CAST(round(x * 1000000) AS BIGINT)) AS sm,
      |         count(*) AS n
      |  FROM exploded GROUP BY label, pos),
      |cent AS (
      |  SELECT label,
      |         list(CAST(sm AS BIGINT) / (CAST(1000000 AS DOUBLE) * n)
      |              ORDER BY pos) AS c_arr
      |  FROM sums GROUP BY label),
      |scored AS (
      |  SELECT v.vec_id, v.label,
      |         list_reduce([0.0] || list_transform(range(1, 65),
      |           i -> v.embedding[i]::DOUBLE * c.c_arr[i]), (a, b) -> a + b) /
      |         (sqrt(list_reduce([0.0] || list_transform(v.embedding,
      |            x -> x::DOUBLE * x::DOUBLE), (a, b) -> a + b)) *
      |          sqrt(list_reduce([0.0] || list_transform(c.c_arr,
      |            x -> x * x), (a, b) -> a + b))) AS cos_centroid
      |  FROM embeddings v JOIN cent c ON v.label = c.label)
      |SELECT vec_id, label, cos_centroid,
      |       CASE WHEN cos_centroid < CAST(0.05 AS DOUBLE) THEN 1 ELSE 0 END
      |         AS is_outlier
      |FROM scored""".stripMargin

  // ── emb_pq_encode (r7) — PRODUCT QUANTIZATION (Jégou et al. 2011, the
  // memory-compression backbone of billion-vector ANN: IVF-PQ): the
  // 64-dim vector splits into 4 subvectors of 16 dims; each subvector is
  // replaced by the id of its nearest of 16 codebook centroids → the
  // vector compresses to 4 bytes (+error). Codebooks here are the
  // deterministic LCG table (the HyperPlanes trick) so the assignment is
  // a pure function; production swaps in per-subspace k-means codebooks
  // exactly as AnnIndex swaps KMeansTrainer centroids.
  //
  // ENGINE-EXACT BY CONSTRUCTION: components and centroids quantize to
  // integer micro-units (×1000) first, so every distance is an exact
  // BIGINT sum of squares — argmin can never flip on a last-ulp float
  // divergence (the emb_centroid_by_label discipline). Tie-break =
  // first minimum (array_position / list_position agree).
  //
  // Scale shape: a narrow single-pass projection — no join, no shuffle,
  // no window; 100 TB of vectors PQ-encode embarrassingly parallel.
  // Spark side runs the FUSED pq_encode kernel (one tight integer loop
  // per row, codegen'd); the DuckDB oracle runs the literal nested-HOF
  // formulation — equality under the binary gate proves the kernel.
  def embPqEncode(spark: SparkSession, dir: String): DataFrame = {
    viewEmb(spark, dir)
    graft.expr.GraftFunctions.register(spark)
    spark.sql(
      """WITH enc AS (SELECT vec_id, pq_encode(embedding) AS e FROM embeddings)
        |SELECT vec_id,
        |  cast(element_at(e, 1) AS INT) AS code0,
        |  cast(element_at(e, 2) AS INT) AS code1,
        |  cast(element_at(e, 3) AS INT) AS code2,
        |  cast(element_at(e, 4) AS INT) AS code3,
        |  element_at(e, 5) AS qerr
        |FROM enc""".stripMargin)
  }

  val embPqEncodeSql: String = {
    val diff = s"qv[s*16 + d + 1] - ((1103515245::BIGINT * (s*256 + c*16 + d) + 12345) % 2001 - 1000)"
    s"""WITH q AS (
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           x -> CAST(round(x::DOUBLE * 1000.0, 0) AS BIGINT)) AS qv
       |  FROM embeddings),
       |dists AS (
       |  SELECT vec_id,
       |    list_transform(range(0, 4), s ->
       |      list_transform(range(0, 16), c ->
       |        list_sum(list_transform(range(0, 16), d ->
       |          ($diff) * ($diff))))) AS dt
       |  FROM q)
       |SELECT vec_id,
       |  CAST(list_position(dt[1], list_min(dt[1])) - 1 AS INT) AS code0,
       |  CAST(list_position(dt[2], list_min(dt[2])) - 1 AS INT) AS code1,
       |  CAST(list_position(dt[3], list_min(dt[3])) - 1 AS INT) AS code2,
       |  CAST(list_position(dt[4], list_min(dt[4])) - 1 AS INT) AS code3,
       |  CAST(list_min(dt[1]) + list_min(dt[2])
       |     + list_min(dt[3]) + list_min(dt[4]) AS BIGINT) AS qerr
       |FROM dists""".stripMargin
  }

  // ── ann_pq_adc_topk (r7) — ASYMMETRIC DISTANCE COMPUTATION search over
  // the PQ codes: each query precomputes its 4×16 distance table to the
  // codebook (the ADC lookup table), and a candidate's distance is the
  // sum of 4 TABLE LOOKUPS by its codes — the vectors themselves are
  // never touched at scoring time. This is how IVF-PQ scores a
  // billion-vector posting list from RAM-resident 4-byte codes (Jégou et
  // al. 2011 §III-B). Same integer micro-unit discipline as
  // [[embPqEncode]], so distances and the ranking are engine-exact.
  //
  // Scale shape: the 3-query ADC table broadcasts (a few hundred longs);
  // the candidate side streams its codes map-side — the same
  // broadcast-the-probes shape as ann_bruteforce, but each comparison is
  // 4 integer adds instead of a 64-dim float dot.
  def annPqAdcTopk(spark: SparkSession, dir: String): DataFrame = {
    viewEmb(spark, dir)
    graft.expr.GraftFunctions.register(spark)
    // Both halves run fused codegen kernels: candidates pq_encode to
    // 1-based positions, probes pq_adc_table to the flattened 4x16
    // distance table; a candidate's score is 4 array lookups. (The
    // interpreted nested-HOF formulation — which the oracle still runs —
    // cost more in Catalyst analysis than in execution.)
    spark.sql(
      s"""WITH enc AS (
         |  SELECT vec_id, pq_encode(embedding) AS e FROM embeddings),
         |codes AS (
         |  SELECT vec_id,
         |    cast(element_at(e, 1) + 1 AS INT) AS p0,
         |    cast(element_at(e, 2) + 1 AS INT) AS p1,
         |    cast(element_at(e, 3) + 1 AS INT) AS p2,
         |    cast(element_at(e, 4) + 1 AS INT) AS p3
         |  FROM enc),
         |probes AS (
         |  SELECT vec_id AS q_id, pq_adc_table(embedding) AS adc
         |  FROM embeddings WHERE vec_id < 3),
         |scored AS (
         |  SELECT /*+ BROADCAST(p) */ p.q_id, c.vec_id,
         |         element_at(p.adc, c.p0)
         |       + element_at(p.adc, 16 + c.p1)
         |       + element_at(p.adc, 32 + c.p2)
         |       + element_at(p.adc, 48 + c.p3) AS adc_dist
         |  FROM probes p JOIN codes c ON p.q_id <> c.vec_id),
         |ranked AS (
         |  SELECT q_id, vec_id, adc_dist,
         |         row_number() OVER (PARTITION BY q_id
         |           ORDER BY adc_dist, vec_id) AS rnk
         |  FROM scored)
         |SELECT q_id, vec_id, cast(adc_dist AS BIGINT) AS adc_dist,
         |       cast(rnk AS INT) AS rnk
         |FROM ranked WHERE rnk <= 5""".stripMargin)
  }

  val annPqAdcTopkSql: String = {
    val diff = s"qv[s*16 + d + 1] - ((1103515245::BIGINT * (s*256 + c*16 + d) + 12345) % 2001 - 1000)"
    s"""WITH q AS (
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           x -> CAST(round(x::DOUBLE * 1000.0, 0) AS BIGINT)) AS qv
       |  FROM embeddings),
       |dists AS (
       |  SELECT vec_id,
       |    list_transform(range(0, 4), s ->
       |      list_transform(range(0, 16), c ->
       |        CAST(list_sum(list_transform(range(0, 16), d ->
       |          ($diff) * ($diff))) AS BIGINT))) AS dt
       |  FROM q),
       |enc AS (
       |  SELECT vec_id,
       |    CAST(list_position(dt[1], list_min(dt[1])) AS INT) AS p0,
       |    CAST(list_position(dt[2], list_min(dt[2])) AS INT) AS p1,
       |    CAST(list_position(dt[3], list_min(dt[3])) AS INT) AS p2,
       |    CAST(list_position(dt[4], list_min(dt[4])) AS INT) AS p3
       |  FROM dists),
       |probes AS (SELECT vec_id AS q_id, dt FROM dists WHERE vec_id < 3),
       |scored AS (
       |  SELECT p.q_id, c.vec_id,
       |         dt[1][c.p0] + dt[2][c.p1] + dt[3][c.p2] + dt[4][c.p3] AS adc_dist
       |  FROM probes p JOIN enc c ON p.q_id <> c.vec_id),
       |ranked AS (
       |  SELECT q_id, vec_id, adc_dist,
       |         row_number() OVER (PARTITION BY q_id
       |           ORDER BY adc_dist, vec_id) AS rnk
       |  FROM scored)
       |SELECT q_id, vec_id, CAST(adc_dist AS BIGINT) AS adc_dist,
       |       CAST(rnk AS INT) AS rnk
       |FROM ranked WHERE rnk <= 5""".stripMargin
  }

  // ── ann_pq_rerank_topk (r8) — the standard two-stage serving path
  // (Jégou et al. 2011 §V: ADC shortlist, exact re-rank): the cheap
  // integer ADC scan cuts the corpus to a 32-candidate shortlist per
  // probe, then the exact float cosine — 4 integer adds vs a 64-dim
  // float dot, but the float dot now runs on 32 rows instead of the
  // corpus — settles the final top-5. This is what closes the PQ loop
  // for serving: ADC alone ranks by a quantized distance (ann_pq_adc_
  // topk documents its approximation); the rerank restores exact
  // ordering among the survivors, the accuracy/cost point production
  // ANN serving actually runs at.
  //
  // Scale shape: stage 1 is ann_pq_adc_topk's shape verbatim (3-probe
  // ADC tables broadcast, codes stream map-side). Stage 2's shortlist
  // is probes×32 rows — broadcast it; the corpus is scanned ONCE more
  // map-side to fetch shortlist embeddings (never shuffled, never
  // all-pairs). Engine-exact: ADC distances are integer micro-units;
  // the rerank cosine is the same bit-identical float_dot fold the
  // oracle reproduces (the ann_bruteforce discipline).
  def annPqRerankTopk(spark: SparkSession, dir: String): DataFrame = {
    viewEmb(spark, dir)
    graft.expr.GraftFunctions.register(spark)
    spark.sql(
      s"""WITH enc AS (
         |  SELECT vec_id, pq_encode(embedding) AS e FROM embeddings),
         |codes AS (
         |  SELECT vec_id,
         |    cast(element_at(e, 1) + 1 AS INT) AS p0,
         |    cast(element_at(e, 2) + 1 AS INT) AS p1,
         |    cast(element_at(e, 3) + 1 AS INT) AS p2,
         |    cast(element_at(e, 4) + 1 AS INT) AS p3
         |  FROM enc),
         |probes AS (
         |  SELECT vec_id AS q_id, pq_adc_table(embedding) AS adc
         |  FROM embeddings WHERE vec_id < 3),
         |scored AS (
         |  SELECT /*+ BROADCAST(p) */ p.q_id, c.vec_id,
         |         element_at(p.adc, c.p0)
         |       + element_at(p.adc, 16 + c.p1)
         |       + element_at(p.adc, 32 + c.p2)
         |       + element_at(p.adc, 48 + c.p3) AS adc_dist
         |  FROM probes p JOIN codes c ON p.q_id <> c.vec_id),
         |shortlist AS (
         |  SELECT q_id, vec_id, adc_dist FROM (
         |    SELECT q_id, vec_id, adc_dist,
         |           row_number() OVER (PARTITION BY q_id
         |             ORDER BY adc_dist, vec_id) AS adc_rnk
         |    FROM scored)
         |  WHERE adc_rnk <= 32),
         |rer AS (
         |  SELECT /*+ BROADCAST(s), BROADCAST(qe) */
         |         s.q_id, s.vec_id, s.adc_dist,
         |         ${dotS("qe.embedding", "ce.embedding")}
         |           / (sqrt(${dotS("qe.embedding", "qe.embedding")})
         |              * sqrt(${dotS("ce.embedding", "ce.embedding")})) AS cs
         |  FROM shortlist s
         |  JOIN embeddings qe ON qe.vec_id = s.q_id
         |  JOIN embeddings ce ON ce.vec_id = s.vec_id),
         |ranked AS (
         |  SELECT q_id, vec_id, adc_dist, cs,
         |         row_number() OVER (PARTITION BY q_id
         |           ORDER BY cs DESC, vec_id) AS rnk
         |  FROM rer)
         |SELECT q_id, vec_id, cast(adc_dist AS BIGINT) AS adc_dist,
         |       cs AS cos_sim, cast(rnk AS INT) AS rnk
         |FROM ranked WHERE rnk <= 5""".stripMargin)
  }

  val annPqRerankTopkSql: String = {
    val diff = s"qv[s*16 + d + 1] - ((1103515245::BIGINT * (s*256 + c*16 + d) + 12345) % 2001 - 1000)"
    s"""WITH q AS (
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           x -> CAST(round(x::DOUBLE * 1000.0, 0) AS BIGINT)) AS qv
       |  FROM embeddings),
       |dists AS (
       |  SELECT vec_id,
       |    list_transform(range(0, 4), s ->
       |      list_transform(range(0, 16), c ->
       |        CAST(list_sum(list_transform(range(0, 16), d ->
       |          ($diff) * ($diff))) AS BIGINT))) AS dt
       |  FROM q),
       |enc AS (
       |  SELECT vec_id,
       |    CAST(list_position(dt[1], list_min(dt[1])) AS INT) AS p0,
       |    CAST(list_position(dt[2], list_min(dt[2])) AS INT) AS p1,
       |    CAST(list_position(dt[3], list_min(dt[3])) AS INT) AS p2,
       |    CAST(list_position(dt[4], list_min(dt[4])) AS INT) AS p3
       |  FROM dists),
       |probes AS (SELECT vec_id AS q_id, dt FROM dists WHERE vec_id < 3),
       |scored AS (
       |  SELECT p.q_id, c.vec_id,
       |         dt[1][c.p0] + dt[2][c.p1] + dt[3][c.p2] + dt[4][c.p3] AS adc_dist
       |  FROM probes p JOIN enc c ON p.q_id <> c.vec_id),
       |shortlist AS (
       |  SELECT q_id, vec_id, adc_dist FROM (
       |    SELECT q_id, vec_id, adc_dist,
       |           row_number() OVER (PARTITION BY q_id
       |             ORDER BY adc_dist, vec_id) AS adc_rnk
       |    FROM scored)
       |  WHERE adc_rnk <= 32),
       |rer AS (
       |  SELECT s.q_id, s.vec_id, s.adc_dist,
       |         ${dotD("qe.embedding", "ce.embedding")}
       |           / (sqrt(${dotD("qe.embedding", "qe.embedding")})
       |              * sqrt(${dotD("ce.embedding", "ce.embedding")})) AS cs
       |  FROM shortlist s
       |  JOIN embeddings qe ON qe.vec_id = s.q_id
       |  JOIN embeddings ce ON ce.vec_id = s.vec_id),
       |ranked AS (
       |  SELECT q_id, vec_id, adc_dist, cs,
       |         row_number() OVER (PARTITION BY q_id
       |           ORDER BY cs DESC, vec_id) AS rnk
       |  FROM rer)
       |SELECT q_id, vec_id, CAST(adc_dist AS BIGINT) AS adc_dist,
       |       cs AS cos_sim, CAST(rnk AS INT) AS rnk
       |FROM ranked WHERE rnk <= 5""".stripMargin
  }

  // ── emb_rp_project (r8) — Johnson–Lindenstrauss random projection
  // 64 → 16 dims with a ±1 (Achlioptas 2003) matrix: the cheap
  // dimensionality cut a pipeline runs before clustering or coarse ANN
  // when the full vectors are 4× wider than the geometry needs. The
  // matrix is the same deterministic LCG discipline as the PQ codebook
  // (sign = LCG(j·64+d) ≥ 0), inputs quantize to integer micro-units,
  // and a ±1 projection is pure BIGINT adds — the projected values are
  // engine-exact, so the FULL output passes the binary oracle gate
  // (a Gaussian matrix would need float muls and a transcendental-free
  // parity story; ±1 needs none). `RandomProjectionSpec` pins the JL
  // property itself — E‖Px‖² = k·‖x‖² within sampling error — which the
  // oracle cannot see.
  //
  // Scale shape: one narrow map-side projection, no shuffle at all
  // (the explode to long form is for the gate's hashing; production
  // keeps the 16-long array column).
  def embRpProject(spark: SparkSession, dir: String): DataFrame = {
    viewEmb(spark, dir)
    graft.expr.GraftFunctions.register(spark)
    // Fused codegen kernel (expr/Kernels.rpProject) — the interpreted
    // transform/aggregate HOF formulation (which the oracle still runs)
    // measured 39 s at sf0.1; the kernel is one tight integer loop.
    spark.sql(
      """SELECT vec_id, dim, val
        |FROM (SELECT vec_id, rp_project(embedding) AS p FROM embeddings)
        |LATERAL VIEW posexplode(p) AS dim, val""".stripMargin)
  }

  val embRpProjectSql: String =
    """WITH qv AS (
      |  SELECT vec_id,
      |         list_transform(embedding,
      |           x -> CAST(round(x::DOUBLE * 1000.0, 0) AS BIGINT)) AS q
      |  FROM embeddings)
      |SELECT vec_id, CAST(j AS INT) AS dim,
      |       CAST(list_sum(list_transform(range(0, 64), d ->
      |         CASE WHEN (1103515245::BIGINT * (j * 64 + d) + 12345) % 2001 - 1000 >= 0
      |              THEN q[d + 1] ELSE -q[d + 1] END)) AS BIGINT) AS val
      |FROM qv, range(0, 16) AS t(j)""".stripMargin

  // ── ann_knn_graph (r10) — the k-NN GRAPH over the whole corpus: top-3
  // cosine neighbors for EVERY vector, candidates restricted to the
  // vector's coarse cluster (the SemDeDup/IVF routing — nprobe=1). The
  // graph is what diversity sampling, graph-based dedup, and SemDeDup's
  // keeper selection consume; the ann_* serving queries answer point
  // probes, this materializes the corpus-wide artifact. Candidate
  // generation is within-cluster only: per-reducer work is bounded by
  // |cluster|², the published corpus-scale trade (k ≈ √n trained
  // centroids at production, the tools/KMeansTrainer swap — plan shape
  // untouched). Singleton clusters emit no rows (documented: a vector
  // with no in-cluster peer has no edge at nprobe=1). Ties break by
  // neighbor id; cosines are the bit-identical float_dot folds.
  /** Shared plan body: `centsCte` supplies the coarse centroid relation
    * (c_id, c_emb float array, c_nrm). The catalog query routes through
    * 16 deterministic fixture picks (oracle-checkable); the production
    * form swaps in tools/KMeansTrainer output via [[annKnnGraphTrained]]
    * — identical plan shape, only the broadcast side changes. */
  private def knnGraphSqlWith(centsCte: String): String =
    s"""WITH normed AS (
         |  SELECT vec_id, embedding,
         |         sqrt(float_dot(embedding, embedding)) AS nrm
         |  FROM embeddings),
         |cents AS ($centsCte),
         |assign AS (
         |  SELECT n.vec_id, c.c_id, n.embedding, n.nrm,
         |         row_number() OVER (PARTITION BY n.vec_id
         |           ORDER BY float_dot(n.embedding, c.c_emb) / (n.nrm * c.c_nrm) DESC,
         |                    c.c_id) AS crnk
         |  FROM normed n CROSS JOIN cents c),
         |members AS (SELECT vec_id, c_id, embedding, nrm FROM assign WHERE crnk = 1),
         |edges AS (
         |  SELECT a.vec_id, b.vec_id AS nbr_id, a.c_id,
         |         float_dot(a.embedding, b.embedding) / (a.nrm * b.nrm) AS cs
         |  FROM members a JOIN members b
         |    ON a.c_id = b.c_id AND a.vec_id <> b.vec_id),
         |ranked AS (
         |  SELECT vec_id, nbr_id, c_id, cs,
         |         row_number() OVER (PARTITION BY vec_id
         |           ORDER BY cs DESC, nbr_id) AS rnk
         |  FROM edges)
         |SELECT vec_id, CAST(rnk AS INT) AS rnk, nbr_id,
         |       CAST(c_id AS BIGINT) AS cluster_id, cs AS cos_sim
         |FROM ranked WHERE rnk <= 3""".stripMargin

  def annKnnGraph(spark: SparkSession, dir: String): DataFrame = {
    viewEmb(spark, dir)
    graft.expr.GraftFunctions.register(spark)
    spark.sql(knnGraphSqlWith(
      """SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm
        |  FROM normed WHERE vec_id BETWEEN 100 AND 115""".stripMargin))
  }

  /** The k ≈ √n production swap (r11): the identical knn-graph plan with
    * TRAINED coarse centroids ([[graft.tools.KMeansTrainer.train]]
    * output: c_id, c_emb array<double>) replacing the 16 fixture picks —
    * per-reducer work drops from |corpus/16|² toward |corpus/√n|².
    * Centroids cast to float so the scoring kernel (`float_dot`) and
    * tie-breaks are byte-identical to the catalog query's. Demonstrated
    * at sf≈1 in ScaleStressSpec with the reducer-bound assertion. */
  def annKnnGraphTrained(spark: SparkSession, dir: String,
      centroids: DataFrame): DataFrame = {
    viewEmb(spark, dir)
    graft.expr.GraftFunctions.register(spark)
    centroids.selectExpr("CAST(c_id AS BIGINT) AS c_id",
        "transform(c_emb, x -> CAST(x AS FLOAT)) AS c_emb")
      .createOrReplaceTempView("knn_trained_cents")
    spark.sql(knnGraphSqlWith(
      """SELECT c_id, c_emb, sqrt(float_dot(c_emb, c_emb)) AS c_nrm
        |  FROM knn_trained_cents""".stripMargin))
  }

  val annKnnGraphSql: String =
    s"""WITH normed AS (
       |  SELECT vec_id, embedding,
       |         sqrt(${dotD("embedding", "embedding",
                             "range(1, len(embedding) + 1)")}) AS nrm
       |  FROM embeddings),
       |cents AS (
       |  SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm
       |  FROM normed WHERE vec_id BETWEEN 100 AND 115),
       |assign AS (
       |  SELECT n.vec_id, c.c_id, n.embedding, n.nrm,
       |         row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |           ${dotD("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) DESC,
       |           c.c_id) AS crnk
       |  FROM normed n CROSS JOIN cents c),
       |members AS (SELECT vec_id, c_id, embedding, nrm FROM assign WHERE crnk = 1),
       |edges AS (
       |  SELECT a.vec_id, b.vec_id AS nbr_id, a.c_id,
       |         ${dotD("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cs
       |  FROM members a JOIN members b
       |    ON a.c_id = b.c_id AND a.vec_id <> b.vec_id),
       |ranked AS (
       |  SELECT vec_id, nbr_id, c_id, cs,
       |         row_number() OVER (PARTITION BY vec_id
       |           ORDER BY cs DESC, nbr_id) AS rnk
       |  FROM edges)
       |SELECT vec_id, CAST(rnk AS INT) AS rnk, nbr_id,
       |       CAST(c_id AS BIGINT) AS cluster_id, cs AS cos_sim
       |FROM ranked WHERE rnk <= 3""".stripMargin

  // ── emb_binarize ★ (r11) — 1-bit binary quantization: each 64-dim
  // float vector collapses to TWO packed 32-bit sign words (BIGINT-typed;
  // bit i−1 of word 0 = sign of dim i, dims 33..64 in word 1) plus its
  // popcount density. The production memory story: 256 bytes of floats →
  // 8 bytes per vector (32×), the quantization step binary-embedding
  // retrieval (ITQ/BQ-style and the modern Matryoshka-binary stacks)
  // ships to hold billion-vector indexes in RAM. Sign extraction is pure
  // comparison — no float arithmetic — so both engines agree bit-for-bit.
  // Shape: narrow per-row fold, scan speed, no shuffle.
  private def packWordSpark(lo: Int): String =
    s"""aggregate(transform(sequence($lo, ${lo + 31}),
       |    i -> IF(element_at(embedding, i) > 0,
       |            shiftleft(CAST(1 AS BIGINT), i - $lo), CAST(0 AS BIGINT))),
       |  CAST(0 AS BIGINT), (a, x) -> a + x)""".stripMargin

  private def packWordDuck(lo: Int): String =
    s"""list_reduce([CAST(0 AS BIGINT)] || list_transform(range($lo, ${lo + 32}),
       |    i -> CASE WHEN embedding[i] > 0
       |              THEN CAST(1 AS BIGINT) << (i - $lo)
       |              ELSE CAST(0 AS BIGINT) END), (a, b) -> a + b)""".stripMargin

  def embBinarize(spark: SparkSession, dir: String): DataFrame = {
    viewEmb(spark, dir)
    spark.sql(
      s"""SELECT vec_id, label,
         |       ${packWordSpark(1)} AS w0,
         |       ${packWordSpark(33)} AS w1,
         |       CAST(bit_count(${packWordSpark(1)})
         |          + bit_count(${packWordSpark(33)}) AS INT) AS density
         |FROM embeddings""".stripMargin)
  }

  val embBinarizeSql: String =
    s"""SELECT vec_id, label,
       |       ${packWordDuck(1)} AS w0,
       |       ${packWordDuck(33)} AS w1,
       |       CAST(bit_count(${packWordDuck(1)})
       |          + bit_count(${packWordDuck(33)}) AS INT) AS density
       |FROM embeddings""".stripMargin

  // ── ann_hamming_topk ★ (r11) — two-stage binary retrieval: Hamming
  // SHORTLIST over the binarized index (distance = popcount(xor) on two
  // 8-byte words — two XORs + two POPCNTs per candidate, fully codegen'd,
  // no floats in the scan), then true-cosine RERANK of the 64 survivors.
  // This is the shape binary-quantized indexes actually ship (the
  // ann_pq_rerank discipline): stage 1 touches 8 bytes/vector at memory
  // bandwidth, stage 2 touches full floats for only shortlist/N of the
  // corpus (12.8% here; measured recall@5 14/15 at sf0.001, 12/15 at
  // sf0.01 — the 64-bit-code accuracy/scan-fraction tradeoff, pinned by
  // AnnHammingSpec). Ties break by vec_id at both stages; the probe side
  // (vec_id < 3) broadcasts exactly like ann_bruteforce_topk.
  val HammingShortlist = 64

  def annHammingTopk(spark: SparkSession, dir: String): DataFrame = {
    viewEmb(spark, dir)
    graft.expr.GraftFunctions.register(spark)
    spark.sql(
      s"""SELECT vec_id, embedding,
         |       sqrt(${dotS("embedding", "embedding")}) AS nrm,
         |       ${packWordSpark(1)} AS w0, ${packWordSpark(33)} AS w1
         |FROM embeddings""".stripMargin)
      .pinned()
      .createOrReplaceTempView("bin_index_t")
    spark.sql(
      s"""WITH queries AS (SELECT * FROM bin_index_t WHERE vec_id < 3),
         |scored AS (
         |  SELECT /*+ BROADCAST(q) */ q.vec_id AS q_id, c.vec_id AS vec_id,
         |         CAST(bit_count(q.w0 ^ c.w0)
         |            + bit_count(q.w1 ^ c.w1) AS INT) AS hamming
         |  FROM queries q JOIN bin_index_t c ON q.vec_id <> c.vec_id),
         |shortlist AS (
         |  SELECT q_id, vec_id, hamming,
         |         row_number() OVER (PARTITION BY q_id
         |           ORDER BY hamming, vec_id) AS hrnk
         |  FROM scored),
         |-- stage 2: floats touched ONLY for shortlist survivors — the
         |-- rerank joins the full vectors back by id instead of carrying
         |-- them (or the cosine) through the stage-1 scan.
         |rerank AS (
         |  SELECT /*+ BROADCAST(q) */ s.q_id, s.vec_id, s.hamming,
         |         ${dotS("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cs
         |  FROM shortlist s
         |  JOIN bin_index_t c ON c.vec_id = s.vec_id
         |  JOIN queries q ON q.vec_id = s.q_id
         |  WHERE s.hrnk <= $HammingShortlist),
         |reranked AS (
         |  SELECT q_id, vec_id, hamming, cs,
         |         row_number() OVER (PARTITION BY q_id
         |           ORDER BY cs DESC, vec_id) AS rnk
         |  FROM rerank)
         |SELECT q_id, vec_id, CAST(rnk AS INT) AS rnk, hamming, cs AS cos_sim
         |FROM reranked WHERE rnk <= 5""".stripMargin)
  }

  val annHammingTopkSql: String =
    s"""WITH bin_index AS (
       |  SELECT vec_id, embedding,
       |         sqrt(${dotD("embedding", "embedding")}) AS nrm,
       |         ${packWordDuck(1)} AS w0, ${packWordDuck(33)} AS w1
       |  FROM embeddings),
       |queries AS (SELECT * FROM bin_index WHERE vec_id < 3),
       |scored AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
       |         CAST(bit_count(xor(q.w0, c.w0))
       |            + bit_count(xor(q.w1, c.w1)) AS INT) AS hamming
       |  FROM queries q JOIN bin_index c ON q.vec_id <> c.vec_id),
       |shortlist AS (
       |  SELECT q_id, vec_id, hamming,
       |         row_number() OVER (PARTITION BY q_id
       |           ORDER BY hamming, vec_id) AS hrnk
       |  FROM scored),
       |rerank AS (
       |  SELECT s.q_id, s.vec_id, s.hamming,
       |         ${dotD("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cs
       |  FROM shortlist s
       |  JOIN bin_index c ON c.vec_id = s.vec_id
       |  JOIN queries q ON q.vec_id = s.q_id
       |  WHERE s.hrnk <= $HammingShortlist),
       |reranked AS (
       |  SELECT q_id, vec_id, hamming, cs,
       |         row_number() OVER (PARTITION BY q_id
       |           ORDER BY cs DESC, vec_id) AS rnk
       |  FROM rerank)
       |SELECT q_id, vec_id, CAST(rnk AS INT) AS rnk, hamming, cs AS cos_sim
       |FROM reranked WHERE rnk <= 5""".stripMargin

  // ── ann_ivfpq_topk ★ (r11) — the COMPOSED production index: IVF coarse
  // routing + PQ codes stored IN the posting lists (FAISS `IVFx,PQ4` —
  // what billion-vector serving actually deploys; Jégou et al. 2011
  // §VI "IVFADC"). The two halves already exist separately
  // (ann_ivf_topk routes but scores floats; ann_pq_adc_topk scores codes
  // but scans everything): composed, a probe visits nprobe=2 posting
  // lists and scores each member with 4 integer table lookups — scan
  // fraction × 32-byte-free-scoring at once.
  //
  // Scale shape: the index build (assignment + encode) is one
  // materialized relation (exactly what FAISS persists: list id + 4-byte
  // code per vector); the probe join is an EQUI-join on the list id —
  // strictly better than ADC's all-candidate fan-out; per-reducer work
  // is bounded by posting-list size (the trained-centroid k≈√n swap
  // bounds that — demonstrated at stress for knn/semantic). Engine-exact:
  // routing is the cosine argmax both engines compute identically, ADC
  // distances are integer micro-units.
  def annIvfpqTopk(spark: SparkSession, dir: String): DataFrame = {
    viewEmb(spark, dir)
    graft.expr.GraftFunctions.register(spark)
    spark.sql(
      s"""SELECT vec_id, embedding,
         |       sqrt(${dotS("embedding", "embedding")}) AS nrm
         |FROM embeddings""".stripMargin)
      .pinned()
      .createOrReplaceTempView("ivfpq_normed_t")
    // THE INDEX: every vector's nearest-centroid list id + its 4 PQ code
    // positions (1-based for element_at) — built once, checkpointed.
    spark.sql(
      s"""WITH cents AS (
         |  SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm
         |  FROM ivfpq_normed_t WHERE vec_id BETWEEN 100 AND 115),
         |assign AS (
         |  SELECT n.vec_id, c.c_id,
         |         row_number() OVER (PARTITION BY n.vec_id
         |           ORDER BY ${dotS("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) DESC,
         |                    c.c_id) AS crnk
         |  FROM ivfpq_normed_t n CROSS JOIN cents c),
         |enc AS (
         |  SELECT vec_id, pq_encode(embedding) AS e FROM ivfpq_normed_t)
         |SELECT a.vec_id, a.c_id, a.crnk,
         |       cast(element_at(e.e, 1) + 1 AS INT) AS p0,
         |       cast(element_at(e.e, 2) + 1 AS INT) AS p1,
         |       cast(element_at(e.e, 3) + 1 AS INT) AS p2,
         |       cast(element_at(e.e, 4) + 1 AS INT) AS p3
         |FROM assign a JOIN enc e ON a.vec_id = e.vec_id
         |WHERE a.crnk <= $ivfNprobe""".stripMargin)
      .pinned()
      .createOrReplaceTempView("ivfpq_index_t")
    spark.sql(
      s"""WITH lists AS (
         |  SELECT vec_id, c_id, p0, p1, p2, p3 FROM ivfpq_index_t
         |  WHERE crnk = 1),
         |qroute AS (
         |  SELECT vec_id AS q_id, c_id FROM ivfpq_index_t
         |  WHERE vec_id < 3 AND crnk <= $ivfNprobe),
         |qadc AS (
         |  SELECT vec_id AS q_id, pq_adc_table(embedding) AS adc
         |  FROM ivfpq_normed_t WHERE vec_id < 3),
         |probes AS (
         |  SELECT r.q_id, r.c_id, a.adc
         |  FROM qroute r JOIN qadc a ON r.q_id = a.q_id),
         |scored AS (
         |  SELECT /*+ BROADCAST(p) */ p.q_id, l.vec_id, l.c_id,
         |         element_at(p.adc, l.p0)
         |       + element_at(p.adc, 16 + l.p1)
         |       + element_at(p.adc, 32 + l.p2)
         |       + element_at(p.adc, 48 + l.p3) AS adc_dist
         |  FROM probes p
         |  JOIN lists l ON l.c_id = p.c_id AND l.vec_id <> p.q_id),
         |ranked AS (
         |  SELECT q_id, vec_id, c_id, adc_dist,
         |         row_number() OVER (PARTITION BY q_id
         |           ORDER BY adc_dist, vec_id) AS rnk
         |  FROM scored)
         |SELECT q_id, vec_id, CAST(c_id AS INT) AS centroid_id,
         |       CAST(adc_dist AS BIGINT) AS adc_dist, CAST(rnk AS INT) AS rnk
         |FROM ranked WHERE rnk <= 5""".stripMargin)
  }

  val annIvfpqTopkSql: String = {
    val diff = s"qv[s*16 + d + 1] - ((1103515245::BIGINT * (s*256 + c*16 + d) + 12345) % 2001 - 1000)"
    s"""WITH normed AS (
       |  SELECT vec_id, embedding,
       |         sqrt(list_reduce([0.0] || list_transform(embedding,
       |           x -> x::DOUBLE * x::DOUBLE), (a, b) -> a + b)) AS nrm
       |  FROM embeddings),
       |cents AS (
       |  SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm
       |  FROM normed WHERE vec_id BETWEEN 100 AND 115),
       |assign AS (
       |  SELECT n.vec_id, c.c_id,
       |         row_number() OVER (PARTITION BY n.vec_id
       |           ORDER BY ${dotD("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) DESC,
       |                    c.c_id) AS crnk
       |  FROM normed n CROSS JOIN cents c),
       |q AS (
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           x -> CAST(round(x::DOUBLE * 1000.0, 0) AS BIGINT)) AS qv
       |  FROM embeddings),
       |dists AS (
       |  SELECT vec_id,
       |    list_transform(range(0, 4), s ->
       |      list_transform(range(0, 16), c ->
       |        CAST(list_sum(list_transform(range(0, 16), d ->
       |          ($diff) * ($diff))) AS BIGINT))) AS dt
       |  FROM q),
       |enc AS (
       |  SELECT vec_id,
       |    CAST(list_position(dt[1], list_min(dt[1])) AS INT) AS p0,
       |    CAST(list_position(dt[2], list_min(dt[2])) AS INT) AS p1,
       |    CAST(list_position(dt[3], list_min(dt[3])) AS INT) AS p2,
       |    CAST(list_position(dt[4], list_min(dt[4])) AS INT) AS p3
       |  FROM dists),
       |lists AS (
       |  SELECT a.vec_id, a.c_id, e.p0, e.p1, e.p2, e.p3
       |  FROM assign a JOIN enc e ON a.vec_id = e.vec_id WHERE a.crnk = 1),
       |qroute AS (
       |  SELECT vec_id AS q_id, c_id FROM assign
       |  WHERE vec_id < 3 AND crnk <= $ivfNprobe),
       |probes AS (
       |  SELECT r.q_id, r.c_id, d.dt
       |  FROM qroute r JOIN dists d ON r.q_id = d.vec_id),
       |scored AS (
       |  SELECT p.q_id, l.vec_id, l.c_id,
       |         p.dt[1][l.p0] + p.dt[2][l.p1] + p.dt[3][l.p2] + p.dt[4][l.p3]
       |           AS adc_dist
       |  FROM probes p
       |  JOIN lists l ON l.c_id = p.c_id AND l.vec_id <> p.q_id),
       |ranked AS (
       |  SELECT q_id, vec_id, c_id, adc_dist,
       |         row_number() OVER (PARTITION BY q_id
       |           ORDER BY adc_dist, vec_id) AS rnk
       |  FROM scored)
       |SELECT q_id, vec_id, CAST(c_id AS INT) AS centroid_id,
       |       CAST(adc_dist AS BIGINT) AS adc_dist, CAST(rnk AS INT) AS rnk
       |FROM ranked WHERE rnk <= 5""".stripMargin
  }

  // ── ann_recall_report ★ (r11) — the index-quality REPORT: every
  // approximate method in the catalog evaluated against the exact cosine
  // baseline in one pass — per method, results returned, hits inside the
  // exact top-5, and recall in integer micro-units. This is the
  // completeness-critic operator an ANN deployment runs after every
  // index rebuild (FAISS's recall@k benchmark as a catalog query); the
  // oracle RERUNS all six pipelines and the baseline, so the report
  // itself is engine-exact.
  // Shape: each method's own scale shape (documented on its row);
  // the report adds one equi-join on (q_id, vec_id) against the 15-row
  // baseline and two bounded aggregations.
  def annRecallReport(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{lit, col}
    // Every method consumed through the served-output memo: in a
    // catalog pass the standalone queries already materialized these
    // exact relations — the report joins the memos, it never re-serves
    // (run standalone, the report pays each serve once and later
    // standalone runs reuse ITS memos).
    val bf = servedCatalog("ann_bruteforce_topk")(spark, dir)
      .select(col("q_id"), col("vec_id"))
    val methodNames = Seq("ann_lsh_topk", "ann_ivf_topk", "ann_pq_adc_topk",
      "ann_pq_rerank_topk", "ann_hamming_topk", "ann_ivfpq_topk",
      "ann_sq_topk", "ann_nsw_topk", "ann_hnsw_topk", "ann_nsw_diverse",
      "ann_nsw_bidir")
    val methods: Seq[(String, DataFrame)] =
      methodNames.map(m => m -> servedCatalog(m)(spark, dir))
    val union = methods.map { case (m, df) =>
      df.select(lit(m).as("method"), col("q_id"), col("vec_id"))
    }.reduce(_ unionByName _)
    union.createOrReplaceTempView("ann_report_union_t")
    bf.createOrReplaceTempView("ann_report_bf_t")
    spark.sql(
      """WITH returned AS (
        |  SELECT method, CAST(count(*) AS BIGINT) AS n_returned
        |  FROM ann_report_union_t GROUP BY method),
        |hits AS (
        |  SELECT u.method, CAST(count(*) AS BIGINT) AS hits
        |  FROM ann_report_union_t u
        |  JOIN ann_report_bf_t b ON u.q_id = b.q_id AND u.vec_id = b.vec_id
        |  GROUP BY u.method)
        |SELECT r.method, r.n_returned, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
        |       CAST(coalesce(h.hits, 0) * 1000000 div 15 AS BIGINT)
        |         AS recall_micro
        |FROM returned r LEFT JOIN hits h ON r.method = h.method""".stripMargin)
  }

  lazy val annRecallReportSql: String = {
    val subs = Seq(
      "ann_lsh_topk" -> annLshTopkSql,
      "ann_ivf_topk" -> annIvfTopkSql,
      "ann_pq_adc_topk" -> annPqAdcTopkSql,
      "ann_pq_rerank_topk" -> annPqRerankTopkSql,
      "ann_hamming_topk" -> annHammingTopkSql,
      "ann_ivfpq_topk" -> annIvfpqTopkSql,
      "ann_sq_topk" -> annSqTopkSql,
      "ann_nsw_topk" -> annNswTopkSql,
      "ann_hnsw_topk" -> annHnswTopkSql,
      "ann_nsw_diverse" -> annNswDiverseSql,
      "ann_nsw_bidir" -> annNswBidirSql)
    val unionSql = subs.map { case (m, sql) =>
      s"SELECT '$m' AS method, q_id, vec_id FROM (\n$sql\n)"
    }.mkString("\nUNION ALL\n")
    s"""WITH u AS (
       |$unionSql
       |),
       |bf AS (
       |  SELECT q_id, vec_id FROM (
       |$annBruteforceSql
       |)),
       |returned AS (
       |  SELECT method, CAST(count(*) AS BIGINT) AS n_returned
       |  FROM u GROUP BY method),
       |hits AS (
       |  SELECT u.method, CAST(count(*) AS BIGINT) AS hits
       |  FROM u JOIN bf b ON u.q_id = b.q_id AND u.vec_id = b.vec_id
       |  GROUP BY u.method)
       |SELECT r.method, r.n_returned, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
       |       CAST(coalesce(h.hits, 0) * 1000000 // 15 AS BIGINT)
       |         AS recall_micro
       |FROM returned r LEFT JOIN hits h ON r.method = h.method""".stripMargin
  }

  // ── ann_sq_topk ★ (r11) — SCALAR-QUANTIZATION search (the IVF_SQ8
  // building block: Faiss/Milvus's default billion-scale tradeoff — 64
  // 1-byte codes per vector where PQ spends 4, for much tighter
  // distances without codebook training): a per-DIMENSION uniform
  // quantizer is "trained" in one corpus pass (min/max per dimension in
  // integer micro-units), every candidate compresses to 64 byte codes,
  // and search runs the ASYMMETRIC distance — the probe keeps its exact
  // micro vector, each candidate dimension reconstructs to its cell
  // CENTER lo + (c·W + W/2) div 256 (W = hi−lo+1), and the score is the
  // exact BIGINT Σ (q_d − center(c_d))². Engine-exact end-to-end: the
  // quantizer bounds, the codes, and every distance are integers, so the
  // ranking can never flip on a float ulp.
  //
  // Scale shape: the trainer is ONE map-side-combined 64-row agg; the
  // 64-long range arrays broadcast as a 1-row dimension (allowlisted);
  // candidates carry codes map-side against the 3-probe broadcast — the
  // ann_bruteforce shape with 8x smaller candidate payloads.
  private val SqDims = 64

  def annSqTopk(spark: SparkSession, dir: String): DataFrame = {
    viewEmb(spark, dir)
    val w = (d: String) =>
      s"(element_at(r.his, $d + 1) - element_at(r.los, $d + 1) + 1)"
    val recon = (d: String) =>
      s"(element_at(r.los, $d + 1) + (element_at(c.cd, $d + 1) * ${w(d)}" +
        s" + ${w(d)} div 2) div 256)"
    spark.sql(
      s"""WITH q AS (
         |  SELECT vec_id,
         |         transform(embedding,
         |           x -> CAST(round(CAST(x AS DOUBLE) * 1000.0, 0) AS BIGINT))
         |           AS qv
         |  FROM embeddings),
         |dimstats AS (
         |  SELECT pos, min(v) AS lo, max(v) AS hi
         |  FROM (SELECT element_at(qv, pos + 1) AS v, pos
         |        FROM q LATERAL VIEW explode(sequence(0, ${SqDims - 1})) AS pos)
         |  GROUP BY pos),
         |rng AS (
         |  SELECT transform(array_sort(collect_list(struct(pos, lo))),
         |                   x -> x.lo) AS los,
         |         transform(array_sort(collect_list(struct(pos, hi))),
         |                   x -> x.hi) AS his
         |  FROM dimstats),
         |codes AS (
         |  SELECT q.vec_id,
         |         transform(sequence(0, ${SqDims - 1}), d ->
         |           (element_at(q.qv, d + 1) - element_at(r.los, d + 1)) * 256
         |             div (element_at(r.his, d + 1) - element_at(r.los, d + 1) + 1))
         |           AS cd
         |  FROM q CROSS JOIN rng r),
         |probes AS (SELECT vec_id AS q_id, qv FROM q WHERE vec_id < 3),
         |scored AS (
         |  SELECT /*+ BROADCAST(p) */ p.q_id, c.vec_id,
         |         aggregate(sequence(0, ${SqDims - 1}), CAST(0 AS BIGINT),
         |           (acc, d) -> acc
         |             + (element_at(p.qv, d + 1) - ${recon("d")})
         |             * (element_at(p.qv, d + 1) - ${recon("d")})) AS sq_dist
         |  FROM probes p JOIN codes c ON p.q_id <> c.vec_id
         |  CROSS JOIN rng r),
         |ranked AS (
         |  SELECT q_id, vec_id, sq_dist,
         |         row_number() OVER (PARTITION BY q_id
         |           ORDER BY sq_dist, vec_id) AS rnk
         |  FROM scored)
         |SELECT q_id, vec_id, CAST(sq_dist AS BIGINT) AS sq_dist,
         |       CAST(rnk AS INT) AS rnk
         |FROM ranked WHERE rnk <= 5""".stripMargin)
  }

  val annSqTopkSql: String = {
    val w = "(r.his[d + 1] - r.los[d + 1] + 1)"
    val recon = s"(r.los[d + 1] + (c.cd[d + 1] * $w + $w // 2) // 256)"
    s"""WITH q AS (
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           x -> CAST(round(x::DOUBLE * 1000.0, 0) AS BIGINT)) AS qv
       |  FROM embeddings),
       |dimstats AS (
       |  SELECT pos, min(qv[pos + 1]) AS lo, max(qv[pos + 1]) AS hi
       |  FROM q CROSS JOIN (SELECT unnest(range(0, $SqDims)) AS pos)
       |  GROUP BY pos),
       |rng AS (
       |  SELECT list(lo ORDER BY pos) AS los, list(hi ORDER BY pos) AS his
       |  FROM dimstats),
       |codes AS (
       |  SELECT q.vec_id,
       |         list_transform(range(0, $SqDims), d ->
       |           (q.qv[d + 1] - r.los[d + 1]) * 256
       |             // (r.his[d + 1] - r.los[d + 1] + 1)) AS cd
       |  FROM q CROSS JOIN rng r),
       |probes AS (SELECT vec_id AS q_id, qv FROM q WHERE vec_id < 3),
       |scored AS (
       |  SELECT p.q_id, c.vec_id,
       |         CAST(list_sum(list_transform(range(0, $SqDims), d ->
       |           (p.qv[d + 1] - $recon) * (p.qv[d + 1] - $recon)))
       |           AS BIGINT) AS sq_dist
       |  FROM probes p JOIN codes c ON p.q_id <> c.vec_id
       |  CROSS JOIN rng r),
       |ranked AS (
       |  SELECT q_id, vec_id, sq_dist,
       |         row_number() OVER (PARTITION BY q_id
       |           ORDER BY sq_dist, vec_id) AS rnk
       |  FROM scored)
       |SELECT q_id, vec_id, CAST(sq_dist AS BIGINT) AS sq_dist,
       |       CAST(rnk AS INT) AS rnk
       |FROM ranked WHERE rnk <= 5""".stripMargin
  }

  // ── emb_mmr_rerank ★ (r11) — MAXIMAL MARGINAL RELEVANCE diversity
  // re-rank (Carbonell & Goldstein 1998 — the serving-side step after
  // any ANN shortlist: pure top-k returns five copies of the same
  // near-dup; MMR trades relevance against redundancy): per probe, the
  // exact-cosine top-20 shortlist greedily yields 5 picks, each
  // maximizing λ·rel − (1−λ)·max-sim-to-already-picked with λ = 0.7.
  // ENGINE-EXACT DECISIONS: cosines quantize to integer micro-units
  // before any comparison (round half-up — the emb_pq_encode
  // discipline), λ becomes the integer split 7·rel − 3·maxsim, ties
  // break by vec_id. The oracle re-RUNS the greedy as 5 generated CTE
  // levels (the text_bpe_train discipline); the Spark side runs the
  // identical integer greedy DRIVER-SIDE over the pinned shortlist/sim
  // tables — bounded metadata, the KMeansTrainer discipline (five
  // relational levels over ≤1,140-row views cost ~0.75 s of pure job
  // latency each; rerank is a serving-side step anyway).
  //
  // Scale shape: stage 1 is ann_bruteforce's probe-broadcast scan (at
  // production: any ANN index); everything after is probes × 20 rows —
  // the pairwise-sim table is probes × 20 × 19 and each level's argmax
  // is a ≤20-row partitioned window. Serving cost decoupled from corpus
  // size by the shortlist, which is the point of rerank-after-retrieve.
  private val MmrShortlist = 20
  private val MmrPicks = 5

  /** The shortlist filter over the relevance table — shared text; the
    * Spark side MATERIALIZES it (localCheckpoint → view) because every
    * greedy level references it and Catalyst inlines CTEs (without the
    * pin the corpus scoring scan re-runs once per level — measured 11.7 s
    * vs ~1 s pinned at sf0.1). */
  private val mmrShortCte: String =
    s"""SELECT q_id, vec_id, rel_micro
       |FROM (SELECT q_id, vec_id, rel_micro,
       |             row_number() OVER (PARTITION BY q_id
       |               ORDER BY rel_micro DESC, vec_id) AS srk
       |      FROM relm)
       |WHERE srk <= $MmrShortlist""".stripMargin

  /** The greedy levels, over relations named `short` and `simm`. */
  private def mmrGreedy: String = {
    val sb = new StringBuilder
    sb ++=
      s"""sel1 AS (
         |  SELECT q_id, vec_id, rel_micro FROM (
         |    SELECT q_id, vec_id, rel_micro,
         |           row_number() OVER (PARTITION BY q_id
         |             ORDER BY rel_micro DESC, vec_id) AS rk
         |    FROM short) WHERE rk = 1)""".stripMargin
    for (k <- 2 to MmrPicks) {
      val selu = (1 until k).map(i => s"SELECT * FROM sel$i")
        .mkString(" UNION ALL ")
      sb ++= s""",
         |selu${k - 1} AS ($selu),
         |cand$k AS (
         |  SELECT s.q_id, s.vec_id, s.rel_micro, max(m.sim_micro) AS msim
         |  FROM short s
         |  JOIN selu${k - 1} t ON t.q_id = s.q_id
         |  JOIN simm m ON m.q_id = s.q_id AND m.va = s.vec_id
         |             AND m.vb = t.vec_id
         |  WHERE NOT EXISTS (SELECT 1 FROM selu${k - 1} u
         |                    WHERE u.q_id = s.q_id AND u.vec_id = s.vec_id)
         |  GROUP BY s.q_id, s.vec_id, s.rel_micro),
         |sel$k AS (
         |  SELECT q_id, vec_id, rel_micro FROM (
         |    SELECT q_id, vec_id, rel_micro,
         |           row_number() OVER (PARTITION BY q_id
         |             ORDER BY 7 * rel_micro - 3 * msim DESC, vec_id) AS rk
         |    FROM cand$k) WHERE rk = 1)""".stripMargin
    }
    sb ++= "\n" + (1 to MmrPicks).map(k =>
      s"SELECT q_id, CAST($k AS INT) AS mmr_rank, vec_id, rel_micro FROM sel$k")
      .mkString("\nUNION ALL\n")
    sb.result()
  }

  def embMmrRerank(spark: SparkSession, dir: String): DataFrame = {
    viewEmb(spark, dir)
    graft.expr.GraftFunctions.register(spark)
    spark.sql(
      s"""SELECT vec_id, embedding,
         |       sqrt(${dotS("embedding", "embedding")}) AS nrm
         |FROM embeddings""".stripMargin)
      .pinned()
      .createOrReplaceTempView("mmr_normed_t")
    // Pin the shortlist (probes x 20 rows) and the pairwise-sim table
    // (probes x 20 x 19): every greedy level references both, and the
    // unpinned CTE form re-ran the corpus scoring scan per level.
    spark.sql(
      s"""WITH queries AS (SELECT * FROM mmr_normed_t WHERE vec_id < 3),
         |relm AS (
         |  SELECT /*+ BROADCAST(q) */ q.vec_id AS q_id, c.vec_id,
         |         CAST(round(${dotS("q.embedding", "c.embedding")}
         |               / (q.nrm * c.nrm) * 1000000, 0) AS BIGINT) AS rel_micro
         |  FROM queries q JOIN mmr_normed_t c ON q.vec_id <> c.vec_id)
         |$mmrShortCte""".stripMargin)
      .pinned()
      .createOrReplaceTempView("mmr_short_t")
    val simm = spark.sql(
      s"""SELECT a.q_id, a.vec_id AS va, b.vec_id AS vb,
         |       CAST(round(${dotS("na.embedding", "nb.embedding")}
         |             / (na.nrm * nb.nrm) * 1000000, 0) AS BIGINT)
         |         AS sim_micro
         |FROM mmr_short_t a
         |JOIN mmr_short_t b ON b.q_id = a.q_id AND b.vec_id != a.vec_id
         |JOIN mmr_normed_t na ON na.vec_id = a.vec_id
         |JOIN mmr_normed_t nb ON nb.vec_id = b.vec_id""".stripMargin)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    // The greedy itself runs DRIVER-SIDE over bounded metadata (probes ×
    // 20 shortlist rows + probes × 20 × 19 sims — the KMeansTrainer /
    // BPE-argmax discipline): five SQL levels over ≤1,140-row views cost
    // ~0.75 s of pure job latency each, and serving-side rerank IS a
    // client-side step in production. The integer arithmetic is
    // IDENTICAL to the oracle's generated SQL levels (7·rel − 3·maxsim,
    // ties by vec_id), which re-run the greedy relationally.
    val short = spark.table("mmr_short_t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val out = scala.collection.mutable.Buffer[(Long, Int, Long, Long)]()
    short.groupBy(_._1).foreach { case (qId, rows) =>
      val cands = rows.map(r => (r._2, r._3)).sortBy(_._1)
      val picked = scala.collection.mutable.Buffer[(Long, Long)]()
      for (k <- 1 to MmrPicks) {
        val scored = cands.filterNot(c => picked.exists(_._1 == c._1)).map {
          case (v, rel) =>
            val score =
              if (picked.isEmpty) rel // level 1: pure relevance
              else 7L * rel - 3L * picked.map(p => simm((qId, v, p._1))).max
            (v, rel, score)
        }
        val best = scored.minBy { case (v, _, s) => (-s, v) }
        picked += ((best._1, best._2))
        out += ((qId, k, best._1, best._2))
      }
    }
    import spark.implicits._
    out.toSeq.toDF("q_id", "mmr_rank", "vec_id", "rel_micro")
  }

  val embMmrRerankSql: String =
    s"""WITH normed AS (
       |  SELECT vec_id, embedding,
       |         sqrt(list_reduce([0.0] || list_transform(embedding,
       |           x -> x::DOUBLE * x::DOUBLE), (a, b) -> a + b)) AS nrm
       |  FROM embeddings),
       |queries AS (SELECT * FROM normed WHERE vec_id < 3),
       |relm AS (
       |  SELECT q.vec_id AS q_id, c.vec_id,
       |         CAST(round(${dotD("q.embedding", "c.embedding")}
       |               / (q.nrm * c.nrm) * 1000000, 0) AS BIGINT) AS rel_micro
       |  FROM queries q JOIN normed c ON q.vec_id <> c.vec_id),
       |short AS (
       |$mmrShortCte),
       |simm AS (
       |  SELECT a.q_id, a.vec_id AS va, b.vec_id AS vb,
       |         CAST(round(${dotD("na.embedding", "nb.embedding")}
       |               / (na.nrm * nb.nrm) * 1000000, 0) AS BIGINT)
       |           AS sim_micro
       |  FROM short a
       |  JOIN short b ON b.q_id = a.q_id AND b.vec_id != a.vec_id
       |  JOIN normed na ON na.vec_id = a.vec_id
       |  JOIN normed nb ON nb.vec_id = b.vec_id),
       |$mmrGreedy""".stripMargin

  // ── ann_nsw_topk ★ (r12) — GRAPH-BASED ANN serving (r11 verdict #2):
  // greedy BEAM SEARCH over a navigable small-world-style neighbor
  // graph — the modern production ANN shape (NSW/HNSW: Malkov et al.;
  // what hnswlib/Vespa/Lucene-HNSW serve with). The graph is the
  // ann_knn_graph artifact made NAVIGABLE: each vector keeps its top-M
  // cosine neighbors among candidates sharing either of its TWO nearest
  // coarse lists (crnk ≤ 2 membership — the second-nearest list is what
  // creates inter-cluster edges, without which beam search could never
  // leave the entry point's cluster). Search: every probe starts at the
  // global entry point (min vec_id), and each of `NswHops` hops expands
  // the current beam's out-neighbors, rescores frontier ∪ neighbors
  // against the probe, and keeps the best `NswBeam` — the HNSW layer-0
  // ef-search loop, unrolled. ENGINE-EXACT DECISIONS: similarities
  // quantize to integer micro-units before any comparison (the
  // emb_mmr_rerank discipline), ties break by vec_id; the DuckDB oracle
  // replays the SAME hop chain as generated CTEs.
  //
  // Scale shape: graph build is the bounded co-list pair join (per-
  // reducer |list|², the allowlisted knn-graph trade; k ≈ √n trained
  // centroids at production — the KMeansTrainer swap). Each search hop
  // touches beam·M candidate rows PER PROBE via equi-joins on vec_id —
  // serving cost is O(hops · beam · M), decoupled from corpus size,
  // which is the point of graph ANN. Hop count is a constant (geometric
  // expansion reaches everything navigable); frontiers are probes×beam
  // rows, pinned per hop.
  private val NswM = 12
  private val NswBeam = 12
  private val NswHops = 6

  /** ENGINE-side lazy hop chain (r15): the serve loop's hops as chained
    * CTEs instead of one pinned localCheckpoint per hop. The pinned form
    * existed because a hop references its frontier TWICE (frontier ∪
    * frontier⋈edges — lazy chaining doubles the subtree per hop,
    * exponential at 6 hops); over a SELF-LOOP-augmented edge relation
    * (every index node carries (v, v)) the same set is
    * DISTINCT(frontier ⋈ edges_sl) — ONE frontier reference per hop, so
    * the whole chain plans linearly and the serve runs as ONE Spark job
    * instead of `hops` sequential pin jobs (measured on ann_nsw_topk's
    * 6-hop serve at sf0.1: 2.0–2.7 s pinned → 0.8–1.1 s lazy, identical
    * rows). Set-equivalence: every frontier node is in `normed`, so its
    * self-loop keeps it in the expansion exactly as the UNION arm did;
    * the oracle texts keep the UNION form and the gate machine-checks
    * end-to-end equality. Frontier width stays beam·|probes| rows —
    * tiny — so the per-hop DISTINCT and window exchanges are
    * AQE-coalesced micro-stages within the one job. */
  private def nswHopChainCtes(f0: String, edgesSl: String, normed: String,
      beam: Int, hops: Int, px: String): String =
    (1 to hops).map { h =>
      val prev = if (h == 1) f0 else s"${px}hop${h - 1}"
      s"""${px}hop$h AS (
         |SELECT q_id, vec_id, sim_micro FROM (
         |  SELECT q_id, vec_id, sim_micro,
         |         row_number() OVER (PARTITION BY q_id
         |           ORDER BY sim_micro DESC, vec_id) AS rnk
         |  FROM (
         |    SELECT x.q_id, x.vec_id,
         |           CAST(round(${dotS("q.embedding", "c.embedding")}
         |                 / (q.nrm * c.nrm) * 1000000, 0) AS BIGINT) AS sim_micro
         |    FROM (SELECT DISTINCT f.q_id, e.nbr_id AS vec_id
         |          FROM $prev f JOIN $edgesSl e ON e.vec_id = f.vec_id) x
         |    JOIN $normed q ON q.vec_id = x.q_id
         |    JOIN $normed c ON c.vec_id = x.vec_id))
         |WHERE rnk <= $beam)""".stripMargin
    }.mkString(",\n")

  /** The duplicate-class expansion + top-3 tail every NSW serve ends
    * with, as a SELECT over the last hop CTE. */
  private def nswServeTailSpark(lastHop: String, alln: String): String =
    s"""SELECT q_id, vec_id, CAST(rnk AS INT) AS rnk, sim_micro
       |FROM (SELECT q_id, vec_id, sim_micro,
       |             row_number() OVER (PARTITION BY q_id
       |               ORDER BY sim_micro DESC, vec_id) AS rnk
       |      FROM (SELECT f.q_id, a.vec_id, f.sim_micro
       |            FROM $lastHop f
       |            JOIN $alln a ON a.rep_id = f.vec_id)
       |      WHERE vec_id <> q_id)
       |WHERE rnk <= 3""".stripMargin

  /** One search hop over relations `<prev>` (q_id, vec_id), `gedges`,
    * and `<normed>`; dialect differences injected via `dot`. */
  private def nswHopSql(prev: String, normed: String,
      dot: (String, String) => String): String =
    s"""SELECT q_id, vec_id, sim_micro FROM (
       |  SELECT q_id, vec_id, sim_micro,
       |         row_number() OVER (PARTITION BY q_id
       |           ORDER BY sim_micro DESC, vec_id) AS rnk
       |  FROM (
       |    SELECT x.q_id, x.vec_id,
       |           CAST(round(${dot("q.embedding", "c.embedding")}
       |                 / (q.nrm * c.nrm) * 1000000, 0) AS BIGINT) AS sim_micro
       |    FROM (SELECT q_id, vec_id FROM $prev
       |          UNION
       |          SELECT f.q_id, e.nbr_id AS vec_id
       |          FROM $prev f JOIN gedges e ON e.vec_id = f.vec_id) x
       |    JOIN $normed q ON q.vec_id = x.q_id
       |    JOIN $normed c ON c.vec_id = x.vec_id))
       |WHERE rnk <= $NswBeam""".stripMargin

  def annNswTopk(spark: SparkSession, dir: String): DataFrame = {
    // Index over DISTINCT vectors: exact-duplicate classes collapse to
    // their min-id representative at build and expand back at serve.
    // Stress-discovered degeneration (sf≈1, 10 exact copies each):
    // without the collapse every node's M out-edges are consumed by its
    // own copies, the graph shatters into disconnected duplicate
    // cliques, and beam search can never leave the entry's clique —
    // the duplicate-heavy-corpus failure every production graph-ANN
    // index dedups away before wiring. The collapse + coarse-pair
    // scoring is the memoized [[nswBuild]] shared by the family.
    val (alln, normed, gsc) = nswBuild(spark, dir)
    alln.createOrReplaceTempView("nsw_all_t")
    normed.createOrReplaceTempView("nsw_normed_t")
    gsc.createOrReplaceTempView("nsw_gsc_t")
    // The navigable out-edge relation: top-M by micro-similarity over
    // the shared scored pairs, SELF-LOOP-augmented for the lazy hop
    // chain (see nswHopChainCtes). Pinned — the search joins it every
    // hop.
    spark.sql(
      s"""SELECT vec_id, nbr_id FROM (
         |  SELECT vec_id, nbr_id,
         |         row_number() OVER (PARTITION BY vec_id
         |           ORDER BY sim_micro DESC, nbr_id) AS rnk
         |  FROM nsw_gsc_t) WHERE rnk <= $NswM
         |UNION ALL
         |SELECT vec_id, vec_id AS nbr_id FROM nsw_normed_t""".stripMargin)
      .pinned()
      .createOrReplaceTempView("nsw_gedges_sl_t")
    // Beam 0: every probe starts at the single global entry point.
    spark.sql(
      """SELECT q.vec_id AS q_id, e.entry AS vec_id
        |FROM (SELECT vec_id FROM nsw_normed_t WHERE vec_id < 3) q
        |CROSS JOIN (SELECT min(vec_id) AS entry FROM nsw_normed_t) e""".stripMargin)
      .pinned()
      .createOrReplaceTempView("nsw_f0_t")
    // The whole 6-hop serve + duplicate-class expansion: ONE lazy job.
    spark.sql(
      s"""WITH ${nswHopChainCtes("nsw_f0_t", "nsw_gedges_sl_t",
            "nsw_normed_t", NswBeam, NswHops, "nsw")}
         |${nswServeTailSpark(s"nswhop$NswHops", "nsw_all_t")}""".stripMargin)
  }

  lazy val annNswTopkSql: String = {
    val dot = (a: String, b: String) => dotD(a, b)
    val hops = (1 to NswHops).map { h =>
      s"""f$h AS (
         |${nswHopSql(s"f${h - 1}", "normed", dot)})""".stripMargin
    }.mkString(",\n")
    s"""WITH alln AS MATERIALIZED (
       |  SELECT vec_id, embedding, nrm,
       |         min(vec_id) OVER (PARTITION BY embedding) AS rep_id
       |  FROM (SELECT vec_id, embedding,
       |               sqrt(${dotD("embedding", "embedding")}) AS nrm
       |        FROM embeddings)),
       |normed AS MATERIALIZED (
       |  SELECT vec_id, embedding, nrm FROM alln WHERE vec_id = rep_id),
       |cents AS (
       |  SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm
       |  FROM normed WHERE vec_id BETWEEN 100 AND 115),
       |memb AS (
       |  SELECT vec_id, c_id FROM (
       |    SELECT n.vec_id, c.c_id,
       |           row_number() OVER (PARTITION BY n.vec_id
       |             ORDER BY ${dotD("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) DESC,
       |                      c.c_id) AS crnk
       |    FROM normed n CROSS JOIN cents c) WHERE crnk <= 2),
       |cand AS (
       |  SELECT DISTINCT a.vec_id, b.vec_id AS nbr_id
       |  FROM memb a JOIN memb b
       |    ON a.c_id = b.c_id AND a.vec_id <> b.vec_id),
       |gscored AS (
       |  SELECT c.vec_id, c.nbr_id,
       |         CAST(round(${dotD("x.embedding", "y.embedding")}
       |               / (x.nrm * y.nrm) * 1000000, 0) AS BIGINT) AS sim_micro
       |  FROM cand c
       |  JOIN normed x ON x.vec_id = c.vec_id
       |  JOIN normed y ON y.vec_id = c.nbr_id),
       |gedges AS (
       |  SELECT vec_id, nbr_id FROM (
       |    SELECT vec_id, nbr_id,
       |           row_number() OVER (PARTITION BY vec_id
       |             ORDER BY sim_micro DESC, nbr_id) AS rnk
       |    FROM gscored) WHERE rnk <= $NswM),
       |f0 AS (
       |  SELECT q.vec_id AS q_id, e.entry AS vec_id
       |  FROM (SELECT vec_id FROM normed WHERE vec_id < 3) q
       |  CROSS JOIN (SELECT min(vec_id) AS entry FROM normed) e),
       |$hops
       |SELECT q_id, vec_id, CAST(rnk AS INT) AS rnk, sim_micro
       |FROM (SELECT q_id, vec_id, sim_micro,
       |             row_number() OVER (PARTITION BY q_id
       |               ORDER BY sim_micro DESC, vec_id) AS rnk
       |      FROM (SELECT f.q_id, a.vec_id, f.sim_micro
       |            FROM f$NswHops f
       |            JOIN alln a ON a.rep_id = f.vec_id)
       |      WHERE vec_id <> q_id)
       |WHERE rnk <= 3""".stripMargin
  }

  // ── ann_nsw_diverse ★ (r12) — NSW serving over a DIVERSITY-SELECTED
  // graph (Malkov & Yashunin's select-neighbors heuristic, the part of
  // HNSW that survives near-duplicate corpora): instead of the raw
  // top-M edges, each node picks its M out-neighbors GREEDILY — a
  // candidate is kept only if it is closer to the node than to any
  // already-kept neighbor, so a clump of near-identical candidates
  // spends ONE edge slot, not all of them, and the remaining slots buy
  // long-range diversity. The exact-duplicate collapse (ann_nsw_topk's
  // build step) handles bit-identical copies; this heuristic is the
  // GENERAL fix for near-dup clumps no dedup can catch. Relationally:
  // top-[[DivC]] candidates per node, then [[DivM]] greedy rounds —
  // per round ONE per-node argmax (window over the shrinking candidate
  // relation) and one anti-domination filter (equi-join to the scored
  // pair relation; a candidate pair absent from the co-list relation is
  // conservatively kept). All decisions in integer micro-units; the
  // DuckDB oracle replays every greedy round AND the search as CTEs.
  //
  // Scale shape: the candidate cap bounds each round's relation at
  // n·C rows; rounds are a constant M; everything is equi-joins and
  // per-node windows. Search cost is the NSW serving shape.
  private val DivC = 16
  private val DivM = 8

  /** The [[DivM]]-pick greedy select-neighbors pass over a candidate
    * view `<px>_rem0_t` (vec_id, nbr_id, sim_micro), anti-dominating
    * against the scored pair view `gscView`; materializes
    * `<px>_edges_t` (WITH sim — consumers may project it away).
    *
    * ONE per-node array fold, not [[DivM]] driver rounds (r13: the
    * round form cost ~16 sequential pin jobs per pass and made
    * ann_nsw_bidir the catalog's #1 wall-clock entry at 35 s; this
    * form is 3 shuffles total). Equivalence to the round form the
    * DuckDB oracle still replays ([[diversityRoundsSqlD]]) is the
    * textbook one: each round picks the (sim DESC, nbr ASC)-max
    * SURVIVOR, and domination only ever removes candidates without
    * changing scores, so scanning candidates once in that global order
    * and keeping each iff (< M kept) ∧ (not dominated by an
    * already-kept pick) selects the identical set — and the hash gate
    * machine-checks that equivalence every Verify run. Domination
    * lookups come from a per-node map of candidate-pair sims (absent
    * pair → conservative keep, exactly the round form's LEFT JOIN
    * NULL arm; `try_element_at` keeps the missing-key probe
    * ANSI-safe). */
  private def diversityRounds(spark: SparkSession, px: String,
      gscView: String): Unit = {
    val noSim = "CAST(-2000000000 AS BIGINT)" // < any cosine micro-sim
    spark.sql(
      s"""WITH cl AS (
         |  SELECT vec_id,
         |         transform(array_sort(collect_list(struct(
         |             CAST(-sim_micro AS BIGINT) AS ns, nbr_id, sim_micro))),
         |           t -> struct(t.nbr_id AS nbr, t.sim_micro AS sim)) AS cands
         |  FROM ${px}_rem0_t GROUP BY vec_id),
         |pm AS (
         |  SELECT a.vec_id,
         |         map_from_entries(collect_list(struct(
         |             a.nbr_id * 100000000 + b.nbr_id, g.sim_micro))) AS m
         |  FROM ${px}_rem0_t a
         |  JOIN ${px}_rem0_t b
         |    ON b.vec_id = a.vec_id AND b.nbr_id <> a.nbr_id
         |  JOIN $gscView g ON g.vec_id = a.nbr_id AND g.nbr_id = b.nbr_id
         |  GROUP BY a.vec_id),
         |sel AS (
         |  SELECT c.vec_id,
         |         aggregate(c.cands,
         |           CAST(array() AS ARRAY<STRUCT<nbr: BIGINT, sim: BIGINT>>),
         |           (kept, cd) -> CASE
         |             WHEN size(kept) >= $DivM THEN kept
         |             WHEN size(filter(kept, k ->
         |                 coalesce(try_element_at(p.m,
         |                     cd.nbr * 100000000 + k.nbr), $noSim)
         |                   > cd.sim)) > 0 THEN kept
         |             ELSE concat(kept, array(cd)) END) AS picks
         |  FROM cl c LEFT JOIN pm p ON p.vec_id = c.vec_id)
         |SELECT vec_id, pk.nbr AS nbr_id, pk.sim AS sim_micro
         |FROM sel LATERAL VIEW explode(picks) AS pk""".stripMargin)
      .pinned()
      .createOrReplaceTempView(s"${px}_edges_t")
  }

  def annNswDiverse(spark: SparkSession, dir: String): DataFrame = {
    val (alln, normed, gsc) = nswBuild(spark, dir)
    alln.createOrReplaceTempView("ndv_all_t")
    normed.createOrReplaceTempView("ndv_normed_t")
    gsc.createOrReplaceTempView("ndv_gsc_t")
    spark.sql(
      s"""SELECT vec_id, nbr_id, sim_micro FROM (
         |  SELECT vec_id, nbr_id, sim_micro,
         |         row_number() OVER (PARTITION BY vec_id
         |           ORDER BY sim_micro DESC, nbr_id) AS rnk
         |  FROM ndv_gsc_t) WHERE rnk <= $DivC""".stripMargin)
      .pinned()
      .createOrReplaceTempView("ndv_rem0_t")
    // Greedy diversity rounds: pick the best remaining candidate per
    // node, then drop candidates closer to the pick than to the node.
    diversityRounds(spark, "ndv", "ndv_gsc_t")
    // Self-loop-augmented serve edges for the lazy hop chain (the
    // spec-pinned ndv/nbd edge views keep their exact contents).
    spark.sql(
      """SELECT vec_id, nbr_id FROM ndv_edges_t
        |UNION ALL
        |SELECT vec_id, vec_id AS nbr_id FROM ndv_normed_t""".stripMargin)
      .pinned()
      .createOrReplaceTempView("ndv_edges_sl_t")
    spark.sql(
      """SELECT q.vec_id AS q_id, e.entry AS vec_id
        |FROM (SELECT vec_id FROM ndv_normed_t WHERE vec_id < 3) q
        |CROSS JOIN (SELECT min(vec_id) AS entry FROM ndv_normed_t) e""".stripMargin)
      .pinned()
      .createOrReplaceTempView("ndv_f0_t")
    spark.sql(
      s"""WITH ${nswHopChainCtes("ndv_f0_t", "ndv_edges_sl_t",
            "ndv_normed_t", NswBeam, NswHops, "ndv")}
         |${nswServeTailSpark(s"ndvhop$NswHops", "ndv_all_t")}""".stripMargin)
  }

  /** The [[DivM]] greedy rounds as generated oracle CTEs, prefixed so a
    * pipeline can run the selection twice (ann_nsw_bidir's reverse
    * re-selection); emits `<px>pick{k}` / `<px>rem{k}` reading
    * `<px>rem0`. */
  private def diversityRoundsSqlD(px: String): String =
    (1 to DivM).map { k =>
      s"""${px}pick$k AS MATERIALIZED (
         |  SELECT vec_id, nbr_id, sim_micro FROM (
         |    SELECT vec_id, nbr_id, sim_micro,
         |           row_number() OVER (PARTITION BY vec_id
         |             ORDER BY sim_micro DESC, nbr_id) AS rn
         |    FROM ${px}rem${k - 1}) WHERE rn = 1),
         |${px}rem$k AS MATERIALIZED (
         |  SELECT r.vec_id, r.nbr_id, r.sim_micro
         |  FROM ${px}rem${k - 1} r
         |  JOIN ${px}pick$k p ON p.vec_id = r.vec_id
         |  LEFT JOIN gsc g
         |    ON g.vec_id = r.nbr_id AND g.nbr_id = p.nbr_id
         |  WHERE r.nbr_id <> p.nbr_id
         |    AND (g.sim_micro IS NULL OR g.sim_micro <= r.sim_micro))""".stripMargin
    }.mkString(",\n")

  private def diversityEdgesSqlD(px: String): String =
    (1 to DivM)
      .map(k => s"  SELECT vec_id, nbr_id, sim_micro FROM ${px}pick$k")
      .mkString("\n  UNION ALL\n")

  /** Shared base CTEs (alln → gsc → rem0) for the diverse/bidir
    * oracles — the exact text of the memoized Spark nswBuild. */
  private lazy val nswDiverseBaseSqlCtes: String =
    s"""alln AS MATERIALIZED (
       |  SELECT vec_id, embedding, nrm,
       |         min(vec_id) OVER (PARTITION BY embedding) AS rep_id
       |  FROM (SELECT vec_id, embedding,
       |               sqrt(${dotD("embedding", "embedding")}) AS nrm
       |        FROM embeddings)),
       |normed AS MATERIALIZED (
       |  SELECT vec_id, embedding, nrm FROM alln WHERE vec_id = rep_id),
       |cents AS (
       |  SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm
       |  FROM normed WHERE vec_id BETWEEN 100 AND 115),
       |memb AS (
       |  SELECT vec_id, c_id FROM (
       |    SELECT n.vec_id, c.c_id,
       |           row_number() OVER (PARTITION BY n.vec_id
       |             ORDER BY ${dotD("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) DESC,
       |                      c.c_id) AS crnk
       |    FROM normed n CROSS JOIN cents c) WHERE crnk <= 2),
       |cand AS (
       |  SELECT DISTINCT a.vec_id, b.vec_id AS nbr_id
       |  FROM memb a JOIN memb b
       |    ON a.c_id = b.c_id AND a.vec_id <> b.vec_id),
       |gsc AS MATERIALIZED (
       |  SELECT c.vec_id, c.nbr_id,
       |         CAST(round(${dotD("x.embedding", "y.embedding")}
       |               / (x.nrm * y.nrm) * 1000000, 0) AS BIGINT) AS sim_micro
       |  FROM cand c
       |  JOIN normed x ON x.vec_id = c.vec_id
       |  JOIN normed y ON y.vec_id = c.nbr_id),
       |rem0 AS MATERIALIZED (
       |  SELECT vec_id, nbr_id, sim_micro FROM (
       |    SELECT vec_id, nbr_id, sim_micro,
       |           row_number() OVER (PARTITION BY vec_id
       |             ORDER BY sim_micro DESC, nbr_id) AS rnk
       |    FROM gsc) WHERE rnk <= $DivC)""".stripMargin

  /** Shared serve tail: entry point, beam hops over `edges`, top-3. */
  private def nswServeTailSqlD(edges: String): String = {
    val dot = (a: String, b: String) => dotD(a, b)
    val hops = (1 to NswHops).map { h =>
      s"""f$h AS MATERIALIZED (
         |${hnswHopSql(s"f${h - 1}", edges, "normed", NswBeam, dot)})""".stripMargin
    }.mkString(",\n")
    s"""f0 AS (
       |  SELECT q.vec_id AS q_id, e.entry AS vec_id
       |  FROM (SELECT vec_id FROM normed WHERE vec_id < 3) q
       |  CROSS JOIN (SELECT min(vec_id) AS entry FROM normed) e),
       |$hops
       |SELECT q_id, vec_id, CAST(rnk AS INT) AS rnk, sim_micro
       |FROM (SELECT q_id, vec_id, sim_micro,
       |             row_number() OVER (PARTITION BY q_id
       |               ORDER BY sim_micro DESC, vec_id) AS rnk
       |      FROM (SELECT f.q_id, a.vec_id, f.sim_micro
       |            FROM f$NswHops f
       |            JOIN alln a ON a.rep_id = f.vec_id)
       |      WHERE vec_id <> q_id)
       |WHERE rnk <= 3""".stripMargin
  }

  lazy val annNswDiverseSql: String =
    s"""WITH $nswDiverseBaseSqlCtes,
       |${diversityRoundsSqlD("")},
       |dedges AS MATERIALIZED (
       |${diversityEdgesSqlD("")}),
       |${nswServeTailSqlD("dedges")}""".stripMargin

  // ── ann_nsw_bidir ★ (r13) — the reverse-edge re-selection
  // (hnswlib's `keepPrunedConnections` shrink, the COVERAGE one-union
  // extension): after the forward select-neighbors pass, every forward
  // edge u→v NOMINATES u back as a candidate of v (in HNSW terms: when
  // u links v, v gains the back-link and, if over budget, re-runs
  // select-neighbors over its grown list). Relationally: candidate set
  // 2 = DISTINCT(forward ∪ reversed-forward) — cosine is symmetric so
  // the reversed edge carries the identical sim_micro — then the SAME
  // [[DivM]] greedy rounds re-select each node's M edges from it. The
  // degree bound now holds BIDIRECTIONALLY: a node's final list has
  // re-ranked both the neighbors it chose and the neighbors that chose
  // it, so high-in-degree hubs trade their worst back-links for
  // diversity instead of accumulating unboundedly (NswBidirSpec pins
  // out-degree ≤ M, candidate provenance, and that reverse nominations
  // actually enter final lists on the fixture). Search and output are
  // the ann_nsw_diverse serve, so the recall report reads the two rows
  // as an ablation of exactly one index-build decision.
  //
  // Scale shape: the reverse union doubles a relation already capped at
  // n·M rows; the re-selection rounds are the same constant-M windows;
  // serve cost unchanged.
  def annNswBidir(spark: SparkSession, dir: String): DataFrame = {
    val (alln, normed, gsc) = nswBuild(spark, dir)
    alln.createOrReplaceTempView("nbd_all_t")
    normed.createOrReplaceTempView("nbd_normed_t")
    gsc.createOrReplaceTempView("nbd_gsc_t")
    spark.sql(
      s"""SELECT vec_id, nbr_id, sim_micro FROM (
         |  SELECT vec_id, nbr_id, sim_micro,
         |         row_number() OVER (PARTITION BY vec_id
         |           ORDER BY sim_micro DESC, nbr_id) AS rnk
         |  FROM nbd_gsc_t) WHERE rnk <= $DivC""".stripMargin)
      .pinned()
      .createOrReplaceTempView("nbd_rem0_t")
    diversityRounds(spark, "nbd", "nbd_gsc_t")
    spark.sql(
      """SELECT DISTINCT vec_id, nbr_id, sim_micro FROM (
        |  SELECT vec_id, nbr_id, sim_micro FROM nbd_edges_t
        |  UNION ALL
        |  SELECT nbr_id AS vec_id, vec_id AS nbr_id, sim_micro
        |  FROM nbd_edges_t)""".stripMargin)
      .pinned()
      .createOrReplaceTempView("nbd2_rem0_t")
    diversityRounds(spark, "nbd2", "nbd_gsc_t")
    // Self-loop-augmented serve edges (nbd2_edges_t itself stays exactly
    // the spec-pinned re-selected edge set).
    spark.sql(
      """SELECT vec_id, nbr_id FROM nbd2_edges_t
        |UNION ALL
        |SELECT vec_id, vec_id AS nbr_id FROM nbd_normed_t""".stripMargin)
      .pinned()
      .createOrReplaceTempView("nbd2_edges_sl_t")
    spark.sql(
      """SELECT q.vec_id AS q_id, e.entry AS vec_id
        |FROM (SELECT vec_id FROM nbd_normed_t WHERE vec_id < 3) q
        |CROSS JOIN (SELECT min(vec_id) AS entry FROM nbd_normed_t) e""".stripMargin)
      .pinned()
      .createOrReplaceTempView("nbd_f0_t")
    spark.sql(
      s"""WITH ${nswHopChainCtes("nbd_f0_t", "nbd2_edges_sl_t",
            "nbd_normed_t", NswBeam, NswHops, "nbd")}
         |${nswServeTailSpark(s"nbdhop$NswHops", "nbd_all_t")}""".stripMargin)
  }

  lazy val annNswBidirSql: String =
    s"""WITH $nswDiverseBaseSqlCtes,
       |${diversityRoundsSqlD("")},
       |brem0 AS MATERIALIZED (
       |  SELECT DISTINCT vec_id, nbr_id, sim_micro FROM (
       |${diversityEdgesSqlD("")}
       |  UNION ALL
       |${diversityEdgesSqlD("").replace("SELECT vec_id, nbr_id, sim_micro",
            "SELECT nbr_id AS vec_id, vec_id AS nbr_id, sim_micro")})),
       |${diversityRoundsSqlD("b")},
       |bedges AS MATERIALIZED (
       |${diversityEdgesSqlD("b")}),
       |${nswServeTailSqlD("bedges")}""".stripMargin

  // ── ann_hnsw_topk ★ (r12) — HIERARCHICAL navigable-small-world search
  // (Malkov & Yashunin 2016): the multi-layer upgrade of ann_nsw_topk and
  // the exact serving shape of hnswlib/Lucene-HNSW/pgvector. Every vector
  // gets a DETERMINISTIC geometric level from the engine-shared md5 hash
  // (P[lvl ≥ 1] = 1/4, P[lvl ≥ 2] = 1/16 — the hash replaces HNSW's RNG,
  // so both engines assign identical levels); layer l keeps only nodes
  // with lvl ≥ l. Search descends:
  // enter at the top layer's global entry point, take [[HnswHopsU]]
  // narrow-beam hops on layers 2 then 1 (the greedy zoom-in), then run
  // the layer-0 beam search — the ef-search loop — from the descended
  // frontier. Three fixture-measured design points, each a real HNSW
  // lesson: (1) layer 0 reuses NSW's two-nearest-coarse-list wiring,
  // scored ONCE and re-ranked, but UPPER layers widen membership to the
  // FOUR nearest coarse lists — the long-range links; with only crnk ≤ 2
  // edges the upper graphs cannot cross cluster boundaries and the
  // descent strands probes (bounded: only the geometrically-sparse
  // lvl ≥ 1 nodes pay the wider fan-out). (2) The layer-0 stage is
  // MULTI-SEEDED: descended frontier ∪ the flat entry point, so the
  // hierarchy adds its zoomed-in region without betting the search on
  // it. (3) ef (layer-0 beam) = 24, not the frontier width 12 — with a
  // shared beam the high-sim descended seeds otherwise crowd out the
  // low-sim path the flat entry needs (measured 33% recall at ef 12 vs
  // 60%, tying flat NSW, at ef 24 — the textbook ef-vs-recall knob).
  // All similarities quantize to integer micro-units before any
  // decision; the DuckDB oracle replays the full descent chain as
  // generated CTEs.
  //
  // Scale shape: one bounded pair-scoring stage (the allowlisted co-list
  // trade, k ≈ √n trained centroids at production); upper layers are
  // geometrically sparser so their edge builds are 1/16 and 1/256 of the
  // layer-0 work; each search hop is an equi-join on vec_id touching
  // beam·M rows per probe — serving cost O(hops·beam·M), independent of
  // corpus size, with the hierarchy cutting the hops a flat NSW needs.
  private val HnswM0 = 12
  private val HnswMU = 4
  private val HnswBeam0 = 24
  private val HnswBeamU = 3
  private val HnswHops0 = 6
  private val HnswHopsU = 2

  /** One search hop over `<prev>` (q_id, vec_id) expanding `<edges>`. */
  private def hnswHopSql(prev: String, edges: String, normed: String,
      beam: Int, dot: (String, String) => String): String =
    s"""SELECT q_id, vec_id, sim_micro FROM (
       |  SELECT q_id, vec_id, sim_micro,
       |         row_number() OVER (PARTITION BY q_id
       |           ORDER BY sim_micro DESC, vec_id) AS rnk
       |  FROM (
       |    SELECT x.q_id, x.vec_id,
       |           CAST(round(${dot("q.embedding", "c.embedding")}
       |                 / (q.nrm * c.nrm) * 1000000, 0) AS BIGINT) AS sim_micro
       |    FROM (SELECT q_id, vec_id FROM $prev
       |          UNION
       |          SELECT f.q_id, e.nbr_id AS vec_id
       |          FROM $prev f JOIN $edges e ON e.vec_id = f.vec_id) x
       |    JOIN $normed q ON q.vec_id = x.q_id
       |    JOIN $normed c ON c.vec_id = x.vec_id))
       |WHERE rnk <= $beam""".stripMargin

  /** Layer-l edge set: the once-scored co-list pairs, restricted to
    * endpoints of level ≥ l, top-M per node. */
  private def hnswEdgesSql(l: Int, m: Int, gsc: String, lv: String): String = {
    val restrict = if (l == 0) gsc
    else s"""(SELECT g.* FROM $gsc g
            |   JOIN $lv la ON la.vec_id = g.vec_id AND la.lvl >= $l
            |   JOIN $lv lb ON lb.vec_id = g.nbr_id AND lb.lvl >= $l)""".stripMargin
    s"""SELECT vec_id, nbr_id FROM (
       |  SELECT vec_id, nbr_id,
       |         row_number() OVER (PARTITION BY vec_id
       |           ORDER BY sim_micro DESC, nbr_id) AS rnk
       |  FROM $restrict) WHERE rnk <= $m""".stripMargin
  }

  def annHnswTopk(spark: SparkSession, dir: String): DataFrame = {
    val h = hSpark("CAST(vec_id AS STRING)")
    // Index over DISTINCT vectors (the ann_nsw_topk duplicate-collapse:
    // duplicate classes otherwise consume every out-edge and shatter
    // the graph into cliques); expand back at serve. Shared memoized
    // build ([[nswBuild]]).
    val (alln, normed, gsc) = nswBuild(spark, dir)
    alln.createOrReplaceTempView("hnsw_all_t")
    normed.createOrReplaceTempView("hnsw_normed_t")
    gsc.createOrReplaceTempView("hnsw_gsc_t")
    spark.sql(
      s"""SELECT vec_id,
         |       CASE WHEN $h % 16 = 0 THEN 2
         |            WHEN $h % 4 = 0 THEN 1 ELSE 0 END AS lvl
         |FROM hnsw_normed_t""".stripMargin)
      .pinned()
      .createOrReplaceTempView("hnsw_lv_t")
    // Layer-0 pairs come scored from the shared build (hnsw_gsc_t);
    // every layer's edge set re-ranks that relation.
    // Upper-layer pair relation: lvl ≥ 1 nodes only, crnk ≤ 4 lists —
    // the long-range links the descent needs to cross clusters.
    spark.sql(
      s"""WITH cents AS (
         |  SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm
         |  FROM hnsw_normed_t WHERE vec_id BETWEEN 100 AND 115),
         |upper_nodes AS (
         |  SELECT t.* FROM hnsw_normed_t t
         |  JOIN hnsw_lv_t l ON l.vec_id = t.vec_id AND l.lvl >= 1),
         |memb4 AS (
         |  SELECT vec_id, c_id FROM (
         |    SELECT n.vec_id, c.c_id,
         |           row_number() OVER (PARTITION BY n.vec_id
         |             ORDER BY ${dotS("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) DESC,
         |                      c.c_id) AS crnk
         |    FROM upper_nodes n CROSS JOIN cents c) WHERE crnk <= 4),
         |candu AS (
         |  SELECT DISTINCT a.vec_id, b.vec_id AS nbr_id
         |  FROM memb4 a JOIN memb4 b
         |    ON a.c_id = b.c_id AND a.vec_id <> b.vec_id)
         |SELECT c.vec_id, c.nbr_id,
         |       CAST(round(${dotS("x.embedding", "y.embedding")}
         |             / (x.nrm * y.nrm) * 1000000, 0) AS BIGINT) AS sim_micro
         |FROM candu c
         |JOIN hnsw_normed_t x ON x.vec_id = c.vec_id
         |JOIN hnsw_normed_t y ON y.vec_id = c.nbr_id""".stripMargin)
      .pinned()
      .createOrReplaceTempView("hnsw_gscu_t")
    // Per-layer edge pins, SELF-LOOP-augmented (see nswHopChainCtes):
    // self-loops come from the FULL index node set, so any frontier
    // node survives a hop on any layer exactly as the UNION arm kept it.
    Seq((0, HnswM0, "hnsw_gsc_t", 0), (1, HnswMU, "hnsw_gscu_t", 0),
        (2, HnswMU, "hnsw_gscu_t", 2)).foreach { case (l, m, gsc, filt) =>
      spark.sql(hnswEdgesSql(filt, m, gsc, "hnsw_lv_t") +
          "\nUNION ALL\nSELECT vec_id, vec_id AS nbr_id FROM hnsw_normed_t")
        .pinned()
        .createOrReplaceTempView(s"hnsw_ed${l}sl_t")
    }
    // Entry: the highest non-empty layer's least node.
    spark.sql(
      """SELECT q.vec_id AS q_id, e.entry AS vec_id
        |FROM (SELECT vec_id FROM hnsw_normed_t WHERE vec_id < 3) q
        |CROSS JOIN (SELECT coalesce(
        |    (SELECT min(vec_id) FROM hnsw_lv_t WHERE lvl >= 2),
        |    (SELECT min(vec_id) FROM hnsw_lv_t WHERE lvl >= 1),
        |    (SELECT min(vec_id) FROM hnsw_lv_t)) AS entry) e""".stripMargin)
      .pinned()
      .createOrReplaceTempView("hnsw_f0_t")
    // The whole descent (2 hops on layer 2, 2 on layer 1), the
    // multi-seeded layer-0 frontier (descended ∪ flat entry), and the
    // 6-hop ef-search: ONE lazy job (previously 11 pinned hop jobs).
    spark.sql(
      s"""WITH ${nswHopChainCtes("hnsw_f0_t", "hnsw_ed2sl_t",
            "hnsw_normed_t", HnswBeamU, HnswHopsU, "hu2")},
         |${nswHopChainCtes(s"hu2hop$HnswHopsU", "hnsw_ed1sl_t",
            "hnsw_normed_t", HnswBeamU, HnswHopsU, "hu1")},
         |hseed AS (
         |  SELECT q_id, vec_id FROM hu1hop$HnswHopsU
         |  UNION
         |  SELECT q.vec_id AS q_id, e.entry AS vec_id
         |  FROM (SELECT vec_id FROM hnsw_normed_t WHERE vec_id < 3) q
         |  CROSS JOIN (SELECT min(vec_id) AS entry FROM hnsw_normed_t) e),
         |${nswHopChainCtes("hseed", "hnsw_ed0sl_t",
            "hnsw_normed_t", HnswBeam0, HnswHops0, "hs")}
         |${nswServeTailSpark(s"hshop$HnswHops0", "hnsw_all_t")}""".stripMargin)
  }

  lazy val annHnswTopkSql: String = {
    val dot = (a: String, b: String) => dotD(a, b)
    val h = hDuck("CAST(vec_id AS VARCHAR)")
    val edgeCtes = Seq((0, HnswM0, "gsc", 0), (1, HnswMU, "gscu", 0),
        (2, HnswMU, "gscu", 2)).map { case (l, m, gsc, filt) =>
      s"""ed$l AS MATERIALIZED (
         |${hnswEdgesSql(filt, m, gsc, "lv")})""".stripMargin
    }.mkString(",\n")
    val upper =
      Seq.fill(HnswHopsU)(("ed2", HnswBeamU)) ++
        Seq.fill(HnswHopsU)(("ed1", HnswBeamU))
    val upperHops = upper.zipWithIndex.map { case ((ed, beam), i) =>
      s"""f${i + 1} AS MATERIALIZED (
         |${hnswHopSql(s"f$i", ed, "normed", beam, dot)})""".stripMargin
    }.mkString(",\n")
    val layer0Hops = (1 to HnswHops0).map { i =>
      val prev = if (i == 1) "s0" else s"s${i - 1}"
      s"""s$i AS MATERIALIZED (
         |${hnswHopSql(prev, "ed0", "normed", HnswBeam0, dot)})""".stripMargin
    }.mkString(",\n")
    val hops =
      s"""$upperHops,
         |s0 AS (
         |  SELECT q_id, vec_id FROM f${upper.size}
         |  UNION
         |  SELECT q.vec_id AS q_id, e.entry AS vec_id
         |  FROM (SELECT vec_id FROM normed WHERE vec_id < 3) q
         |  CROSS JOIN (SELECT min(vec_id) AS entry FROM normed) e),
         |$layer0Hops""".stripMargin
    s"""WITH alln AS MATERIALIZED (
       |  SELECT vec_id, embedding, nrm,
       |         min(vec_id) OVER (PARTITION BY embedding) AS rep_id
       |  FROM (SELECT vec_id, embedding,
       |               sqrt(${dotD("embedding", "embedding")}) AS nrm
       |        FROM embeddings)),
       |normed AS MATERIALIZED (
       |  SELECT vec_id, embedding, nrm FROM alln WHERE vec_id = rep_id),
       |lv AS MATERIALIZED (
       |  SELECT vec_id,
       |         CASE WHEN $h % 16 = 0 THEN 2
       |              WHEN $h % 4 = 0 THEN 1 ELSE 0 END AS lvl
       |  FROM normed),
       |cents AS (
       |  SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm
       |  FROM normed WHERE vec_id BETWEEN 100 AND 115),
       |memb AS (
       |  SELECT vec_id, c_id FROM (
       |    SELECT n.vec_id, c.c_id,
       |           row_number() OVER (PARTITION BY n.vec_id
       |             ORDER BY ${dotD("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) DESC,
       |                      c.c_id) AS crnk
       |    FROM normed n CROSS JOIN cents c) WHERE crnk <= 2),
       |cand AS (
       |  SELECT DISTINCT a.vec_id, b.vec_id AS nbr_id
       |  FROM memb a JOIN memb b
       |    ON a.c_id = b.c_id AND a.vec_id <> b.vec_id),
       |gsc AS MATERIALIZED (
       |  SELECT c.vec_id, c.nbr_id,
       |         CAST(round(${dotD("x.embedding", "y.embedding")}
       |               / (x.nrm * y.nrm) * 1000000, 0) AS BIGINT) AS sim_micro
       |  FROM cand c
       |  JOIN normed x ON x.vec_id = c.vec_id
       |  JOIN normed y ON y.vec_id = c.nbr_id),
       |upper_nodes AS (
       |  SELECT t.* FROM normed t
       |  JOIN lv l ON l.vec_id = t.vec_id AND l.lvl >= 1),
       |memb4 AS (
       |  SELECT vec_id, c_id FROM (
       |    SELECT n.vec_id, c.c_id,
       |           row_number() OVER (PARTITION BY n.vec_id
       |             ORDER BY ${dotD("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) DESC,
       |                      c.c_id) AS crnk
       |    FROM upper_nodes n CROSS JOIN cents c) WHERE crnk <= 4),
       |candu AS (
       |  SELECT DISTINCT a.vec_id, b.vec_id AS nbr_id
       |  FROM memb4 a JOIN memb4 b
       |    ON a.c_id = b.c_id AND a.vec_id <> b.vec_id),
       |gscu AS MATERIALIZED (
       |  SELECT c.vec_id, c.nbr_id,
       |         CAST(round(${dotD("x.embedding", "y.embedding")}
       |               / (x.nrm * y.nrm) * 1000000, 0) AS BIGINT) AS sim_micro
       |  FROM candu c
       |  JOIN normed x ON x.vec_id = c.vec_id
       |  JOIN normed y ON y.vec_id = c.nbr_id),
       |$edgeCtes,
       |f0 AS (
       |  SELECT q.vec_id AS q_id, e.entry AS vec_id
       |  FROM (SELECT vec_id FROM normed WHERE vec_id < 3) q
       |  CROSS JOIN (SELECT coalesce(
       |      (SELECT min(vec_id) FROM lv WHERE lvl >= 2),
       |      (SELECT min(vec_id) FROM lv WHERE lvl >= 1),
       |      (SELECT min(vec_id) FROM lv)) AS entry) e),
       |$hops
       |SELECT q_id, vec_id, CAST(rnk AS INT) AS rnk, sim_micro
       |FROM (SELECT q_id, vec_id, sim_micro,
       |             row_number() OVER (PARTITION BY q_id
       |               ORDER BY sim_micro DESC, vec_id) AS rnk
       |      FROM (SELECT f.q_id, a.vec_id, f.sim_micro
       |            FROM s$HnswHops0 f
       |            JOIN alln a ON a.rep_id = f.vec_id)
       |      WHERE vec_id <> q_id)
       |WHERE rnk <= 3""".stripMargin
  }

  // ── ann_ivf_trained_topk ★ + ann_kmeans_centroids ★ (r12) — the
  // PRODUCTION ROUTING PATH oracle-pinned (r11 verdict #1): IVF top-k
  // where the coarse centroids are TRAINED by Lloyd's algorithm
  // ([[graft.tools.KMeansTrainer.trainMicro]]), not picked from fixture
  // ids. The whole chain is integer-exact — vectors quantize to shifted
  // micro-units (round(x·1000) + 1024, non-negative by construction),
  // distances are BIGINT squared-L2, the centroid update is the
  // per-(c, dim) floor mean — so the DuckDB oracle REPLAYS all
  // `KmRounds` Lloyd rounds as generated CTEs (the graph_pagerank /
  // text_bpe_train discipline: the oracle re-runs the training loop,
  // and the binary hash match is a machine-checked proof that the
  // trained index, not just the final probe, is identical).
  //
  // Scale shape: per Lloyd round, the k-row centroid relation BROADCASTS
  // onto the quantized scan (N never shuffles), argmin by per-vector
  // window, ONE map-side-combined sum/count per (c, dim) with only the
  // k·d mean rows reaching the driver. The serving stage is the same
  // IVF routing join as ann_ivf_topk: posting lists shuffle once on
  // centroid id, each probe touches nprobe lists. k grows as √n at
  // production scale (the stress-proven KMeansTrainer swap); the CTE
  // replay is scale-free because the oracle mirrors whatever k the
  // builder passes.
  private val KmK = 8
  private val KmRounds = 3
  private val KmScale = 1000L
  private val KmShift = 1024L
  private val KmNprobe = 2

  private val qvSpark =
    s"transform(embedding, x -> cast(round(cast(x as double) * $KmScale) as bigint) + $KmShift)"
  private val qvDuck =
    s"list_transform(embedding, x -> CAST(round(x::DOUBLE * $KmScale) AS BIGINT) + $KmShift)"
  private def sqdistSpark(a: String, b: String) =
    s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)"
  private def sqdistDuck(a: String, b: String) =
    s"""list_reduce([CAST(0 AS BIGINT)] || list_transform(range(1, 65),
       |      i -> ($a[i] - $b[i]) * ($a[i] - $b[i])), (x, y) -> x + y)""".stripMargin

  /** The trained final-assignment relation as a pinned temp view
    * `kmt_asgf_t` (vec_id, qv, c_id, crnk, dist): trains the centroids,
    * then ranks every vector's centroids by integer distance. Shared by
    * both r12 queries. */
  private def trainedAssignView(spark: SparkSession, dir: String): Unit = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = graft.tools.KMeansTrainer.trainMicro(
      spark, emb, KmK, KmRounds, KmScale, KmShift)
    cents.createOrReplaceTempView("kmt_cents_t")
    emb.selectExpr("vec_id", s"$qvSpark AS qv")
      .pinned()
      .createOrReplaceTempView("kmt_qvecs_t")
    // Assignment is consumed by posting lists AND probe routing below —
    // pin once; the centroid side is k rows, broadcast explicitly.
    spark.sql(
      s"""SELECT /*+ BROADCAST(c) */ n.vec_id, n.qv, c.c_id,
         |       ${sqdistSpark("n.qv", "c.cent")} AS dist,
         |       row_number() OVER (PARTITION BY n.vec_id
         |         ORDER BY ${sqdistSpark("n.qv", "c.cent")}, c.c_id) AS crnk
         |FROM kmt_qvecs_t n CROSS JOIN kmt_cents_t c""".stripMargin)
      .where(s"crnk <= $KmNprobe")
      .pinned()
      .createOrReplaceTempView("kmt_asgf_t")
  }

  def annIvfTrainedTopk(spark: SparkSession, dir: String): DataFrame = {
    trainedAssignView(spark, dir)
    spark.sql(
      s"""WITH lists AS (
         |  SELECT vec_id, c_id, qv FROM kmt_asgf_t WHERE crnk = 1),
         |qprobe AS (
         |  SELECT vec_id AS q_id, c_id, qv AS q_qv
         |  FROM kmt_asgf_t WHERE vec_id < 3 AND crnk <= $KmNprobe),
         |scored AS (
         |  SELECT /*+ BROADCAST(qp) */ qp.q_id, l.vec_id, l.c_id,
         |         ${sqdistSpark("qp.q_qv", "l.qv")} AS dist
         |  FROM qprobe qp
         |  JOIN lists l ON l.c_id = qp.c_id AND l.vec_id <> qp.q_id),
         |ranked AS (
         |  SELECT q_id, vec_id, c_id, dist,
         |         row_number() OVER (PARTITION BY q_id ORDER BY dist, vec_id) AS rnk
         |  FROM scored)
         |SELECT q_id, vec_id, CAST(c_id AS BIGINT) AS centroid_id,
         |       CAST(rnk AS INT) AS rnk, CAST(dist AS BIGINT) AS dist
         |FROM ranked WHERE rnk <= 3""".stripMargin)
  }

  def annKmeansCentroids(spark: SparkSession, dir: String): DataFrame = {
    trainedAssignView(spark, dir)
    spark.sql(
      s"""WITH members AS (SELECT c_id, dist FROM kmt_asgf_t WHERE crnk = 1),
         |sizes AS (
         |  SELECT c_id, CAST(count(*) AS BIGINT) AS cluster_size,
         |         CAST(sum(dist) AS BIGINT) AS inertia
         |  FROM members GROUP BY c_id),
         |cdims AS (
         |  SELECT c_id, posexplode(cent) AS (dim0, cval) FROM kmt_cents_t)
         |SELECT c.c_id, CAST(c.dim0 + 1 AS INT) AS dim,
         |       CAST(c.cval AS BIGINT) AS cval,
         |       coalesce(s.cluster_size, CAST(0 AS BIGINT)) AS cluster_size,
         |       coalesce(s.inertia, CAST(0 AS BIGINT)) AS inertia
         |FROM cdims c LEFT JOIN sizes s ON s.c_id = c.c_id""".stripMargin)
  }

  /** The shared Lloyd-replay CTE chain (qvecs → cents0 → … →
    * cents`KmRounds` → asgf), generated once for both oracles. */
  private val kmLloydCtes: String = {
    val rounds = (1 to KmRounds).map { i =>
      s"""asg$i AS (
         |  SELECT vec_id, qv, c_id FROM (
         |    SELECT n.vec_id, n.qv, c.c_id,
         |           row_number() OVER (PARTITION BY n.vec_id
         |             ORDER BY ${sqdistDuck("n.qv", "c.cent")}, c.c_id) AS rnk
         |    FROM qvecs n CROSS JOIN cents${i - 1} c) WHERE rnk = 1),
         |upd$i AS (
         |  SELECT c_id, list(m ORDER BY dim) AS cent FROM (
         |    SELECT c_id, dim, CAST(sum(x) // count(*) AS BIGINT) AS m
         |    FROM (SELECT c_id, unnest(qv) AS x,
         |                 generate_subscripts(qv, 1) AS dim FROM asg$i)
         |    GROUP BY c_id, dim)
         |  GROUP BY c_id),
         |cents$i AS (
         |  SELECT p.c_id, COALESCE(u.cent, p.cent) AS cent
         |  FROM cents${i - 1} p LEFT JOIN upd$i u ON u.c_id = p.c_id)""".stripMargin
    }.mkString(",\n")
    s"""qvecs AS (SELECT vec_id, $qvDuck AS qv FROM embeddings),
       |cents0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS c_id,
       |         qv AS cent
       |  FROM (SELECT vec_id, qv FROM qvecs ORDER BY vec_id LIMIT $KmK)),
       |$rounds,
       |asgf AS (
       |  SELECT n.vec_id, n.qv, c.c_id,
       |         ${sqdistDuck("n.qv", "c.cent")} AS dist,
       |         row_number() OVER (PARTITION BY n.vec_id
       |           ORDER BY ${sqdistDuck("n.qv", "c.cent")}, c.c_id) AS crnk
       |  FROM qvecs n CROSS JOIN cents$KmRounds c)""".stripMargin
  }

  val annIvfTrainedTopkSql: String =
    s"""WITH $kmLloydCtes,
       |lists AS (SELECT vec_id, c_id, qv FROM asgf WHERE crnk = 1),
       |qprobe AS (
       |  SELECT vec_id AS q_id, c_id, qv AS q_qv
       |  FROM asgf WHERE vec_id < 3 AND crnk <= $KmNprobe),
       |scored AS (
       |  SELECT qp.q_id, l.vec_id, l.c_id,
       |         ${sqdistDuck("qp.q_qv", "l.qv")} AS dist
       |  FROM qprobe qp
       |  JOIN lists l ON l.c_id = qp.c_id AND l.vec_id <> qp.q_id),
       |ranked AS (
       |  SELECT q_id, vec_id, c_id, dist,
       |         row_number() OVER (PARTITION BY q_id ORDER BY dist, vec_id) AS rnk
       |  FROM scored)
       |SELECT q_id, vec_id, CAST(c_id AS BIGINT) AS centroid_id,
       |       CAST(rnk AS INT) AS rnk, CAST(dist AS BIGINT) AS dist
       |FROM ranked WHERE rnk <= 3""".stripMargin

  val annKmeansCentroidsSql: String =
    s"""WITH $kmLloydCtes,
       |members AS (SELECT c_id, dist FROM asgf WHERE crnk = 1),
       |sizes AS (
       |  SELECT c_id, CAST(count(*) AS BIGINT) AS cluster_size,
       |         CAST(sum(dist) AS BIGINT) AS inertia
       |  FROM members GROUP BY c_id),
       |cdims AS (
       |  SELECT c_id, generate_subscripts(cent, 1) AS dim, unnest(cent) AS cval
       |  FROM cents$KmRounds)
       |SELECT c.c_id, CAST(c.dim AS INT) AS dim, CAST(c.cval AS BIGINT) AS cval,
       |       COALESCE(s.cluster_size, CAST(0 AS BIGINT)) AS cluster_size,
       |       COALESCE(s.inertia, CAST(0 AS BIGINT)) AS inertia
       |FROM cdims c LEFT JOIN sizes s ON s.c_id = c.c_id""".stripMargin

  // ── ann_filtered_topk ★ (r12) — FILTERED vector search: exact cosine
  // top-5 restricted to candidates sharing the probe's label — the
  // metadata-predicate + ANN combination that is production vector
  // search's hard problem (filtered HNSW / partition-pruned IVF). This
  // entry is the PRE-FILTER baseline: the predicate prunes the
  // candidate stream BEFORE any distance work (at production, a
  // label-partitioned index makes that prune a partition prune), and
  // the output carries the per-probe filtered candidate count — the
  // selectivity number that decides pre- vs post-filter serving. The
  // post-filter alternative (over-fetch unfiltered top-k', then drop)
  // loses recall exactly when selectivity is low; the pre-filter
  // baseline is what it is measured against.
  //
  // Engine-exactness and shape: ann_bruteforce's discipline verbatim —
  // per-row DOUBLE cosine (never a float aggregation), vec_id
  // tie-breaks, the fixed 3-probe broadcast; the label equality rides
  // the join condition, so Catalyst prunes before the dot product.
  def annFilteredTopk(spark: SparkSession, dir: String): DataFrame = {
    viewEmb(spark, dir)
    graft.expr.GraftFunctions.register(spark)
    spark.sql(
      s"""SELECT vec_id, label, embedding,
         |       sqrt(${dotS("embedding", "embedding")}) AS nrm
         |FROM embeddings""".stripMargin)
      .pinned()
      .createOrReplaceTempView("flt_normed_t")
    spark.sql(
      s"""WITH queries AS (SELECT * FROM flt_normed_t WHERE vec_id < 3),
         |scored AS (
         |  SELECT /*+ BROADCAST(q) */ q.vec_id AS q_id, q.label,
         |         c.vec_id AS vec_id,
         |         ${dotS("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cs
         |  FROM queries q JOIN flt_normed_t c
         |    ON c.label = q.label AND q.vec_id <> c.vec_id),
         |counted AS (
         |  SELECT q_id, CAST(count(*) AS BIGINT) AS n_candidates
         |  FROM scored GROUP BY q_id),
         |ranked AS (
         |  SELECT q_id, label, vec_id, cs,
         |         row_number() OVER (PARTITION BY q_id
         |           ORDER BY cs DESC, vec_id) AS rnk
         |  FROM scored)
         |SELECT r.q_id, CAST(r.label AS INT) AS label, r.vec_id,
         |       CAST(r.rnk AS INT) AS rnk, r.cs AS cos_sim, c.n_candidates
         |FROM ranked r JOIN counted c ON c.q_id = r.q_id
         |WHERE r.rnk <= 5""".stripMargin)
  }

  val annFilteredTopkSql: String =
    s"""WITH normed AS (
       |  SELECT vec_id, label, embedding,
       |         sqrt(list_reduce([0.0] || list_transform(embedding,
       |           x -> x::DOUBLE * x::DOUBLE), (a, b) -> a + b)) AS nrm
       |  FROM embeddings),
       |queries AS (SELECT * FROM normed WHERE vec_id < 3),
       |scored AS (
       |  SELECT q.vec_id AS q_id, q.label, c.vec_id AS vec_id,
       |         ${dotD("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cs
       |  FROM queries q JOIN normed c
       |    ON c.label = q.label AND q.vec_id <> c.vec_id),
       |counted AS (
       |  SELECT q_id, CAST(count(*) AS BIGINT) AS n_candidates
       |  FROM scored GROUP BY q_id),
       |ranked AS (
       |  SELECT q_id, label, vec_id, cs,
       |         row_number() OVER (PARTITION BY q_id
       |           ORDER BY cs DESC, vec_id) AS rnk
       |  FROM scored)
       |SELECT r.q_id, CAST(r.label AS INT) AS label, r.vec_id,
       |       CAST(r.rnk AS INT) AS rnk, r.cs AS cos_sim, c.n_candidates
       |FROM ranked r JOIN counted c ON c.q_id = r.q_id
       |WHERE r.rnk <= 5""".stripMargin

  // ── emb_mrl_recall ★ (r12) — MATRYOSHKA truncation evaluation: exact
  // cosine top-5 retrieval re-run at nested dimension budgets (first 8 /
  // 16 / 32 / 64 dims) and scored against the full-dimension ranking —
  // recall@5 per budget in integer micro-units. The report an
  // MRL-trained embedding deployment (Kusupati et al. 2022) reads to
  // pick its serving dimension: how much of the full ranking survives
  // an 8× cheaper index. The 64-dim row is the identity sanity
  // (recall = 1.0 by construction).
  //
  // Engine-exactness: per-budget dots and norms are left-to-right
  // DOUBLE folds over IDENTICAL prefixes in both engines (the
  // ann_bruteforce discipline — per-row arithmetic, never a float
  // aggregation); ranks break ties by vec_id; the recall counts are
  // BIGINT.
  //
  // Scale shape: one pinned norm pass (all four prefix norms in one
  // scan), then per budget the bruteforce shape — fixed 3-probe
  // broadcast against the candidate stream, map-side; the report joins
  // the 15-row full-dim baseline. Nothing new shuffles.
  val MrlDims = Seq(8, 16, 32, 64)

  def embMrlRecall(spark: SparkSession, dir: String): DataFrame = {
    viewEmb(spark, dir)
    graft.expr.GraftFunctions.register(spark)
    val normCols = MrlDims.map(d =>
      s"sqrt(float_dot(slice(embedding, 1, $d), slice(embedding, 1, $d))) AS n$d")
      .mkString(",\n       ")
    spark.sql(
      s"""SELECT vec_id, embedding,
         |       $normCols
         |FROM embeddings""".stripMargin)
      .pinned()
      .createOrReplaceTempView("mrl_normed_t")
    val perDim = MrlDims.map { d =>
      s"""SELECT /*+ BROADCAST(q) */ $d AS dim_budget,
         |       q.vec_id AS q_id, c.vec_id AS vec_id,
         |       float_dot(slice(q.embedding, 1, $d), slice(c.embedding, 1, $d))
         |         / (q.n$d * c.n$d) AS cs
         |FROM (SELECT * FROM mrl_normed_t WHERE vec_id < 3) q
         |JOIN mrl_normed_t c ON q.vec_id <> c.vec_id""".stripMargin
    }.mkString("\nUNION ALL\n")
    spark.sql(
      s"""WITH scored AS (
         |$perDim
         |),
         |ranked AS (
         |  SELECT dim_budget, q_id, vec_id,
         |         row_number() OVER (PARTITION BY dim_budget, q_id
         |           ORDER BY cs DESC, vec_id) AS rnk
         |  FROM scored),
         |cut AS (SELECT * FROM ranked WHERE rnk <= 5),
         |full5 AS (SELECT q_id, vec_id FROM cut WHERE dim_budget = 64)
         |SELECT c.dim_budget,
         |       CAST(count(*) AS BIGINT) AS n_returned,
         |       CAST(sum(CASE WHEN f.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |         AS BIGINT) AS hits,
         |       CAST(sum(CASE WHEN f.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |         * 1000000 div 15 AS BIGINT) AS recall_micro
         |FROM cut c
         |LEFT JOIN full5 f ON f.q_id = c.q_id AND f.vec_id = c.vec_id
         |GROUP BY c.dim_budget""".stripMargin)
  }

  val embMrlRecallSql: String = {
    val normCols = MrlDims.map(d =>
      s"""sqrt(list_reduce([0.0] || list_transform(range(1, ${d + 1}),
         |    i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE),
         |    (x, y) -> x + y)) AS n$d""".stripMargin)
      .mkString(",\n")
    val perDim = MrlDims.map { d =>
      s"""SELECT $d AS dim_budget, q.vec_id AS q_id, c.vec_id AS vec_id,
         |       ${dotD("q.embedding", "c.embedding", s"range(1, ${d + 1})")}
         |         / (q.n$d * c.n$d) AS cs
         |FROM (SELECT * FROM mrl_normed WHERE vec_id < 3) q
         |JOIN mrl_normed c ON q.vec_id <> c.vec_id""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH mrl_normed AS MATERIALIZED (
       |  SELECT vec_id, embedding,
       |$normCols
       |  FROM embeddings),
       |scored AS (
       |$perDim
       |),
       |ranked AS (
       |  SELECT dim_budget, q_id, vec_id,
       |         row_number() OVER (PARTITION BY dim_budget, q_id
       |           ORDER BY cs DESC, vec_id) AS rnk
       |  FROM scored),
       |cut AS (SELECT * FROM ranked WHERE rnk <= 5),
       |full5 AS (SELECT q_id, vec_id FROM cut WHERE dim_budget = 64)
       |SELECT c.dim_budget,
       |       CAST(count(*) AS BIGINT) AS n_returned,
       |       CAST(sum(CASE WHEN f.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |         AS BIGINT) AS hits,
       |       CAST(sum(CASE WHEN f.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |         * 1000000 // 15 AS BIGINT) AS recall_micro
       |FROM cut c
       |LEFT JOIN full5 f ON f.q_id = c.q_id AND f.vec_id = c.vec_id
       |GROUP BY c.dim_budget""".stripMargin
  }

  /** The report-evaluated methods' catalog entries, routed through the
    * served-output memo — the standalone query and the report row are
    * THE SAME materialized relation within a session pass. */
  private val servedFns: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_bruteforce_topk" -> (annBruteforce _),
    "ann_lsh_topk" -> (annLshTopk _),
    "ann_ivf_topk" -> (annIvfTopk _),
    "ann_pq_adc_topk" -> (annPqAdcTopk _),
    "ann_pq_rerank_topk" -> (annPqRerankTopk _),
    "ann_hamming_topk" -> (annHammingTopk _),
    "ann_ivfpq_topk" -> (annIvfpqTopk _),
    "ann_sq_topk" -> (annSqTopk _),
    "ann_nsw_topk" -> (annNswTopk _),
    "ann_hnsw_topk" -> (annHnswTopk _),
    "ann_nsw_diverse" -> (annNswDiverse _),
    "ann_nsw_bidir" -> (annNswBidir _))

  private def servedCatalog(name: String): (SparkSession, String) => DataFrame =
    served(name, servedFns(name)) _

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    servedFns.map { case (n, _) => n -> servedCatalog(n) } ++ Map(
    "ann_ivf_trained_topk" -> (annIvfTrainedTopk _),
    "ann_kmeans_centroids" -> (annKmeansCentroids _),
    "emb_mrl_recall" -> (embMrlRecall _),
    "ann_filtered_topk" -> (annFilteredTopk _),
    "emb_mmr_rerank" -> (embMmrRerank _),
    "ann_recall_report" -> (annRecallReport _),
    "emb_binarize" -> (embBinarize _),
    "ann_knn_graph" -> (annKnnGraph _),
    "emb_rp_project" -> (embRpProject _),
    "emb_pq_encode" -> (embPqEncode _),
    "emb_outlier" -> (embOutlier _),
    "ann_range_search" -> (annRangeSearch _),
    "emb_centroid_by_label" -> (embCentroidByLabel _),
    "emb_normalize" -> (embNormalize _),
    "emb_quantize" -> (embQuantize _))

  val oracle: Map[String, String] = Map(
    "ann_nsw_topk" -> annNswTopkSql,
    "ann_hnsw_topk" -> annHnswTopkSql,
    "ann_nsw_diverse" -> annNswDiverseSql,
    "ann_nsw_bidir" -> annNswBidirSql,
    "ann_ivf_trained_topk" -> annIvfTrainedTopkSql,
    "ann_kmeans_centroids" -> annKmeansCentroidsSql,
    "emb_mrl_recall" -> embMrlRecallSql,
    "ann_filtered_topk" -> annFilteredTopkSql,
    "emb_mmr_rerank" -> embMmrRerankSql,
    "ann_sq_topk" -> annSqTopkSql,
    "ann_recall_report" -> annRecallReportSql,
    "emb_binarize" -> embBinarizeSql,
    "ann_hamming_topk" -> annHammingTopkSql,
    "ann_ivfpq_topk" -> annIvfpqTopkSql,
    "ann_knn_graph" -> annKnnGraphSql,
    "emb_rp_project" -> embRpProjectSql,
    "ann_pq_rerank_topk" -> annPqRerankTopkSql,
    "emb_pq_encode" -> embPqEncodeSql,
    "ann_pq_adc_topk" -> annPqAdcTopkSql,
    "emb_outlier" -> embOutlierSql,
    "ann_bruteforce_topk" -> annBruteforceSql,
    "ann_lsh_topk" -> annLshTopkSql,
    "ann_ivf_topk" -> annIvfTopkSql,
    "ann_range_search" -> annRangeSearchSql,
    "emb_centroid_by_label" -> embCentroidByLabelSql,
    "emb_normalize" -> embNormalizeSql,
    "emb_quantize" -> embQuantizeSql)
}
