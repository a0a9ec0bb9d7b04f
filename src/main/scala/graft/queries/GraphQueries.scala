package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Pin.PinSyntax

/** Iterative graph analytics over the relational fixture: PageRank on the
  * customer↔supplier bipartite graph induced by orders⋈lineitem (edge =
  * "this customer bought from this supplier"). The operator family the
  * catalog was missing: DRIVER-COORDINATED ITERATION over a distributed
  * edge relation — the Pregel-in-DataFrames shape (GraphX/GraphFrames'
  * aggregateMessages) every web-graph / link-spam / influence pipeline
  * runs at 100 TB.
  *
  * Engine-exactness: ranks live in integer micro-units (SCALE = 1e12).
  * Damping 0.85 is the exact rational 17/20: each neighbor contribution
  * is floor((17·r) / (20·deg)) and the teleport base is
  * floor(3·floor(SCALE/n) / 20) — BIGINT floor arithmetic both engines
  * compute bit-identically (no doubles anywhere), so five iterations of
  * the fixed-point pass the binary oracle gate. The DuckDB oracle unrolls
  * the same five rounds as a generated CTE chain (the text_bpe_train
  * discipline: the oracle RERUNS the iteration, not just the result).
  *
  * Scale shape (100 TB): per iteration, ONE equi-join (ranks ⋈ edges on
  * src — at production the edge table is bucketed by src so the join is
  * co-located and only the rank vector shuffles) and ONE map-side-combined
  * sum by dst. Work per iteration is O(|E|/p) per executor with no
  * all-pairs stage; the iteration count is a constant. The edge+degree
  * relation is materialized once (localCheckpoint) and reused by all
  * rounds — at cluster scale this is the cached/bucketed edge RDD every
  * Pregel implementation keeps resident. The only driver-side value is
  * the 1-row node count (bounded metadata, the GlobalOrder precedent).
  */
object GraphQueries {

  /** Rank micro-units: r sums to ~SCALE across nodes each round. */
  val Scale = 1000000000000L
  /** Fixed iteration count (constant; convergence is geometric in 0.85). */
  val Iterations = 5

  /** The distinct customer↔supplier bipartite pair relation (customer
    * c ↦ 2c, supplier s ↦ 2s+1 — disjoint keys), memoized/SHARED-pinned
    * per (session, dir): pagerank, kcore, bfs and hits all derive their
    * edge relations from this ONE orders⋈lineitem build — r15, previously
    * each of the four re-ran the join+distinct from the parquet scans.
    * hits' directed (custkey, suppkey) edge set is the same relation
    * through the bijective decode (src div 2, dst div 2). */
  private[graft] def bipartiteHalf(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SessionMemo.cached(spark, s"bipartitehalf/$dir") {
      val orders = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"))
      val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_suppkey"))
      graft.operators.PinnedStages.sharedCheckpoint(
        orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
          .distinct())
    }

  /** Both-direction bipartite edges, hash-partitioned + sorted on the
    * probe key `dst` — the Pregel edge-resident layout kcore and bfs
    * share (identical relation, previously built twice per pass). */
  private[graft] def bipartiteEdgesByDst(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SessionMemo.cached(spark, s"bipartiteedgesdst/$dir") {
      val half = bipartiteHalf(spark, dir)
      graft.operators.PinnedStages.sharedCheckpointPartitioned(
        half.union(half.select(col("dst").as("src"), col("src").as("dst")))
          .repartition(col("dst")).sortWithinPartitions("dst"))
    }

  def graphPagerank(spark: SparkSession, dir: String): DataFrame = {
    // The distinct pair relation comes from the family-shared memo; the
    // degree table is CACHED: r0, the final join, and the node count all
    // read it — uncached, each consumer re-runs the aggregation.
    val half = bipartiteHalf(spark, dir)
    val edges = half.union(half.select(col("dst").as("src"), col("src").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d")).persist()
    // (half is a shared checkpoint — no per-query persist needed.)
    // One materialization, reused by all rounds — CACHED (not
    // checkpointed) hash-partitioned + sorted on the join key, so the
    // InMemoryRelation advertises its partitioning/ordering and every
    // iteration's sort-merge join exchanges and sorts ONLY the rank
    // vector (per-node, small), never the edge relation. This is the
    // GraphX/Pregel edge-resident layout: edges stay put, messages move.
    val edgeDeg = edges.join(deg, "src")
      .select(col("src"), col("dst"), col("d"))
      .repartition(col("src")).sortWithinPartitions("src")
      .persist()
    val n = deg.count() // bounded driver-side metadata; materializes the caches
    val r0 = Scale / n
    val base = (3L * r0) / 20L

    var ranks = deg.select(col("src").as("node"), lit(r0).as("r"))
    for (_ <- 1 to Iterations) {
      ranks = edgeDeg
        .join(ranks, edgeDeg("src") === ranks("node"))
        .groupBy(col("dst"))
        .agg(sum(expr("(17 * r) div (20 * d)")).as("contrib"))
        .select(col("dst").as("node"), (lit(base) + col("contrib")).as("r"))
    }
    ranks
      .join(deg, ranks("node") === deg("src"))
      .select(
        when(col("node") % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("node_type"),
        expr("node div 2").as("node_id"),
        col("d").as("degree"),
        col("r").as("rank_micro"))
  }

  val graphPagerankSql: String = {
    val rounds = (1 to Iterations).map { i =>
      s"""r$i AS (
         |  SELECT e.dst AS node,
         |         b.base + sum((17 * r.r) // (20 * e.d)) AS r
         |  FROM edge_deg e JOIN r${i - 1} r ON e.src = r.node
         |  CROSS JOIN consts b
         |  GROUP BY e.dst, b.base)""".stripMargin
    }.mkString(",\n")
    s"""WITH half AS (
       |  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |edges AS (
       |  SELECT src, dst FROM half
       |  UNION ALL
       |  SELECT dst AS src, src AS dst FROM half),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src),
       |edge_deg AS (
       |  SELECT e.src, e.dst, d.d FROM edges e JOIN deg d ON e.src = d.src),
       |consts AS (
       |  SELECT CAST($Scale // count(*) AS BIGINT) AS r0,
       |         CAST((3 * ($Scale // count(*))) // 20 AS BIGINT) AS base
       |  FROM deg),
       |r0 AS (SELECT d.src AS node, c.r0 AS r FROM deg d CROSS JOIN consts c),
       |$rounds
       |SELECT CASE WHEN r.node % 2 = 0 THEN 'customer' ELSE 'supplier' END
       |         AS node_type,
       |       CAST(r.node // 2 AS BIGINT) AS node_id,
       |       d.d AS degree,
       |       CAST(r.r AS BIGINT) AS rank_micro
       |FROM r$Iterations r JOIN deg d ON r.node = d.src""".stripMargin
  }

  // ── graph_triangles ★ (r11) — degree-oriented triangle counting ──────
  //
  // The second graph-analytics family member: exact triangle count +
  // global clustering coefficient over the part CO-PURCHASE graph
  // (edge = two parts in the same order; per-order fanout bounded by
  // basket size, ≤ C(7,2) = 21 pairs/order in TPC-H shape). The
  // community-structure / spam-detection primitive every web-graph
  // pipeline ships next to PageRank.
  //
  // The scale trick is the ORIENTATION (Chiba–Nishizeki / Schank): order
  // nodes by (degree, id) — packed into one BIGINT sort key, collision-
  // free for id < 1e8 — and keep each edge only low→high. Every triangle
  // then has EXACTLY one source (its ≺-least corner), so the count needs
  // no /3 or /6 dedup, and the wedge join's per-node work is outdeg²
  // where outdeg ≤ O(√m) BY CONSTRUCTION — the O(m^1.5) bound that makes
  // exact triangle counting feasible at web scale. All three stages are
  // equi-joins shuffling on node keys; nothing is all-pairs.
  //
  // Engine-exact: counts and the floor-div clustering coefficient
  // (3T·1e6 div Σ C(d,2)) are all BIGINT arithmetic.
  /** The grouped co-purchase pair relation (p1 < p2, with the shared
    * order count), memoized/SHARED-pinned per (session, dir) — r15: the
    * SAME self-join explode + pair aggregation was previously built three
    * times per pass (graph_triangles' distinct pairs, the link-predict
    * family's edge set, and cc/lpa's thresholded strong-tie set). The
    * distinct pair relation is exactly this relation's group keys; the
    * strong-tie set is the n_orders ≥ [[CcMinOrders]] filter. Grouping
    * costs the same aggregation the DISTINCT paid. */
  private[graft] def coPurchaseCounts(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SessionMemo.cached(spark, s"copurchase/$dir") {
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"))
        .repartition(spark.sparkContext.defaultParallelism)
        .createOrReplaceTempView("copurchase_li_t")
      // Plain pin (AQE stays on): this build has the catalog's biggest
      // self-join inside — an AQE-off scope here made the whole
      // explode+aggregate plan statically (measured: graph_cc, its first
      // payer, 3.3 → 8.6 s), which dwarfs the one anti-join build-side
      // exchange that preserving hash(p1, p2) would have saved.
      graft.operators.PinnedStages.sharedCheckpoint(spark.sql(
        """SELECT a.l_partkey AS p1, b.l_partkey AS p2,
          |       CAST(count(*) AS BIGINT) AS n_orders
          |FROM copurchase_li_t a JOIN copurchase_li_t b
          |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          |GROUP BY a.l_partkey, b.l_partkey""".stripMargin))
    }

  /** cc/lpa's strong-tie edge set (support ≥ [[CcMinOrders]]), both
    * directions, hash-partitioned + sorted on the probe key — identical
    * relation previously built by BOTH graph_cc and graph_lpa. */
  private[graft] def strongTieEdges(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SessionMemo.cached(spark, s"strongtie/$dir") {
      val half = coPurchaseCounts(spark, dir)
        .where(col("n_orders") >= CcMinOrders)
        .select(col("p1"), col("p2"))
      graft.operators.PinnedStages.sharedCheckpointPartitioned(
        half.union(half.select(col("p2").as("p1"), col("p1").as("p2")))
          .select(col("p1").as("src"), col("p2").as("dst"))
          .repartition(col("dst")).sortWithinPartitions("dst"))
    }

  def graphTriangles(spark: SparkSession, dir: String): DataFrame = {
    // The distinct co-purchase edge relation (= the shared grouped
    // relation's keys) feeds degree + orientation (and through
    // `oriented`, three join legs) straight from the family checkpoint.
    coPurchaseCounts(spark, dir)
      .select(col("p1"), col("p2"))
      .createOrReplaceTempView("tri_pairs_t")
    // The (degree, id) sort key per node — 20k rows, consumed by BOTH
    // legs of the orientation join: pin once.
    val ork = spark.sql(
      """SELECT p, d, d * 100000000 + p AS ok FROM
        |  (SELECT p, CAST(count(*) AS BIGINT) AS d FROM
        |     (SELECT p1 AS p FROM tri_pairs_t
        |      UNION ALL SELECT p2 AS p FROM tri_pairs_t)
        |   GROUP BY p)""".stripMargin)
      .pinned()
    // The 1e8 packing is collision-free ONLY for ids < 1e8 — ENFORCED,
    // not assumed (the dd_span_rewrite advisory's lesson: a silent
    // collision corrupts counts identically in places no oracle can
    // see). Bigger graphs re-pack with a wider multiplier or a struct
    // key; failing loudly here is the contract.
    val maxId = ork.agg(max(col("p"))).head.getLong(0)
    require(maxId < 100000000L,
      s"graph_triangles: node id $maxId >= 1e8 breaks the packed sort key; " +
        "widen the multiplier for this id space")
    ork.createOrReplaceTempView("tri_ork_t")
    // Oriented edges carry the closure probe key PACKED into one BIGINT
    // (edge_key = src·1e8 + dst): the wedge-closure join then runs on a
    // single long column instead of a two-column composite.
    spark.sql(
      """SELECT CASE WHEN o1.ok < o2.ok THEN pr.p1 ELSE pr.p2 END AS src,
        |       CASE WHEN o1.ok < o2.ok THEN pr.p2 ELSE pr.p1 END AS dst,
        |       CASE WHEN o1.ok < o2.ok THEN o2.ok ELSE o1.ok END AS dst_ok,
        |       CASE WHEN o1.ok < o2.ok THEN pr.p1 * 100000000 + pr.p2
        |            ELSE pr.p2 * 100000000 + pr.p1 END AS edge_key
        |FROM tri_pairs_t pr
        |JOIN tri_ork_t o1 ON o1.p = pr.p1
        |JOIN tri_ork_t o2 ON o2.p = pr.p2""".stripMargin)
      .pinned()
      .createOrReplaceTempView("tri_oriented_t")
    // The wedge stream (Σ C(outdeg, 2) rows — the O(m^1.5) volume the
    // algorithm inherently ships) closes against the edge set via a
    // SHUFFLE_HASH probe: hash-build on the m-row edge side, STREAM the
    // wedges — a sort-merge here would sort the wedge stream, by far the
    // largest relation in the plan, for no benefit.
    spark.sql(
      """WITH tri AS (
        |  SELECT /*+ SHUFFLE_HASH(e3) */
        |         CAST(count(*) AS BIGINT) AS n_triangles
        |  FROM (SELECT e1.dst * 100000000 + e2.dst AS wedge_key
        |        FROM tri_oriented_t e1
        |        JOIN tri_oriented_t e2
        |          ON e1.src = e2.src AND e1.dst_ok < e2.dst_ok) w
        |  JOIN (SELECT edge_key FROM tri_oriented_t) e3
        |    ON w.wedge_key = e3.edge_key),
        |wedges AS (
        |  SELECT CAST(sum(d * (d - 1) div 2) AS BIGINT) AS n_wedges
        |  FROM tri_ork_t)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM tri_ork_t) AS n_nodes,
        |       (SELECT CAST(count(*) AS BIGINT) FROM tri_pairs_t) AS n_edges,
        |       (SELECT max(d) FROM tri_ork_t) AS max_degree,
        |       w.n_wedges, t.n_triangles,
        |       CAST(3 * t.n_triangles * 1000000 div w.n_wedges AS BIGINT)
        |         AS clustering_micro
        |FROM tri t CROSS JOIN wedges w""".stripMargin)
  }

  val graphTrianglesSql: String =
    """WITH pairs AS (
      |  SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |deg AS (
      |  SELECT p, CAST(count(*) AS BIGINT) AS d FROM (
      |    SELECT p1 AS p FROM pairs UNION ALL SELECT p2 AS p FROM pairs)
      |  GROUP BY p),
      |ork AS (SELECT p, d, d * 100000000 + p AS ok FROM deg),
      |oriented AS (
      |  SELECT CASE WHEN o1.ok < o2.ok THEN pr.p1 ELSE pr.p2 END AS src,
      |         CASE WHEN o1.ok < o2.ok THEN pr.p2 ELSE pr.p1 END AS dst,
      |         CASE WHEN o1.ok < o2.ok THEN o2.ok ELSE o1.ok END AS dst_ok
      |  FROM pairs pr JOIN ork o1 ON o1.p = pr.p1 JOIN ork o2 ON o2.p = pr.p2),
      |tri AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_triangles
      |  FROM oriented e1
      |  JOIN oriented e2 ON e1.src = e2.src AND e1.dst_ok < e2.dst_ok
      |  JOIN oriented e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
      |wedges AS (
      |  SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
      |       (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_edges,
      |       (SELECT max(d) FROM deg) AS max_degree,
      |       w.n_wedges, t.n_triangles,
      |       CAST(3 * t.n_triangles * 1000000 // w.n_wedges AS BIGINT)
      |         AS clustering_micro
      |FROM tri t CROSS JOIN wedges w""".stripMargin

  // ── graph_kcore ★ (r12) — full k-core decomposition via the h-index
  // fixpoint (Lü et al. 2016): init h⁰(v) = deg(v); each round
  // h(v) ← H({h(u) : u ∈ N(v)}) where H is the h-index. The operator
  // converges monotonically DOWN to the coreness of every node — the
  // density/influence decomposition (spam cores, community nuclei,
  // engagement tiers) every web-graph pipeline ships next to PageRank
  // and triangles. Graph: the customer↔supplier bipartite relation
  // (pagerank's node encoding c↦2c, s↦2s+1), whose h-operator converges
  // in 2–6 rounds across sf0.001–sf0.1 (probed); [[KcoreRounds]] = 12
  // gives ≥2× margin and the final round is REQUIRED to be a fixpoint —
  // a loud failure, never silently unconverged labels (the
  // text_spell_cluster discipline).
  //
  // Engine-exactness: pure BIGINT arithmetic. The per-round h-index is
  // computed WITHOUT sorting neighbor lists: h = max over distinct
  // neighbor values t of min(t, |{u : h(u) ≥ t}|), realized as a
  // (node, value)-histogram aggregation + a per-node cumulative count
  // over DISTINCT values (tie-free by construction, so the default
  // RANGE window frame is identical in both engines). The DuckDB oracle
  // REPLAYS all 12 rounds as generated CTEs (the pagerank/bpe/kmeans
  // discipline).
  //
  // Scale shape (100 TB): the edge relation is materialized ONCE,
  // hash-partitioned + sorted on the probe key (the Pregel edge-resident
  // layout — only the per-node h vector shuffles per round); the
  // histogram groupBy (node, hv) is map-side combined, so the window's
  // input is ≤ min(deg, max_h) rows per node, NOT the raw neighbor
  // stream; the cumulative window is partitioned per node (no global
  // sort). Work per round is O(|E|/p) per executor; the round count is
  // a small constant with a machine-checked fixpoint.
  /** Fixed h-operator rounds; the last round must be a fixpoint. */
  val KcoreRounds = 12

  def graphKcore(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Family-shared edge relation, checkpointed hash-partitioned on the
    // probe key `dst` (partitioning survives the pin): every round's
    // join exchanges ONLY the h vector (the graph_pagerank layout).
    val edges = bipartiteEdgesByDst(spark, dir)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d")).persist()

    def step(prev: DataFrame): DataFrame = {
      val hist = edges.join(prev, edges("dst") === prev("node"))
        .groupBy(edges("src").as("node"), col("h").as("hv"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("node").orderBy(col("hv").desc)
      hist.select(col("node"), col("hv"), sum(col("c")).over(w).as("cum"))
        .groupBy("node")
        .agg(max(least(col("hv"), col("cum"))).as("h"))
    }

    // Pin each round (the per-node h vector is small) and STOP at the
    // observed fixpoint: once h stops changing, every further application
    // is the identity, so the engine's early answer is provably the
    // oracle's fixed-[[KcoreRounds]]-round answer — half the rounds on
    // the fixture (fixpoint at 2–6 across SFs). [[KcoreRounds]] stays
    // the REQUIRED bound: hitting it still changing fails loudly.
    var h = deg.select(col("src").as("node"), col("d").as("h")).pinned()
    var changed = -1L
    var round = 0
    while (changed != 0L && round < KcoreRounds) {
      // Fixpoint count as an observe() on the round's own pinned pass
      // (r15; was a separate join+count job per round). h is monotone
      // non-increasing and every node keeps a row, so the inner join
      // the old count used is exactly this join.
      val obs = new org.apache.spark.sql.Observation()
      val next = step(h)
        .join(h.select(col("node"), col("h").as("old")), "node")
        .observe(obs, count(when(col("h") =!= col("old"), 1)).as("changed"))
        .select(col("node"), col("h"))
        .pinned()
      changed = obs.get("changed").asInstanceOf[Long]
      h = next
      round += 1
    }
    require(changed == 0,
      s"graph_kcore: h-operator not a fixpoint after $KcoreRounds rounds " +
        s"($changed nodes still changing) — raise KcoreRounds for this graph")
    h.join(deg, h("node") === deg("src"))
      .select(
        when(col("node") % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("node_type"),
        expr("node div 2").as("node_id"),
        col("d").as("degree"),
        col("h").as("coreness"))
  }

  val graphKcoreSql: String = {
    val rounds = (1 to KcoreRounds).map { i =>
      s"""h$i AS (
         |  SELECT node, CAST(max(least(hv, cum)) AS BIGINT) AS h
         |  FROM (
         |    SELECT node, hv,
         |           sum(c) OVER (PARTITION BY node ORDER BY hv DESC) AS cum
         |    FROM (
         |      SELECT e.src AS node, p.h AS hv, CAST(count(*) AS BIGINT) AS c
         |      FROM edges e JOIN h${i - 1} p ON p.node = e.dst
         |      GROUP BY e.src, p.h))
         |  GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH half AS (
       |  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |edges AS (
       |  SELECT src, dst FROM half
       |  UNION ALL
       |  SELECT dst AS src, src AS dst FROM half),
       |deg AS (
       |  SELECT src AS node, CAST(count(*) AS BIGINT) AS d
       |  FROM edges GROUP BY src),
       |h0 AS (SELECT node, d AS h FROM deg),
       |$rounds
       |SELECT CASE WHEN h.node % 2 = 0 THEN 'customer' ELSE 'supplier' END
       |         AS node_type,
       |       CAST(h.node // 2 AS BIGINT) AS node_id,
       |       d.d AS degree,
       |       h.h AS coreness
       |FROM h$KcoreRounds h JOIN deg d ON d.node = h.node""".stripMargin
  }

  // ── graph_link_predict ★ (r12) — common-neighbor link prediction over
  // the part co-purchase graph: for every NON-adjacent pair (a, b) that
  // shares at least one neighbor, the classic unsupervised scores —
  // common-neighbor count, Jaccard |N(a)∩N(b)| / |N(a)∪N(b)|, and the
  // resource-allocation index Σ_{c∈N(a)∩N(b)} 1/deg(c) (Zhou et al.
  // 2009, the strongest of the local indices) — top-50 candidates. The
  // recommender / graph-completion primitive ("parts bought together
  // but never yet in one order") every co-occurrence pipeline ships.
  //
  // Scale shape (100 TB): candidate generation is the WEDGE STREAM —
  // per common neighbor c, its neighbor pairs (a < b) — Σ C(deg, 2)
  // rows, the same volume graph_triangles ships; that stream is
  // inherent to EXACT common-neighbor scoring. What must NOT grow
  // unbounded is the candidate-pair STATE: on a dense graph pairs with
  // 1–2 shared neighbors approach all-pairs cardinality while carrying
  // zero ranking signal (probed: the fixture's top-50 min common is
  // 58/15/5 at sf0.001/0.01/0.1). [[LinkPredictMinCommon]] = 3 is the
  // support floor — the d10_basket_rules minsup discipline — cutting
  // candidate state 11× at sf0.1 with the top-50 untouched at every
  // probed scale; the oracle applies the identical floor, so the gate
  // stays exact. The groupBy key is the pairs PACKED into one BIGINT
  // (24-byte shuffle rows); existing edges leave via one hash anti-join
  // on the same packed key; degrees join only the floor's survivors;
  // ranking is TakeOrderedAndProject (never a global sort). At extreme
  // scale the further lever is threshold-driven candidate generation —
  // the PPJoin+ prefix cascade over adjacency lists (dd_prefix_jaccard)
  // — which trades the wedge stream for a similarity-join prefix probe.
  //
  // Engine-exactness: pure BIGINT — the RA contribution is quantized
  // PER NEIGHBOR (1e6 div deg(c)) before the sum, so aggregation order
  // cannot perturb it; Jaccard is a single floor-div of counts; the
  // top-50 cut breaks score ties by (p1, p2).
  /** Support floor on common neighbors (see header: the minsup lever). */
  val LinkPredictMinCommon = 3

  /** Shared base relations for the link-prediction family (exact /
    * pruned / cut audit), memoized per (session, dir) and re-published
    * as temp views: the co-purchase edge list, and the ra-annotated
    * adjacency (c = the token/hub node whose degree d and pre-quantized
    * RA contribution ride along). SHARED-checkpointed so one catalog
    * pass builds the graph once for all three queries. */
  private def linkPredictViews(spark: SparkSession, dir: String): Unit = {
    val (pairs, adj) = graft.operators.SessionMemo.cached(
      spark, s"lpviews/$dir") {
      // The edge set is the family-shared grouped co-purchase relation's
      // keys (see coPurchaseCounts) — no second self-join explode.
      val pairs = coPurchaseCounts(spark, dir).select(col("p1"), col("p2"))
      pairs.createOrReplaceTempView("lp_pairs_t")
      // Packed-key guard: same 1e8 contract as graph_triangles.
      val maxId = spark.sql("SELECT max(p2) FROM lp_pairs_t").head.getLong(0)
      require(maxId < 100000000L,
        s"graph_link_predict: node id $maxId >= 1e8 breaks the packed edge key")
      // Adjacency with the hub's degree and its pre-quantized RA
      // contribution attached once (the pagerank edge_deg layout) — both
      // wedge legs read it. Hash-partitioned + sorted on the wedge key
      // `c` BEFORE the checkpoint (r15): the pin preserves partitioning
      // and ordering, so the exact operator's wedge self-join on c runs
      // with ZERO exchanges and ZERO sorts on the adjacency (previously
      // both legs re-shuffled it), and `nodeg`'s GROUP BY c aggregates
      // exchange-free.
      val adj = graft.operators.PinnedStages.sharedCheckpointPartitioned(spark.sql(
        """WITH adj AS (
          |  SELECT p1 AS c, p2 AS x FROM lp_pairs_t
          |  UNION ALL
          |  SELECT p2 AS c, p1 AS x FROM lp_pairs_t),
          |deg AS (SELECT c, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY c)
          |SELECT a.c, a.x, d.d, 1000000 div d.d AS ra
          |FROM adj a JOIN deg d ON d.c = a.c""".stripMargin)
        .repartition(col("c")).sortWithinPartitions("c"))
      (pairs, adj)
    }
    pairs.createOrReplaceTempView("lp_pairs_t")
    adj.createOrReplaceTempView("lp_adj_t")
  }

  // (r13–r14 these streams ran as streaming sort-aggregates via a scoped
  // replaceHashWithSortAgg conf; r15 retired that helper — the fix for
  // the giant PARTIAL maps is exchanging first, not sorting always. See
  // the aggregation-shape comments in graphLinkPredict /
  // lpCascadeJoinCtesSpark.)

  /** Pair-aggregation exchange width, derived from the graph's OWN wedge
    * volume Σ_c C(deg_c, 2) — the exact row count of the exact
    * operator's collision stream and a tight upper bound on the
    * cascade's (the prefixes are subsets of the full lists). One row
    * group per ~1M stream rows bounds each reduce task's aggregation
    * state (hash map or sort buffer) to ~10⁶ entries REGARDLESS of
    * total volume — the §5 "more partitions, smaller per-task state"
    * remedy, scale-adaptive instead of inheriting the session's
    * core-count shuffle width (at sf0.1 that width put 4.1M rows and
    * up to 1.7M groups in each of 32 tasks, which is exactly the state
    * that spilled under the r14 driver host's memory pressure).
    * Clamped to [defaultParallelism, 4096]; the memoized volume is one
    * 20k-row driver scalar per (session, dir). */
  private def lpAggParts(spark: SparkSession, dir: String): Int = {
    val wedgeRows = graft.operators.SessionMemo.cached(
      spark, s"lpwedgevol/$dir") {
      spark.sql(
        """SELECT CAST(sum(d * (d - 1) div 2) AS BIGINT)
          |FROM (SELECT c, max(d) AS d FROM lp_adj_t GROUP BY c)""".stripMargin)
        .head.getLong(0)
    }
    math.max(spark.sparkContext.defaultParallelism,
      math.min(4096L, wedgeRows / 1000000L + 1).toInt)
  }

  def graphLinkPredict(spark: SparkSession, dir: String): DataFrame = {
    linkPredictViews(spark, dir)
    // Aggregation shape (r15): explicit REPARTITION(parts, pk) — width
    // from lpAggParts — then a hash aggregate whose maps run entirely
    // AFTER the exchange. Each task holds one narrow partition's groups
    // (~10⁶ ceiling) and spills to the sort fallback only under real
    // pressure, where the previous DISTRIBUTE + SORT + streaming
    // sort-agg ALWAYS sorted the full 138M-row wedge stream. No conf
    // scope and no planning-forcing pin needed anymore (the r14-flagged
    // per-invocation localCheckpoint leak goes with it).
    val parts = lpAggParts(spark, dir)
    spark.sql(
      s"""WITH wedge_rows AS (
        |  SELECT e1.x * 100000000 + e2.x AS pk, e1.ra AS ra
        |  FROM lp_adj_t e1 JOIN lp_adj_t e2
        |    ON e1.c = e2.c AND e1.x < e2.x),
        |shuffled AS (
        |  SELECT /*+ REPARTITION($parts, pk) */ pk, ra FROM wedge_rows),
        |wedges AS (
        |  SELECT pk,
        |         CAST(count(*) AS BIGINT) AS common,
        |         CAST(sum(ra) AS BIGINT) AS ra_micro
        |  FROM shuffled
        |  GROUP BY pk
        |  HAVING count(*) >= $LinkPredictMinCommon),
        |cand AS (
        |  SELECT /*+ SHUFFLE_HASH(e) */
        |         w.pk div 100000000 AS p1, w.pk % 100000000 AS p2,
        |         w.common, w.ra_micro
        |  FROM wedges w
        |  LEFT ANTI JOIN lp_pairs_t e
        |    ON w.pk = e.p1 * 100000000 + e.p2),
        |nodeg AS (SELECT c, max(d) AS d FROM lp_adj_t GROUP BY c)
        |SELECT c.p1, c.p2, d1.d AS deg1, d2.d AS deg2, c.common,
        |       CAST(c.common * 1000000 div (d1.d + d2.d - c.common) AS BIGINT)
        |         AS jaccard_micro,
        |       c.ra_micro
        |FROM cand c
        |JOIN nodeg d1 ON d1.c = c.p1
        |JOIN nodeg d2 ON d2.c = c.p2
        |ORDER BY jaccard_micro DESC, c.p1, c.p2
        |LIMIT 50""".stripMargin)
  }

  val graphLinkPredictSql: String =
    s"""WITH pairs AS (
      |  SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |adj AS (
      |  SELECT p1 AS c, p2 AS x FROM pairs
      |  UNION ALL
      |  SELECT p2 AS c, p1 AS x FROM pairs),
      |deg AS (SELECT c, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY c),
      |adjd AS (
      |  SELECT a.c, a.x, d.d, 1000000 // d.d AS ra
      |  FROM adj a JOIN deg d ON d.c = a.c),
      |wedges AS (
      |  SELECT e1.x * 100000000 + e2.x AS pk,
      |         CAST(count(*) AS BIGINT) AS common,
      |         CAST(sum(e1.ra) AS BIGINT) AS ra_micro
      |  FROM adjd e1 JOIN adjd e2 ON e1.c = e2.c AND e1.x < e2.x
      |  GROUP BY e1.x * 100000000 + e2.x
      |  HAVING count(*) >= $LinkPredictMinCommon),
      |cand AS (
      |  SELECT CAST(w.pk // 100000000 AS BIGINT) AS p1,
      |         CAST(w.pk % 100000000 AS BIGINT) AS p2,
      |         w.common, w.ra_micro
      |  FROM wedges w
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM pairs e WHERE e.p1 * 100000000 + e.p2 = w.pk))
      |SELECT c.p1, c.p2, d1.d AS deg1, d2.d AS deg2, c.common,
      |       CAST(c.common * 1000000 // (d1.d + d2.d - c.common) AS BIGINT)
      |         AS jaccard_micro,
      |       c.ra_micro
      |FROM cand c
      |JOIN deg d1 ON d1.c = c.p1
      |JOIN deg d2 ON d2.c = c.p2
      |ORDER BY jaccard_micro DESC, c.p1, c.p2
      |LIMIT 50""".stripMargin

  // ── graph_link_predict_pruned ★ (r13) — THRESHOLD-DRIVEN candidate
  // generation for link prediction: the r12 verdict's named lever,
  // realized by running the dd_prefix_jaccard PPJoin+ cascade OVER
  // ADJACENCY LISTS. Each node is a "document" whose tokens are its
  // neighbors; the rarest-first global order is ASCENDING DEGREE — an
  // exact identity, because a neighbor token c appears in exactly
  // deg(c) lists, so df(c) = deg(c). The query answers the production
  // question a link-prediction deployment actually serves — "which
  // non-edge pairs have adjacency Jaccard ≥ t" (a CONFIDENCE FLOOR, t =
  // 1/3 here) — by generating candidates from prefix collisions instead
  // of the exhaustive wedge stream:
  //  - probing prefix n − ⌈t·n⌉ + 1 (prefix-filter theorem, exactly
  //    dd_prefix_jaccard's);
  //  - INDEX prefix n − ⌈2t/(1+t)·n⌉ + 1 on the smaller side — sound
  //    because pairing is oriented larger-probes-smaller (b.n < a.n, id
  //    tiebreak), so O ≥ t/(1+t)(n_a+n_b) ≥ 2t/(1+t)·n_b; the prefix
  //    theorem then needs only the (n_b − O_min + 1)-prefix on b;
  //  - the l-EXTENDED prefixes with the cnt ≥ l generation floor
  //    ([[LinkPredictGenFloor]] — the move that makes the cascade work
  //    at ALL on flat-df data);
  //  - the positional + suffix-slot bounds — sound under asymmetric
  //    prefixes, because they only use the positions of SHARED tokens
  //    in the one global (df, g) order.
  // Verification computes the exact row (common, ra, jaccard) by
  // intersecting PACKED ADJACENCY ARRAYS (see linkPredictRankedViews)
  // over the surviving candidates — O(deg) per pair, no per-(pair,
  // token) row stream; existing edges leave by anti-join; minsup and
  // the cross-multiplied threshold test are integer-exact. THE ORACLE
  // IS THE NAIVE DEFINITION (the exact operator's wedge pipeline + the
  // same threshold filter), so the hash match machine-checks the
  // cascade's LOSSLESSNESS on the graph exactly as dd_prefix_jaccard's
  // does on text.
  //
  // Honest fixture framing: the co-purchase fixture is DENSE and
  // degree-homogeneous (sf0.1: 20k nodes, deg ≈ 119 ± 30, top-50
  // jaccard floor 0.035) — at confidence floors that low NO candidate
  // pruning can beat the exhaustive wedge stream (a 0.97-prefix is the
  // whole list), which is why graph_link_predict keeps the exact wedge
  // plan. The pruned variant earns its keep where thresholds are real:
  // at t = 1/3 the top-50 EQUALS the exact operator's wherever the
  // data's score floor clears t (LinkPredictPrunedSpec pins this on
  // sf0.001, floor 0.42), and returns the honest empty set where no
  // pair clears the floor. graph_link_predict_cut audits the cascade's
  // stage-by-stage cut against the Σ C(deg,2) wedge volume it avoids.
  //
  // Scale shape (100 TB): prefix volume is Σ_c probe_df(c)·index_df(c)
  // where BOTH factors exclude the highest-degree hubs first (they rank
  // last in every list) — the PPJoin economics, now on degrees; the
  // verification join touches only survivors. At t = 1/3 the join
  // volume is a third of the wedge stream on THIS homogeneous graph and
  // collapses further on power-law graphs (the hot hubs that dominate
  // Σ C(deg,2) never enter a prefix).
  def graphLinkPredictPrunedAt(spark: SparkSession, dir: String,
      p: Int, q: Int): DataFrame = {
    require(p >= 1 && q > p, s"threshold p/q must be in (0, 1), got $p/$q")
    linkPredictRankedViews(spark, dir)
    lpVerifiedView(spark, dir, p, q)
    spark.sql(
      s"""WITH qual AS (
        |  SELECT least(d1, d2) AS p1, greatest(d1, d2) AS p2,
        |         CASE WHEN d1 < d2 THEN n1 ELSE n2 END AS deg1,
        |         CASE WHEN d1 < d2 THEN n2 ELSE n1 END AS deg2,
        |         cm, ra_micro
        |  FROM lpp_common_t
        |  WHERE cm >= $LinkPredictMinCommon
        |    AND $q * cm >= $p * (n1 + n2 - cm))
        |SELECT t.p1, t.p2, t.deg1, t.deg2, t.cm AS common,
        |       CAST(t.cm * 1000000 div (t.deg1 + t.deg2 - t.cm) AS BIGINT)
        |         AS jaccard_micro,
        |       t.ra_micro
        |FROM qual t
        |LEFT ANTI JOIN lp_pairs_t e ON t.p1 = e.p1 AND t.p2 = e.p2
        |ORDER BY jaccard_micro DESC, t.p1, t.p2
        |LIMIT 50""".stripMargin)
  }

  /** The VERIFIED candidate relation — every floored+bounded collision
    * pair with its exact (common, ra) from the packed-array
    * intersection — memoized/SHARED-pinned per (session, dir, p, q):
    * the cascade's second expensive stage, consumed by both the pruned
    * query and the cut audit (r14: previously each re-ran the
    * intersection over millions of pairs; one threshold's family now
    * verifies once per pass).
    *
    * NO depth-1 suffix probe before it — the r13 gate lesson applied at
    * the design level: on the graph the probe cut 17% of candidates
    * (sf0.01) while costing a |cand|·deg-row aggregation, yet
    * verification is an ARRAY INTERSECTION — O(deg) per pair with NO
    * intermediate row explosion — i.e. verification is CHEAPER than the
    * probe that would thin it. The probe pays only when verification is
    * expensive (the dd text cascade); here it never can. */
  private[graft] def lpVerifiedView(spark: SparkSession, dir: String,
      p: Int, q: Int): (Long, Long, Long) = {
    val (common, prefixPairs, prefixRows, floorPairs) =
      graft.operators.SessionMemo.cached(spark, s"lpverified/$p/$q/$dir") {
      // ONE observed pass (re-landed r15; first attempted r14): cascade
      // join (streaming sort-agg over the one exchange — see
      // withSortAgg), generation floor, cand0 bound, and the
      // packed-array verification all stream into the single
      // checkpointed VERIFIED relation; the three pre-verification
      // volume stats the cut audit reports ride the same pass as an
      // observation. Nothing pre-verification is materialized — the
      // previously checkpointed floored relation (7M rows at sf0.1
      // t = 1/20) had no consumer other than this stage, and its
      // executor-storage pin was the family's largest resident block
      // (the r14 spill driver under the bench host's memory pressure).
      //
      // Aggregation shape (r15, revising the r14 sort-agg verdict): the
      // r14 failure was the PRE-exchange partial hash maps of a plain
      // GROUP BY — a ~1.0 combine ratio over the whole collision stream.
      // lpCascadeJoinCtesSpark now exchanges FIRST (DISTRIBUTE BY pk, no
      // sort) so the hash maps hold only one partition's groups, spill
      // to the sort fallback under pressure, and skip the guaranteed
      // full sort the streaming sort-agg paid (measured: 26.0 s →
      // 13.5 s warm at sf0.1 t = 1/20 with the slimmed stream).
      locally {
        val obs = new org.apache.spark.sql.Observation()
        // One chained Dataset, NOT a temp view: an Observation only
        // fires for executions of the Dataset chain it was attached to
        // — a view embedding the observed plan into a second query
        // never delivers the metrics and obs.get blocks forever
        // (measured the hard way, r14).
        val alpha = s"($p * (n1 + n2) + ${p + q - 1}) div ${p + q}"
        val common = graft.operators.PinnedStages.sharedCheckpoint(
          spark.sql(
            s"WITH ${lpCascadeJoinCtesSpark(p, q, lpAggParts(spark, dir))}\n" +
              "SELECT * FROM joined")
            .observe(obs, count(lit(1)).as("prefix_pairs"),
              sum(col("cnt")).as("prefix_rows"),
              count(when(col("cnt") >= LinkPredictGenFloor, 1))
                .as("floor_pairs"))
            .where(col("cnt") >= LinkPredictGenFloor)
            // cnt + mnv ≡ cnt + least(n1 − px, n2 − py): see the slim-
            // stream identity in lpCascadeJoinCtesSpark (the oracle text
            // keeps the px/py form; result equality is machine-checked).
            .where(expr(s"least(ub, cnt + mnv) >= $alpha"))
            .selectExpr("pk div 100000000 AS d1", "pk % 100000000 AS d2",
              "n1", "n2")
            // SHUFFLE_HASH with the nodes-sized array relation as the
            // build side: a sort-merge here would SORT the candidate
            // stream twice (by d1, then d2) for no benefit — the hash
            // build is per-partition nodes-sized, so the plan stays
            // fully distributed at any graph size (no broadcast cap).
            .join(spark.table("lpp_arr_t").as("x1").hint("shuffle_hash"),
              expr("x1.x = d1"))
            .join(spark.table("lpp_arr_t").as("x2").hint("shuffle_hash"),
              expr("x2.x = d2"))
            .selectExpr("d1", "d2", "n1", "n2",
              "array_intersect(x1.arr, x2.arr) AS iv")
            .selectExpr("d1", "d2", "n1", "n2",
              "CAST(size(iv) AS BIGINT) AS cm",
              "aggregate(iv, CAST(0 AS BIGINT), " +
                "(acc, v) -> acc + v % 1048576) AS ra_micro"))
        val m = obs.get // blocks until the checkpoint action completes
        (common, m("prefix_pairs").asInstanceOf[Long],
          m("prefix_rows").asInstanceOf[Long],
          m("floor_pairs").asInstanceOf[Long])
      }
    }
    common.createOrReplaceTempView("lpp_common_t")
    (prefixPairs, prefixRows, floorPairs)
  }

  /** The t = 1/3 confidence-floor instantiation (see header). */
  def graphLinkPredictPruned(spark: SparkSession, dir: String): DataFrame =
    graphLinkPredictPrunedAt(spark, dir, 1, 3)

  /** r14 (verdict #2): the threshold that BITES at the correctness
    * gate's own scale — at sf0.01 the non-edge score ceiling is exactly
    * 0.1 (one pair) and 94,376 candidate pairs clear t = 1/20, so the
    * driver's oracle equality checks 50 REAL qualifying pairs where the
    * t = 1/3 entry returns the honest empty set (its floor sits above
    * the fixture's ceiling there). Honest economics note: at t = 1/20
    * the probing prefix is ≈ 0.95·n + l — on this degree-homogeneous
    * graph the cascade's join volume approaches the exhaustive wedge
    * stream, exactly the regime the cut audit (graph_link_predict_cut_t20)
    * quantifies; the entry's value is gate-scale PROOF of cascade
    * losslessness on real pairs, with the same plan that prunes hard
    * when degrees are skewed or thresholds are real. */
  def graphLinkPredictPrunedT20(spark: SparkSession, dir: String): DataFrame =
    graphLinkPredictPrunedAt(spark, dir, 1, 20)

  /** Degree-ranked adjacency-list relation + node sizes for the prefix
    * cascade, memoized/SHARED-pinned like the base graph. */
  private[graft] def linkPredictRankedViews(spark: SparkSession, dir: String): Unit = {
    linkPredictViews(spark, dir)
    val (ranked, sizes, arr) = graft.operators.SessionMemo.cached(
      spark, s"lprankedviews/$dir") {
      // r15, two structural moves on the ranked relation:
      //  1. The node's list size n rides ALONG in the same window pass
      //     that ranks tokens (count over the same x-partition — the
      //     adjacency is symmetric, so count per x ≡ sizes' count per
      //     c). The engine-side prefix legs then need NO sizes join at
      //     all — previously each leg re-shuffled the 4.7M-row ranked
      //     relation by doc_id just to attach one integer.
      //  2. Hash-partitioned + sorted on the collision key `g` BEFORE
      //     the checkpoint: probe and index are now pure FILTERS of
      //     this relation, so the cascade's prefix self-join on g runs
      //     with ZERO exchanges and ZERO sorts — previously both legs
      //     re-shuffled per threshold (2 exchanges × 2 thresholds per
      //     pass).
      val ranked = graft.operators.PinnedStages.sharedCheckpointPartitioned(spark.sql(
        """SELECT x AS doc_id, c AS g, d AS df,
          |       row_number() OVER (PARTITION BY x ORDER BY d, c) AS rn,
          |       CAST(count(*) OVER (PARTITION BY x) AS BIGINT) AS n
          |FROM lp_adj_t""".stripMargin)
        .repartition(col("g")).sortWithinPartitions("g"))
      // Exchange-free aggregation: lp_adj_t is c-partitioned.
      val sizes = graft.operators.PinnedStages.sharedCheckpointPartitioned(spark.sql(
        """SELECT c AS doc_id, CAST(count(*) AS BIGINT) AS n
          |FROM lp_adj_t GROUP BY c""".stripMargin))
      // Per-node adjacency packed as one array row: element =
      // c · 2²⁰ + ra(c) (ra = 1e6 div deg ≤ 1e6 < 2²⁰; c < 1e8 keeps
      // the product < 2⁴⁷). Verification intersects two such arrays —
      // equal elements ⟺ same neighbor — so common = size and the RA
      // sum unpacks with one modulo, all without a per-(pair, token)
      // row stream. Nodes-sized (not edges-sized): the relation joins
      // by node id and degrades from broadcast to shuffle join
      // naturally as the graph grows.
      // Partition-preserving pin: the groupBy leaves hash(x) — exactly
      // the key the verification's SHUFFLE_HASH probes join on, so the
      // build side never re-exchanges.
      val arr = graft.operators.PinnedStages.sharedCheckpointPartitioned(spark.sql(
        """SELECT x, collect_list(c * 1048576 + ra) AS arr
          |FROM lp_adj_t GROUP BY x""".stripMargin))
      (ranked, sizes, arr)
    }
    ranked.createOrReplaceTempView("lpp_ranked_t")
    sizes.createOrReplaceTempView("lpp_sizes_t")
    arr.createOrReplaceTempView("lpp_arr_t")
  }

  /** cand0 from the slim joined relation: unpack the pair key and
    * re-derive the suffix-slot bound and overlap floor (engine-shared
    * text; `rel` is the slim relation's name). */
  private def lpCand0Cte(p: Int, q: Int, idiv: String, rel: String): String =
    s"""cand0 AS (
       |  SELECT pk $idiv 100000000 AS d1, pk % 100000000 AS d2,
       |         n1, n2, cnt, px, py,
       |         ($p * (n1 + n2) + ${p + q - 1}) $idiv ${p + q} AS alpha
       |  FROM $rel
       |  WHERE least(ub, cnt + least(n1 - px, n2 - py))
       |        >= ($p * (n1 + n2) + ${p + q - 1}) $idiv ${p + q})""".stripMargin

  /** Generation floor l: candidate pairs must share ≥ l tokens across
    * the l-EXTENDED prefixes (Adapt-Join's l-prefix scheme, Wang et al.
    * 2012). Soundness: a qualifying pair has O ≥ max(α, minsup) ≥ l
    * common tokens; its l-th smallest (global order) common token has
    * at most O − l common tokens after it, so it sits within position
    * n − O + l ≤ n − floor + l on BOTH sides (floor = each side's O
    * lower bound) — the first l common tokens all land inside both
    * extended prefixes, giving ≥ l collisions. Why it exists: on
    * degree-HOMOGENEOUS graphs every token has similar df, so at l = 1
    * nearly every 2-hop pair collides once and candidate state
    * explodes (54.8M pairs at sf0.1 — the all-pairs regime PPJoin's
    * zipf assumption normally prevents); requiring l = minsup = 3
    * collisions costs two extra prefix tokens of join volume and cuts
    * candidates 38× (54.8M → 1.45M measured). l = LinkPredictMinCommon
    * keeps the floors aligned: generation never prunes a pair the
    * minsup gate would have kept. */
  val LinkPredictGenFloor = 3

  /** The ENGINE-side cascade-join text (r15): semantically identical to
    * [[lpCascadeJoinCtes]] (the oracle's text — the end-to-end result
    * equality stays machine-checked every Verify run), but the probing
    * and index prefixes are pure FILTERS over the n-carrying ranked
    * relation instead of a ranked⋈sizes join: n rides on the ranked row
    * (attached in the same window pass — see linkPredictRankedViews), so
    * with the g-partitioned checkpoint the whole candidate generation up
    * to the one pk exchange is exchange-free. Same prefix bounds, same
    * orientation predicate, same packed pk, same slim `joined` schema. */
  private def lpCascadeJoinCtesSpark(p: Int, q: Int, parts: Int): String = {
    val ext = LinkPredictGenFloor
    // r15 shuffle diet (§2.3 shuffle fewer bytes + §2.1): the collision
    // stream is 132.7M rows at sf0.1 t = 1/20, and its aggregation is
    // the cascade's whole bill (the prefix join itself noop-times at
    // ~1 s). Three moves, measured on that stream:
    //  - the per-row suffix-slot term least(an−arn, bn−brn) is computed
    //    BEFORE the exchange and an/bn/arn/brn are ALL dropped from the
    //    stream — the only downstream consumer of px = max(arn) /
    //    py = max(brn) is the cand0 bound's least(n1 − px, n2 − py),
    //    and min_r least(x_r, y_r) = least(min_r x_r, min_r y_r) (each
    //    side of a pk-group shares its n, and the row holding the
    //    global-min component attains it as its least), so that term
    //    IS min(v): the stream is 2 columns (pk, v), 24-byte UnsafeRows
    //    instead of 40, and the aggregate runs 3 functions
    //    (count, min(v), max(v)) instead of 4. (The dd text cascade
    //    keeps px/py — its depth-1/2 suffix probes read the positions
    //    themselves; the graph cascade has no suffix probe BY DESIGN,
    //    see lpVerifiedView.) n1/n2 re-attach from the 20k-row
    //    node-sizes relation by broadcast after the groups collapse
    //    (they are functions of pk);
    //  - REPARTITION(parts, pk) WITHOUT the sort, width from
    //    lpAggParts: the post-exchange HASH aggregate's map holds only
    //    one NARROW partition's groups (the pre-exchange partial maps
    //    that failed in r14 saw the whole near-cartesian stream with a
    //    ~1.0 combine ratio; at the session's 32-wide shuffle the
    //    post-exchange maps still spilled under catalog pin pressure —
    //    the width must track the stream volume, not the core count);
    // Fresh-session measurement at sf0.1 t = 1/20 (warm pass): sort-agg
    // 26.0 s, dist+hash same columns 18.6 s, this shape 13.5 s; the
    // oracle text (lpCascadeJoinCtes) keeps the naive max(an)/max(bn)
    // aggregation and the end-to-end equality stays machine-checked.
    s"""lpprobe AS (
       |  SELECT doc_id, g, rn, n FROM lpp_ranked_t
       |  WHERE rn <= n - ($p * n + ${q - 1}) div $q + $ext),
       |lpindex AS (
       |  SELECT doc_id, g, rn, n FROM lpp_ranked_t
       |  WHERE rn <= n - (2 * $p * n + ${p + q - 1}) div ${p + q} + $ext),
       |lprows AS (
       |  SELECT a.doc_id * 100000000 + b.doc_id AS pk,
       |         least(a.n - a.rn, b.n - b.rn) AS v
       |  FROM lpprobe a JOIN lpindex b
       |    ON a.g = b.g AND (b.n < a.n OR (b.n = a.n AND b.doc_id < a.doc_id))
       |    AND b.n * $q >= a.n * $p),
       |lpshuf AS (SELECT /*+ REPARTITION($parts, pk) */ pk, v FROM lprows),
       |lpagg AS (
       |  SELECT pk, CAST(count(*) AS BIGINT) AS cnt,
       |         min(v) AS mnv, max(v) + 1 AS ub
       |  FROM lpshuf
       |  GROUP BY pk),
       |joined AS (
       |  SELECT /*+ BROADCAST(s1, s2) */
       |         pk, s1.n AS n1, s2.n AS n2, cnt, mnv, ub
       |  FROM lpagg
       |  JOIN lpp_sizes_t s1 ON s1.doc_id = pk div 100000000
       |  JOIN lpp_sizes_t s2 ON s2.doc_id = pk % 100000000)""".stripMargin
  }

  /** ONE cascade-join text shared with the ORACLE (the suffixProbe
    * discipline; since r15 the engine runs [[lpCascadeJoinCtesSpark]] —
    * same cascade, prefix legs as filters over the n-carrying ranked
    * relation — and the oracle keeps this join form; result equality is
    * the machine-checked contract): l-extended probing/index prefixes
    * over the ranked relation, the candidate pairs PACKED into one
    * BIGINT key — `dist`
    * injects Spark's `DISTRIBUTE BY pk SORT BY pk` (with
    * `replaceHashWithSortAgg` both aggregate halves stream in O(1)
    * memory over the collision stream; an r14 experiment re-confirmed
    * that the hash form's multi-million-entry partial maps fail at
    * sf0.1 once the family's pinned relations crowd unified memory),
    * empty for DuckDB.
    * `joined` carries the minimal per-pair
    * state (n1, n2, cnt, px, py, ub); the suffix-slot bound
    * ub2 = cnt + least(n1−px, n2−py) and the overlap floor alpha are
    * recomputed by the consumer — 7 slim columns in the one
    * materialized relation. */
  private[graft] def lpCascadeJoinCtes(p: Int, q: Int, idiv: String,
      ranked: String, sizes: String, dist: String = ""): String = {
    val ext = LinkPredictGenFloor // prefix lengths carry + (l − 1) + 1 = + l
    s"""lpprobe AS (
       |  SELECT r.doc_id, r.g, r.rn, z.n
       |  FROM $ranked r JOIN $sizes z ON r.doc_id = z.doc_id
       |  WHERE r.rn <= z.n - ($p * z.n + ${q - 1}) $idiv $q + $ext),
       |lpindex AS (
       |  SELECT r.doc_id, r.g, r.rn, z.n
       |  FROM $ranked r JOIN $sizes z ON r.doc_id = z.doc_id
       |  WHERE r.rn <= z.n - (2 * $p * z.n + ${p + q - 1}) $idiv ${p + q} + $ext),
       |lprows AS (
       |  SELECT a.doc_id * 100000000 + b.doc_id AS pk,
       |         a.n AS an, b.n AS bn, a.rn AS arn, b.rn AS brn
       |  FROM lpprobe a JOIN lpindex b
       |    ON a.g = b.g AND (b.n < a.n OR (b.n = a.n AND b.doc_id < a.doc_id))
       |    AND b.n * $q >= a.n * $p),
       |lpshuf AS (SELECT pk, an, bn, arn, brn FROM lprows $dist),
       |joined AS (
       |  SELECT pk, max(an) AS n1, max(bn) AS n2,
       |         CAST(count(*) AS BIGINT) AS cnt,
       |         max(arn) AS px, max(brn) AS py,
       |         max(least(an - arn, bn - brn)) + 1 AS ub
       |  FROM lpshuf
       |  GROUP BY pk)""".stripMargin
  }

  /** Naive thresholded oracle: the exact operator's wedge pipeline plus
    * the identical cross-multiplied threshold test — matching it IS the
    * losslessness proof for the graph cascade. */
  def graphLinkPredictPrunedSqlAt(p: Int, q: Int): String =
    s"""WITH pairs AS (
      |  SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |adj AS (
      |  SELECT p1 AS c, p2 AS x FROM pairs
      |  UNION ALL
      |  SELECT p2 AS c, p1 AS x FROM pairs),
      |deg AS (SELECT c, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY c),
      |adjd AS (
      |  SELECT a.c, a.x, d.d, 1000000 // d.d AS ra
      |  FROM adj a JOIN deg d ON d.c = a.c),
      |wedges AS (
      |  SELECT e1.x * 100000000 + e2.x AS pk,
      |         CAST(count(*) AS BIGINT) AS common,
      |         CAST(sum(e1.ra) AS BIGINT) AS ra_micro
      |  FROM adjd e1 JOIN adjd e2 ON e1.c = e2.c AND e1.x < e2.x
      |  GROUP BY e1.x * 100000000 + e2.x
      |  HAVING count(*) >= $LinkPredictMinCommon),
      |cand AS (
      |  SELECT CAST(w.pk // 100000000 AS BIGINT) AS p1,
      |         CAST(w.pk % 100000000 AS BIGINT) AS p2,
      |         w.common, w.ra_micro
      |  FROM wedges w
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM pairs e WHERE e.p1 * 100000000 + e.p2 = w.pk))
      |SELECT c.p1, c.p2, d1.d AS deg1, d2.d AS deg2, c.common,
      |       CAST(c.common * 1000000 // (d1.d + d2.d - c.common) AS BIGINT)
      |         AS jaccard_micro,
      |       c.ra_micro
      |FROM cand c
      |JOIN deg d1 ON d1.c = c.p1
      |JOIN deg d2 ON d2.c = c.p2
      |WHERE $q * c.common >= $p * (d1.d + d2.d - c.common)
      |ORDER BY jaccard_micro DESC, c.p1, c.p2
      |LIMIT 50""".stripMargin

  val graphLinkPredictPrunedSql: String = graphLinkPredictPrunedSqlAt(1, 3)

  // ── graph_link_predict_cut ★ (r13) — the cascade AUDIT for
  // graph_link_predict_pruned (the dd_prefix_stats discipline): the
  // exhaustive wedge volume Σ C(deg, 2) the lever avoids (closed form
  // over the degree relation — never materialized), the prefix-join
  // row volume actually paid, candidate pairs at each cascade stage,
  // and the qualifying count. BOTH engines run the identical cascade
  // text, so every count is oracle-pinned — these ratios are what a
  // deployment reads to decide exact-wedge vs threshold-cascade per
  // graph (the probe2-gate discipline, one level up).
  def graphLinkPredictCutAt(spark: SparkSession, dir: String,
      p: Int, q: Int): DataFrame = {
    linkPredictRankedViews(spark, dir)
    val (prefixPairs, prefixRows, floorPairs) =
      lpVerifiedView(spark, dir, p, q)
    // All counts serve from the ONE memoized VERIFIED relation (one row
    // per cand0 survivor, so bound_pairs = its count) plus the observed
    // pre-verification stats riding that pass.
    spark.sql(
      s"""WITH qual AS (
        |  SELECT least(d1, d2) AS p1, greatest(d1, d2) AS p2
        |  FROM lpp_common_t
        |  WHERE cm >= $LinkPredictMinCommon AND $q * cm >= $p * (n1 + n2 - cm)),
        |nonedge AS (
        |  SELECT t.p1 FROM qual t
        |  LEFT ANTI JOIN lp_pairs_t e ON t.p1 = e.p1 AND t.p2 = e.p2)
        |SELECT (SELECT CAST(sum(n * (n - 1) div 2) AS BIGINT)
        |        FROM lpp_sizes_t) AS wedge_rows,
        |       CAST($prefixRows AS BIGINT) AS prefix_rows,
        |       CAST($prefixPairs AS BIGINT) AS prefix_pairs,
        |       CAST($floorPairs AS BIGINT) AS floor_pairs,
        |       (SELECT count(*) FROM lpp_common_t) AS bound_pairs,
        |       (SELECT count(*) FROM nonedge) AS qualifying_pairs""".stripMargin)
  }

  def graphLinkPredictCut(spark: SparkSession, dir: String): DataFrame =
    graphLinkPredictCutAt(spark, dir, 1, 3)

  /** The audit row for the gate-biting t = 1/20 (see
    * graphLinkPredictPrunedT20): on this homogeneous graph it records
    * the cascade's DEGRADED economics honestly — prefix volume
    * approaching wedge volume — the number a deployment reads before
    * choosing exact-wedge at low confidence floors. Shares the joined
    * relation memo with the pruned query, so a catalog pass pays the
    * prefix join once per threshold. */
  def graphLinkPredictCutT20(spark: SparkSession, dir: String): DataFrame =
    graphLinkPredictCutAt(spark, dir, 1, 20)

  def graphLinkPredictCutSqlAt(p: Int, q: Int): String =
    s"""WITH pairs AS (
      |  SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |adjb AS (
      |  SELECT p1 AS c, p2 AS x FROM pairs
      |  UNION ALL
      |  SELECT p2 AS c, p1 AS x FROM pairs),
      |degb AS (SELECT c, CAST(count(*) AS BIGINT) AS d FROM adjb GROUP BY c),
      |adjd AS (
      |  SELECT a.c, a.x, d.d, 1000000 // d.d AS ra
      |  FROM adjb a JOIN degb d ON d.c = a.c),
      |lppr AS (
      |  SELECT x AS doc_id, c AS g, d AS df,
      |         row_number() OVER (PARTITION BY x ORDER BY d, c) AS rn
      |  FROM adjd),
      |lsz AS (SELECT c AS doc_id, d AS n FROM degb),
      |${lpCascadeJoinCtes(p, q, "//", "lppr", "lsz")},
      |floored AS (
      |  SELECT * FROM joined WHERE cnt >= $LinkPredictGenFloor),
      |${lpCand0Cte(p, q, "//", "floored")},
      |common AS (
      |  SELECT c.d1, c.d2, c.n1, c.n2, CAST(count(*) AS BIGINT) AS cm
      |  FROM cand0 c
      |  JOIN adjd a1 ON a1.x = c.d1
      |  JOIN adjd a2 ON a2.x = c.d2 AND a2.c = a1.c
      |  GROUP BY c.d1, c.d2, c.n1, c.n2),
      |qual AS (
      |  SELECT least(d1, d2) AS p1, greatest(d1, d2) AS p2
      |  FROM common
      |  WHERE cm >= $LinkPredictMinCommon AND $q * cm >= $p * (n1 + n2 - cm)),
      |nonedge AS (
      |  SELECT t.p1 FROM qual t
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM pairs e WHERE e.p1 = t.p1 AND e.p2 = t.p2))
      |SELECT (SELECT CAST(sum(n * (n - 1) // 2) AS BIGINT) FROM lsz)
      |         AS wedge_rows,
      |       (SELECT CAST(sum(cnt) AS BIGINT) FROM joined) AS prefix_rows,
      |       (SELECT count(*) FROM joined) AS prefix_pairs,
      |       (SELECT count(*) FROM floored) AS floor_pairs,
      |       (SELECT count(*) FROM cand0) AS bound_pairs,
      |       (SELECT count(*) FROM nonedge) AS qualifying_pairs""".stripMargin

  val graphLinkPredictCutSql: String = graphLinkPredictCutSqlAt(1, 3)

  // ── graph_bfs ★ (r12) — multi-source shortest hop distances ──────────
  // Frontier propagation from a fixed probe set (customers 1, 2 and
  // supplier 1 — present at every SF) over the bipartite graph: the
  // third Pregel shape next to pagerank (push-sum) and kcore (fixpoint)
  // — reachability/radius analysis, the BFS layer under connected
  // components, landmark distances, and influence-radius queries.
  //
  // Each round: dist' = min(dist, min over edges of neighbor dist + 1),
  // written as one equi-join + one (probe, node) min-aggregation — both
  // map-side combinable, pure BIGINT. [[BfsRounds]] = 8 is ≥2× the
  // probed eccentricity (3–4 at sf0.001–0.1); the final round must be a
  // fixpoint (loud require, the kcore discipline), and the oracle
  // replays all 8 rounds as generated CTEs. Unreached nodes are absent
  // in both engines.
  //
  // Scale shape (100 TB): the edge relation is the same cached
  // edge-resident layout the other iterative ops use (only the dist
  // vector shuffles); per round one join + one combine-heavy min-agg;
  // production BFS additionally tracks the CHANGED frontier to skip
  // settled nodes — at the fixture's diameter the dense-min form is the
  // oracle-replayable equivalent with identical output.
  /** Fixed BFS rounds; the last round must be a fixpoint. */
  val BfsRounds = 8
  /** Probe sources: (label, encoded node id) — custkeys 1, 2 ↦ 2c,
    * suppkey 1 ↦ 2s+1 (the pagerank encoding). */
  val BfsProbes: Seq[(String, Long)] =
    Seq(("cust_1", 2L), ("cust_2", 4L), ("supp_1", 3L))

  def graphBfs(spark: SparkSession, dir: String): DataFrame = {
    // Family-shared dst-partitioned edge relation (identical to
    // graph_kcore's — previously each built its own).
    val edges = bipartiteEdgesByDst(spark, dir)
    import spark.implicits._
    // Pin EVERY round (the text_spell_cluster loop discipline): the
    // self-union puts the previous round's lineage in the plan TWICE, so
    // unpinned rounds double the subplan count per iteration — measured
    // 47 s at sf0.1 unpinned vs seconds pinned. The pinned relation is
    // the small per-(probe, node) dist vector, never the edges.
    // Early-exit at the observed fixpoint (the graph_kcore argument:
    // converged min-propagation is idempotent, so the early answer IS
    // the oracle's fixed-round answer); BfsRounds stays the loud bound.
    // New entries only ever ADD rows (dist can't lose or change a
    // settled minimum upward), so row-count equality + no changed pair
    // is the full fixpoint test.
    var dist = BfsProbes.toDF("probe", "node").select(
      col("probe"), col("node"), lit(0L).as("d")).pinned()
    var changed = -1L
    var round = 0
    while (changed != 0L && round < BfsRounds) {
      // Fixpoint count as an observe() on the round's own pinned pass
      // (r15; replaces the per-round full-outer-join count job). The
      // old distance rides the tagged self-arm; entries only ever ADD
      // (a settled min never rises), so the full-outer's dist-only arm
      // was vacuous and changed ≡ count(old IS NULL OR d ≠ old).
      val obs = new org.apache.spark.sql.Observation()
      val next = dist
        .select(col("probe"), col("node"), col("d"), lit(true).as("own"))
        .union(edges.join(dist, edges("dst") === dist("node"))
          .select(col("probe"), edges("src").as("node"),
            (col("d") + 1L).as("d"), lit(false).as("own")))
        .groupBy("probe", "node")
        .agg(min(col("d")).as("d"), min(when(col("own"), col("d"))).as("old"))
        .observe(obs, count(when(col("old").isNull ||
          col("d") =!= col("old"), 1)).as("changed"))
        .select(col("probe"), col("node"), col("d"))
        .pinned()
      changed = obs.get("changed").asInstanceOf[Long]
      dist = next
      round += 1
    }
    require(changed == 0,
      s"graph_bfs: distances not a fixpoint after $BfsRounds rounds " +
        s"($changed entries still changing) — raise BfsRounds for this graph")
    dist.select(
      col("probe"),
      when(col("node") % 2 === 0, lit("customer"))
        .otherwise(lit("supplier")).as("node_type"),
      expr("node div 2").as("node_id"),
      col("d").as("dist"))
  }

  val graphBfsSql: String = {
    val probes = BfsProbes
      .map { case (p, n) => s"('$p', $n)" }.mkString(", ")
    // AS MATERIALIZED: each round references the previous CTE TWICE
    // (self-union + join) — inlined, the oracle's plan doubles per round
    // (the same pathology the Spark side pins away per round).
    val rounds = (1 to BfsRounds).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT probe, node, CAST(min(d) AS BIGINT) AS d FROM (
         |    SELECT probe, node, d FROM d${i - 1}
         |    UNION ALL
         |    SELECT p.probe, e.src AS node, p.d + 1 AS d
         |    FROM edges e JOIN d${i - 1} p ON p.node = e.dst)
         |  GROUP BY probe, node)""".stripMargin
    }.mkString(",\n")
    s"""WITH half AS (
       |  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |edges AS MATERIALIZED (
       |  SELECT src, dst FROM half
       |  UNION ALL
       |  SELECT dst AS src, src AS dst FROM half),
       |d0 AS (
       |  SELECT probe, CAST(node AS BIGINT) AS node, CAST(0 AS BIGINT) AS d
       |  FROM (VALUES $probes) AS q(probe, node)),
       |$rounds
       |SELECT probe,
       |       CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
       |         AS node_type,
       |       CAST(node // 2 AS BIGINT) AS node_id,
       |       d AS dist
       |FROM d$BfsRounds""".stripMargin
  }

  // ── graph_cc ★ (r12) — CONNECTED COMPONENTS over the strong-tie
  // co-purchase graph (part pairs sharing ≥ [[CcMinOrders]] orders —
  // the thresholded graph where components are non-trivial: 8 at
  // sf0.01, 2,308 at sf0.1): min-label propagation to a REQUIRED
  // fixpoint, per-node labels with component sizes joined back. The
  // product-family / substitute-group segmentation every catalog
  // pipeline derives before pricing or recommendation work.
  //
  // Each round is one equi-join (labels ⋈ edges) + one min-aggregation
  // — both map-side combinable, the BFS plan shape. [[CcRounds]] = 20
  // is ≈2× the probed fixpoint depth (4/11/11 across SFs) and the last
  // round must be a fixpoint (loud require). Min-label is O(diameter)
  // rounds — right for this graph's short chains; on diameter-heavy
  // billion-edge graphs the O(log n) alternative is star contraction,
  // which this library ships as dd_cluster_star (large-star/small-star
  // over the duplicate graph). The oracle replays all 20 rounds as
  // generated CTEs.
  /** Strong-tie support floor for the CC edge set. */
  val CcMinOrders = 2
  /** Fixed min-label rounds; the last round must be a fixpoint. */
  val CcRounds = 20

  def graphCc(spark: SparkSession, dir: String): DataFrame = {
    // Family-shared strong-tie edge relation (identical to graph_lpa's;
    // derived from the shared grouped co-purchase relation).
    val edges = strongTieEdges(spark, dir)
    // Per-round pins, same reason as graph_bfs: the self-union doubles
    // unpinned lineage per round; the pinned label vector is small.
    // Early-exit at the observed fixpoint, same argument as graph_bfs.
    var lab = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lab")).pinned()
    var changed = -1L
    var round = 0
    while (changed != 0L && round < CcRounds) {
      // The fixpoint count rides the round's OWN pinned pass as an
      // observe() (r15 — previously a separate join+count job per
      // round): the old label is the min over the tagged self-arm
      // (every node appears there exactly once), so changed =
      // count(new ≠ old) is exact by construction.
      val obs = new org.apache.spark.sql.Observation()
      val next = lab.select(col("node"), col("lab"), lit(true).as("own"))
        .union(edges.join(lab, edges("dst") === lab("node"))
          .select(edges("src").as("node"), col("lab"), lit(false).as("own")))
        .groupBy("node")
        .agg(min(col("lab")).as("lab"),
          min(when(col("own"), col("lab"))).as("old"))
        .observe(obs,
          count(when(col("lab") =!= col("old"), 1)).as("changed"))
        .select(col("node"), col("lab"))
        .pinned()
      changed = obs.get("changed").asInstanceOf[Long]
      lab = next
      round += 1
    }
    require(changed == 0,
      s"graph_cc: labels not a fixpoint after $CcRounds rounds " +
        s"($changed nodes still changing) — raise CcRounds for this graph")
    val sizes = lab.groupBy("lab").agg(count(lit(1)).as("comp_size"))
    lab.join(sizes, "lab")
      .select(col("node").as("part_id"), col("lab").as("component"),
        col("comp_size"))
  }

  val graphCcSql: String = {
    // AS MATERIALIZED — same double-reference reason as graphBfsSql.
    val rounds = (1 to CcRounds).map { i =>
      s"""l$i AS MATERIALIZED (
         |  SELECT node, CAST(min(lab) AS BIGINT) AS lab FROM (
         |    SELECT node, lab FROM l${i - 1}
         |    UNION ALL
         |    SELECT e.src AS node, p.lab
         |    FROM edges e JOIN l${i - 1} p ON p.node = e.dst)
         |  GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH half AS (
       |  SELECT p1, p2 FROM (
       |    SELECT a.l_partkey AS p1, b.l_partkey AS p2,
       |           count(*) AS n_orders
       |    FROM lineitem a JOIN lineitem b
       |      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |    GROUP BY a.l_partkey, b.l_partkey)
       |  WHERE n_orders >= $CcMinOrders),
       |edges AS MATERIALIZED (
       |  SELECT p1 AS src, p2 AS dst FROM half
       |  UNION ALL
       |  SELECT p2 AS src, p1 AS dst FROM half),
       |l0 AS (
       |  SELECT node, node AS lab
       |  FROM (SELECT DISTINCT src AS node FROM edges)),
       |$rounds,
       |sizes AS (
       |  SELECT lab, CAST(count(*) AS BIGINT) AS comp_size
       |  FROM l$CcRounds GROUP BY lab)
       |SELECT l.node AS part_id, l.lab AS component, s.comp_size
       |FROM l$CcRounds l JOIN sizes s ON s.lab = l.lab""".stripMargin
  }

  // ── graph_lpa ★ (r12) — LABEL-PROPAGATION COMMUNITIES (Raghavan et
  // al. 2007) over the strong-tie co-purchase graph (graph_cc's edge
  // set): each round every node adopts the PLURALITY label among its
  // neighbors, ties broken by the smaller label — the near-linear
  // community detector (finer than connected components: cc finds the
  // 2,308 islands at sf0.1, LPA splits the big ones into dense cores)
  // that product-family and fraud-ring pipelines run when modularity
  // methods are too expensive. Fully DETERMINISTIC synchronous variant:
  // the plurality argmax is (count DESC, label ASC) — no randomized
  // order, so runs are bit-identical and the DuckDB oracle REPLAYS all
  // [[LpaRounds]] rounds as generated CTEs. Synchronous LPA may
  // oscillate on bipartite-ish subgraphs instead of converging; the
  // contract is therefore the FIXED-ROUND label vector (identical in
  // both engines regardless), with an early exit only at an OBSERVED
  // fixpoint — the update is a deterministic function of the label
  // vector, so a fixpoint is idempotent and the early answer IS the
  // fixed-round answer (the graph_bfs/graph_cc argument).
  //
  // Scale shape (100 TB): per round ONE equi-join (labels ⋈ edges, the
  // edge relation resident/bucketed — only the label vector shuffles),
  // one map-side-combined (node, label) count, and a per-node plurality
  // pick. The pick is a per-node window over the COUNTED label
  // histogram (≤ deg distinct labels per node, not the raw neighbor
  // stream); round count is a small constant.
  /** Fixed synchronous LPA rounds; early exit only at a fixpoint. */
  val LpaRounds = 12

  def graphLpa(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Family-shared strong-tie edge relation (identical to graph_cc's).
    val edges = strongTieEdges(spark, dir)
    // Per-round pins (the label vector is per-node small); the plurality
    // pick runs on the aggregated histogram, never the neighbor stream.
    var lab = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lab")).pinned()
    var changed = -1L
    var round = 0
    while (changed != 0L && round < LpaRounds) {
      val votes = edges.join(lab, edges("dst") === lab("node"))
        .groupBy(edges("src").as("node"), col("lab"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("node")
        .orderBy(col("cnt").desc, col("lab"))
      // Fixpoint count as an observe() on the round's own pinned pass
      // (r15): the old label joins into the pass (per-node relation,
      // one row each; every voted node is in lab and vice versa — the
      // same inner join the separate per-round count job used to run).
      val obs = new org.apache.spark.sql.Observation()
      val next = votes
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") === 1)
        .select(col("node"), col("lab"))
        .join(lab.select(col("node"), col("lab").as("old")), "node")
        .observe(obs,
          count(when(col("lab") =!= col("old"), 1)).as("changed"))
        .select(col("node"), col("lab"))
        .pinned()
      changed = obs.get("changed").asInstanceOf[Long]
      lab = next
      round += 1
    }
    // NO fixpoint require — oscillation is legal for synchronous LPA;
    // the oracle replays the same LpaRounds rounds either way.
    val sizes = lab.groupBy("lab").agg(count(lit(1)).as("comm_size"))
    lab.join(sizes, "lab")
      .select(col("node").as("part_id"), col("lab").as("community"),
        col("comm_size"))
  }

  val graphLpaSql: String = {
    // AS MATERIALIZED — each round's histogram is consumed by the window
    // pick; inlined, DuckDB re-expands the per-round chain.
    val rounds = (1 to LpaRounds).map { i =>
      s"""l$i AS MATERIALIZED (
         |  SELECT node, lab FROM (
         |    SELECT node, lab,
         |           row_number() OVER (PARTITION BY node
         |             ORDER BY cnt DESC, lab) AS rnk
         |    FROM (
         |      SELECT e.src AS node, p.lab, count(*) AS cnt
         |      FROM edges e JOIN l${i - 1} p ON p.node = e.dst
         |      GROUP BY e.src, p.lab))
         |  WHERE rnk = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH half AS (
       |  SELECT p1, p2 FROM (
       |    SELECT a.l_partkey AS p1, b.l_partkey AS p2,
       |           count(*) AS n_orders
       |    FROM lineitem a JOIN lineitem b
       |      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |    GROUP BY a.l_partkey, b.l_partkey)
       |  WHERE n_orders >= $CcMinOrders),
       |edges AS MATERIALIZED (
       |  SELECT p1 AS src, p2 AS dst FROM half
       |  UNION ALL
       |  SELECT p2 AS src, p1 AS dst FROM half),
       |l0 AS (
       |  SELECT node, node AS lab
       |  FROM (SELECT DISTINCT src AS node FROM edges)),
       |$rounds,
       |sizes AS (
       |  SELECT lab, CAST(count(*) AS BIGINT) AS comm_size
       |  FROM l$LpaRounds GROUP BY lab)
       |SELECT l.node AS part_id, l.lab AS community, s.comm_size
       |FROM l$LpaRounds l JOIN sizes s ON s.lab = l.lab""".stripMargin
  }

  // ── graph_hits ★ (r12) — HITS hubs & authorities (Kleinberg 1999)
  // over the DIRECTED customer→supplier purchase graph: hub scores on
  // customers (buy from many good suppliers), authority scores on
  // suppliers (bought by many good hubs) — the mutual-reinforcement
  // ranking (the other classic link-analysis eigenvector next to
  // PageRank) a marketplace runs to find power buyers and anchor
  // vendors. ENGINE-EXACT: scores live in integer nano-units
  // (SCALE = 1e9); each half-round is one equi-join + sum, then an
  // L1 normalization by the 1-row total with floor division — pure
  // BIGINT both engines compute bit-identically (products bounded by
  // SCALE² = 1e18 < 2⁶³). The DuckDB oracle replays all [[HitsRounds]]
  // rounds as generated CTEs (the pagerank discipline).
  //
  // Scale shape (100 TB): per half-round ONE equi-join against the
  // resident edge relation (only the score vector shuffles), one
  // map-side-combined sum, and a 1-row total cross-joined back
  // (bounded scalar, the allowlisted pattern). Output is two
  // TakeOrderedAndProject top-10s — no global sort, no windows.
  /** Score nano-units: each vector L1-normalizes to ~HitsScale. */
  val HitsScale = 1000000000L
  /** Fixed HITS rounds (convergence is geometric; count is constant). */
  val HitsRounds = 4

  def graphHits(spark: SparkSession, dir: String): DataFrame = {
    // Directed edges: customer → supplier, distinct — the family-shared
    // bipartite pair relation through the bijective decode (c ↦ 2c,
    // s ↦ 2s+1 are injective, so the decoded projection stays distinct).
    // Resident (checkpoint blocks) for all 2·HitsRounds joins.
    val edges = bipartiteHalf(spark, dir)
      .select(expr("src div 2").as("src"), expr("dst div 2").as("dst"))
    val nHubs = edges.select("src").distinct().count() // bounded metadata
    val h0 = HitsScale / nHubs

    // One half-round: propagate `prev` (node, s) across `edges` keyed by
    // `from`→`to`, then L1-normalize by the total (floor div). The total
    // is a 1-row aggregate — bounded driver metadata (the pagerank
    // node-count / KMeansTrainer discipline), fetched with the same
    // action that materializes the pin, so each half-round costs ONE
    // pinned stage instead of two (measured 7.3 s → under 5 s at sf0.1).
    def halfRound(prev: DataFrame, from: String, to: String): DataFrame = {
      val raw = edges.join(prev, edges(from) === prev("node"))
        .groupBy(edges(to).as("node"))
        .agg(sum(col("s")).as("raw"))
        .pinned() // consumed by the total AND the normalize
      val tot = raw.agg(sum(col("raw"))).head.getLong(0)
      raw.select(col("node"), expr(s"(raw * $HitsScale) div $tot").as("s"))
    }

    var hub = edges.select(col("src").as("node")).distinct()
      .select(col("node"), lit(h0).as("s")).pinned()
    var auth: DataFrame = null
    for (_ <- 1 to HitsRounds) {
      auth = halfRound(hub, "src", "dst")
      hub = halfRound(auth, "dst", "src")
    }
    val topHubs = hub
      .select(lit("customer").as("node_type"), col("node").as("node_id"),
        col("s").as("score_nano"))
      .orderBy(col("score_nano").desc, col("node_id")).limit(10)
    val topAuths = auth
      .select(lit("supplier").as("node_type"), col("node").as("node_id"),
        col("s").as("score_nano"))
      .orderBy(col("score_nano").desc, col("node_id")).limit(10)
    topHubs.union(topAuths)
  }

  val graphHitsSql: String = {
    // Each round: raw sums AS MATERIALIZED (consumed by both the 1-row
    // total and the normalize — inlined, the chain doubles per round,
    // the graph_bfs pathology).
    def half(i: Int, out: String, prev: String, from: String, to: String) =
      s"""${out}raw$i AS MATERIALIZED (
         |  SELECT e.$to AS node, CAST(sum(p.s) AS BIGINT) AS raw
         |  FROM edges e JOIN $prev p ON p.node = e.$from
         |  GROUP BY e.$to),
         |$out$i AS MATERIALIZED (
         |  SELECT node, CAST((raw * $HitsScale) // t.tot AS BIGINT) AS s
         |  FROM ${out}raw$i
         |  CROSS JOIN (SELECT sum(raw) AS tot FROM ${out}raw$i) t)""".stripMargin
    val rounds = (1 to HitsRounds).map { i =>
      half(i, "a", s"h${i - 1}", "src", "dst") + ",\n" +
        half(i, "h", s"a$i", "dst", "src")
    }.mkString(",\n")
    s"""WITH edges AS MATERIALIZED (
       |  SELECT DISTINCT o.o_custkey AS src, l.l_suppkey AS dst
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |h0 AS (
       |  SELECT node, CAST($HitsScale // c.n AS BIGINT) AS s
       |  FROM (SELECT DISTINCT src AS node FROM edges)
       |  CROSS JOIN (SELECT count(DISTINCT src) AS n FROM edges) c),
       |$rounds
       |SELECT * FROM (
       |  SELECT 'customer' AS node_type, node AS node_id, s AS score_nano
       |  FROM h$HitsRounds ORDER BY s DESC, node LIMIT 10)
       |UNION ALL
       |SELECT * FROM (
       |  SELECT 'supplier' AS node_type, node AS node_id, s AS score_nano
       |  FROM a$HitsRounds ORDER BY s DESC, node LIMIT 10)""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (graphPagerank _),
    "graph_triangles" -> (graphTriangles _),
    "graph_kcore" -> (graphKcore _),
    "graph_link_predict" -> (graphLinkPredict _),
    "graph_link_predict_pruned" -> (graphLinkPredictPruned _),
    "graph_link_predict_pruned_t20" -> (graphLinkPredictPrunedT20 _),
    "graph_link_predict_cut" -> (graphLinkPredictCut _),
    "graph_link_predict_cut_t20" -> (graphLinkPredictCutT20 _),
    "graph_bfs" -> (graphBfs _),
    "graph_cc" -> (graphCc _),
    "graph_lpa" -> (graphLpa _),
    "graph_hits" -> (graphHits _))

  val oracle: Map[String, String] = Map(
    "graph_pagerank" -> graphPagerankSql,
    "graph_triangles" -> graphTrianglesSql,
    "graph_kcore" -> graphKcoreSql,
    "graph_link_predict" -> graphLinkPredictSql,
    "graph_link_predict_pruned" -> graphLinkPredictPrunedSql,
    "graph_link_predict_pruned_t20" -> graphLinkPredictPrunedSqlAt(1, 20),
    "graph_link_predict_cut" -> graphLinkPredictCutSql,
    "graph_link_predict_cut_t20" -> graphLinkPredictCutSqlAt(1, 20),
    "graph_bfs" -> graphBfsSql,
    "graph_cc" -> graphCcSql,
    "graph_lpa" -> graphLpaSql,
    "graph_hits" -> graphHitsSql)
}
