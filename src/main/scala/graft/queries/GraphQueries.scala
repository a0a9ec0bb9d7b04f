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

  def graphPagerank(spark: SparkSession, dir: String): DataFrame = {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"))
    // Node encoding: customer c ↦ 2c, supplier s ↦ 2s+1 (disjoint keys).
    // The distinct pair relation and the degree table are CACHED: r0, the
    // final join, and the node count all read them — uncached, each
    // consumer re-runs the orders⋈lineitem build (16 parquet scans in the
    // full plan; 2 with the caches).
    val half = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
      .persist()
    val edges = half.union(half.select(col("dst").as("src"), col("src").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d")).persist()
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
  def graphTriangles(spark: SparkSession, dir: String): DataFrame = {
    spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
      .repartition(spark.sparkContext.defaultParallelism)
      .createOrReplaceTempView("li_t")
    // The distinct co-purchase edge relation feeds degree + orientation
    // (and through `oriented`, three join legs): pin it once — uncached,
    // Catalyst re-runs the self-join explode per consumer.
    spark.sql(
      """SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
        |FROM li_t a JOIN li_t b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey""".stripMargin)
      .pinned()
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (graphPagerank _),
    "graph_triangles" -> (graphTriangles _))

  val oracle: Map[String, String] = Map(
    "graph_pagerank" -> graphPagerankSql,
    "graph_triangles" -> graphTrianglesSql)
}
