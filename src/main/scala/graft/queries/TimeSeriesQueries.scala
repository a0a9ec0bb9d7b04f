package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.fixtures.SyntheticCdc

/** Time-series similarity search over behavioral activity series — the
  * EDBT/ICDE distributed-similarity-search family (PAA/SAX indexing,
  * GEMINI lower-bound pruning) the catalog was missing: each user's
  * 30-day activity-count series is reduced to K Piecewise Aggregate
  * Approximation segments, probes rank neighbors by exact integer PAA
  * distance, and the famous PAA LOWER-BOUND property (Keogh et al. 2001:
  * paa_dist/m lower-bounds the full squared distance — Cauchy–Schwarz
  * per segment) is emitted as a machine-checked witness column per
  * result pair, not assumed.
  *
  * Engine-exact: day indexes are integer floor-divisions of epoch
  * microseconds, segment sums and all distances are exact BIGINT sums of
  * squares (no float ever), and the full-series distance uses the
  * norm²+norm²−2·inner identity over the SHARED days equi-join — sparse
  * series need no dense alignment or full-outer join.
  *
  * Scale shape (100 TB): the series build is ONE map-side-combined
  * (user, day) count; PAA is a second (user, segment) agg (K rows/user —
  * the dimensionality cut that makes the index fit); the probe scoring
  * is a broadcast of probes·K segment rows against the corpus's PAA
  * relation (equi-join on segment, group by pair); the witness joins are
  * probe-day broadcasts. At production the PAA words feed a SAX-style
  * bucketed index and the lower bound prunes candidates before any full
  * series is touched — the GEMINI recipe; here the bound is verified on
  * every emitted pair instead.
  */
object TimeSeriesQueries {

  /** PAA segments per series (30 fixture days → 6 segments of 5). */
  val Segments = 6
  /** Days per segment. */
  val SegDays = 5

  def tsPaaTopk(spark: SparkSession, dir: String): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    spark.sql(
      s"""WITH bounds AS (SELECT min(unix_micros(ts)) AS t0 FROM events_t),
         |days AS (
         |  SELECT user_id,
         |         CAST((unix_micros(ts) - b.t0) div 86400000000 AS BIGINT) AS day,
         |         CAST(count(*) AS BIGINT) AS c
         |  FROM events_t CROSS JOIN bounds b
         |  GROUP BY user_id, (unix_micros(ts) - b.t0) div 86400000000),
         |paa AS (
         |  SELECT user_id, CAST(day div $SegDays AS INT) AS seg,
         |         CAST(sum(c) AS BIGINT) AS s
         |  FROM days WHERE day div $SegDays < $Segments
         |  GROUP BY user_id, CAST(day div $SegDays AS INT)),
         |norms AS (
         |  SELECT user_id, CAST(sum(c * c) AS BIGINT) AS n2
         |  FROM days GROUP BY user_id),
         |probes AS (SELECT user_id AS p FROM (SELECT DISTINCT user_id
         |           FROM events_t) WHERE user_id < 3),
         |paa_dist AS (
         |  SELECT pr.p, o.user_id,
         |         CAST(sum((coalesce(a.s, 0) - o.s) *
         |                  (coalesce(a.s, 0) - o.s)) AS BIGINT) AS paa_d
         |  FROM probes pr
         |  JOIN paa o ON o.user_id != pr.p
         |  LEFT JOIN paa a ON a.user_id = pr.p AND a.seg = o.seg
         |  GROUP BY pr.p, o.user_id),
         |inner_prod AS (
         |  SELECT pr.p, o.user_id, CAST(sum(a.c * o.c) AS BIGINT) AS ip
         |  FROM probes pr
         |  JOIN days a ON a.user_id = pr.p
         |  JOIN days o ON o.day = a.day AND o.user_id != pr.p
         |  GROUP BY pr.p, o.user_id),
         |full_dist AS (
         |  SELECT d.p, d.user_id,
         |         na.n2 + nb.n2 - 2 * coalesce(i.ip, 0) AS full_d
         |  FROM paa_dist d
         |  JOIN norms na ON na.user_id = d.p
         |  JOIN norms nb ON nb.user_id = d.user_id
         |  LEFT JOIN inner_prod i ON i.p = d.p AND i.user_id = d.user_id),
         |ranked AS (
         |  SELECT d.p, d.user_id, d.paa_d, f.full_d,
         |         CASE WHEN d.paa_d div $SegDays <= f.full_d THEN 1 ELSE 0 END
         |           AS lb_ok,
         |         row_number() OVER (PARTITION BY d.p
         |           ORDER BY d.paa_d, d.user_id) AS rnk
         |  FROM paa_dist d
         |  JOIN full_dist f ON f.p = d.p AND f.user_id = d.user_id)
         |SELECT p AS probe_user, user_id, paa_d, full_d,
         |       CAST(lb_ok AS INT) AS lb_ok, CAST(rnk AS INT) AS rnk
         |FROM ranked WHERE rnk <= 3""".stripMargin)
  }

  val tsPaaTopkSql: String =
    s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
       |bounds AS (SELECT min(us) AS t0 FROM ev),
       |days AS (
       |  SELECT user_id, CAST((us - b.t0) // 86400000000 AS BIGINT) AS day,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM ev CROSS JOIN bounds b
       |  GROUP BY user_id, (us - b.t0) // 86400000000),
       |paa AS (
       |  SELECT user_id, CAST(day // $SegDays AS INT) AS seg,
       |         CAST(sum(c) AS BIGINT) AS s
       |  FROM days WHERE day // $SegDays < $Segments
       |  GROUP BY user_id, CAST(day // $SegDays AS INT)),
       |norms AS (
       |  SELECT user_id, CAST(sum(c * c) AS BIGINT) AS n2
       |  FROM days GROUP BY user_id),
       |probes AS (SELECT user_id AS p FROM (SELECT DISTINCT user_id FROM ev)
       |           WHERE user_id < 3),
       |paa_dist AS (
       |  SELECT pr.p, o.user_id,
       |         CAST(sum((coalesce(a.s, 0) - o.s) *
       |                  (coalesce(a.s, 0) - o.s)) AS BIGINT) AS paa_d
       |  FROM probes pr
       |  JOIN paa o ON o.user_id != pr.p
       |  LEFT JOIN paa a ON a.user_id = pr.p AND a.seg = o.seg
       |  GROUP BY pr.p, o.user_id),
       |inner_prod AS (
       |  SELECT pr.p, o.user_id, CAST(sum(a.c * o.c) AS BIGINT) AS ip
       |  FROM probes pr
       |  JOIN days a ON a.user_id = pr.p
       |  JOIN days o ON o.day = a.day AND o.user_id != pr.p
       |  GROUP BY pr.p, o.user_id),
       |full_dist AS (
       |  SELECT d.p, d.user_id,
       |         na.n2 + nb.n2 - 2 * coalesce(i.ip, 0) AS full_d
       |  FROM paa_dist d
       |  JOIN norms na ON na.user_id = d.p
       |  JOIN norms nb ON nb.user_id = d.user_id
       |  LEFT JOIN inner_prod i ON i.p = d.p AND i.user_id = d.user_id),
       |ranked AS (
       |  SELECT d.p, d.user_id, d.paa_d, f.full_d,
       |         CASE WHEN d.paa_d // $SegDays <= f.full_d THEN 1 ELSE 0 END
       |           AS lb_ok,
       |         row_number() OVER (PARTITION BY d.p
       |           ORDER BY d.paa_d, d.user_id) AS rnk
       |  FROM paa_dist d
       |  JOIN full_dist f ON f.p = d.p AND f.user_id = d.user_id)
       |SELECT p AS probe_user, user_id, paa_d, full_d,
       |       CAST(lb_ok AS INT) AS lb_ok, CAST(rnk AS INT) AS rnk
       |FROM ranked WHERE rnk <= 3""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_paa_topk" -> (tsPaaTopk _))

  val oracle: Map[String, String] = Map(
    "ts_paa_topk" -> tsPaaTopkSql)
}
