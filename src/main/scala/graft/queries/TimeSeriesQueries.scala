package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.fixtures.SyntheticCdc
import graft.operators.Pin.PinSyntax

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
  /** SAX alphabet size (2 bits/segment). */
  val SaxLevels = 4

  /** The shared series prologue (bounds → days → DENSE paa),
    * parameterized on the integer-division spelling and the 0..K-1
    * segment generator — ONE text for both engines so the two ts_
    * queries (and the two engines) cannot drift. `paa` is DENSIFIED
    * (every user × every segment, empty windows = 0): a sparse relation
    * silently drops (s_probe − 0)² terms for users with an event-free
    * window, underestimating their distance (one such user exists at
    * sf0.1). */
  private def seriesCtes(idiv: String, table: String, usExpr: String,
      segGrid: String): String =
    s"""bounds AS (SELECT min($usExpr) AS t0 FROM $table),
       |days AS (
       |  SELECT user_id,
       |         CAST(($usExpr - b.t0) $idiv 86400000000 AS BIGINT) AS day,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM $table CROSS JOIN bounds b
       |  GROUP BY user_id, ($usExpr - b.t0) $idiv 86400000000),
       |paa_sparse AS (
       |  SELECT user_id, CAST(day $idiv $SegDays AS INT) AS seg,
       |         CAST(sum(c) AS BIGINT) AS s
       |  FROM days WHERE day $idiv $SegDays < $Segments
       |  GROUP BY user_id, CAST(day $idiv $SegDays AS INT)),
       |paa AS (
       |  SELECT u.user_id, g.seg, coalesce(p.s, CAST(0 AS BIGINT)) AS s
       |  FROM (SELECT DISTINCT user_id FROM days) u
       |  CROSS JOIN ($segGrid) g
       |  LEFT JOIN paa_sparse p ON p.user_id = u.user_id AND p.seg = g.seg)""".stripMargin

  private def seriesSpark = seriesCtes("div", "events_t", "unix_micros(ts)",
    s"SELECT CAST(x AS INT) AS seg FROM (SELECT explode(sequence(0, ${Segments - 1})) AS x)")
  private def seriesDuck =
    "ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),\n" +
      seriesCtes("//", "ev", "us",
        s"SELECT CAST(unnest(range(0, $Segments)) AS INT) AS seg")

  /** Everything after the prologue differs between engines ONLY in the
    * integer-division token: one body text, two renderings. */
  private def paaCommon(idiv: String): String =
    s"""norms AS (
       |  SELECT user_id, CAST(sum(c * c) AS BIGINT) AS n2
       |  FROM days GROUP BY user_id),
       |probes AS (SELECT user_id AS p FROM (SELECT DISTINCT user_id
       |           FROM days) d WHERE user_id < 3),
       |paa_dist AS (
       |  SELECT pr.p, o.user_id,
       |         CAST(sum((a.s - o.s) * (a.s - o.s)) AS BIGINT) AS paa_d
       |  FROM probes pr
       |  JOIN paa o ON o.user_id != pr.p
       |  JOIN paa a ON a.user_id = pr.p AND a.seg = o.seg
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
       |         CASE WHEN d.paa_d $idiv $SegDays <= f.full_d THEN 1 ELSE 0 END
       |           AS lb_ok,
       |         row_number() OVER (PARTITION BY d.p
       |           ORDER BY d.paa_d, d.user_id) AS rnk
       |  FROM paa_dist d
       |  JOIN full_dist f ON f.p = d.p AND f.user_id = d.user_id)""".stripMargin

  private val paaTopkSelect: String =
    """SELECT p AS probe_user, user_id, paa_d, full_d,
      |       CAST(lb_ok AS INT) AS lb_ok, CAST(rnk AS INT) AS rnk
      |FROM ranked WHERE rnk <= 3""".stripMargin

  def tsPaaTopk(spark: SparkSession, dir: String): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    spark.sql(s"WITH $seriesSpark,\n${paaCommon("div")}\n$paaTopkSelect")
  }

  val tsPaaTopkSql: String = s"WITH $seriesDuck,\n${paaCommon("//")}\n$paaTopkSelect"

  // ── ts_sax_prune ★ (r11) — the iSAX INDEX demonstrated, with a
  // machine-checked ADMISSIBILITY witness: every user's PAA vector
  // discretizes to a 6-symbol SAX word (2 bits/segment, equal-width
  // integer breakpoints over the corpus PAA range — packed into one
  // BIGINT, no string assembly), words group into buckets, and for each
  // probe the per-bucket MINDIST (Σ per-segment squared gap to the
  // level's EXACT integer bounds — every member's segment sum lies
  // inside its level bounds by construction, so MINDIST lower-bounds the
  // distance to every bucket member) prunes buckets whose bound exceeds
  // the probe's current k-th-best distance. The output is the pruning
  // report per probe — buckets/users pruned vs scanned — plus
  // `admissible_violations`: the count of TRUE top-3 neighbors living in
  // a pruned bucket, pinned 0 by the oracle compare. That is the GEMINI
  // no-false-dismissal guarantee as a checked column, not a citation.
  //
  // Scale shape: words/buckets are one more K-rows/user map +
  // ≤levels^K-row agg; the MINDIST table is probes × buckets × K —
  // bounded by the alphabet, not the corpus; at production the bucket
  // relation IS the index (partitioned by word), probes read only
  // unpruned partitions, and the admissibility column is the regression
  // test that the integer breakpoint math never clips a true neighbor.
  private def saxBody(idiv: String, shl: (String, String) => String): String = {
    val one = "CAST(1 AS BIGINT)"
    s"""rng AS (SELECT min(s) AS lo, max(s) AS hi FROM paa),
       |lv AS (
       |  SELECT p.user_id, p.seg,
       |         least($SaxLevels - 1,
       |               (p.s - r.lo) * $SaxLevels $idiv (r.hi - r.lo + 1)) AS l
       |  FROM paa p CROSS JOIN rng r),
       |words AS (
       |  SELECT user_id,
       |         CAST(sum(${shl("l", "2 * seg")}) AS BIGINT) AS word
       |  FROM lv GROUP BY user_id),
       |buckets AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS n_users
       |  FROM words GROUP BY word),
       |top3 AS (SELECT p, user_id, paa_d FROM ranked WHERE rnk <= 3),
       |kth AS (SELECT p, max(paa_d) AS t FROM top3 GROUP BY p),
       |bucket_lv AS (
       |  SELECT b.word, b.n_users, g.seg,
       |         CAST((b.word $idiv ${shl(one, "2 * g.seg")}) % $SaxLevels AS BIGINT)
       |           AS l
       |  FROM buckets b CROSS JOIN (SELECT DISTINCT seg FROM paa) g),
       |mind AS (
       |  SELECT pp.user_id AS p, bl.word,
       |         CAST(sum(
       |           CASE WHEN pp.s < r.lo + (bl.l * (r.hi - r.lo + 1)
       |                                    + $SaxLevels - 1) $idiv $SaxLevels
       |                THEN (r.lo + (bl.l * (r.hi - r.lo + 1)
       |                              + $SaxLevels - 1) $idiv $SaxLevels - pp.s)
       |                     * (r.lo + (bl.l * (r.hi - r.lo + 1)
       |                                + $SaxLevels - 1) $idiv $SaxLevels - pp.s)
       |                WHEN pp.s > r.lo + ((bl.l + 1) * (r.hi - r.lo + 1)
       |                                    + $SaxLevels - 1) $idiv $SaxLevels - 1
       |                THEN (pp.s - (r.lo + ((bl.l + 1) * (r.hi - r.lo + 1)
       |                              + $SaxLevels - 1) $idiv $SaxLevels - 1))
       |                     * (pp.s - (r.lo + ((bl.l + 1) * (r.hi - r.lo + 1)
       |                                + $SaxLevels - 1) $idiv $SaxLevels - 1))
       |                ELSE 0 END) AS BIGINT) AS mindist
       |  FROM (SELECT user_id, seg, s FROM paa WHERE user_id < 3) pp
       |  JOIN bucket_lv bl ON bl.seg = pp.seg
       |  CROSS JOIN rng r
       |  GROUP BY pp.user_id, bl.word),
       |pruned AS (
       |  SELECT m.p, m.word,
       |         CASE WHEN m.mindist > k.t THEN 1 ELSE 0 END AS is_pruned
       |  FROM mind m JOIN kth k ON k.p = m.p),
       |viol AS (
       |  SELECT t.p, CAST(count(*) AS BIGINT) AS v
       |  FROM top3 t
       |  JOIN words w ON w.user_id = t.user_id
       |  JOIN pruned pr ON pr.p = t.p AND pr.word = w.word
       |  WHERE pr.is_pruned = 1
       |  GROUP BY t.p)
       |SELECT pr.p AS probe_user,
       |       CAST(count(*) AS BIGINT) AS n_buckets,
       |       CAST(sum(pr.is_pruned) AS BIGINT) AS buckets_pruned,
       |       CAST(sum(b.n_users) AS BIGINT) AS users_total,
       |       CAST(sum(CASE WHEN pr.is_pruned = 1 THEN b.n_users ELSE 0 END)
       |         AS BIGINT) AS users_pruned,
       |       CAST(coalesce(max(v.v), 0) AS BIGINT) AS admissible_violations
       |FROM pruned pr
       |JOIN buckets b ON b.word = pr.word
       |LEFT JOIN viol v ON v.p = pr.p
       |GROUP BY pr.p""".stripMargin
  }

  def tsSaxPrune(spark: SparkSession, dir: String): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    spark.sql(s"WITH $seriesSpark,\n${paaCommon("div")},\n" +
      saxBody("div", (a, b) => s"shiftleft(CAST($a AS BIGINT), $b)"))
  }

  /** Sakoe–Chiba band half-width for the LB_Keogh envelopes. */
  val Band = 2
  /** Dense series length (the fixture's 30-day span). */
  val SpanDays = 30

  // ── ts_lbkeogh ★ (r11) — envelope lower bounds toward ELASTIC
  // matching: per candidate series, the Sakoe–Chiba band-r upper/lower
  // ENVELOPES (running max/min over a ±r-day RANGE window — the window
  // pattern the catalog lacked), and per (probe, candidate) the LB_Keogh
  // bound: Σ (q_i − U_i)² where q pokes above the envelope, (L_i − q_i)²
  // where it dips below, 0 inside. The chain LB_Keogh ≤ DTW ≤ ED is the
  // foundation of every elastic-distance index (Keogh & Ratanamahatana
  // 2005); full DTW is r12's recursive step, but the SANDWICH ENDS are
  // exactly computable today, so `sandwich_ok` (lb ≤ exact Euclidean
  // distance) is emitted and oracle-pinned per result pair — a bound
  // violation anywhere fails the hash, making the envelope math itself
  // machine-checked.
  //
  // Engine-exact: dense 30-day integer vectors (missing days = 0),
  // RANGE-frame max/min, BIGINT sums of squares throughout. Scale shape:
  // the dense grid is 30 rows/user by construction; envelopes are one
  // user-partitioned window pass; probe scoring broadcasts 3×30 probe
  // days against the envelope relation (equi-join on day); top-3 by
  // exact ED with the bound riding along.
  /** The shared envelope/bound prologue (dense grid → Sakoe–Chiba
    * envelopes → LB_Keogh + exact ED per probe pair) — ONE text consumed
    * by both ts_lbkeogh and ts_dtw_topk, in both engines. */
  private def envLbCtes: String =
    s"""dgrid AS (
       |  SELECT u.user_id, g.day, coalesce(d.c, CAST(0 AS BIGINT)) AS c
       |  FROM (SELECT DISTINCT user_id FROM days) u
       |  CROSS JOIN (SELECT CAST(seg AS BIGINT) * $SegDays + o.off AS day
       |              FROM (SELECT DISTINCT seg FROM paa) s
       |              CROSS JOIN (SELECT CAST(0 AS BIGINT) AS off UNION ALL
       |                          SELECT 1 UNION ALL SELECT 2 UNION ALL
       |                          SELECT 3 UNION ALL SELECT 4) o) g
       |  LEFT JOIN days d ON d.user_id = u.user_id AND d.day = g.day),
       |env AS (
       |  SELECT user_id, day, c,
       |         max(c) OVER (PARTITION BY user_id ORDER BY day
       |           RANGE BETWEEN $Band PRECEDING AND $Band FOLLOWING) AS u_env,
       |         min(c) OVER (PARTITION BY user_id ORDER BY day
       |           RANGE BETWEEN $Band PRECEDING AND $Band FOLLOWING) AS l_env
       |  FROM dgrid),
       |probe_days AS (
       |  SELECT user_id AS p, day, c AS q FROM dgrid WHERE user_id < 3),
       |lb AS (
       |  SELECT pd.p, e.user_id,
       |         CAST(sum(CASE WHEN pd.q > e.u_env
       |                       THEN (pd.q - e.u_env) * (pd.q - e.u_env)
       |                       WHEN pd.q < e.l_env
       |                       THEN (e.l_env - pd.q) * (e.l_env - pd.q)
       |                       ELSE 0 END) AS BIGINT) AS lb_keogh
       |  FROM probe_days pd
       |  JOIN env e ON e.day = pd.day AND e.user_id != pd.p
       |  GROUP BY pd.p, e.user_id),
       |ed AS (
       |  SELECT pd.p, g.user_id,
       |         CAST(sum((pd.q - g.c) * (pd.q - g.c)) AS BIGINT) AS full_d
       |  FROM probe_days pd
       |  JOIN dgrid g ON g.day = pd.day AND g.user_id != pd.p
       |  GROUP BY pd.p, g.user_id)""".stripMargin

  private def lbkeoghBody: String =
    s"""$envLbCtes,
       |scored AS (
       |  SELECT l.p, l.user_id, l.lb_keogh, e.full_d,
       |         CASE WHEN l.lb_keogh <= e.full_d THEN 1 ELSE 0 END AS sandwich_ok,
       |         row_number() OVER (PARTITION BY l.p
       |           ORDER BY e.full_d, l.user_id) AS rnk
       |  FROM lb l JOIN ed e ON e.p = l.p AND e.user_id = l.user_id)
       |SELECT p AS probe_user, user_id, lb_keogh, full_d,
       |       CAST(sandwich_ok AS INT) AS sandwich_ok, CAST(rnk AS INT) AS rnk
       |FROM scored WHERE rnk <= 3""".stripMargin

  def tsLbKeogh(spark: SparkSession, dir: String): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    spark.sql(s"WITH $seriesSpark,\n$lbkeoghBody")
  }

  val tsLbKeoghSql: String = s"WITH $seriesDuck,\n$lbkeoghBody"

  val tsSaxPruneSql: String =
    s"WITH $seriesDuck,\n${paaCommon("//")},\n" +
      saxBody("//", (a, b) => s"(CAST($a AS BIGINT) << ($b))")

  /** LB_Keogh-ranked candidate cap before the exact DTW refinement —
    * the GEMINI filter-and-refine contract: the quadratic kernel runs on
    * a CONSTANT number of pairs per probe regardless of corpus size. */
  val DtwCandidates = 20
  /** Band-reachability sentinel: out-of-band DP cells hold Inf; every
    * in-band add saturates at least(Inf, ·) so both engines clip
    * identically (max real path cost ≪ Inf; Inf + cost never overflows
    * BIGINT). */
  val DtwInf = 4000000000000000L

  // ── ts_dtw_topk ★ (r11) — the RECURSIVE DTW kernel itself (the step
  // the lbkeogh notes deferred): exact Sakoe–Chiba band-r Dynamic Time
  // Warping over the dense 30-day integer vectors, run GEMINI-style —
  // LB_Keogh ranks the corpus, only the top-$DtwCandidates candidates
  // per probe reach the O(n·band) DP, and the full elastic sandwich
  // LB_Keogh ≤ DTW ≤ ED (lower bound admissible for the SAME band;
  // the diagonal i=j path is inside every band so ED upper-bounds) is
  // emitted per result pair as `chain_ok` and oracle-pinned — a bound
  // violation anywhere fails the hash, so the DP recurrence itself is
  // machine-checked, in BOTH engines, via two structurally different
  // implementations:
  //   Spark — a nested `aggregate` higher-order fold: the outer fold
  //   walks DP rows carrying the previous row extended with the virtual
  //   D[i][-1] cell; the inner fold builds each row left-to-right (the
  //   within-row new[j-1] dependency). Pure codegen'd expressions over
  //   ARRAY<BIGINT>; no UDF, no shuffle beyond the candidate join.
  //   DuckDB — anti-diagonal recursion in a recursive CTE: cells on
  //   diagonal d depend only on diagonals d-1/d-2, so each step carries
  //   TWO diagonals as lists and computes the next with one
  //   list_transform (no within-row dependency on the diagonal).
  // Identical integers out of both is the strongest cross-check the
  // harness offers for a dynamic program.
  //
  // Scale shape (100 TB): lb/ed are the same bounded probe broadcasts as
  // ts_lbkeogh; the DP stage is probes × $DtwCandidates rows of pure
  // per-row expression work (no shuffle, no state) — the refinement cost
  // is decoupled from corpus size by the admissible filter, which is the
  // entire point of the lower-bound cascade.
  private val dtwCandCtes: String =
    s"""cand AS (
       |  SELECT l.p, l.user_id, l.lb_keogh, e.full_d,
       |         row_number() OVER (PARTITION BY l.p
       |           ORDER BY l.lb_keogh, l.user_id) AS crk
       |  FROM lb l JOIN ed e ON e.p = l.p AND e.user_id = l.user_id),
       |capped AS (SELECT * FROM cand WHERE crk <= $DtwCandidates),
       |pairsv AS (
       |  SELECT cd.p, cd.user_id, cd.lb_keogh, cd.full_d, qa.v AS qv, ca.v AS cv
       |  FROM capped cd
       |  JOIN vecs qa ON qa.user_id = cd.p
       |  JOIN vecs ca ON ca.user_id = cd.user_id)""".stripMargin

  private val dtwFinal: String =
    s"""scoredd AS (
       |  SELECT d.p, d.user_id, c.lb_keogh, d.dtw_d, c.full_d,
       |         CASE WHEN c.lb_keogh <= d.dtw_d AND d.dtw_d <= c.full_d
       |              THEN 1 ELSE 0 END AS chain_ok,
       |         row_number() OVER (PARTITION BY d.p
       |           ORDER BY d.dtw_d, d.user_id) AS rnk
       |  FROM dtwed d
       |  JOIN capped c ON c.p = d.p AND c.user_id = d.user_id)
       |SELECT p AS probe_user, user_id, lb_keogh, dtw_d, full_d,
       |       CAST(chain_ok AS INT) AS chain_ok, CAST(rnk AS INT) AS rnk
       |FROM scoredd WHERE rnk <= 3""".stripMargin

  /** The Spark-side DTW kernel as a pure SQL expression over two
    * ARRAY<BIGINT> columns of length n: a nested `aggregate` fold. The
    * outer accumulator pe = [D[i-1][-1], D[i-1][0..n-1]] (virtual left
    * border first), so D[i-1][j] = pe[j+2] and D[i-1][j-1] = pe[j+1];
    * seeding pe = [0, Inf…] makes D[0][0] = cost(0,0) with no special
    * case. Public so DtwSpec can pin it against a reference DP on
    * arbitrary vectors. */
  def dtwAggExpr(n: Int, band: Int, qCol: String, cCol: String): String = {
    val inf = s"CAST($DtwInf AS BIGINT)"
    s"""aggregate(
       |  sequence(0, ${n - 1}),
       |  concat(array(CAST(0 AS BIGINT)),
       |         transform(sequence(1, $n), x -> $inf)),
       |  (pe, i) -> concat(array($inf),
       |    aggregate(sequence(0, ${n - 1}), CAST(array() AS ARRAY<BIGINT>),
       |      (nr, j) -> concat(nr, array(
       |        CASE WHEN (i - j) > $band OR (j - i) > $band THEN $inf
       |        ELSE least($inf,
       |          (element_at($qCol, i + 1) - element_at($cCol, j + 1))
       |            * (element_at($qCol, i + 1) - element_at($cCol, j + 1))
       |          + least(element_at(pe, j + 2), element_at(pe, j + 1),
       |                  CASE WHEN j > 0 THEN element_at(nr, j)
       |                       ELSE $inf END))
       |        END)))),
       |  pe -> element_at(pe, ${n + 1}))""".stripMargin
  }

  def tsDtwTopk(spark: SparkSession, dir: String): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    val dtwExpr = dtwAggExpr(SpanDays, Band, "qv", "cv")
    spark.sql(
      s"""WITH $seriesSpark,
         |$envLbCtes,
         |vecs AS (
         |  SELECT user_id,
         |         transform(array_sort(collect_list(struct(day, c))),
         |                   x -> CAST(x.c AS BIGINT)) AS v
         |  FROM dgrid GROUP BY user_id),
         |$dtwCandCtes,
         |dtwed AS (SELECT p, user_id, $dtwExpr AS dtw_d FROM pairsv),
         |$dtwFinal""".stripMargin)
  }

  val tsDtwTopkSql: String = {
    val n = SpanDays
    val inf = s"$DtwInf::BIGINT"
    // Anti-diagonal recursion: step s holds diagonals s (d1) and s-1
    // (d0) as row-indexed lists (value of cell (i, d-i) at position
    // i+1); cell (i, j=s+1-i) reads preds (i-1,j)=d1[i], (i,j-1)=d1[i+1],
    // (i-1,j-1)=d0[i]; out-of-range list_extract → NULL → coalesce Inf.
    s"""WITH RECURSIVE $seriesDuck,
       |$envLbCtes,
       |vecs AS (SELECT user_id, list(c ORDER BY day) AS v
       |         FROM dgrid GROUP BY user_id),
       |$dtwCandCtes,
       |dp AS (
       |  SELECT p, user_id, qv, cv, 0 AS s,
       |         list_transform(range(0, $n), i ->
       |           CASE WHEN i = 0
       |                THEN (qv[1] - cv[1]) * (qv[1] - cv[1])
       |                ELSE $inf END) AS d1,
       |         list_transform(range(0, $n), i -> $inf) AS d0
       |  FROM pairsv
       |  UNION ALL
       |  SELECT p, user_id, qv, cv, s + 1,
       |         list_transform(range(0, $n), i ->
       |           CASE WHEN (s + 1 - i) BETWEEN 0 AND ${n - 1}
       |                     AND abs(i - (s + 1 - i)) <= $Band
       |                THEN least($inf,
       |                  (qv[i + 1] - cv[s + 1 - i + 1])
       |                    * (qv[i + 1] - cv[s + 1 - i + 1])
       |                  + least(coalesce(d1[i], $inf),
       |                          coalesce(d1[i + 1], $inf),
       |                          coalesce(d0[i], $inf)))
       |                ELSE $inf END) AS d1,
       |         d1 AS d0
       |  FROM dp WHERE s < ${2 * n - 2}),
       |dtwed AS (SELECT p, user_id, d1[$n] AS dtw_d
       |          FROM dp WHERE s = ${2 * n - 2}),
       |$dtwFinal""".stripMargin
  }

  /** Weekly period for the autocorrelation probe (days). */
  val PeriodLag = 7
  /** Activity floor: users with fewer active days carry no signal. */
  val PeriodMinDays = 10

  // ── ts_periodicity ★ (r11) — periodic-behavior mining: for each user,
  // the lag-7 raw autocorrelation of the daily activity series
  // (Σ c_t·c_{t+7} over shared days, normalized by the series energy
  // Σ c_t² in integer micro-units) against the lag-1 contrast — the
  // weekly-rhythm detector (batch jobs, weekday-only users, weekly
  // digests) a behavioral pipeline runs before seasonality-aware
  // modeling. Engine-exact: the sparse (user, day) relation self-joins
  // on day+lag (missing days contribute exactly 0 — no densification
  // needed for a product), all sums BIGINT, one floor division at the
  // end. Top-10 by (periodicity DESC, user_id) via ORDER BY + LIMIT —
  // TakeOrderedAndProject, no global sort, no window.
  //
  // Scale shape (100 TB): the self-join is an equi-join on
  // (user_id, day) — co-partitioned with the series build; everything
  // downstream is user-sized aggregation.
  private def periodicityBody(idiv: String): String =
    s"""energy AS (
       |  SELECT user_id, CAST(sum(c * c) AS BIGINT) AS s0,
       |         CAST(count(*) AS BIGINT) AS n_days
       |  FROM days GROUP BY user_id),
       |lag7 AS (
       |  SELECT a.user_id, CAST(sum(a.c * b.c) AS BIGINT) AS s7
       |  FROM days a JOIN days b
       |    ON b.user_id = a.user_id AND b.day = a.day + $PeriodLag
       |  GROUP BY a.user_id),
       |lag1 AS (
       |  SELECT a.user_id, CAST(sum(a.c * b.c) AS BIGINT) AS s1
       |  FROM days a JOIN days b
       |    ON b.user_id = a.user_id AND b.day = a.day + 1
       |  GROUP BY a.user_id)
       |SELECT e.user_id, e.n_days, e.s0,
       |       coalesce(l7.s7, CAST(0 AS BIGINT)) AS s7,
       |       coalesce(l1.s1, CAST(0 AS BIGINT)) AS s1,
       |       CAST(coalesce(l7.s7, 0) * 1000000 $idiv e.s0 AS BIGINT)
       |         AS periodicity_micro
       |FROM energy e
       |LEFT JOIN lag7 l7 ON l7.user_id = e.user_id
       |LEFT JOIN lag1 l1 ON l1.user_id = e.user_id
       |WHERE e.n_days >= $PeriodMinDays AND e.s0 > 0
       |ORDER BY periodicity_micro DESC, e.user_id LIMIT 10""".stripMargin

  def tsPeriodicity(spark: SparkSession, dir: String): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    spark.sql(s"WITH $seriesSpark,\n${periodicityBody("div")}")
  }

  val tsPeriodicitySql: String =
    s"WITH $seriesDuck,\n${periodicityBody("//")}"

  /** Matrix-profile subsequence length (days). */
  val MpLen = 7
  /** Trivial-match exclusion zone (windows closer than this overlap too
    * much to count as a genuine repeat — the standard m/2 rule). */
  val MpExcl = 4

  // ── ts_discord ★ (r11) — MATRIX-PROFILE discord mining (Yeh et al.
  // 2016): per user, every length-7 window of the dense 30-day series
  // scores its nearest-neighbor distance among the user's OTHER windows
  // (trivial overlaps excluded — the m/2 zone), and the window whose
  // nearest neighbor is FARTHEST is the user's DISCORD: the week unlike
  // any other week that user ever had — the subsequence-anomaly
  // primitive (fraud weeks, outage weeks, behavior breaks). Top-10
  // users by discord distance. Engine-exact: dense integer vectors,
  // BIGINT sums of squares, deterministic ties (max distance → lowest
  // window; ranking by (d², user)).
  //
  // Scale shape (100 TB): the all-window-pairs stage is bounded PER KEY
  // by construction — 24 windows × 7 offsets × 24 partners ≈ 4k rows
  // per user before the map-side-combined min, linear in users with no
  // cross-user joins anywhere; the final cut is TakeOrderedAndProject.
  // (The STOMP O(n) dot-product recurrence is the long-series
  // refinement; at n=30 the quadratic form IS the right plan.)
  /** private[graft]: DiscordSpec drives the same body over crafted
    * series via a `dgrid` temp view, pinned against a reference matrix
    * profile. */
  private[graft] def discordBody(winExplode: String): String = {
    s"""wd AS (
       |  SELECT user_id, i, day - i AS t, c
       |  FROM dgrid $winExplode),
       |dpair AS (
       |  SELECT a.user_id, a.i AS wi, b.i AS wj,
       |         CAST(sum((a.c - b.c) * (a.c - b.c)) AS BIGINT) AS d2
       |  FROM wd a JOIN wd b
       |    ON b.user_id = a.user_id AND b.t = a.t
       |   AND abs(a.i - b.i) >= $MpExcl
       |  GROUP BY a.user_id, a.i, b.i),
       |profile AS (
       |  SELECT user_id, wi, min(d2) AS nnd FROM dpair
       |  GROUP BY user_id, wi),
       |disc AS (
       |  SELECT user_id, wi, nnd,
       |         row_number() OVER (PARTITION BY user_id
       |           ORDER BY nnd DESC, wi) AS rk
       |  FROM profile)
       |SELECT user_id, CAST(wi AS INT) AS discord_window, nnd AS discord_d2
       |FROM disc WHERE rk = 1
       |ORDER BY discord_d2 DESC, user_id LIMIT 10""".stripMargin
  }

  def tsDiscord(spark: SparkSession, dir: String): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    val wMax = SpanDays - MpLen
    spark.sql(s"WITH $seriesSpark,\n$envLbCtes,\n" + discordBody(
      s"LATERAL VIEW explode(sequence(greatest(0, day - ${MpLen - 1}), " +
        s"least($wMax, day))) AS i"))
  }

  val tsDiscordSql: String = {
    val wMax = SpanDays - MpLen
    s"WITH $seriesDuck,\n$envLbCtes,\n" + discordBody(
      s", unnest(range(greatest(0, day - ${MpLen - 1}), " +
        s"least($wMax, day) + 1)) AS u(i)")
  }

  /** STOMP series length: 30 fixture days × 24 = 720 hourly buckets —
    * the calendar fixes n regardless of SF (empty hours densify to 0),
    * giving the ts family its demonstrated LONG-series plan (n ≥ 256,
    * the r11 verdict ask) on fixture-derived data. */
  val StompN = 720
  /** STOMP subsequence length (one day of hours). */
  val StompM = 24
  /** Trivial-match exclusion zone — the standard m/2 rule. */
  val StompExcl = StompM / 2

  // ── ts_stomp_discord ★ (r12) — LONG-SERIES matrix-profile discords
  // via the STOMP dot-product recurrence (Zhu et al., ICDM 2016): the
  // corpus's hourly activity series (n = 720) scores every length-24
  // window's nearest-neighbor squared Euclidean distance, and the
  // windows whose nearest neighbors are FARTHEST are the discords — the
  // days unlike any other day the corpus ever had. The O(n²m) all-pairs
  // form ts_discord uses at n = 30 is the WRONG plan here; STOMP's
  // observation is that along a DIAGONAL (fixed window offset k) the
  // sliding dot product obeys QT(i+1, k) = QT(i, k) − x(i)·x(i+k) +
  // x(i+m)·x(i+k+m) — a cumulative sum: QT(i, k) = cum(k, i+m−1) −
  // cum(k, i−1) over the element products p(j, k) = x(j)·x(j+k). One
  // cumsum window per diagonal turns every matrix cell into O(1), and
  // dist²(i, i+k) = ss(i) + ss(i+k) − 2·QT(i, k) with ss the same
  // cumsum trick on x². Integer-exact throughout (hourly counts are
  // BIGINT); ties break by window id. StompSpec machine-checks the
  // recurrence against the naive quadratic definition cell-by-cell;
  // the DuckDB oracle REPLAYS the identical recurrence (shared CTE
  // text, the generated-CTE discipline).
  //
  // Scale shape (100 TB): the series build is ONE map-side-combined
  // hour count (the corpus collapses before anything quadratic); the
  // diagonal stage is n−m−excl+1 ≈ 685 independent cumsum chains
  // (PARTITION BY k — embarrassingly parallel, O(n) each, O(n²) total
  // with O(1) per cell vs O(m) naive); the expansion join is an
  // equi-join on h = j + k; per-key series at production partition by
  // (key, k). The two unpartitioned windows run over the 720-row
  // calendar-bounded series (the ts_seasonal argument); the final
  // ranking window runs over the 697-row window-profile relation.
  private[graft] def stompBody(idiv: String, usExpr: String, table: String,
      hourGrid: String, kExplode: String,
      finalSelect: String = StompDiscordSelect): String = {
    val wMax = StompN - StompM // last valid window start
    s"""sbounds AS (SELECT min($usExpr) AS t0 FROM $table),
       |hourly AS (
       |  SELECT CAST(($usExpr - b.t0) $idiv 3600000000 AS BIGINT) AS h,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM $table CROSS JOIN sbounds b
       |  WHERE ($usExpr - b.t0) $idiv 3600000000 < $StompN
       |  GROUP BY CAST(($usExpr - b.t0) $idiv 3600000000 AS BIGINT)),
       |xs AS (
       |  SELECT g.h, coalesce(s.c, CAST(0 AS BIGINT)) AS v
       |  FROM ($hourGrid) g LEFT JOIN hourly s ON s.h = g.h),
       |sq AS (
       |  SELECT h, v,
       |         CAST(sum(v * v) OVER (ORDER BY h
       |             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum2
       |  FROM xs),
       |-- lag sources include rows the next CTE filters out: WHERE runs
       |-- before window functions, so the filter must live downstream
       |ssall AS (
       |  SELECT h,
       |         cum2 - coalesce(lag(cum2, $StompM) OVER (ORDER BY h),
       |                         CAST(0 AS BIGINT)) AS ss2
       |  FROM sq),
       |ss AS (
       |  SELECT h - ${StompM - 1} AS i, ss2
       |  FROM ssall WHERE h >= ${StompM - 1}),
       |diag AS (
       |  SELECT e.j, e.k, e.v * b.v AS p
       |  FROM (SELECT a.h AS j, a.v, kk.k
       |        FROM xs a $kExplode) e
       |  JOIN xs b ON b.h = e.j + e.k),
       |qtc AS (
       |  SELECT j, k,
       |         CAST(sum(p) OVER (PARTITION BY k ORDER BY j
       |             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM diag),
       |qtall AS (
       |  SELECT j, k,
       |         cum - coalesce(lag(cum, $StompM)
       |             OVER (PARTITION BY k ORDER BY j), CAST(0 AS BIGINT)) AS qt
       |  FROM qtc),
       |qt AS (
       |  SELECT j - ${StompM - 1} AS i, k, qt
       |  FROM qtall WHERE j >= ${StompM - 1}),
       |d2 AS (
       |  SELECT q.i, q.k, sa.ss2 + sb.ss2 - 2 * q.qt AS d2
       |  FROM qt q
       |  JOIN ss sa ON sa.i = q.i
       |  JOIN ss sb ON sb.i = q.i + q.k),
       |mirrored AS (
       |  SELECT i, i + k AS nb, d2 FROM d2
       |  UNION ALL
       |  SELECT i + k AS i, i AS nb, d2 FROM d2),
       |mp AS (
       |  SELECT i, min(d2) AS mp_d2 FROM mirrored GROUP BY i),
       |nn AS (
       |  SELECT b.i, min(b.nb) AS nn_start
       |  FROM mirrored b JOIN mp m ON m.i = b.i AND b.d2 = m.mp_d2
       |  GROUP BY b.i),
       |disc AS (
       |  SELECT m.i, m.mp_d2, n.nn_start,
       |         row_number() OVER (ORDER BY m.mp_d2 DESC, m.i) AS rk
       |  FROM mp m JOIN nn n ON n.i = m.i)
       |$finalSelect""".stripMargin
  }

  /** The catalog cut: top-5 discords. */
  private val StompDiscordSelect: String =
    """SELECT CAST(rk AS INT) AS discord_rank, i AS win_start,
      |       nn_start, mp_d2
      |FROM disc WHERE rk <= 5 ORDER BY rk""".stripMargin

  /** The FULL 697-window matrix profile from the production recurrence —
    * StompSpec's witness surface (cell-by-cell vs the naive quadratic). */
  private[graft] def stompFullProfile(spark: SparkSession, dir: String): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    spark.sql("WITH " + stompBody("div", "unix_micros(ts)", "events_t",
      s"SELECT CAST(x AS BIGINT) AS h FROM (SELECT explode(sequence(0, ${StompN - 1})) AS x)",
      s"LATERAL VIEW explode(sequence($StompExcl, ${StompN - StompM})) kk AS k",
      "SELECT i, mp_d2 FROM disc"))
  }

  def tsStompDiscord(spark: SparkSession, dir: String): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    spark.sql("WITH " + stompBody("div", "unix_micros(ts)", "events_t",
      s"SELECT CAST(x AS BIGINT) AS h FROM (SELECT explode(sequence(0, ${StompN - 1})) AS x)",
      s"LATERAL VIEW explode(sequence($StompExcl, ${StompN - StompM})) kk AS k"))
  }

  val tsStompDiscordSql: String =
    "WITH ev AS (SELECT epoch_us(ts) AS us FROM events),\n" +
      stompBody("//", "us", "ev",
        s"SELECT CAST(unnest(range(0, $StompN)) AS BIGINT) AS h",
        s"CROSS JOIN (SELECT unnest(range($StompExcl, ${StompN - StompM + 1})) AS k) kk")

  // ── ts_motif ★ (r12) — top-5 MOTIF pairs over the same long hourly
  // series: the window pairs whose squared Euclidean distance is
  // SMALLEST — the recurring daily patterns, the matrix profile's other
  // half (discord = max of the min-profile, motif = min over pairs).
  // Same STOMP diagonal recurrence, same engine-shared CTE text, two
  // differences: the diagonal range starts at k = [[StompM]] so motif
  // pairs never OVERLAP (an overlapping pair shares raw points and wins
  // trivially — the discord profile's m/2 exclusion is too permissive
  // for pair ranking), and the final cut ranks d² ascending over the
  // pair relation directly (no per-window min needed). Integer-exact;
  // ties break by (win_a, win_b).
  //
  // Scale shape: identical to ts_stomp_discord — ~673 independent O(n)
  // diagonal cumsum chains, O(1) per cell; only the final
  // TakeOrderedAndProject differs.
  private val StompMotifSelect: String =
    """SELECT CAST(rk AS INT) AS motif_rank, i AS win_a, i + k AS win_b, d2
      |FROM (SELECT i, k, d2,
      |             row_number() OVER (ORDER BY d2 ASC, i, k) AS rk
      |      FROM d2)
      |WHERE rk <= 5 ORDER BY rk""".stripMargin

  def tsMotif(spark: SparkSession, dir: String): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    spark.sql("WITH " + stompBody("div", "unix_micros(ts)", "events_t",
      s"SELECT CAST(x AS BIGINT) AS h FROM (SELECT explode(sequence(0, ${StompN - 1})) AS x)",
      s"LATERAL VIEW explode(sequence($StompM, ${StompN - StompM})) kk AS k",
      StompMotifSelect))
  }

  val tsMotifSql: String =
    "WITH ev AS (SELECT epoch_us(ts) AS us FROM events),\n" +
      stompBody("//", "us", "ev",
        s"SELECT CAST(unnest(range(0, $StompN)) AS BIGINT) AS h",
        s"CROSS JOIN (SELECT unnest(range($StompM, ${StompN - StompM + 1})) AS k) kk",
        StompMotifSelect)

  // ── ts_seasonal ★ (r11) — integer SEASONAL DECOMPOSITION (STL-lite):
  // the corpus-level daily activity series splits into TREND (the
  // un-normalized centered 7-day window sum — integer by construction),
  // RESIDUAL (7·c_d − trend_d: scaling the point by the window width
  // instead of dividing the window keeps every term exact), and the
  // day-of-week SEASONAL profile (per-dow residual sum and count over
  // the days where the full window exists) — the
  // weekday/weekend-rhythm decomposition a capacity planner reads
  // before any forecasting. Emitted per day with the dow profile joined
  // back, so the output carries trend, residual, and seasonal in one
  // row; every column BIGINT.
  //
  // Scale shape (100 TB): the series is ONE map-side-combined (day)
  // count (the aggregation collapses the corpus before any window); the
  // windows run over the 30-row aggregated series — bounded by the
  // calendar, not the corpus (unpartitioned window allowlisted on that
  // argument); the dow profile is a ≤7-row agg.
  private def seasonalBody(idiv: String): String =
    s"""daily AS (
       |  SELECT day, CAST(sum(c) AS BIGINT) AS c
       |  FROM days GROUP BY day),
       |trended AS (
       |  SELECT day, c,
       |         CAST(sum(c) OVER (ORDER BY day
       |             RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT)
       |           AS trend7,
       |         CAST(count(*) OVER (ORDER BY day
       |             RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT)
       |           AS wdays
       |  FROM daily),
       |resid AS (
       |  SELECT day, c, trend7, day % 7 AS dow,
       |         CASE WHEN wdays = 7 THEN 7 * c - trend7 END AS r
       |  FROM trended),
       |seasonal AS (
       |  SELECT dow, CAST(sum(r) AS BIGINT) AS dow_resid,
       |         CAST(count(r) AS BIGINT) AS dow_days
       |  FROM resid GROUP BY dow)
       |SELECT t.day, t.c, t.trend7, CAST(t.dow AS BIGINT) AS dow, t.r AS resid,
       |       s.dow_resid, s.dow_days
       |FROM resid t JOIN seasonal s ON s.dow = t.dow""".stripMargin

  // ── ts_forecast_baseline ★ (r12) — the BACKTEST report: the two
  // baselines every forecasting system must beat — seasonal-naive
  // (ŷ(d) = y(d−7), the weekly-rhythm echo) and persistence
  // (ŷ(d) = y(d−1)) — replayed over the corpus daily series with exact
  // integer absolute errors and a per-day winner. This is the honesty
  // artifact of a forecasting pipeline: a model that can't beat these
  // two columns isn't a model. Forecast lookups are equi-joins on
  // day−7 / day−1 (gap-safe — never a positional lag that would slip on
  // a missing day); everything BIGINT.
  //
  // Scale shape (100 TB): the series is ONE map-side-combined day
  // count — the corpus collapses to ≤30 rows before anything else; the
  // joins and the verdict run on that bounded relation. Per-key
  // backtests partition the same joins by key.
  private def forecastBody(): String =
    s"""daily AS (
       |  SELECT day, CAST(sum(c) AS BIGINT) AS c
       |  FROM days GROUP BY day)
       |SELECT d.day, d.c AS actual,
       |       s.c AS fc_seasonal, p.c AS fc_persist,
       |       abs(d.c - s.c) AS ae_seasonal,
       |       abs(d.c - p.c) AS ae_persist,
       |       CASE WHEN abs(d.c - s.c) <= abs(d.c - p.c)
       |            THEN 'seasonal' ELSE 'persist' END AS winner
       |FROM daily d
       |JOIN daily s ON s.day = d.day - 7
       |JOIN daily p ON p.day = d.day - 1""".stripMargin

  def tsForecastBaseline(spark: SparkSession, dir: String): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    spark.sql(s"WITH $seriesSpark,\n${forecastBody()}")
  }

  val tsForecastBaselineSql: String = s"WITH $seriesDuck,\n${forecastBody()}"

  def tsSeasonal(spark: SparkSession, dir: String): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    spark.sql(s"WITH $seriesSpark,\n${seasonalBody("div")}")
  }

  val tsSeasonalSql: String = s"WITH $seriesDuck,\n${seasonalBody("//")}"

  // ── ts_changepoint ★ (r11) — CUSUM mean-shift changepoint detection
  // over the per-user daily series (the monitoring question "when did
  // this user's behavior change", and at corpus level "when did this
  // source's volume shift" — the data-freshness alarm a training-data
  // pipeline runs on ingest volumes). The statistic is the classic
  // integer-scaled CUSUM deviation D_t = |n·S_t − t·S_n| (S_t the
  // prefix sum, t = 1..n−1): maximized exactly in BIGINT (n = 30 days,
  // counts are small — no overflow), argmax tie broken to the EARLIEST
  // t, and the before/after segment sums emitted as witnesses so a
  // consumer can compute both means without re-scanning. The day grid
  // is DENSIFIED (event-free days count 0 — the same discipline as the
  // PAA prologue: a sparse series would silently skip quiet days and
  // shift every t).
  //
  // Scale shape (100 TB): one map-side-combined (user, day) count, one
  // users×30 dense grid (the grid side is a 30-row broadcast), one
  // 30-row-per-user window scan — the whole statistic is one shuffle on
  // user_id; no pair joins, no global sort.
  val CpDays = 30

  private def changepointCtes(idiv: String, table: String, usExpr: String,
      dayGrid: String): String =
    s"""bounds AS (SELECT min($usExpr) AS t0 FROM $table),
       |days AS (
       |  SELECT user_id,
       |         CAST(($usExpr - b.t0) $idiv 86400000000 AS BIGINT) AS day,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM $table CROSS JOIN bounds b
       |  GROUP BY user_id, ($usExpr - b.t0) $idiv 86400000000),
       |dense AS (
       |  SELECT u.user_id, g.day, coalesce(d.c, CAST(0 AS BIGINT)) AS c
       |  FROM (SELECT DISTINCT user_id FROM days) u
       |  CROSS JOIN ($dayGrid) g
       |  LEFT JOIN days d ON d.user_id = u.user_id AND d.day = g.day),
       |cum AS (
       |  SELECT user_id, day + 1 AS t,
       |         sum(c) OVER (PARTITION BY user_id ORDER BY day
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS st,
       |         sum(c) OVER (PARTITION BY user_id) AS sn
       |  FROM dense),
       |dstat AS (
       |  SELECT user_id, t, st, sn,
       |         abs($CpDays * st - t * sn) AS dev
       |  FROM cum WHERE t < $CpDays),
       |mx AS (
       |  SELECT user_id, max(dev) AS cp_stat, any_value(sn) AS total
       |  FROM dstat GROUP BY user_id),
       |cp AS (
       |  SELECT m.user_id, m.cp_stat, m.total, min(d2.t) AS cp_t
       |  FROM mx m JOIN dstat d2
       |    ON d2.user_id = m.user_id AND d2.dev = m.cp_stat
       |  GROUP BY m.user_id, m.cp_stat, m.total)
       |SELECT c.user_id, CAST(c.cp_t AS BIGINT) AS cp_day,
       |       CAST(c.cp_stat AS BIGINT) AS cp_stat,
       |       CAST(c.total AS BIGINT) AS total_events,
       |       CAST(d3.st AS BIGINT) AS before_sum,
       |       CAST(c.total - d3.st AS BIGINT) AS after_sum
       |FROM cp c JOIN dstat d3
       |  ON d3.user_id = c.user_id AND d3.t = c.cp_t""".stripMargin

  def tsChangepoint(spark: SparkSession, dir: String): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    spark.sql("WITH " + changepointCtes("div", "events_t", "unix_micros(ts)",
      s"SELECT CAST(x AS BIGINT) AS day FROM (SELECT explode(sequence(0, ${CpDays - 1})) AS x)"))
  }

  val tsChangepointSql: String =
    "WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),\n" +
      changepointCtes("//", "ev", "us",
        s"SELECT CAST(unnest(range(0, $CpDays)) AS BIGINT) AS day")

  // ── pipe_drift_report ★ (r11) — DISTRIBUTION-DRIFT monitoring between
  // two time windows (the PSI dashboard every production training-data
  // pipeline runs on its ingest: "does this month's mix still look like
  // last month's?"). Buckets are (event_type × 6-hour band); the ref
  // window is days 0–14, current is days 15+; each bucket reports both
  // counts, both micro-unit shares, and the TRIANGULAR-DISCREPANCY term
  // (p−q)²/(p+q) in micro-units — a bona-fide f-divergence (it bounds
  // Jensen–Shannon within constant factors) chosen over PSI's
  // (p−q)·ln(p/q) because it is EXACT in integer micro-units: ln() ulp
  // divergence across engines would poison a hash-compared oracle, and
  // unlike PSI it is finite when a bucket is empty on one side (a new
  // event type appearing IS the drift signal, not a division error).
  //
  // Scale shape (100 TB): one scan, one map-side-combined
  // (type, band, half) agg (≤2·|buckets| rows cross the shuffle), the
  // two totals ride a 1-row broadcast. No pair joins, no windows over
  // data-sized relations.
  val DriftRefDays = 15

  private def driftCtes(idiv: String, table: String, usExpr: String): String =
    s"""bounds AS (SELECT min($usExpr) AS t0 FROM $table),
       |base AS (
       |  SELECT event_type,
       |         CAST(($usExpr - b.t0) $idiv 86400000000 AS BIGINT) AS day,
       |         CAST(($usExpr $idiv 21600000000) % 4 AS BIGINT) AS band
       |  FROM $table CROSS JOIN bounds b),
       |counts AS (
       |  SELECT event_type, band,
       |         CAST(sum(CASE WHEN day < $DriftRefDays THEN 1 ELSE 0 END)
       |           AS BIGINT) AS ref_n,
       |         CAST(sum(CASE WHEN day >= $DriftRefDays THEN 1 ELSE 0 END)
       |           AS BIGINT) AS cur_n
       |  FROM base GROUP BY event_type, band),
       |tot AS (
       |  SELECT CAST(sum(ref_n) AS BIGINT) AS r_total,
       |         CAST(sum(cur_n) AS BIGINT) AS c_total
       |  FROM counts),
       |shares AS (
       |  SELECT c.event_type, c.band, c.ref_n, c.cur_n,
       |         CAST(c.ref_n * 1000000 $idiv t.r_total AS BIGINT) AS p_micro,
       |         CAST(c.cur_n * 1000000 $idiv t.c_total AS BIGINT) AS q_micro
       |  FROM counts c CROSS JOIN tot t)
       |SELECT event_type, band, ref_n, cur_n, p_micro, q_micro,
       |       CAST(CASE WHEN p_micro + q_micro = 0 THEN 0
       |            ELSE (p_micro - q_micro) * (p_micro - q_micro)
       |                 $idiv (p_micro + q_micro) END AS BIGINT) AS tri_micro
       |FROM shares""".stripMargin

  def pipeDriftReport(spark: SparkSession, dir: String): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    spark.sql("WITH " + driftCtes("div", "events_t", "unix_micros(ts)"))
  }

  val pipeDriftReportSql: String =
    "WITH ev AS (SELECT event_type, epoch_us(ts) AS us FROM events),\n" +
      driftCtes("//", "ev", "us")

  // ── ts_ewma ★ (r11) — exponentially-weighted smoothing + one-step
  // forecast anomaly over the per-user daily series (the "is today's
  // volume surprising given the trend" alarm — the recency-weighted
  // sibling of ts_changepoint's level-shift test). α is fixed at 1/2 so
  // the recurrence ewma_t = (ewma_{t-1} + c_t)/2 has an EXACT integer
  // closed form: E_t = Σ_{i≤t} c_i·2^i gives ewma_t = E_t / 2^(t+1) with
  // no float ever — E_t is one prefix-sum window over the dense series,
  // and both the forecast (ewma_{t-1} = E_{t-1}/2^t) and the absolute
  // residual are emitted in milli-units via the SAME floor division in
  // both engines. Overflow budget: E_29 ≤ c_max·2^30; ×1000 stays inside
  // BIGINT for c_max up to ~8·10^6 events/user/day — far above the
  // fixture and asserted nowhere cheaper than the milli scale. Each
  // user reports the day whose residual is LARGEST (earliest-day
  // tie-break) plus the end-of-window smoothed level — the alert row.
  //
  // Scale shape (100 TB): identical to ts_changepoint — one map-side
  // (user, day) count, a 30-row broadcast day grid to densify, one
  // per-user prefix window, one argmax equi-join. Single shuffle on
  // user_id.
  private def ewmaCtes(idiv: String, table: String, usExpr: String,
      dayGrid: String, pow2: String => String): String =
    s"""bounds AS (SELECT min($usExpr) AS t0 FROM $table),
       |days AS (
       |  SELECT user_id,
       |         CAST(($usExpr - b.t0) $idiv 86400000000 AS BIGINT) AS day,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM $table CROSS JOIN bounds b
       |  GROUP BY user_id, ($usExpr - b.t0) $idiv 86400000000),
       |dense AS (
       |  SELECT u.user_id, g.day, coalesce(d.c, CAST(0 AS BIGINT)) AS c
       |  FROM (SELECT DISTINCT user_id FROM days) u
       |  CROSS JOIN ($dayGrid) g
       |  LEFT JOIN days d ON d.user_id = u.user_id AND d.day = g.day),
       |cum AS (
       |  SELECT user_id, day, c,
       |         sum(c * ${pow2("day")}) OVER (PARTITION BY user_id
       |           ORDER BY day
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS et
       |  FROM dense),
       |resid AS (
       |  SELECT user_id, day, c,
       |         CAST((et - c * ${pow2("day")}) * 1000 $idiv ${pow2("day")}
       |           AS BIGINT) AS forecast_milli,
       |         CAST(abs(c * ${pow2("day")} - (et - c * ${pow2("day")}))
       |              * 1000 $idiv ${pow2("day")} AS BIGINT) AS dev_milli
       |  FROM cum WHERE day >= 1),
       |level AS (
       |  SELECT user_id,
       |         CAST(max(et) * 1000 $idiv ${pow2(s"CAST($CpDays AS BIGINT)")}
       |           AS BIGINT) AS level_milli
       |  FROM cum GROUP BY user_id),
       |mx AS (
       |  SELECT user_id, max(dev_milli) AS dev_milli FROM resid
       |  GROUP BY user_id),
       |pick AS (
       |  SELECT m.user_id, m.dev_milli, min(r.day) AS anom_day
       |  FROM mx m JOIN resid r
       |    ON r.user_id = m.user_id AND r.dev_milli = m.dev_milli
       |  GROUP BY m.user_id, m.dev_milli)
       |SELECT p.user_id, CAST(p.anom_day AS BIGINT) AS anom_day,
       |       r.c AS observed, r.forecast_milli, p.dev_milli,
       |       l.level_milli
       |FROM pick p
       |JOIN resid r ON r.user_id = p.user_id AND r.day = p.anom_day
       |JOIN level l ON l.user_id = p.user_id""".stripMargin

  def tsEwma(spark: SparkSession, dir: String): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    spark.sql("WITH " + ewmaCtes("div", "events_t", "unix_micros(ts)",
      s"SELECT CAST(x AS BIGINT) AS day FROM (SELECT explode(sequence(0, ${CpDays - 1})) AS x)",
      d => s"shiftleft(CAST(1 AS BIGINT), CAST($d AS INT))"))
  }

  val tsEwmaSql: String =
    "WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),\n" +
      ewmaCtes("//", "ev", "us",
        s"SELECT CAST(unnest(range(0, $CpDays)) AS BIGINT) AS day",
        d => s"(CAST(1 AS BIGINT) << CAST($d AS INT))")

  /** FastDTW coarsening factor (fine hours per coarse bucket). */
  val FdC = 8
  /** FastDTW projection radius in coarse cells. */
  val FdR = 1

  // ── ts_fastdtw ★ (r13) — LONG-SERIES elastic alignment by FastDTW
  // coarsening (Salvador & Chan 2007 — the ts family's documented
  // remaining lever): align the corpus's two length-[[StompN]] = 720
  // hourly behavior series (click vs view counts — the calendar fixes
  // n at every SF) WITHOUT the 518,400-cell full DP. One
  // coarsen→project→refine pass:
  //  1. COARSEN by [[FdC]] = 8 (integer block sums) → two length-90
  //     series; run the FULL coarse DP (both directions).
  //  2. The optimal-path cells fall out RELATIONALLY — no backtrace
  //     loop: cell (I,J) is on an optimal path iff
  //     F(I,J) + B(I,J) − cost(I,J) = F(N−1,N−1), with B read off the
  //     SAME forward-DP expression over the reversed series
  //     (B(i,j) = F_rev(N−1−i, N−1−j)) — the text_unigram_train
  //     forward×backward trick on a 2-D grid. Ties keep ALL optimal
  //     paths' cells (deterministic; a backtrace would have to pick).
  //  3. PROJECT the path ± [[FdR]] coarse cells, take each coarse
  //     row's [min, max] span (contiguous — the dilation of a monotone
  //     staircase), and REFINE: the fine DP runs only inside the
  //     projected per-row bounds (Inf outside), via the ts_dtw_topk
  //     nested-fold kernel with the Sakoe-Chiba test swapped for the
  //     row-indexed bound arrays.
  // Output pins the REFINEMENT COST against the full-resolution DP:
  // cells_refined (Σ projected-band area) vs cells_full = n², plus the
  // coarse side's 2·N² — all oracle-checked integers, so the claimed
  // speedup ratio is machine-verified, not prose. The radius is the
  // accuracy knob and the operator is PARAMETERIZED by it
  // ([[tsFastDtwAt]]); the catalog entry runs the paper's default
  // r = 1 (16× cell cut, measured) and FastDtwSpec pins the honest
  // tradeoff against the exact full DP computed independently in
  // driver Scala: the banded distance can only OVER-estimate
  // (restricting paths — r = 1 lands ~16% high at sf0.01 on these
  // SPARSE hourly series, FastDTW's documented hard case), shrinks
  // monotonically in r, and at r = 6 recovers the exact optimum on
  // both fixtures while still cutting cells 3.8×.
  //
  // Scale shape (100 TB): the series build is one map-side-combined
  // hourly aggregation (corpus collapses before anything quadratic);
  // everything after is per-row expression work over ONE packed pair —
  // at production (per-entity pairs) the same plan runs per group with
  // cells_refined ≈ n·(2r+2)·C per pair instead of n², which is the
  // entire point of FastDTW.
  def tsFastDtw(spark: SparkSession, dir: String): DataFrame =
    tsFastDtwAt(spark, dir, FdR)

  def tsFastDtwAt(spark: SparkSession, dir: String, r: Int): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    val n = StompN
    val cn = n / FdC
    spark.sql(
      s"""WITH bounds AS (SELECT min(unix_micros(ts)) AS t0 FROM events_t),
        |hourly AS (
        |  SELECT CAST((unix_micros(ts) - b.t0) div 3600000000 AS BIGINT) AS h,
        |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |           AS BIGINT) AS cx,
        |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |           AS BIGINT) AS cy
        |  FROM events_t CROSS JOIN bounds b
        |  WHERE (unix_micros(ts) - b.t0) div 3600000000 < $n
        |  GROUP BY CAST((unix_micros(ts) - b.t0) div 3600000000 AS BIGINT)),
        |grid AS (SELECT CAST(x AS BIGINT) AS h
        |         FROM (SELECT explode(sequence(0, ${n - 1})) AS x)),
        |xs AS (
        |  SELECT g.h, coalesce(s.cx, CAST(0 AS BIGINT)) AS x,
        |         coalesce(s.cy, CAST(0 AS BIGINT)) AS y
        |  FROM grid g LEFT JOIN hourly s ON s.h = g.h),
        |vec AS (
        |  SELECT transform(array_sort(collect_list(struct(h, x))),
        |           t -> t.x) AS xv,
        |         transform(array_sort(collect_list(struct(h, y))),
        |           t -> t.y) AS yv
        |  FROM xs),
        |cvec AS (
        |  SELECT xv, yv,
        |         transform(sequence(0, ${cn - 1}), i ->
        |           aggregate(slice(xv, i * $FdC + 1, $FdC),
        |             CAST(0 AS BIGINT), (a, b) -> a + b)) AS cxv,
        |         transform(sequence(0, ${cn - 1}), i ->
        |           aggregate(slice(yv, i * $FdC + 1, $FdC),
        |             CAST(0 AS BIGINT), (a, b) -> a + b)) AS cyv
        |  FROM vec),
        |rvec AS (SELECT *, reverse(cxv) AS rxv, reverse(cyv) AS ryv
        |         FROM cvec),
        |mats AS (
        |  SELECT xv, yv, cxv, cyv,
        |         ${dtwMatrixExpr(cn, "cxv", "cyv")} AS fm,
        |         ${dtwMatrixExpr(cn, "rxv", "ryv")} AS bm
        |  FROM rvec),
        |opath AS (
        |  SELECT p.pos div $cn AS ci, p.pos % $cn AS cj
        |  FROM mats m LATERAL VIEW posexplode(m.fm) p AS pos, col
        |  WHERE p.col + element_at(m.bm, ${cn * cn} - p.pos)
        |        - (element_at(m.cxv, CAST(p.pos div $cn + 1 AS INT))
        |            - element_at(m.cyv, p.pos % $cn + 1))
        |          * (element_at(m.cxv, CAST(p.pos div $cn + 1 AS INT))
        |            - element_at(m.cyv, p.pos % $cn + 1))
        |        = element_at(m.fm, ${cn * cn})),
        |dil AS (
        |  SELECT DISTINCT ci + di AS ci, cj + dj AS cj
        |  FROM opath
        |  LATERAL VIEW explode(sequence(-$r, $r)) AS di
        |  LATERAL VIEW explode(sequence(-$r, $r)) AS dj
        |  WHERE ci + di BETWEEN 0 AND ${cn - 1}
        |    AND cj + dj BETWEEN 0 AND ${cn - 1}),
        |rowband AS (
        |  SELECT ci, min(cj) AS cjlo, max(cj) AS cjhi FROM dil GROUP BY ci),
        |bandv AS (
        |  SELECT transform(array_sort(collect_list(struct(ci, cjlo))),
        |           t -> CAST(t.cjlo * $FdC AS BIGINT)) AS lov,
        |         transform(array_sort(collect_list(struct(ci, cjhi))),
        |           t -> CAST(t.cjhi * $FdC + ${FdC - 1} AS BIGINT)) AS hiv,
        |         CAST(sum((cjhi - cjlo + 1) * ${FdC.toLong * FdC} ) AS BIGINT)
        |           AS cells_refined
        |  FROM rowband)
        |SELECT CAST($n AS BIGINT) AS n, CAST($cn AS BIGINT) AS coarse_n,
        |       CAST(${n.toLong * n} AS BIGINT) AS cells_full,
        |       CAST(${2L * cn * cn} AS BIGINT) AS cells_coarse,
        |       b.cells_refined,
        |       ${dtwBandDistExpr(n, FdC, "m.xv", "m.yv", "b.lov", "b.hiv")}
        |         AS dtw_fast
        |FROM mats m CROSS JOIN bandv b""".stripMargin)
  }

  /** Full-matrix DTW forward DP as ONE nested fold (the dtwAggExpr
    * kernel, accumulating every row): returns the n² row-major cell
    * array. D[i-1][·] reads back into the accumulated matrix, D[i][j-1]
    * into the row being built — no second accumulator needed. */
  def dtwMatrixExpr(n: Int, qCol: String, cCol: String): String = {
    val inf = s"CAST($DtwInf AS BIGINT)"
    s"""aggregate(sequence(0, ${n - 1}), CAST(array() AS ARRAY<BIGINT>),
       |  (m, i) -> concat(m,
       |    aggregate(sequence(0, ${n - 1}), CAST(array() AS ARRAY<BIGINT>),
       |      (nr, j) -> concat(nr, array(least($inf,
       |        (element_at($qCol, i + 1) - element_at($cCol, j + 1))
       |          * (element_at($qCol, i + 1) - element_at($cCol, j + 1))
       |        + CASE WHEN i = 0 AND j = 0 THEN CAST(0 AS BIGINT)
       |          ELSE least(
       |            CASE WHEN i > 0 THEN element_at(m, (i - 1) * $n + j + 1)
       |                 ELSE $inf END,
       |            CASE WHEN i > 0 AND j > 0
       |                 THEN element_at(m, (i - 1) * $n + j) ELSE $inf END,
       |            CASE WHEN j > 0 THEN element_at(nr, j) ELSE $inf END)
       |          END))))))""".stripMargin
  }

  /** The dtwAggExpr kernel with the Sakoe-Chiba test replaced by
    * per-row projected bounds: row i's admissible j span is
    * [lo[i div cf], hi[i div cf]] (coarse-indexed arrays). */
  def dtwBandDistExpr(n: Int, cf: Int, qCol: String, cCol: String,
      loCol: String, hiCol: String): String = {
    val inf = s"CAST($DtwInf AS BIGINT)"
    s"""aggregate(
       |  sequence(0, ${n - 1}),
       |  concat(array(CAST(0 AS BIGINT)),
       |         transform(sequence(1, $n), x -> $inf)),
       |  (pe, i) -> concat(array($inf),
       |    aggregate(sequence(0, ${n - 1}), CAST(array() AS ARRAY<BIGINT>),
       |      (nr, j) -> concat(nr, array(
       |        CASE WHEN j < element_at($loCol, CAST(i div $cf + 1 AS INT))
       |               OR j > element_at($hiCol, CAST(i div $cf + 1 AS INT))
       |             THEN $inf
       |        ELSE least($inf,
       |          (element_at($qCol, i + 1) - element_at($cCol, j + 1))
       |            * (element_at($qCol, i + 1) - element_at($cCol, j + 1))
       |          + least(element_at(pe, j + 2), element_at(pe, j + 1),
       |                  CASE WHEN j > 0 THEN element_at(nr, j)
       |                       ELSE $inf END))
       |        END)))),
       |  pe -> element_at(pe, ${n + 1}))""".stripMargin
  }

  val tsFastDtwSql: String = {
    val n = StompN
    val cn = n / FdC
    val inf = s"$DtwInf::BIGINT"
    // Anti-diagonal recursions (the tsDtwTopkSql pattern): coarse
    // forward, coarse backward (reversed lists), fine banded.
    def coarseDp(px: String, xcol: String, ycol: String) =
      s"""${px} AS (
         |  SELECT 0 AS s, $xcol AS q, $ycol AS c,
         |         list_transform(range(0, $cn), i ->
         |           CASE WHEN i = 0
         |                THEN ($xcol[1] - $ycol[1]) * ($xcol[1] - $ycol[1])
         |                ELSE $inf END) AS d1,
         |         list_transform(range(0, $cn), i -> $inf) AS d0
         |  FROM cvec
         |  UNION ALL
         |  SELECT s + 1, q, c,
         |         list_transform(range(0, $cn), i ->
         |           CASE WHEN (s + 1 - i) BETWEEN 0 AND ${cn - 1}
         |                THEN least($inf,
         |                  (q[i + 1] - c[s + 1 - i + 1])
         |                    * (q[i + 1] - c[s + 1 - i + 1])
         |                  + least(coalesce(d1[i], $inf),
         |                          coalesce(d1[i + 1], $inf),
         |                          coalesce(d0[i], $inf)))
         |                ELSE $inf END) AS d1,
         |         d1 AS d0
         |  FROM $px WHERE s < ${2 * cn - 2})""".stripMargin
    s"""WITH RECURSIVE bounds AS (
       |  SELECT min(epoch_us(ts)) AS t0 FROM events),
       |hourly AS (
       |  SELECT CAST((epoch_us(ts) - b.t0) // 3600000000 AS BIGINT) AS h,
       |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
       |           AS BIGINT) AS cx,
       |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
       |           AS BIGINT) AS cy
       |  FROM events CROSS JOIN bounds b
       |  WHERE (epoch_us(ts) - b.t0) // 3600000000 < $n
       |  GROUP BY CAST((epoch_us(ts) - b.t0) // 3600000000 AS BIGINT)),
       |grid AS (SELECT CAST(unnest(range(0, $n)) AS BIGINT) AS h),
       |xs AS (
       |  SELECT g.h, coalesce(s.cx, CAST(0 AS BIGINT)) AS x,
       |         coalesce(s.cy, CAST(0 AS BIGINT)) AS y
       |  FROM grid g LEFT JOIN hourly s ON s.h = g.h),
       |vec AS (
       |  SELECT list(x ORDER BY h) AS xv, list(y ORDER BY h) AS yv FROM xs),
       |cvec AS (
       |  SELECT xv, yv,
       |         list_transform(range(0, $cn), i ->
       |           CAST(list_sum(xv[i * $FdC + 1 : i * $FdC + $FdC])
       |             AS BIGINT)) AS cxv,
       |         list_transform(range(0, $cn), i ->
       |           CAST(list_sum(yv[i * $FdC + 1 : i * $FdC + $FdC])
       |             AS BIGINT)) AS cyv
       |  FROM vec),
       |${coarseDp("dpf", "cxv", "cyv")},
       |${coarseDp("dpb", "list_reverse(cxv)", "list_reverse(cyv)")},
       |fcells AS (
       |  SELECT t.i AS ci, dp.s - t.i AS cj, dp.d1[t.i + 1] AS f
       |  FROM dpf dp, unnest(range(0, $cn)) AS t(i)
       |  WHERE (dp.s - t.i) BETWEEN 0 AND ${cn - 1}),
       |bcells AS (
       |  SELECT ${cn - 1} - t.i AS ci, ${cn - 1} - (dp.s - t.i) AS cj,
       |         dp.d1[t.i + 1] AS bv
       |  FROM dpb dp, unnest(range(0, $cn)) AS t(i)
       |  WHERE (dp.s - t.i) BETWEEN 0 AND ${cn - 1}),
       |ctotal AS (
       |  SELECT f AS total FROM fcells
       |  WHERE ci = ${cn - 1} AND cj = ${cn - 1}),
       |opath AS (
       |  SELECT fc.ci, fc.cj
       |  FROM fcells fc
       |  JOIN bcells bc ON bc.ci = fc.ci AND bc.cj = fc.cj
       |  CROSS JOIN ctotal t
       |  CROSS JOIN cvec v
       |  WHERE fc.f + bc.bv
       |        - (v.cxv[fc.ci + 1] - v.cyv[fc.cj + 1])
       |          * (v.cxv[fc.ci + 1] - v.cyv[fc.cj + 1])
       |        = t.total),
       |dil AS (
       |  SELECT DISTINCT o.ci + a.di AS ci, o.cj + b.dj AS cj
       |  FROM opath o,
       |       unnest(range(-$FdR, ${FdR + 1})) AS a(di),
       |       unnest(range(-$FdR, ${FdR + 1})) AS b(dj)
       |  WHERE o.ci + a.di BETWEEN 0 AND ${cn - 1}
       |    AND o.cj + b.dj BETWEEN 0 AND ${cn - 1}),
       |rowband AS (
       |  SELECT ci, min(cj) AS cjlo, max(cj) AS cjhi FROM dil GROUP BY ci),
       |bandv AS (
       |  SELECT list(CAST(cjlo * $FdC AS BIGINT) ORDER BY ci) AS lov,
       |         list(CAST(cjhi * $FdC + ${FdC - 1} AS BIGINT) ORDER BY ci)
       |           AS hiv,
       |         CAST(sum((cjhi - cjlo + 1) * ${FdC.toLong * FdC})
       |           AS BIGINT) AS cells_refined
       |  FROM rowband),
       |dpz AS (
       |  SELECT 0 AS s, v.xv AS q, v.yv AS c, b.lov, b.hiv, b.cells_refined,
       |         list_transform(range(0, $n), i ->
       |           CASE WHEN i = 0
       |                THEN (v.xv[1] - v.yv[1]) * (v.xv[1] - v.yv[1])
       |                ELSE $inf END) AS d1,
       |         list_transform(range(0, $n), i -> $inf) AS d0
       |  FROM vec v CROSS JOIN bandv b
       |  UNION ALL
       |  SELECT s + 1, q, c, lov, hiv, cells_refined,
       |         list_transform(range(0, $n), i ->
       |           CASE WHEN (s + 1 - i) BETWEEN 0 AND ${n - 1}
       |                     AND (s + 1 - i) >= lov[i // $FdC + 1]
       |                     AND (s + 1 - i) <= hiv[i // $FdC + 1]
       |                THEN least($inf,
       |                  (q[i + 1] - c[s + 1 - i + 1])
       |                    * (q[i + 1] - c[s + 1 - i + 1])
       |                  + least(coalesce(d1[i], $inf),
       |                          coalesce(d1[i + 1], $inf),
       |                          coalesce(d0[i], $inf)))
       |                ELSE $inf END) AS d1,
       |         d1 AS d0
       |  FROM dpz WHERE s < ${2 * n - 2})
       |SELECT CAST($n AS BIGINT) AS n, CAST($cn AS BIGINT) AS coarse_n,
       |       CAST(${n.toLong * n} AS BIGINT) AS cells_full,
       |       CAST(${2L * cn * cn} AS BIGINT) AS cells_coarse,
       |       cells_refined, d1[$n] AS dtw_fast
       |FROM dpz WHERE s = ${2 * n - 2}""".stripMargin
  }

  /** Pyramid fine resolution: quarter-hour buckets over the SAME fixed
    * 30-day calendar the hourly build uses (720 h × 4 = 2880 buckets of
    * 900 s) — divisible by FdC² = 64, so TWO full coarsening levels run:
    * 2880 → 360 → 45. (The verdict sketched minute resolution n = 5760;
    * 2880 keeps the oracle's fine-level recursion ~6 s in DuckDB where
    * 5760 measured 4× that — the pyramid STRUCTURE, not the bucket
    * width, is what this entry adds.) */
  val FdPyrN = 2880

  // ── ts_fastdtw_pyramid ★ (r14) — the MULTI-LEVEL FastDTW recursion
  // (Salvador & Chan 2007 §4, full algorithm — r13 shipped one
  // coarsen/project/refine pass; this is the named remaining half):
  // quarter-hour series (n = [[FdPyrN]]) coarsened twice by [[FdC]],
  // then refined level by level, EACH LEVEL'S PROJECTION FEEDING THE
  // NEXT:
  //  1. L2 (n = 45): FULL DP both directions; optimal-path cells fall
  //     out relationally (forward×backward, the r13 trick).
  //  2. L1 (n = 360): the L2 path dilated ± [[FdR]] becomes per-row
  //     column bounds; BOTH L1 DPs run BANDED (Inf outside — a cell on
  //     the L1 optimal path is exactly a cell optimal WITHIN the
  //     projected corridor, the FastDTW definition); path extraction is
  //     the same forward×backward identity, now over banded matrices
  //     (sound unchanged: in-corridor F/B values are exact corridor-
  //     restricted costs, and Inf cells cannot fake the equality — the
  //     Inf sum sits ≥ 2⁶² above any real total).
  //  3. L0 (n = 2880): the L1 path's dilation becomes the fine bounds;
  //     one banded forward DP yields the distance.
  // Output pins the per-level refinement ledger: cells_full = n² vs
  // cells_coarse (2·45²) vs cells_l1 vs cells_l0 — all oracle-checked
  // integers, so the pyramid's claimed cell economy is machine-verified
  // level by level. Radius-parameterized like the 1-level operator;
  // FastDtwSpec pins the 2-level accuracy tradeoff against the exact
  // full-resolution DP (over-estimate only; exact at larger r).
  //
  // Scale shape (100 TB): identical to ts_fastdtw — the corpus
  // collapses in one map-side bucket aggregation; everything after is
  // per-row expression work over one packed pair, cells linear in n per
  // level instead of n², which is the entire point of the recursion.
  def tsFastDtwPyramid(spark: SparkSession, dir: String): DataFrame =
    tsFastDtwPyramidAt(spark, dir, FdR)

  def tsFastDtwPyramidAt(spark: SparkSession, dir: String, r: Int): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    val n = FdPyrN
    val n1 = n / FdC
    val n2 = n1 / FdC
    // THREE pinned stages, not one statement: Spark's ProjectCollapse
    // substitutes array-building expressions into their consumers, so a
    // DP kernel referencing an un-materialized vector RE-EVALUATES the
    // whole build per element_at (measured: 14 s for this query
    // single-statement vs ~2 s staged). Each pin is a one-row relation;
    // the kernels then read true columns.
    // Stage A — the series vectors: fine (quarter-hour), L1 and L2
    // block sums (relational, map-side combinable) and their reversals.
    spark.sql(
      s"""WITH bounds AS (SELECT min(unix_micros(ts)) AS t0 FROM events_t),
        |qh AS (
        |  SELECT CAST((unix_micros(ts) - b.t0) div 900000000 AS BIGINT) AS h,
        |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |           AS BIGINT) AS cx,
        |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |           AS BIGINT) AS cy
        |  FROM events_t CROSS JOIN bounds b
        |  WHERE (unix_micros(ts) - b.t0) div 900000000 < $n
        |  GROUP BY CAST((unix_micros(ts) - b.t0) div 900000000 AS BIGINT)),
        |grid AS (SELECT CAST(x AS BIGINT) AS h
        |         FROM (SELECT explode(sequence(0, ${n - 1})) AS x)),
        |xs AS (
        |  SELECT g.h, coalesce(s.cx, CAST(0 AS BIGINT)) AS x,
        |         coalesce(s.cy, CAST(0 AS BIGINT)) AS y
        |  FROM grid g LEFT JOIN qh s ON s.h = g.h),
        |vec AS (
        |  SELECT transform(array_sort(collect_list(struct(h, x))),
        |           t -> t.x) AS xv,
        |         transform(array_sort(collect_list(struct(h, y))),
        |           t -> t.y) AS yv
        |  FROM xs),
        |xs1 AS (
        |  SELECT CAST(h div $FdC AS BIGINT) AS hb,
        |         CAST(sum(x) AS BIGINT) AS bx, CAST(sum(y) AS BIGINT) AS by2
        |  FROM xs GROUP BY h div $FdC),
        |xs2 AS (
        |  SELECT CAST(hb div $FdC AS BIGINT) AS hb2,
        |         CAST(sum(bx) AS BIGINT) AS bx, CAST(sum(by2) AS BIGINT) AS by2
        |  FROM xs1 GROUP BY hb div $FdC),
        |cv1 AS (
        |  SELECT transform(array_sort(collect_list(struct(hb, bx))),
        |           t -> t.bx) AS c1x,
        |         transform(array_sort(collect_list(struct(hb, by2))),
        |           t -> t.by2) AS c1y,
        |         transform(array_sort(collect_list(struct(-hb AS nh, bx))),
        |           t -> t.bx) AS r1x,
        |         transform(array_sort(collect_list(struct(-hb AS nh, by2))),
        |           t -> t.by2) AS r1y
        |  FROM xs1),
        |cv2 AS (
        |  SELECT transform(array_sort(collect_list(struct(hb2, bx))),
        |           t -> t.bx) AS c2x,
        |         transform(array_sort(collect_list(struct(hb2, by2))),
        |           t -> t.by2) AS c2y,
        |         transform(array_sort(collect_list(struct(-hb2 AS nh, bx))),
        |           t -> t.bx) AS r2x,
        |         transform(array_sort(collect_list(struct(-hb2 AS nh, by2))),
        |           t -> t.by2) AS r2y
        |  FROM xs2)
        |SELECT v.xv, v.yv, a.c1x, a.c1y, a.r1x, a.r1y,
        |       b.c2x, b.c2y, b.r2x, b.r2y
        |FROM vec v CROSS JOIN cv1 a CROSS JOIN cv2 b""".stripMargin)
      .pinned()
      .createOrReplaceTempView("pyr_vec_t")
    // Stage B — the per-level corridors: L2 full DPs + path, the BANDED
    // L1 DPs (compact representation) + path, and the projected fine
    // bounds. One pinned row of band arrays + cell ledgers.
    spark.sql(
      s"""WITH m2 AS (
        |  SELECT c2x, c2y, ${dtwMatrixExpr(n2, "c2x", "c2y")} AS fm2,
        |         ${dtwMatrixExpr(n2, "r2x", "r2y")} AS bm2
        |  FROM pyr_vec_t),
        |opath2 AS (
        |  SELECT p.pos div $n2 AS ci, p.pos % $n2 AS cj
        |  FROM m2 m LATERAL VIEW posexplode(m.fm2) p AS pos, col
        |  WHERE p.col + element_at(m.bm2, ${n2 * n2} - p.pos)
        |        - (element_at(m.c2x, CAST(p.pos div $n2 + 1 AS INT))
        |            - element_at(m.c2y, p.pos % $n2 + 1))
        |          * (element_at(m.c2x, CAST(p.pos div $n2 + 1 AS INT))
        |            - element_at(m.c2y, p.pos % $n2 + 1))
        |        = element_at(m.fm2, ${n2 * n2})),
        |dil2 AS (
        |  SELECT DISTINCT ci + di AS ci, cj + dj AS cj
        |  FROM opath2
        |  LATERAL VIEW explode(sequence(-$r, $r)) AS di
        |  LATERAL VIEW explode(sequence(-$r, $r)) AS dj
        |  WHERE ci + di BETWEEN 0 AND ${n2 - 1}
        |    AND cj + dj BETWEEN 0 AND ${n2 - 1}),
        |rowband2 AS (
        |  SELECT ci, min(cj) AS cjlo, max(cj) AS cjhi FROM dil2 GROUP BY ci),
        |band1 AS (
        |  SELECT transform(array_sort(collect_list(struct(ci, cjlo))),
        |           t -> CAST(t.cjlo * $FdC AS BIGINT)) AS lo1,
        |         transform(array_sort(collect_list(struct(ci, cjhi))),
        |           t -> CAST(t.cjhi * $FdC + ${FdC - 1} AS BIGINT)) AS hi1,
        |         transform(array_sort(collect_list(struct(-ci AS nc, cjhi))),
        |           t -> CAST(${n1 - 1} - (t.cjhi * $FdC + ${FdC - 1})
        |             AS BIGINT)) AS rlo1,
        |         transform(array_sort(collect_list(struct(-ci AS nc, cjlo))),
        |           t -> CAST(${n1 - 1} - t.cjlo * $FdC AS BIGINT)) AS rhi1,
        |         CAST(sum((cjhi - cjlo + 1) * ${FdC.toLong * FdC}) AS BIGINT)
        |           AS cells_l1
        |  FROM rowband2),
        |m1 AS (
        |  SELECT
        |    ${dtwBandMatrixCompactExpr(n1, FdC, "v.c1x", "v.c1y", "b.lo1", "b.hi1")}
        |      AS fm1,
        |    ${dtwBandMatrixCompactExpr(n1, FdC, "v.r1x", "v.r1y", "b.rlo1", "b.rhi1")}
        |      AS bm1
        |  FROM pyr_vec_t v CROSS JOIN band1 b),
        |f1c AS (
        |  SELECT pe.i AS ci, CAST(st.os AS INT) + pe2.k AS cj, pe2.f AS f
        |  FROM m1
        |  LATERAL VIEW posexplode(fm1) pe AS i, st
        |  LATERAL VIEW posexplode(st.vs) pe2 AS k, f
        |  WHERE pe2.f < ${DtwInf}L),
        |b1c AS (
        |  SELECT ${n1 - 1} - pe.i AS ci,
        |         ${n1 - 1} - (CAST(st.os AS INT) + pe2.k) AS cj, pe2.f AS bv
        |  FROM m1
        |  LATERAL VIEW posexplode(bm1) pe AS i, st
        |  LATERAL VIEW posexplode(st.vs) pe2 AS k, f
        |  WHERE pe2.f < ${DtwInf}L),
        |tot1 AS (
        |  SELECT f AS total FROM f1c
        |  WHERE ci = ${n1 - 1} AND cj = ${n1 - 1}),
        |opath1 AS (
        |  SELECT fc.ci, fc.cj
        |  FROM f1c fc
        |  JOIN b1c bc ON bc.ci = fc.ci AND bc.cj = fc.cj
        |  CROSS JOIN tot1 t
        |  CROSS JOIN pyr_vec_t v
        |  WHERE fc.f + bc.bv
        |        - (element_at(v.c1x, fc.ci + 1) - element_at(v.c1y, fc.cj + 1))
        |          * (element_at(v.c1x, fc.ci + 1) - element_at(v.c1y, fc.cj + 1))
        |        = t.total),
        |dil1 AS (
        |  SELECT DISTINCT ci + di AS ci, cj + dj AS cj
        |  FROM opath1
        |  LATERAL VIEW explode(sequence(-$r, $r)) AS di
        |  LATERAL VIEW explode(sequence(-$r, $r)) AS dj
        |  WHERE ci + di BETWEEN 0 AND ${n1 - 1}
        |    AND cj + dj BETWEEN 0 AND ${n1 - 1}),
        |rowband1 AS (
        |  SELECT ci, min(cj) AS cjlo, max(cj) AS cjhi FROM dil1 GROUP BY ci),
        |band0 AS (
        |  SELECT transform(array_sort(collect_list(struct(ci, cjlo))),
        |           t -> CAST(t.cjlo * $FdC AS BIGINT)) AS lo0,
        |         transform(array_sort(collect_list(struct(ci, cjhi))),
        |           t -> CAST(t.cjhi * $FdC + ${FdC - 1} AS BIGINT)) AS hi0,
        |         CAST(sum((cjhi - cjlo + 1) * ${FdC.toLong * FdC}) AS BIGINT)
        |           AS cells_l0
        |  FROM rowband1)
        |SELECT b1.cells_l1, b0.lo0, b0.hi0, b0.cells_l0
        |FROM band1 b1 CROSS JOIN band0 b0""".stripMargin)
      .pinned()
      .createOrReplaceTempView("pyr_band_t")
    // Stage C — the banded fine DP over pinned columns.
    spark.sql(
      s"""SELECT CAST($n AS BIGINT) AS n, CAST($n1 AS BIGINT) AS l1_n,
        |       CAST($n2 AS BIGINT) AS l2_n,
        |       CAST(${n.toLong * n} AS BIGINT) AS cells_full,
        |       CAST(${2L * n2 * n2} AS BIGINT) AS cells_coarse,
        |       b.cells_l1, b.cells_l0,
        |       ${dtwBandDistCompactExpr(n, FdC, "v.xv", "v.yv", "b.lo0", "b.hi0")}
        |         AS dtw_fast
        |FROM pyr_vec_t v CROSS JOIN pyr_band_t b""".stripMargin)
  }

  /** Banded DTW distance as a COMPACT row fold: each row's array holds
    * ONLY its band cells (offset-indexed — the accumulator carries
    * (prevOff, prevRow)), so the per-cell append copies O(band width)
    * instead of O(n) and the whole fold is O(n·w²) instead of the
    * full-row kernel's O(n³)-ish concat cost — at the pyramid's
    * n = 2880 the full-row form measured 4 min vs seconds compact.
    * Reads: up = prev(i−1, j), diag = prev(i−1, j−1) via the offset
    * guards (out-of-prev-band → Inf), left = the row being built. */
  def dtwBandDistCompactExpr(n: Int, cf: Int, qCol: String, cCol: String,
      loCol: String, hiCol: String): String = {
    val inf = s"CAST($DtwInf AS BIGINT)"
    def prev(shift: Int) =
      s"""CASE WHEN j - acc.poff - $shift BETWEEN 0 AND size(acc.prow) - 1
         |     THEN element_at(acc.prow, CAST(j - acc.poff - $shift + 1 AS INT))
         |     ELSE $inf END""".stripMargin
    s"""aggregate(sequence(0, ${n - 1}),
       |  named_struct('poff', CAST(0 AS BIGINT),
       |               'prow', CAST(array() AS ARRAY<BIGINT>)),
       |  (acc, i) -> named_struct(
       |    'poff', element_at($loCol, CAST(i div $cf + 1 AS INT)),
       |    'prow', aggregate(
       |      sequence(element_at($loCol, CAST(i div $cf + 1 AS INT)),
       |               element_at($hiCol, CAST(i div $cf + 1 AS INT))),
       |      CAST(array() AS ARRAY<BIGINT>),
       |      (nr, j) -> concat(nr, array(least($inf,
       |        (element_at($qCol, CAST(i + 1 AS INT))
       |          - element_at($cCol, CAST(j + 1 AS INT)))
       |          * (element_at($qCol, CAST(i + 1 AS INT))
       |            - element_at($cCol, CAST(j + 1 AS INT)))
       |        + CASE WHEN i = 0 AND j = 0 THEN CAST(0 AS BIGINT)
       |          ELSE least(
       |            ${prev(0)},
       |            ${prev(1)},
       |            CASE WHEN j > element_at($loCol, CAST(i div $cf + 1 AS INT))
       |                 THEN element_at(nr, CAST(
       |                   j - element_at($loCol, CAST(i div $cf + 1 AS INT))
       |                   AS INT))
       |                 ELSE $inf END)
       |          END))))),
       |  acc -> element_at(acc.prow, CAST(${n - 1} - acc.poff + 1 AS INT)))
       |""".stripMargin
  }

  /** Banded DTW MATRIX in the compact per-row representation — an
    * array of (os = band start, vs = band cells) structs, one per row —
    * built with the same O(n·w²) fold discipline as
    * [[dtwBandDistCompactExpr]] (the full-width matrix form measured
    * ~10 s per 360² matrix from the O(n³) concat cost; this is
    * milliseconds). The pyramid's mid-level path extraction explodes it
    * to (i, j, value) cells. */
  def dtwBandMatrixCompactExpr(n: Int, cf: Int, qCol: String, cCol: String,
      loCol: String, hiCol: String): String = {
    val inf = s"CAST($DtwInf AS BIGINT)"
    val loI = s"element_at($loCol, CAST(i div $cf + 1 AS INT))"
    val hiI = s"element_at($hiCol, CAST(i div $cf + 1 AS INT))"
    val poff = "element_at(m, size(m)).os"
    val pvs = "element_at(m, size(m)).vs"
    def prev(shift: Int) =
      s"""CASE WHEN size(m) > 0 AND j - $poff - $shift >= 0
         |            AND j - $poff - $shift <= size($pvs) - 1
         |     THEN element_at($pvs, CAST(j - $poff - $shift + 1 AS INT))
         |     ELSE $inf END""".stripMargin
    s"""aggregate(sequence(0, ${n - 1}),
       |  CAST(array() AS ARRAY<STRUCT<os: BIGINT, vs: ARRAY<BIGINT>>>),
       |  (m, i) -> concat(m, array(named_struct(
       |    'os', $loI,
       |    'vs', aggregate(sequence($loI, $hiI),
       |      CAST(array() AS ARRAY<BIGINT>),
       |      (nr, j) -> concat(nr, array(least($inf,
       |        (element_at($qCol, CAST(i + 1 AS INT))
       |          - element_at($cCol, CAST(j + 1 AS INT)))
       |          * (element_at($qCol, CAST(i + 1 AS INT))
       |            - element_at($cCol, CAST(j + 1 AS INT)))
       |        + CASE WHEN i = 0 AND j = 0 THEN CAST(0 AS BIGINT)
       |          ELSE least(
       |            ${prev(0)},
       |            ${prev(1)},
       |            CASE WHEN j > $loI
       |                 THEN element_at(nr, CAST(j - $loI AS INT))
       |                 ELSE $inf END)
       |          END))))))))""".stripMargin
  }

  /** DuckDB replay of the full 2-level pyramid trajectory (generated
    * CTE chains, the tsFastDtwSql discipline): L2 full anti-diagonal
    * DPs, relational path extraction, banded L1 anti-diagonal DPs (full-
    * length lists, Inf-guarded — in-band cells only are real), the same
    * forward×backward identity over banded cells, then the banded fine
    * recursion. Every cells_* integer and the final distance replays
    * bit-for-bit. */
  val tsFastDtwPyramidSql: String = {
    val n = FdPyrN
    val n1 = n / FdC
    val n2 = n1 / FdC
    val r = FdR
    val inf = s"$DtwInf::BIGINT"
    def fullDp(px: String, m: Int, xcol: String, ycol: String) =
      s"""$px AS (
         |  SELECT 0 AS s, $xcol AS q, $ycol AS c,
         |         list_transform(range(0, $m), i ->
         |           CASE WHEN i = 0
         |                THEN ($xcol[1] - $ycol[1]) * ($xcol[1] - $ycol[1])
         |                ELSE $inf END) AS d1,
         |         list_transform(range(0, $m), i -> $inf) AS d0
         |  FROM cv2
         |  UNION ALL
         |  SELECT s + 1, q, c,
         |         list_transform(range(0, $m), i ->
         |           CASE WHEN (s + 1 - i) BETWEEN 0 AND ${m - 1}
         |                THEN least($inf,
         |                  (q[i + 1] - c[s + 1 - i + 1])
         |                    * (q[i + 1] - c[s + 1 - i + 1])
         |                  + least(coalesce(d1[i], $inf),
         |                          coalesce(d1[i + 1], $inf),
         |                          coalesce(d0[i], $inf)))
         |                ELSE $inf END) AS d1,
         |         d1 AS d0
         |  FROM $px WHERE s < ${2 * m - 2})""".stripMargin
    def bandDp(px: String, m: Int, xcol: String, ycol: String,
        locol: String, hicol: String) =
      s"""$px AS (
         |  SELECT 0 AS s, $xcol AS q, $ycol AS c, $locol AS lo, $hicol AS hi,
         |         list_transform(range(0, $m), i ->
         |           CASE WHEN i = 0
         |                THEN ($xcol[1] - $ycol[1]) * ($xcol[1] - $ycol[1])
         |                ELSE $inf END) AS d1,
         |         list_transform(range(0, $m), i -> $inf) AS d0
         |  FROM cv2 CROSS JOIN band1
         |  UNION ALL
         |  SELECT s + 1, q, c, lo, hi,
         |         list_transform(range(0, $m), i ->
         |           CASE WHEN (s + 1 - i) BETWEEN lo[i // $FdC + 1]
         |                                     AND hi[i // $FdC + 1]
         |                THEN least($inf,
         |                  (q[i + 1] - c[s + 1 - i + 1])
         |                    * (q[i + 1] - c[s + 1 - i + 1])
         |                  + least(coalesce(d1[i], $inf),
         |                          coalesce(d1[i + 1], $inf),
         |                          coalesce(d0[i], $inf)))
         |                ELSE $inf END) AS d1,
         |         d1 AS d0
         |  FROM $px WHERE s < ${2 * m - 2})""".stripMargin
    s"""WITH RECURSIVE bounds AS (
       |  SELECT min(epoch_us(ts)) AS t0 FROM events),
       |qh AS (
       |  SELECT CAST((epoch_us(ts) - b.t0) // 900000000 AS BIGINT) AS h,
       |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
       |           AS BIGINT) AS cx,
       |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
       |           AS BIGINT) AS cy
       |  FROM events CROSS JOIN bounds b
       |  WHERE (epoch_us(ts) - b.t0) // 900000000 < $n
       |  GROUP BY CAST((epoch_us(ts) - b.t0) // 900000000 AS BIGINT)),
       |grid AS (SELECT CAST(unnest(range(0, $n)) AS BIGINT) AS h),
       |xs AS (
       |  SELECT g.h, coalesce(s.cx, CAST(0 AS BIGINT)) AS x,
       |         coalesce(s.cy, CAST(0 AS BIGINT)) AS y
       |  FROM grid g LEFT JOIN qh s ON s.h = g.h),
       |vec AS MATERIALIZED (
       |  SELECT list(x ORDER BY h) AS xv, list(y ORDER BY h) AS yv FROM xs),
       |cv AS MATERIALIZED (
       |  SELECT xv, yv,
       |         list_transform(range(0, $n1), i ->
       |           CAST(list_sum(xv[i * $FdC + 1 : i * $FdC + $FdC])
       |             AS BIGINT)) AS c1x,
       |         list_transform(range(0, $n1), i ->
       |           CAST(list_sum(yv[i * $FdC + 1 : i * $FdC + $FdC])
       |             AS BIGINT)) AS c1y
       |  FROM vec),
       |cv2 AS MATERIALIZED (
       |  SELECT *,
       |         list_transform(range(0, $n2), i ->
       |           CAST(list_sum(c1x[i * $FdC + 1 : i * $FdC + $FdC])
       |             AS BIGINT)) AS c2x,
       |         list_transform(range(0, $n2), i ->
       |           CAST(list_sum(c1y[i * $FdC + 1 : i * $FdC + $FdC])
       |             AS BIGINT)) AS c2y
       |  FROM cv),
       |${fullDp("dpf2", n2, "c2x", "c2y")},
       |${fullDp("dpb2", n2, "list_reverse(c2x)", "list_reverse(c2y)")},
       |f2cells AS (
       |  SELECT t.i AS ci, dp.s - t.i AS cj, dp.d1[t.i + 1] AS f
       |  FROM dpf2 dp, unnest(range(0, $n2)) AS t(i)
       |  WHERE (dp.s - t.i) BETWEEN 0 AND ${n2 - 1}),
       |b2cells AS (
       |  SELECT ${n2 - 1} - t.i AS ci, ${n2 - 1} - (dp.s - t.i) AS cj,
       |         dp.d1[t.i + 1] AS bv
       |  FROM dpb2 dp, unnest(range(0, $n2)) AS t(i)
       |  WHERE (dp.s - t.i) BETWEEN 0 AND ${n2 - 1}),
       |ctot2 AS (
       |  SELECT f AS total FROM f2cells
       |  WHERE ci = ${n2 - 1} AND cj = ${n2 - 1}),
       |opath2 AS (
       |  SELECT fc.ci, fc.cj
       |  FROM f2cells fc
       |  JOIN b2cells bc ON bc.ci = fc.ci AND bc.cj = fc.cj
       |  CROSS JOIN ctot2 t
       |  CROSS JOIN cv2 v
       |  WHERE fc.f + bc.bv
       |        - (v.c2x[fc.ci + 1] - v.c2y[fc.cj + 1])
       |          * (v.c2x[fc.ci + 1] - v.c2y[fc.cj + 1])
       |        = t.total),
       |dil2 AS (
       |  SELECT DISTINCT o.ci + a.di AS ci, o.cj + b.dj AS cj
       |  FROM opath2 o,
       |       unnest(range(-$r, ${r + 1})) AS a(di),
       |       unnest(range(-$r, ${r + 1})) AS b(dj)
       |  WHERE o.ci + a.di BETWEEN 0 AND ${n2 - 1}
       |    AND o.cj + b.dj BETWEEN 0 AND ${n2 - 1}),
       |rowband2 AS (
       |  SELECT ci, min(cj) AS cjlo, max(cj) AS cjhi FROM dil2 GROUP BY ci),
       |band1 AS MATERIALIZED (
       |  SELECT list(CAST(cjlo * $FdC AS BIGINT) ORDER BY ci) AS lo1,
       |         list(CAST(cjhi * $FdC + ${FdC - 1} AS BIGINT) ORDER BY ci)
       |           AS hi1,
       |         CAST(sum((cjhi - cjlo + 1) * ${FdC.toLong * FdC})
       |           AS BIGINT) AS cells_l1
       |  FROM rowband2),
       |${bandDp("pf1", n1, "c1x", "c1y", "lo1", "hi1")},
       |${bandDp("pb1", n1, "list_reverse(c1x)", "list_reverse(c1y)",
          s"list_reverse(list_transform(hi1, x -> ${n1 - 1} - x))",
          s"list_reverse(list_transform(lo1, x -> ${n1 - 1} - x))")},
       |f1cells AS MATERIALIZED (
       |  SELECT t.i AS ci, dp.s - t.i AS cj, dp.d1[t.i + 1] AS f
       |  FROM pf1 dp, unnest(range(0, $n1)) AS t(i)
       |  WHERE (dp.s - t.i) BETWEEN 0 AND ${n1 - 1}
       |    AND dp.d1[t.i + 1] < $inf),
       |b1cells AS MATERIALIZED (
       |  SELECT ${n1 - 1} - t.i AS ci, ${n1 - 1} - (dp.s - t.i) AS cj,
       |         dp.d1[t.i + 1] AS bv
       |  FROM pb1 dp, unnest(range(0, $n1)) AS t(i)
       |  WHERE (dp.s - t.i) BETWEEN 0 AND ${n1 - 1}
       |    AND dp.d1[t.i + 1] < $inf),
       |ctot1 AS (
       |  SELECT f AS total FROM f1cells
       |  WHERE ci = ${n1 - 1} AND cj = ${n1 - 1}),
       |opath1 AS (
       |  SELECT fc.ci, fc.cj
       |  FROM f1cells fc
       |  JOIN b1cells bc ON bc.ci = fc.ci AND bc.cj = fc.cj
       |  CROSS JOIN ctot1 t
       |  CROSS JOIN cv2 v
       |  WHERE fc.f + bc.bv
       |        - (v.c1x[fc.ci + 1] - v.c1y[fc.cj + 1])
       |          * (v.c1x[fc.ci + 1] - v.c1y[fc.cj + 1])
       |        = t.total),
       |dil1 AS (
       |  SELECT DISTINCT o.ci + a.di AS ci, o.cj + b.dj AS cj
       |  FROM opath1 o,
       |       unnest(range(-$r, ${r + 1})) AS a(di),
       |       unnest(range(-$r, ${r + 1})) AS b(dj)
       |  WHERE o.ci + a.di BETWEEN 0 AND ${n1 - 1}
       |    AND o.cj + b.dj BETWEEN 0 AND ${n1 - 1}),
       |rowband1 AS (
       |  SELECT ci, min(cj) AS cjlo, max(cj) AS cjhi FROM dil1 GROUP BY ci),
       |band0 AS MATERIALIZED (
       |  SELECT list(CAST(cjlo * $FdC AS BIGINT) ORDER BY ci) AS lo0,
       |         list(CAST(cjhi * $FdC + ${FdC - 1} AS BIGINT) ORDER BY ci)
       |           AS hi0,
       |         CAST(sum((cjhi - cjlo + 1) * ${FdC.toLong * FdC})
       |           AS BIGINT) AS cells_l0
       |  FROM rowband1),
       |dpz0 AS (
       |  SELECT 0 AS s, v.xv AS q, v.yv AS c, b.lo0 AS lo, b.hi0 AS hi,
       |         list_transform(range(0, $n), i ->
       |           CASE WHEN i = 0
       |                THEN (v.xv[1] - v.yv[1]) * (v.xv[1] - v.yv[1])
       |                ELSE $inf END) AS d1,
       |         list_transform(range(0, $n), i -> $inf) AS d0
       |  FROM vec v CROSS JOIN band0 b
       |  UNION ALL
       |  SELECT s + 1, q, c, lo, hi,
       |         list_transform(range(0, $n), i ->
       |           CASE WHEN (s + 1 - i) BETWEEN lo[i // $FdC + 1]
       |                                     AND hi[i // $FdC + 1]
       |                THEN least($inf,
       |                  (q[i + 1] - c[s + 1 - i + 1])
       |                    * (q[i + 1] - c[s + 1 - i + 1])
       |                  + least(coalesce(d1[i], $inf),
       |                          coalesce(d1[i + 1], $inf),
       |                          coalesce(d0[i], $inf)))
       |                ELSE $inf END) AS d1,
       |         d1 AS d0
       |  FROM dpz0 WHERE s < ${2 * n - 2})
       |SELECT CAST($n AS BIGINT) AS n, CAST($n1 AS BIGINT) AS l1_n,
       |       CAST($n2 AS BIGINT) AS l2_n,
       |       CAST(${n.toLong * n} AS BIGINT) AS cells_full,
       |       CAST(${2L * n2 * n2} AS BIGINT) AS cells_coarse,
       |       b1.cells_l1, b0.cells_l0, z.d1[$n] AS dtw_fast
       |FROM dpz0 z CROSS JOIN band1 b1 CROSS JOIN band0 b0
       |WHERE z.s = ${2 * n - 2}""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_fastdtw" -> (tsFastDtw _),
    "ts_fastdtw_pyramid" -> (tsFastDtwPyramid _),
    "pipe_drift_report" -> (pipeDriftReport _),
    "ts_changepoint" -> (tsChangepoint _),
    "ts_ewma" -> (tsEwma _),
    "ts_seasonal" -> (tsSeasonal _),
    "ts_discord" -> (tsDiscord _),
    "ts_stomp_discord" -> (tsStompDiscord _),
    "ts_motif" -> (tsMotif _),
    "ts_forecast_baseline" -> (tsForecastBaseline _),
    "ts_periodicity" -> (tsPeriodicity _),
    "ts_paa_topk" -> (tsPaaTopk _),
    "ts_sax_prune" -> (tsSaxPrune _),
    "ts_lbkeogh" -> (tsLbKeogh _),
    "ts_dtw_topk" -> (tsDtwTopk _))

  val oracle: Map[String, String] = Map(
    "ts_fastdtw" -> tsFastDtwSql,
    "ts_fastdtw_pyramid" -> tsFastDtwPyramidSql,
    "pipe_drift_report" -> pipeDriftReportSql,
    "ts_changepoint" -> tsChangepointSql,
    "ts_ewma" -> tsEwmaSql,
    "ts_seasonal" -> tsSeasonalSql,
    "ts_discord" -> tsDiscordSql,
    "ts_stomp_discord" -> tsStompDiscordSql,
    "ts_motif" -> tsMotifSql,
    "ts_forecast_baseline" -> tsForecastBaselineSql,
    "ts_periodicity" -> tsPeriodicitySql,
    "ts_paa_topk" -> tsPaaTopkSql,
    "ts_sax_prune" -> tsSaxPruneSql,
    "ts_lbkeogh" -> tsLbKeoghSql,
    "ts_dtw_topk" -> tsDtwTopkSql)
}
