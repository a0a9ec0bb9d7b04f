package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import DedupQueries.{hSpark, hDuck}

/** Mergeable-sketch operators beyond the KMV bottom-k
  * (`sk_kmv_distinct`, in [[PipelineQueries]]) and the Misra–Gries heavy
  * hitters: HyperLogLog distinct counting (Flajolet et al. 2007) — the
  * sketch production distinct-counting actually ships (fixed 2^p
  * registers vs KMV's K hashes; register-wise max is a true semilattice,
  * so partials merge in any order).
  *
  * The engine-exactness trick: HLL's harmonic mean needs Σ 2^(−M_j),
  * whose floating sum is order-sensitive — instead fold the INTEGER
  * numerator Σ 2^(Mmax − M_j) (each term an exact BIGINT power of two,
  * and integer addition is order-free), then the estimate is
  * α·m²·2^Mmax / num with ONE float multiply chain and one division in a
  * fixed parse order — bit-equal across engines, no transcendentals
  * (rho comes from `length(bin(v))`, exact in both engines, not log2).
  *
  * Scale shape (100 TB): one narrow hash pass over the token stream
  * (duplicates collapse into the same register max — no distinct
  * needed, which is HLL's whole point), one map-side-combined
  * (group, register) MAX — 64 rows per group cross the shuffle, the HLL
  * wire cost — and a constant-size fold. The exact_distinct column is
  * the fixture-scale accuracy witness (the KMV pattern); production
  * drops it.
  */
object SketchQueries {

  /** 2^P registers. P = 6 → m = 64, standard error 1.04/√64 ≈ 13%. */
  val Registers = 64
  /** α₆₄ (Flajolet et al., m = 64). */
  val Alpha = "0.709"

  private def viewDocs(spark: SparkSession, dir: String): Unit =
    spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
      .createOrReplaceTempView("documents")

  // ── sk_hll_distinct ★ — per-language HLL vocabulary estimate ─────────
  //
  // Register j = h mod 64; rank value v = h div 64 (54 bits of the
  // engine-shared md5-top-60 hash); rho = 55 − length(bin(v)) — the
  // leading-zero rank, with the measure-zero v = 0 case pinned to 54 by
  // the same formula in both engines. Raw estimate only (the
  // small-range linear-counting correction needs ln(), a transcendental
  // — zero_registers is emitted so a consumer can apply it; the spec
  // pins accuracy in the raw regime instead).
  def skHllDistinct(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    spark.sql(
      s"""WITH words AS (
         |  SELECT lang, w FROM documents LATERAL VIEW explode(split(text, ' ')) AS w),
         |regs AS (
         |  SELECT lang, CAST(h % $Registers AS INT) AS j,
         |         CAST(55 - length(bin(h div $Registers)) AS INT) AS rho
         |  FROM (SELECT lang, ${hSpark("w")} AS h FROM words)),
         |maxes AS (SELECT lang, j, max(rho) AS m FROM regs GROUP BY lang, j),
         |grid AS (
         |  SELECT lang, j FROM (SELECT DISTINCT lang FROM documents)
         |  LATERAL VIEW explode(sequence(0, ${Registers - 1})) AS j),
         |filled AS (
         |  SELECT g.lang, g.j, coalesce(m.m, 0) AS m
         |  FROM grid g LEFT JOIN maxes m ON g.lang = m.lang AND g.j = m.j),
         |folded AS (
         |  SELECT lang, max(m) AS mmax,
         |         CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS zero_registers
         |  FROM filled GROUP BY lang),
         |nums AS (
         |  SELECT f.lang, fo.mmax, fo.zero_registers,
         |         CAST(sum(shiftleft(CAST(1 AS BIGINT), fo.mmax - f.m)) AS BIGINT)
         |           AS num
         |  FROM filled f JOIN folded fo ON f.lang = fo.lang
         |  GROUP BY f.lang, fo.mmax, fo.zero_registers),
         |exact AS (
         |  SELECT lang, CAST(count(DISTINCT w) AS BIGINT) AS exact_distinct
         |  FROM words GROUP BY lang)
         |SELECT n.lang, n.zero_registers, CAST(n.mmax AS INT) AS max_register,
         |       CAST($Alpha AS DOUBLE) * ${Registers * Registers}.0
         |         * pow(2.0, CAST(n.mmax AS DOUBLE)) / n.num AS hll_estimate,
         |       e.exact_distinct
         |FROM nums n JOIN exact e ON n.lang = e.lang""".stripMargin)
  }

  val skHllDistinctSql: String =
    s"""WITH words AS (
       |  SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
       |regs AS (
       |  SELECT lang, CAST(h % $Registers AS INT) AS j,
       |         CAST(55 - length(bin(h // $Registers)) AS INT) AS rho
       |  FROM (SELECT lang, ${hDuck("w")} AS h FROM words)),
       |maxes AS (SELECT lang, j, max(rho) AS m FROM regs GROUP BY lang, j),
       |grid AS (
       |  SELECT l.lang, CAST(t.j AS INT) AS j
       |  FROM (SELECT DISTINCT lang FROM documents) l
       |  CROSS JOIN (SELECT unnest(range(0, $Registers)) AS j) t),
       |filled AS (
       |  SELECT g.lang, g.j, coalesce(m.m, 0) AS m
       |  FROM grid g LEFT JOIN maxes m ON g.lang = m.lang AND g.j = m.j),
       |folded AS (
       |  SELECT lang, max(m) AS mmax,
       |         CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |           AS zero_registers
       |  FROM filled GROUP BY lang),
       |nums AS (
       |  SELECT f.lang, fo.mmax, fo.zero_registers,
       |         CAST(sum(CAST(1 AS BIGINT) << (fo.mmax - f.m)) AS BIGINT) AS num
       |  FROM filled f JOIN folded fo ON f.lang = fo.lang
       |  GROUP BY f.lang, fo.mmax, fo.zero_registers),
       |exact AS (
       |  SELECT lang, CAST(count(DISTINCT w) AS BIGINT) AS exact_distinct
       |  FROM words GROUP BY lang)
       |SELECT n.lang, n.zero_registers, CAST(n.mmax AS INT) AS max_register,
       |       CAST($Alpha AS DOUBLE) * ${Registers * Registers}.0
       |         * pow(2.0, CAST(n.mmax AS DOUBLE)) / n.num AS hll_estimate,
       |       e.exact_distinct
       |FROM nums n JOIN exact e ON n.lang = e.lang""".stripMargin

  // ── sk_sample_quantiles ★ (r11) — sampled order statistics per group
  // via the deterministic bottom-K-by-hash sample
  // (`expr/BottomKSample`, K = 256): per language, estimate the p25 /
  // p50 / p75 document length from the values carried by the K smallest
  // md5 hashes of the doc id. This completes the production sketch
  // quartet (KMV distinct, HLL, Misra–Gries heavy hitters, sampled
  // quantiles) — the per-group distribution summary a 100 TB profile
  // pass ships when the exact two-phase selection
  // (`text_length_quantiles`) is too expensive to run per group.
  //
  // Scale shape: the naive per-group sample — row_number() OVER
  // (PARTITION BY lang ORDER BY hash) — sorts every group's FULL
  // contents on one reducer per group; the aggregate instead folds
  // map-side into K-bounded buffers and ships ≤ K (hash, value) pairs
  // per group across the shuffle (bottom-k-by-hash is a semilattice, so
  // partials merge in any order). Deterministic (md5-ordered), so the
  // ESTIMATES themselves pass the binary oracle gate: DuckDB draws the
  // identical sample by sorting on the same hash.
  val SampleK = 256

  def skSampleQuantiles(spark: SparkSession, dir: String): DataFrame = {
    viewDocs(spark, dir)
    graft.expr.GraftFunctions.register(spark)
    spark.sql(
      s"""WITH s AS (
         |  SELECT lang,
         |         bottomk_sample(${hSpark("cast(doc_id as string)")},
         |                        CAST(length(text) AS BIGINT), $SampleK) AS vals
         |  FROM documents GROUP BY lang),
         |q AS (SELECT lang, array_sort(vals) AS sv, size(vals) AS n FROM s)
         |SELECT lang, CAST(n AS BIGINT) AS sample_n,
         |       element_at(sv, greatest(CAST(ceil(0.25 * n) AS INT), 1)) AS p25_est,
         |       element_at(sv, greatest(CAST(ceil(0.50 * n) AS INT), 1)) AS p50_est,
         |       element_at(sv, greatest(CAST(ceil(0.75 * n) AS INT), 1)) AS p75_est
         |FROM q""".stripMargin)
  }

  /** The oracle draws the IDENTICAL sample (bottom-K by the same md5
    * hash, min value per hash — the aggregate's collision rule) with
    * window functions, which on fixture scale is fine. */
  val skSampleQuantilesSql: String =
    s"""WITH h AS (
       |  SELECT lang, ${hDuck("CAST(doc_id AS VARCHAR)")} AS h,
       |         CAST(length(text) AS BIGINT) AS v
       |  FROM documents),
       |d AS (SELECT lang, h, min(v) AS v FROM h GROUP BY lang, h),
       |r AS (SELECT lang, v,
       |             row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
       |      FROM d),
       |s AS (SELECT lang, list(v ORDER BY v) AS sv, count(*) AS n
       |      FROM r WHERE rn <= $SampleK GROUP BY lang)
       |SELECT lang, CAST(n AS BIGINT) AS sample_n,
       |       CAST(sv[greatest(CAST(ceil(0.25 * n) AS BIGINT), 1)] AS BIGINT) AS p25_est,
       |       CAST(sv[greatest(CAST(ceil(0.50 * n) AS BIGINT), 1)] AS BIGINT) AS p50_est,
       |       CAST(sv[greatest(CAST(ceil(0.75 * n) AS BIGINT), 1)] AS BIGINT) AS p75_est
       |FROM s""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk_hll_distinct" -> (skHllDistinct _),
    "sk_sample_quantiles" -> (skSampleQuantiles _))

  val oracle: Map[String, String] = Map(
    "sk_hll_distinct" -> skHllDistinctSql,
    "sk_sample_quantiles" -> skSampleQuantilesSql)
}
