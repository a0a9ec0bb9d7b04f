package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** LEARNED corpus-curation models — the step past hand-written rules
  * (`text_quality`, `text_gopher_filters`): a trained linear quality
  * classifier over hashed n-gram features (the CCNet / fastText-style
  * filter real curation pipelines run) and a stupid-backoff bigram
  * language model scoring predictability (the count-based perplexity
  * filter `text_ngram_novelty` stands in for).
  *
  * Engine-exactness discipline: every trained parameter is an INTEGER
  * (micro-units, exact integer division with half-up rounding), so the
  * DuckDB oracle retrains the identical model from the identical data and
  * every weight, score and verdict matches bit-for-bit. Log-odds would
  * need transcendentals whose last-ulp behavior differs across engines;
  * the difference-of-Laplace-smoothed-class-frequencies discriminant and
  * ratio-valued LM conditionals below need only +,*,div — same family,
  * exactly reproducible. (See `tools/QualityModelTrainer` for the
  * persisted-model production form of the same trainer.)
  */
object LearnedQueries {

  import DedupQueries.{hSpark, hDuck}

  /** Feature-hash space. 2^12 buckets: small enough that the weight table
    * broadcasts trivially (one long per bucket), large enough that the
    * fixture vocabulary (~thousands of grams) rarely collides. Production
    * would raise this to 2^20+ — still broadcast-sized. */
  val Buckets = 4096

  // ── shared SQL fragments ─────────────────────────────────────────────

  /** Distinct word unigrams + bigrams of `ws` (a split-on-space array
    * column), hashed into [0, Buckets). Distinct-per-GRAM before hashing:
    * a doc repeats a feature only if two distinct grams collide — the
    * standard hashing-trick bag, identical in both engines. */
  private[graft] def featBucketsSpark(ws: String, buckets: Int = Buckets) =
    s"""transform(array_distinct(concat($ws,
       |    CASE WHEN size($ws) >= 2
       |         THEN transform(sequence(1, size($ws) - 1),
       |                i -> concat(element_at($ws, i), ' ', element_at($ws, i + 1)))
       |         ELSE CAST(array() AS ARRAY<STRING>) END)),
       |  g -> ${hSpark("g")} % $buckets)""".stripMargin

  private def featBucketsDuck(ws: String, buckets: Int = Buckets) =
    s"""list_transform(list_distinct(list_concat($ws,
       |    CASE WHEN len($ws) >= 2
       |         THEN list_transform(range(1, len($ws)), i -> $ws[i] || ' ' || $ws[i + 1])
       |         ELSE []::VARCHAR[] END)),
       |  g -> ${hDuck("g")} % $buckets)""".stripMargin

  /** round_half_up(1e6 * (c+1) / (n+2)) in pure integer arithmetic:
    * (2e6*(c+1) + (n+2)) div (2*(n+2)) — the Laplace-smoothed class-
    * conditional feature frequency in micro-units. Positive operands, so
    * Spark `div` and DuckDB `//` agree (both floor). */
  private[graft] def rMicro(c: String, n: String, div: String) =
    s"(2000000 * ($c + 1) + ($n + 2)) $div (2 * ($n + 2))"

  /** The same smoothed frequency as [[rMicro]], for driver-side Longs —
    * the trainer's spelling; any change must touch both. */
  private[graft] def rMicroLong(c: Long, n: Long): Long =
    (2000000L * (c + 1) + (n + 2)) / (2 * (n + 2))

  // ── text_quality_model ★ — TRAINED quality classifier ────────────────
  //
  // Weak supervision distills the rule-based gate into a learned model:
  // labels come from `text_quality`'s score (>= 0.66 — the corpus median;
  // the driver fixture's docs all clear 0.5, which would leave one empty
  // class), features are hashed
  // word uni+bigrams, and the trained discriminant is the difference of
  // Laplace-smoothed class-conditional feature frequencies
  //     w_f = P̂(f|good) − P̂(f|bad)   (micro-units, exact integers)
  // — the closed-form linear classifier of the NB family that needs no
  // transcendentals. Docs are scored by summing their features' weights
  // (unseen-in-training buckets get the smoothed default), and the
  // decision threshold is the midpoint of the train-split class means —
  // so the model, not a hand constant, sets the operating point.
  //
  // Scale shape (100 TB): featurize is a narrow per-doc map; training is
  // ONE map-side-combined aggregation keyed by bucket (≤4096 rows out —
  // the same reduction k-means uses); the weight table broadcasts back
  // onto the feature stream; scoring is one per-doc aggregation. No
  // all-pairs, no vocab-sized shuffle (buckets cap the key space by
  // construction). The train/test split (doc_id % 5) makes the holdout
  // accuracy the spec asserts an honest generalization number.
  private def qmSql(engine: String): String = {
    val duck = engine == "duck"
    val div = if (duck) "//" else "div"
    val feat = if (duck) featBucketsDuck("ws") else featBucketsSpark("ws")
    val quality = if (duck) TextQueries.qualityDuck("text") else TextQueries.qualitySpark("text")
    val explodeFeats =
      if (duck) "SELECT doc_id, label, is_train, unnest(fs) AS f FROM docs_f"
      else "SELECT doc_id, label, is_train, f FROM docs_f LATERAL VIEW explode(fs) AS f"
    s"""WITH docs_f AS (
       |  SELECT doc_id,
       |         CASE WHEN $quality >= 0.66 THEN 1 ELSE 0 END AS label,
       |         CASE WHEN doc_id % 5 != 0 THEN 1 ELSE 0 END AS is_train,
       |         $feat AS fs
       |  FROM (SELECT doc_id, text, ${if (duck) "string_split(text, ' ')" else "split(text, ' ')"} AS ws
       |        FROM documents)),
       |feats AS ($explodeFeats),
       |totals AS (
       |  SELECT CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |         CAST(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
       |  FROM docs_f WHERE is_train = 1),
       |counts AS (
       |  SELECT f,
       |         CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
       |         CAST(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0
       |  FROM feats WHERE is_train = 1 GROUP BY f),
       |weights AS (
       |  SELECT f, ${rMicro("c1", "n1", div)} - ${rMicro("c0", "n0", div)} AS w
       |  FROM counts CROSS JOIN totals),
       |w_default AS (
       |  SELECT ${rMicro("0", "n1", div)} - ${rMicro("0", "n0", div)} AS w
       |  FROM totals),
       |scored AS (
       |  SELECT fe.doc_id, fe.label, fe.is_train,
       |         CAST(count(*) AS BIGINT) AS n_feats,
       |         CAST(sum(coalesce(w.w, wd.w)) AS BIGINT) AS score_micro
       |  FROM feats fe LEFT JOIN weights w ON fe.f = w.f CROSS JOIN w_default wd
       |  GROUP BY fe.doc_id, fe.label, fe.is_train),
       |thr AS (
       |  SELECT (CAST(sum(CASE WHEN label = 1 THEN score_micro ELSE 0 END) AS DOUBLE)
       |            / sum(CASE WHEN label = 1 THEN 1 ELSE 0 END)
       |        + CAST(sum(CASE WHEN label = 0 THEN score_micro ELSE 0 END) AS DOUBLE)
       |            / sum(CASE WHEN label = 0 THEN 1 ELSE 0 END)) / 2.0 AS t
       |  FROM scored WHERE is_train = 1)
       |SELECT s.doc_id, s.label, s.is_train, s.n_feats, s.score_micro,
       |       CASE WHEN CAST(s.score_micro AS DOUBLE) > thr.t THEN 1 ELSE 0 END AS predicted,
       |       CASE WHEN (CASE WHEN CAST(s.score_micro AS DOUBLE) > thr.t THEN 1 ELSE 0 END) = s.label
       |            THEN 1 ELSE 0 END AS correct
       |FROM scored s CROSS JOIN thr""".stripMargin
  }

  def textQualityModel(spark: SparkSession, dir: String): DataFrame = {
    spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
      .createOrReplaceTempView("documents")
    spark.sql(qmSql("spark"))
  }

  val textQualityModelSql: String = qmSql("duck")

  // ── text_lm_score ★ — stupid-backoff bigram LM predictability ────────
  //
  // A bigram LM trained on half the corpus (doc_id % 2 = 0) scores every
  // document's mean conditional token probability:
  //   P(w_i | w_{i-1}) = c2(w_{i-1} w_i) / c1(w_{i-1})        if seen
  //                    = 0.4 * c1(w_i) / N                    backoff
  // (Brants et al. 2007 "stupid backoff" — scores, not normalized
  // probabilities, which is exactly what a corpus filter ranks by).
  // Every conditional is an integer micro-unit ratio, the per-doc fold
  // is an exact BIGINT sum, and only the final mean is one IEEE division
  // — both engines bit-equal, no transcendentals. Templated/duplicated
  // text scores HIGH (its bigrams dominate the training counts);
  // genuinely novel text scores low — the graded, model-based upgrade of
  // `text_ngram_novelty`'s rare-gram fraction.
  //
  // Scale shape: token/bigram counting is two map-side-combined
  // aggregations (vocab-keyed, the corpus-statistics shape); the
  // conditional table is computed once per distinct bigram TYPE (not per
  // token) via vocab-keyed equi-joins; docs then join their per-doc
  // bigram counts against it on the gram key. No all-pairs; the hottest
  // key is a common bigram, absorbed map-side by the count combine.
  private def lmSql(engine: String): String = {
    val duck = engine == "duck"
    val div = if (duck) "//" else "div"
    val split = if (duck) "string_split(text, ' ')" else "split(text, ' ')"
    val bigrams =
      if (duck)
        """CASE WHEN len(ws) >= 2
          |     THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])
          |     ELSE []::VARCHAR[] END""".stripMargin
      else
        """CASE WHEN size(ws) >= 2
          |     THEN transform(sequence(1, size(ws) - 1),
          |            i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))
          |     ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin
    val explodeTok =
      if (duck) "SELECT doc_id, unnest(ws) AS w FROM w_t"
      else "SELECT doc_id, w FROM w_t LATERAL VIEW explode(ws) AS w"
    val explodeBi =
      if (duck) s"SELECT doc_id, unnest($bigrams) AS gram FROM w_t"
      else s"SELECT doc_id, gram FROM w_t LATERAL VIEW explode($bigrams) AS gram"
    val prefix = if (duck) "string_split(d.gram, ' ')[1]" else "split(d.gram, ' ')[0]"
    val suffix = if (duck) "string_split(d.gram, ' ')[2]" else "split(d.gram, ' ')[1]"
    s"""WITH w_t AS (SELECT doc_id, $split AS ws FROM documents),
       |tokens AS ($explodeTok),
       |bi AS ($explodeBi),
       |train_uni AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS c FROM tokens
       |  WHERE doc_id % 2 = 0 GROUP BY w),
       |train_n AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n FROM tokens WHERE doc_id % 2 = 0),
       |train_bi AS (
       |  SELECT gram, CAST(count(*) AS BIGINT) AS c2 FROM bi
       |  WHERE doc_id % 2 = 0 GROUP BY gram),
       |doc_bi AS (
       |  SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS k
       |  FROM bi GROUP BY doc_id, gram),
       |cond AS (
       |  SELECT d.gram,
       |         CASE WHEN tb.c2 IS NOT NULL
       |              THEN (2000000 * tb.c2 + u1.c) $div (2 * u1.c)
       |              WHEN u2.c IS NOT NULL
       |              THEN (800000 * u2.c + tn.n) $div (2 * tn.n)
       |              ELSE 0 END AS p_micro
       |  FROM (SELECT DISTINCT gram FROM doc_bi) d
       |  LEFT JOIN train_bi tb ON d.gram = tb.gram
       |  LEFT JOIN train_uni u1 ON $prefix = u1.w
       |  LEFT JOIN train_uni u2 ON $suffix = u2.w
       |  CROSS JOIN train_n tn),
       |scored AS (
       |  SELECT b.doc_id,
       |         CAST(sum(b.k) AS BIGINT) AS n_grams,
       |         CAST(sum(b.k * c.p_micro) AS BIGINT) AS sum_micro
       |  FROM doc_bi b JOIN cond c ON b.gram = c.gram
       |  GROUP BY b.doc_id)
       |SELECT doc_id, n_grams, sum_micro,
       |       CAST(sum_micro AS DOUBLE) / n_grams AS lm_score
       |FROM scored""".stripMargin
  }

  def textLmScore(spark: SparkSession, dir: String): DataFrame = {
    spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
      .createOrReplaceTempView("documents")
    spark.sql(lmSql("spark"))
  }

  val textLmScoreSql: String = lmSql("duck")

  /** Spark-side LM SQL over a registered `documents` view — exposed for
    * specs that score bespoke fixtures with the exact catalog query. */
  private[graft] val textLmScoreSqlSpark: String = lmSql("spark")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_quality_model" -> (textQualityModel _),
    "text_lm_score" -> (textLmScore _))

  val oracle: Map[String, String] = Map(
    "text_quality_model" -> textQualityModelSql,
    "text_lm_score" -> textLmScoreSql)
}
