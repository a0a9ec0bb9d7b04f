package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.LearnedQueries
import graft.operators.Pin.PinSyntax

/** Persisted-model form of the `text_quality_model` trainer: fit the
  * linear quality classifier once on a labeled (or weakly-labeled) corpus,
  * persist the weight table beside the data, and score any later shard by
  * loading it — the production loop where training and serving are
  * separate jobs (the `KMeansTrainer` → `AnnIndex` discipline, applied to
  * text curation).
  *
  * The model: hashed word uni+bigram features (engine-shared md5 hash →
  * `buckets` space), per-feature weight = difference of Laplace-smoothed
  * class-conditional document frequencies in INTEGER micro-units
  * (`LearnedQueries.rMicro` — the closed-form member of the NB family
  * that needs no transcendentals, so retraining is bit-reproducible on
  * any engine). Scoring = one weight-table broadcast join + per-doc sum;
  * the decision threshold is the midpoint of the training split's class
  * mean scores, stored with the model.
  *
  * Scale shape (100 TB corpus): featurize is a narrow map; training is a
  * single map-side-combined aggregation keyed by feature bucket (≤
  * `buckets` rows emerge — constant-bounded by construction, the same
  * reduction k-means uses); scoring broadcasts the tiny weight table and
  * aggregates per doc. The only `.collect`s are the class totals (2
  * longs) and the threshold (2 longs + 2 counts) — bounded metadata.
  */
object QualityModelTrainer {

  /** A trained model: `weights` = (f: Long bucket, c1, c0, w: Long
    * micro-units), class doc-counts, and the decision threshold in
    * micro-units (midpoint of train class means; IEEE double of two
    * exact integer ratios). */
  final case class QualityModel(
      weights: DataFrame, n1: Long, n0: Long, threshold: Double,
      buckets: Int) {
    /** Weight of a feature bucket never seen in training. */
    def defaultWeight: Long =
      LearnedQueries.rMicroLong(0, n1) - LearnedQueries.rMicroLong(0, n0)
  }

  /** (doc_id, f) distinct hashed features per document — the shared
    * featurization both train and score run (same SQL fragment as the
    * oracle-checked catalog query, so tool and query cannot drift). */
  def featurize(spark: SparkSession, docs: DataFrame, buckets: Int): DataFrame = {
    graft.expr.GraftFunctions.register(spark)
    // Pure DataFrame transform (no temp view): the streaming gate calls
    // this per micro-batch on the stream's cloned session.
    docs.select(col("doc_id"),
      explode(expr(LearnedQueries.featBucketsSpark("text", buckets))).as("f"))
  }

  /** Fit on `docs` (doc_id: Long, text: String, label: Int ∈ {0,1}). */
  def train(spark: SparkSession, docs: DataFrame,
            buckets: Int = LearnedQueries.Buckets): QualityModel = {
    val labels = docs.select("doc_id", "label")
    // Two scalar class totals — bounded metadata, the only collect here.
    val totals = labels.groupBy(col("label")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n1 = totals.getOrElse(1, 0L)
    val n0 = totals.getOrElse(0, 0L)
    require(n1 > 0 && n0 > 0,
      s"training needs both classes represented; got n1=$n1 n0=$n0")
    val feats = featurize(spark, docs.select("doc_id", "text"), buckets)
      .join(broadcast(labels), "doc_id")
    // ONE map-side-combined aggregation: ≤ `buckets` rows emerge.
    val counts = feats.groupBy(col("f")).agg(
      sum(when(col("label") === 1, 1L).otherwise(0L)).as("c1"),
      sum(when(col("label") === 0, 1L).otherwise(0L)).as("c0"))
    val weights = counts.select(
      col("f"), col("c1"), col("c0"),
      (expr(LearnedQueries.rMicro("c1", n1.toString, "div")) -
        expr(LearnedQueries.rMicro("c0", n0.toString, "div"))).as("w"))
      .pinned() // pin: scored twice below (threshold + serving)
    val m0 = QualityModel(weights, n1, n0, threshold = 0.0, buckets = buckets)
    // Threshold = midpoint of the train classes' mean scores. Exact
    // integer sums; the two divisions + mean are the only IEEE steps.
    val s = score(spark, docs.select("doc_id", "text"), m0)
      .join(broadcast(labels), "doc_id")
      .groupBy(col("label")).agg(
        sum(col("score_micro")).as("sm"), count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val mean1 = s(1)._1.toDouble / s(1)._2
    val mean0 = s(0)._1.toDouble / s(0)._2
    m0.copy(threshold = (mean1 + mean0) / 2.0)
  }

  /** Score (doc_id, text) rows: (doc_id, n_feats, score_micro, predicted).
    * The weight table broadcasts; one per-doc aggregation. */
  def score(spark: SparkSession, docs: DataFrame, model: QualityModel): DataFrame =
    featurize(spark, docs, model.buckets)
      .join(broadcast(model.weights.select("f", "w")), Seq("f"), "left")
      .groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_feats"),
        sum(coalesce(col("w"), lit(model.defaultWeight))).as("score_micro"))
      .withColumn("predicted",
        when(col("score_micro").cast("double") > model.threshold, 1).otherwise(0))

  /** Persist: `dir/weights` parquet + `dir/meta` parquet (n1, n0,
    * threshold, buckets — one row). The bucket count is part of the
    * MODEL, not a serving option: weights are keyed in [0, buckets), so
    * scoring with any other feature space silently produces garbage —
    * persisting it makes a mismatch impossible by construction. */
  def save(spark: SparkSession, model: QualityModel, dir: String): Unit = {
    model.weights.coalesce(1).write.mode("overwrite").parquet(s"$dir/weights")
    import spark.implicits._
    Seq((model.n1, model.n0, model.threshold, model.buckets))
      .toDF("n1", "n0", "threshold", "buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  def load(spark: SparkSession, dir: String): QualityModel = {
    val meta = spark.read.parquet(s"$dir/meta").collect().head
    QualityModel(spark.read.parquet(s"$dir/weights"),
      meta.getAs[Long]("n1"), meta.getAs[Long]("n0"),
      meta.getAs[Double]("threshold"), meta.getAs[Int]("buckets"))
  }
}
