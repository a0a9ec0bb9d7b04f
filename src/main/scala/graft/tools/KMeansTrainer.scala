package graft.tools

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Coarse-centroid trainer for the IVF index — the "production build
  * drops k-means centroids into the same CTE" step the deterministic
  * centroid picks in `ann_ivf_topk` / [[AnnIndex]] stand in for. Lloyd's
  * algorithm by COSINE similarity (the metric every scoring stage here
  * uses), spherical-k-means style: centroids re-normalize each round.
  *
  * Scale shape per iteration (N = corpus, k = centroids, d = dims):
  *   1. assignment — the k-row centroid relation BROADCASTS onto the
  *      vector scan (same join as the IVF probe); argmax by one window
  *      partitioned by vec_id. N never shuffles for the join itself.
  *   2. update — posexplode to (cid, dim, x) and ONE map-side-combined
  *      average per (cid, dim): k·d result rows regardless of N.
  *   3. the k·d means COLLECT to the driver (tiny by construction) to
  *      re-broadcast next round — the standard distributed-k-means loop;
  *      nothing data-sized ever reaches one node.
  * Iterations stop at `maxIters` or when no vector changed assignment
  * (movement tracked by the per-round assignment checksum).
  *
  * Determinism: init = the k smallest vec_ids (a production run seeds
  * k-means++ with a hash-salted sample; determinism matters more here
  * because specs assert exact convergence), ties in argmax break by
  * centroid id. Same input → same centroids, run to run.
  */
object KMeansTrainer {

  /** @return (centroids DataFrame (c_id, c_emb Array[Double]), iterations run) */
  def train(spark: SparkSession, embeddings: DataFrame, k: Int,
      maxIters: Int = 10): (DataFrame, Int) = {
    require(k >= 1, "k must be >= 1")
    import spark.implicits._
    graft.expr.GraftFunctions.register(spark)

    // Unit-normalize once: cosine argmax then equals dot-product argmax.
    val vecs = embeddings
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm", expr("sqrt(aggregate(v, 0.0d, (a, x) -> a + x * x))"))
      .filter(col("nrm") > 0)
      .select(col("vec_id"),
        expr("transform(v, x -> x / nrm)").as("v"))
      .persist() // scanned 2x per round; freed before returning

    var centroids: Seq[(Int, Seq[Double])] = vecs
      .orderBy("vec_id").limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }.toSeq

    var prevSig: java.math.BigDecimal = null
    var iters = 0
    var converged = false
    while (iters < maxIters && !converged) {
      val cDf = spark.createDataFrame(centroids).toDF("c_id", "c_emb")
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("score").desc, col("c_id"))
      // Lineage stays constant-depth across rounds (centroids re-enter
      // through the driver), so persist — consumed by the signature agg
      // and the means agg — and free before the next round; an
      // accumulating per-round checkpoint would pin maxIters copies.
      val assigned = vecs.join(broadcast(cDf))
        .withColumn("score",
          expr("aggregate(zip_with(v, c_emb, (a, b) -> a * b), 0.0d, (a, x) -> a + x)"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") === 1)
        .select(col("vec_id"), col("c_id"), col("v"))
        .persist()

      // Assignment signature: order-independent checksum of (vec, cid).
      // Decimal sum: full-range xxhash64 longs overflow an ANSI BIGINT sum.
      val sig = assigned.agg(
        sum(xxhash64(col("vec_id"), col("c_id")).cast("decimal(38,0)")))
        .head().getDecimal(0)
      if (sig == prevSig) converged = true
      else {
        prevSig = sig
        // Update: per-(cid, dim) mean, then re-normalize driver-side.
        val means = assigned
          .select(col("c_id"), posexplode(col("v")).as(Seq("dim", "x")))
          .groupBy(col("c_id"), col("dim")).agg(avg(col("x")).as("m"))
          .collect()
        val byC = means.groupBy(_.getInt(0))
        centroids = centroids.map { case (cid, old) =>
          byC.get(cid) match {
            case None => (cid, old) // empty cluster keeps its centroid
            case Some(rows) =>
              val m = rows.sortBy(_.getInt(1)).map(_.getDouble(2))
              val n = math.sqrt(m.map(x => x * x).sum)
              (cid, if (n > 0) m.map(_ / n).toSeq else old)
          }
        }
      }
      assigned.unpersist()
      iters += 1
    }
    vecs.unpersist()
    (spark.createDataFrame(centroids).toDF("c_id", "c_emb"), iters)
  }

  /** Assign every vector to its trained centroid (the IVF posting-list
    * build input): broadcast join + per-vector argmax, same plan AND same
    * score as `ann_ivf_topk`'s assignment stage — full cosine, both norms
    * divided out, so a centroid table that isn't unit-norm (hand-picked
    * vectors, not this trainer's output) still assigns correctly. */
  def assign(spark: SparkSession, embeddings: DataFrame,
      centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("score").desc, col("c_id"))
    val cents = centroids.withColumn("c_nrm",
      expr("sqrt(aggregate(c_emb, 0.0d, (a, x) -> a + x * x))"))
    embeddings
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm", expr("sqrt(aggregate(v, 0.0d, (a, x) -> a + x * x))"))
      .filter(col("nrm") > 0)
      .join(broadcast(cents))
      .withColumn("score",
        expr("aggregate(zip_with(v, c_emb, (a, b) -> a * b), 0.0d, (a, x) -> a + x)")
          / (col("nrm") * col("c_nrm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("vec_id"), col("c_id"), col("score"))
  }
}
