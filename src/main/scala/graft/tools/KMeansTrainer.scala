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

  /** Per-subspace PQ codebook trainer (r8) — the "train per-subspace
    * k-means codebooks" half of IVF-PQ (Jégou et al. 2011 §II) the LCG
    * table stood in for: Lloyd's algorithm run independently in each of
    * `subspaces` disjoint `subDim`-dim slices of the MICRO-UNIT
    * quantized vectors (the same `round(x*1000)` integer domain the
    * encode/ADC kernels score in, so trained centroids keep distances
    * exact BIGINT and argmin can never flip on a float ulp).
    *
    * Scale shape per iteration mirrors [[train]], with the subspace id
    * joining the key: the (subspaces × cents) codebook BROADCASTS onto
    * the exploded (vec_id, s, subvector) relation — N·subspaces narrow
    * rows, never shuffled for the join; argmin by window per (vec_id,
    * s); the update is one map-side-combined average per (s, c, dim) —
    * subspaces·cents·subDim result rows regardless of N. Convergence by
    * per-round assignment checksum, exactly like [[train]].
    *
    * Determinism: subspace s seeds from the subvectors of the `cents`
    * smallest vec_ids; argmin ties break by centroid id; means round
    * HALF_UP back to micro-units driver-side. Same input → same
    * codebook.
    *
    * @return (flat micro-unit codebook, laid out
    *         `s*cents*subDim + c*subDim + d` — the layout
    *         [[graft.expr.Kernels.pqEncodeCb]] expects — and the
    *         iteration count) */
  def trainPqCodebooks(spark: SparkSession, embeddings: DataFrame,
      subspaces: Int = 4, cents: Int = 16, subDim: Int = 16,
      maxIters: Int = 8): (Array[Long], Int) = {
    require(subspaces >= 1 && cents >= 1 && subDim >= 1)
    import spark.implicits._
    val dims = subspaces * subDim

    // (vec_id, s, sv): each vector's micro-unit subvectors, one row per
    // subspace — the per-subspace training sets, all trained in one
    // joint plan. Quantization = the kernels' pqQuantize (Spark round on
    // double*1000).
    val subrows = embeddings
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(round(cast(x as double) * 1000.0, 0) as bigint))")
          .as("qv"))
      .filter(size(col("qv")) >= dims)
      .select(col("vec_id"),
        explode(expr(
          s"transform(sequence(0, ${subspaces - 1}), s -> struct(s as s, slice(qv, s * $subDim + 1, $subDim) as sv))"))
          .as("sub"))
      .select(col("vec_id"), col("sub.s").as("s"), col("sub.sv").as("sv"))
      .persist()

    // Seed: subspace s starts from the subvectors of the cents smallest
    // vec_ids (the deterministic analogue of sampled k-means++ seeds).
    val seedIds = subrows.select("vec_id").distinct()
      .orderBy("vec_id").limit(cents)
      .collect().map(_.getLong(0)).zipWithIndex.toMap
    // Fewer distinct vectors than centroids would leave implicit
    // all-zero centroids in the flat layout — which pqEncodeCb still
    // scores and which can win argmin. Fail loudly instead.
    require(seedIds.size == cents,
      s"PQ codebook needs >= $cents distinct training vectors with >= $dims dims; got ${seedIds.size}")
    var codebook: Map[(Int, Int), Seq[Long]] = subrows
      .filter(col("vec_id").isin(seedIds.keys.toSeq: _*))
      .collect().map { r =>
        (r.getInt(1), seedIds(r.getLong(0))) -> r.getSeq[Long](2)
      }.toMap

    var prevSig: java.math.BigDecimal = null
    var iters = 0
    var converged = false
    while (iters < maxIters && !converged) {
      val cbDf = spark.createDataFrame(
        codebook.toSeq.map { case ((s, c), v) => (s, c, v) })
        .toDF("s", "c", "cent")
      val w = Window.partitionBy(col("vec_id"), col("s"))
        .orderBy(col("dist"), col("c"))
      val assigned = subrows.join(broadcast(cbDf), Seq("s"))
        .withColumn("dist",
          expr("aggregate(zip_with(sv, cent, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") === 1)
        .select(col("vec_id"), col("s"), col("c"), col("sv"))
        .persist()
      val sig = assigned.agg(
        sum(xxhash64(col("vec_id"), col("s"), col("c")).cast("decimal(38,0)")))
        .head().getDecimal(0)
      if (sig == prevSig) converged = true
      else {
        prevSig = sig
        // Exact order-independent mean: decimal sum + count, divided
        // driver-side (avg over LongType sums as Double, whose fp
        // accumulation is partition-order dependent past 2^53).
        val means = assigned
          .select(col("s"), col("c"), posexplode(col("sv")).as(Seq("dim", "x")))
          .groupBy(col("s"), col("c"), col("dim"))
          .agg(sum(col("x").cast("decimal(38,0)")).as("sm"), count(lit(1)).as("n"))
          .collect()
        val byC = means.groupBy(r => (r.getInt(0), r.getInt(1)))
        codebook = codebook.map { case (key, old) =>
          key -> (byC.get(key) match {
            case None => old // empty cluster keeps its centroid
            case Some(rows) =>
              rows.sortBy(_.getInt(2)).map { r =>
                r.getDecimal(3).divide(java.math.BigDecimal.valueOf(r.getLong(4)),
                  0, java.math.RoundingMode.HALF_UP).longValueExact()
              }.toSeq
          })
        }
      }
      assigned.unpersist()
      iters += 1
    }
    subrows.unpersist()
    val flat = new Array[Long](subspaces * cents * subDim)
    codebook.foreach { case ((s, c), v) =>
      var d = 0
      while (d < subDim) { flat(s * cents * subDim + c * subDim + d) = v(d); d += 1 }
    }
    (flat, iters)
  }

  /** INTEGER-EXACT Lloyd trainer (r12) — the oracle-pinnable variant of
    * [[train]]: vectors quantize to SHIFTED MICRO-UNITS
    * (`round(x·scale) + shift`, all non-negative so floor-div == trunc-div
    * in every engine), distances are BIGINT squared-L2, and the centroid
    * update is the per-(c, dim) floor mean `sum div count` — every
    * operation exact integer arithmetic a DuckDB oracle replays
    * bit-identically as generated CTEs (the graph_pagerank discipline).
    * Fixed `rounds` (no convergence test) so the oracle unrolls exactly
    * the same chain.
    *
    * Scale shape per round = [[train]]'s: k-row centroid broadcast onto
    * the vector scan (N never shuffles), argmin by per-vector window with
    * c_id tie-break, ONE map-side-combined sum/count per (c, dim) — k·d
    * bounded rows collected to the driver for the floor means (the
    * standard distributed-Lloyd loop; nothing data-sized reaches one
    * node). Seeds = the k smallest vec_ids' quantized vectors; empty
    * clusters keep their previous centroid.
    *
    * @return (c_id BIGINT, cent Array[Long]) — the trained micro-unit
    *         centroids, identical to the oracle's round-`rounds` CTE. */
  def trainMicro(spark: SparkSession, embeddings: DataFrame, k: Int,
      rounds: Int, scale: Long = 1000L, shift: Long = 1024L): DataFrame = {
    require(k >= 1 && rounds >= 0)
    import spark.implicits._
    val qvecs = embeddings
      .select(col("vec_id"),
        expr(s"transform(embedding, x -> cast(round(cast(x as double) * $scale) as bigint) + $shift)")
          .as("qv"))
      .persist() // scanned twice per round + once for seeding
    var cents: Seq[(Long, Seq[Long])] = qvecs
      .orderBy("vec_id").limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Long](1)) }.toSeq
    // The quantized domain is non-negative BY CONSTRUCTION (shift covers
    // the value range) — floor-div == trunc-div only holds there, and the
    // oracle depends on it. Enforce, don't assume.
    val minQ = qvecs.agg(min(expr("array_min(qv)"))).head.getLong(0)
    require(minQ >= 0,
      s"trainMicro: shifted micro-units must be non-negative, got min $minQ; raise shift")
    for (_ <- 1 to rounds) {
      val cDf = spark.createDataFrame(cents).toDF("c_id", "cent")
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("dist"), col("c_id"))
      val means = qvecs.join(broadcast(cDf))
        .withColumn("dist",
          expr("aggregate(zip_with(qv, cent, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") === 1)
        .select(col("c_id"), posexplode(col("qv")).as(Seq("dim", "x")))
        .groupBy(col("c_id"), col("dim"))
        .agg(sum(col("x")).as("sm"), count(lit(1)).as("n"))
        .collect() // k·d bounded rows — the distributed-Lloyd driver hop
      val byC = means.groupBy(_.getLong(0))
      cents = cents.map { case (cid, old) =>
        byC.get(cid) match {
          case None => (cid, old) // empty cluster keeps its centroid
          case Some(rows) =>
            (cid, rows.sortBy(_.getInt(1))
              .map(r => r.getLong(2) / r.getLong(3)).toSeq)
        }
      }
    }
    qvecs.unpersist()
    spark.createDataFrame(cents).toDF("c_id", "cent")
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
