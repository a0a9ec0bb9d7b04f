package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable AS-OF join: for every left row, attach the right row with the
  * GREATEST key `<=` the left key (inclusive, left-outer) — the lookup the
  * reference performs per change row against `lsn_time_mapping`
  * (`sql_queries.py:128-145` time⟷LSN probes), generalized from one probe
  * to a whole-relation operator.
  *
  * Spark has no as-of join. The naive spellings are a non-equi join
  * (BroadcastNestedLoop — quadratic) or a global-sort window (single
  * reducer) — both scale-killers. This operator BUCKETS the key axis so
  * every data-sized stage is equi-partitioned:
  *
  *  1. both sides bucket on `key div bucketWidth` (a narrow map);
  *  2. the right side reduces to one champion row per occupied bucket
  *     (greatest key + its payload) — map-side-combined aggregate;
  *  3. a prefix scan over the champion table computes each left bucket's
  *     CARRY-IN (the champion of the nearest occupied bucket before it).
  *     This one unpartitioned window runs over rows ≈ occupied buckets —
  *     bounded by keyspan/bucketWidth (operator chooses it), NOT by data
  *     size — the same driver-sized-side trick `GlobalOrder` uses;
  *  4. within each bucket, right and left rows union and one window
  *     PARTITION BY bucket ORDER BY (key, side) takes the last right
  *     payload at-or-before each left row (right sorts first on key ties →
  *     `>=` inclusive), falling back to the bucket's carry-in.
  *
  * Total cost: two shuffles of the data (bucket hash for the union window,
  * one aggregate), zero quadratic work, parallelism = occupied buckets.
  * Right keys must be UNIQUE (an as-of source is a keyed mapping; with
  * duplicates "the" row at a key is ill-defined on every engine).
  */
object AsOfJoin {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Max rows the step-3 prefix window may see before the operator widens
    * the bucket width itself (0 disables the guard and trusts the caller). */
  val MaxBucketsConf = "spark.graft.asofjoin.maxBuckets"
  /** Bucket count the auto-widened width aims for. */
  val TargetBucketsConf = "spark.graft.asofjoin.targetBuckets"

  /** The width step 1 actually uses. The step-3 prefix window is "small
    * by construction" ONLY when keyspan/bucketWidth is small; nothing
    * used to enforce that — a caller passing a tiny width against a huge
    * key span silently got a single-reducer window over millions of rows.
    * Now the span is measured and, above `maxBuckets`, the width is
    * WIDENED so the span yields `targetBuckets` buckets. Always safe:
    * bucketWidth is purely a partitioning knob — the join result is
    * width-independent — so auto-correcting beats failing. Pure function,
    * spec'd directly. */
  def effectiveBucketWidth(lo: Long, hi: Long, requested: Long,
      maxBuckets: Long, targetBuckets: Long): Long = {
    require(requested > 0, "bucketWidth must be positive")
    // hi - lo + 1 overflows Long exactly for the most pathological spans
    // (lo deeply negative, hi deeply positive) — the one case the guard
    // exists for — so the span math runs in BigInt. Driver-side, once per
    // join: cost is irrelevant.
    val span = (BigInt(hi) - BigInt(lo) + 1).max(1)
    val buckets = span / requested + 1
    if (maxBuckets <= 0 || buckets <= maxBuckets) requested
    else ((span + targetBuckets - 1) / targetBuckets)
      .max(BigInt(requested)).min(BigInt(Long.MaxValue)).toLong
  }

  /** Session-lifetime memo for the guard's min/max probe, keyed by the
    * CANONICALIZED input plans + keys + a DATA-VERSION component
    * (round-6: the eager probe used to re-run each input's whole lineage
    * on EVERY asOf call, including plan-only inspection). A fingerprint
    * collision — or stale bounds after the underlying data changed under
    * an identical fingerprint — yields a suboptimal width, never a wrong
    * result: bucketWidth is purely a partitioning knob and the join
    * output is width-independent, which is what makes this memo safe at
    * all. Bounded LRU so a long-lived session can't accumulate entries. */
  private val boundsCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(Int, String, Int, String, Int, Int), Option[(Long, Long)]](
        64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(Int, String, Int, String, Int, Int), Option[(Long, Long)]]): Boolean =
        size > 256
    })

  /** Data-version component of the memo key: for file-backed plans, the
    * hash of the sorted input-file list — appending files to a parquet
    * directory under an OTHERWISE IDENTICAL plan changes the
    * fingerprint, so grown data re-probes instead of reusing a stale
    * (narrower) key span that could let the real span exceed
    * `maxBuckets` and erode the OOM guard (ADVICE r6). Driver-side file
    * listing only, served by the already-populated file index — no Spark
    * job. Limitation: an in-place OVERWRITE that keeps the same file
    * names still aliases; callers mutating data that way must
    * [[clearBoundsCache]] (tables written by Spark get fresh part-file
    * UUIDs on every write, so in practice only external rewriters hit
    * this). Non-file relations contribute an empty listing and rely on
    * the plan hash alone. */
  private def dataVersion(df: DataFrame): Int =
    java.util.Arrays.hashCode(df.inputFiles.sorted.asInstanceOf[Array[AnyRef]])

  /** Test seam: observe/clear the memo. Required after mutating data
    * in place under unchanged file names (see [[dataVersion]]). */
  private[graft] def boundsCacheSize: Int = boundsCache.size
  def clearBoundsCache(): Unit = boundsCache.clear()

  /** @param payload right columns to attach (null when no right key <= left key)
    * @param bucketWidth key-axis slice per bucket; pick so that
    *        keyspan/bucketWidth ≈ desired parallelism (10³–10⁶). Misuse
    *        is guarded: see [[effectiveBucketWidth]].
    *
    * NOTE the guard runs a min/max Spark job over both inputs the FIRST
    * time a given (left, right, keys) combination is constructed; the
    * bounds are then memoized by plan fingerprint, so repeated
    * construction and plan-only inspection trigger zero further jobs
    * (AsOfJoinSpec asserts this). Callers whose inputs have expensive
    * lineage can still set `spark.graft.asofjoin.maxBuckets=0` and size
    * the width themselves — the guard and its job are then skipped
    * entirely, on the first call too. */
  def asOf(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
      payload: Seq[String], bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val reserved = Set("__b", "__k", "__tag", "__p", "__l", "__m", "__carry", "__r")
    val clash = (left.columns ++ right.columns).filter(reserved)
    require(clash.isEmpty,
      s"AsOfJoin reserves column names ${reserved.mkString(", ")}; " +
        s"rename input column(s) ${clash.mkString(", ")}")

    // Guard the step-3 prefix window: measure the key span (one map-side-
    // combined min/max pass — negligible next to the join's own shuffles)
    // and widen the bucket width if the requested one would explode the
    // occupied-bucket count. spark.graft.asofjoin.maxBuckets=0 disables.
    val conf = left.sparkSession.conf
    val maxBuckets = conf.get(MaxBucketsConf, (1L << 20).toString).toLong
    val width =
      if (maxBuckets <= 0) bucketWidth
      else {
        val fp = (left.queryExecution.analyzed.canonicalized.hashCode(), leftKey,
          right.queryExecution.analyzed.canonicalized.hashCode(), rightKey,
          dataVersion(left), dataVersion(right))
        // Probe OUTSIDE the map lock: computeIfAbsent would hold the
        // synchronized-map mutex across a Spark job, serializing every
        // concurrent asOf caller behind one min/max pass (ADVICE r6).
        // Two threads racing the same key compute identical bounds and
        // putIfAbsent keeps one — duplicate work, never a wrong answer.
        val bounds = Option(boundsCache.get(fp)).getOrElse {
          val r = left.select(col(leftKey).cast("long").as("__k"))
            .unionByName(right.select(col(rightKey).cast("long").as("__k")))
            .agg(min(col("__k")), max(col("__k"))).head()
          val computed =
            if (r.isNullAt(0)) None // both sides empty
            else Some((r.getLong(0), r.getLong(1)))
          Option(boundsCache.putIfAbsent(fp, computed)).getOrElse(computed)
        }
        bounds match {
          case None => bucketWidth
          case Some((lo, hi)) =>
            val target = conf.get(TargetBucketsConf, (1L << 16).toString).toLong
            val w = effectiveBucketWidth(lo, hi, bucketWidth, maxBuckets, target)
            if (w != bucketWidth) log.warn(
              s"AsOfJoin: bucketWidth=$bucketWidth over key span [$lo, $hi] " +
                s"exceeds $maxBuckets buckets; widened to $w ($target buckets)")
            w
        }
      }
    val lb = left.withColumn("__b", floor(col(leftKey) / lit(width)).cast("long"))
    val rb = right.withColumn("__b", floor(col(rightKey) / lit(width)).cast("long"))

    val payStruct = struct(payload.map(col): _*)
    val payType = right.select(payStruct.as("p")).schema("p").dataType
    val leftCols = left.columns.toSeq
    val lrowStruct = struct(leftCols.map(col): _*)
    val lrowType = left.select(lrowStruct.as("l")).schema("l").dataType

    // 2. champion per occupied right bucket.
    val champs = rb.groupBy(col("__b"))
      .agg(max_by(payStruct, col(rightKey)).as("__p"))

    // 3. carry-in per left bucket: last champion strictly before it. The
    // union is one row per occupied bucket on either side — small by
    // construction — so the unpartitioned prefix window is safe.
    // Probes sort BEFORE champions at the same bucket (tag 0 < 1): a
    // bucket's own champion must not reach its probe through the prefix —
    // same-bucket rights are resolved positionally by the bucket window.
    val probes = lb.select(col("__b")).distinct()
    val wPrefix = Window.orderBy(col("__b"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = champs.select(col("__b"), lit(1).as("__tag"), col("__p"))
      .unionByName(probes.select(col("__b"), lit(0).as("__tag"),
        lit(null).cast(payType).as("__p")))
      .withColumn("__carry", last(col("__p"), ignoreNulls = true).over(wPrefix))
      .filter(col("__tag") === 0)
      .select(col("__b"), col("__carry"))

    // 4. within-bucket resolution, parallel across buckets.
    val unioned = rb.select(col("__b"), col(rightKey).cast("long").as("__k"),
        lit(0).as("__tag"), payStruct.as("__p"), lit(null).cast(lrowType).as("__l"))
      .unionByName(lb.select(col("__b"), col(leftKey).cast("long").as("__k"),
        lit(1).as("__tag"), lit(null).cast(payType).as("__p"), lrowStruct.as("__l")))
    val wBucket = Window.partitionBy(col("__b")).orderBy(col("__k"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(wBucket))
      .filter(col("__tag") === 1)
      .join(carry, Seq("__b"), "left")
      .withColumn("__r", coalesce(col("__m"), col("__carry")))
      .select(leftCols.map(c => col("__l").getField(c).as(c)) ++
        payload.map(p => col("__r").getField(p).as(p)): _*)
  }

  /** FORWARD as-of: for every left row, the right row with the SMALLEST
    * key `>=` the left key (inclusive, left-outer) — the "next event
    * at-or-after" lookup (pandas merge_asof direction='forward', kdb's
    * aj mirror). Reduces EXACTLY to the backward operator on NEGATED
    * keys: max{r : -r <= -l} selects the same row as min{r : r >= l},
    * every bucket/champion/carry argument mirrors, and ties stay
    * inclusive — so the whole scale shape (and its guard, memo, and
    * spec coverage) is inherited rather than duplicated. Keys must be
    * > Long.MinValue: negation maps that one sentinel to itself, which
    * would silently make it every row's preferred match — so it is
    * REJECTED at execution time (raise_error in the negation map), not
    * just documented. */
  def asOfForward(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, payload: Seq[String], bucketWidth: Long): DataFrame = {
    val reserved = Set("__nl", "__nr")
    val clash = (left.columns ++ right.columns).filter(reserved)
    require(clash.isEmpty,
      s"asOfForward reserves ${reserved.mkString(", ")}; rename ${clash.mkString(", ")}")
    def negOrFail(c: org.apache.spark.sql.Column) =
      when(c === Long.MinValue,
        raise_error(lit("asOfForward: key Long.MinValue is unsupported " +
          "(negation maps it to itself)")).cast("long"))
        .otherwise(-c)
    val nl = left.withColumn("__nl", negOrFail(col(leftKey).cast("long")))
    val nr = right.withColumn("__nr", negOrFail(col(rightKey).cast("long")))
    asOf(nl, nr, "__nl", "__nr", payload, bucketWidth)
      .drop("__nl")
  }

  /** NEAREST as-of: for every left row, the right row with the smallest
    * absolute key distance, ties resolved BACKWARD (the pandas
    * merge_asof direction='nearest' convention). Composed from one
    * backward and one forward pass joined on `leftId` (caller-supplied
    * unique row id — with duplicate left rows "the" nearest row per
    * duplicate is only well-defined rowwise). The right key is attached
    * to the payload automatically: the distance comparison needs it. */
  def asOfNearest(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, payload: Seq[String], bucketWidth: Long,
      leftId: String): DataFrame = {
    val payKeys = (rightKey +: payload).distinct
    val clash = left.columns.filter(payKeys.contains)
    require(clash.isEmpty,
      s"asOfNearest payload names ${clash.mkString(", ")} clash with left columns")
    // The forward pass renames each payload key to __f_<key>; a left
    // column literally named __f_<key> would silently collide in that
    // join and corrupt the tie-break — reserve the generated names too.
    val fClash = left.columns.filter(payKeys.map(p => s"__f_$p").contains)
    require(fClash.isEmpty,
      s"asOfNearest reserves __f_<payload> names; rename ${fClash.mkString(", ")}")
    val leftCols = left.columns.toSeq
    val b = asOf(left, right, leftKey, rightKey, payKeys, bucketWidth)
    val f = asOfForward(left, right, leftKey, rightKey, payKeys, bucketWidth)
      .select(col(leftId) +: payKeys.map(c => col(c).as(s"__f_$c")): _*)
    // Distances compare in DECIMAL(38,0): a Long subtraction overflows
    // for spans past 2^63 (lk = 2^62, bk = -2^62) and would silently
    // pick the FARTHER side — exactly the pathological span the width
    // guard already handles in BigInt, so the tie-break must survive it
    // too. Exact integer arithmetic, no double rounding.
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val lk = col(leftKey).cast("long").cast(dec)
    val bk = col(rightKey).cast("long")
    val fk = col(s"__f_$rightKey").cast("long")
    val takeBackward = bk.isNotNull &&
      (fk.isNull || (lk - bk.cast(dec)) <= (fk.cast(dec) - lk))
    b.join(f, Seq(leftId))
      .select(leftCols.map(col) ++ payKeys.map(p =>
        when(takeBackward, col(p)).otherwise(col(s"__f_$p")).as(p)): _*)
  }
}
