package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable RANGE (point-in-interval) join: every point row pairs with
  * every interval row whose `[lo, hi)` contains the point's key —
  * intervals may overlap, so a point can match many intervals (this is
  * what distinguishes it from [[AsOfJoin]], which picks exactly one).
  *
  * Spark plans a raw `p.k >= i.lo AND p.k < i.hi` join as
  * BroadcastNestedLoopJoin — O(points × intervals) compares. This
  * operator makes the join EQUI by bucketing the key axis:
  * each interval replicates to the buckets it overlaps
  * (`floor(lo/w) .. floor((hi-1)/w)` — a bounded explode: width/w + 1
  * rows), each point maps to its single bucket, and the join runs on
  * `bucket` with the containment predicate left as a cheap residual
  * filter. A point meets a given interval in exactly one bucket (its
  * own), so no dedup pass is needed. Cost: one hash-partitioned
  * equi-join; replication factor = avg interval width / bucketWidth
  * (caller picks the trade-off against bucket skew).
  */
object RangeJoin {

  /** @param bucketWidth key-axis slice; pick ≈ the TYPICAL interval width
    *        so replication stays near 2× while buckets stay fine-grained
    *        enough to spread the join. Intervals with `hi <= lo` are
    *        empty and match nothing. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointKey: String, lo: String, hi: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val clash = (points.columns ++ intervals.columns).filter(_ == "__b")
    require(clash.isEmpty, "RangeJoin reserves column name __b; rename it in the inputs")
    val ib = intervals
      .filter(col(hi) > col(lo))
      .withColumn("__b", explode(sequence(
        floor(col(lo) / lit(bucketWidth)).cast("long"),
        floor((col(hi) - lit(1)) / lit(bucketWidth)).cast("long"))))
    val pb = points.withColumn("__b", floor(col(pointKey) / lit(bucketWidth)).cast("long"))
    pb.join(ib, Seq("__b"))
      .filter(col(pointKey) >= col(lo) && col(pointKey) < col(hi))
      .drop("__b")
  }

  /** INTERVAL-OVERLAP join: every left `[llo, lhi)` pairs with every right
    * `[rlo, rhi)` it overlaps (`llo < rhi && rlo < lhi`) — the temporal
    * validity-window join. Both sides replicate to the buckets they span,
    * which makes a pair meet in EVERY bucket their overlap touches; the
    * classic dedup trick assigns each pair to the single bucket containing
    * its overlap START (`greatest(llo, rlo)` — a point both intervals
    * cover), so no distinct pass is needed afterward. Same cost model as
    * [[pointInInterval]]: one equi-join, replication = width/bucketWidth
    * per side. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      llo: String, lhi: String, rlo: String, rhi: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(!(left.columns ++ right.columns).contains("__b"),
      "RangeJoin reserves column name __b; rename it in the inputs")
    def spanBuckets(df: DataFrame, lo: String, hi: String) = df
      .filter(col(hi) > col(lo))
      .withColumn("__b", explode(sequence(
        floor(col(lo) / lit(bucketWidth)).cast("long"),
        floor((col(hi) - lit(1)) / lit(bucketWidth)).cast("long"))))
    spanBuckets(left, llo, lhi)
      .join(spanBuckets(right, rlo, rhi), Seq("__b"))
      .filter(col(llo) < col(rhi) && col(rlo) < col(lhi) &&
        col("__b") === floor(greatest(col(llo), col(rlo)) / lit(bucketWidth)).cast("long"))
      .drop("__b")
  }
}
