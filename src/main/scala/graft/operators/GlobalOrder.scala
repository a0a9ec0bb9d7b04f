package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global-order operators.
  *
  * A bare `row_number() OVER (ORDER BY ...)` funnels the whole dataset
  * through ONE partition — fine for a 2k-row CDC poll window (the
  * reference's k-way heap merge, `main.py:304-350`, is likewise
  * single-threaded), fatal for a 100 TB sort. The scalable equivalent is
  * the three-step TeraSort-style rank:
  *
  *   1. range-partition + sort within partitions on the order key,
  *   2. count rows per partition (tiny driver-side collect of N longs),
  *   3. global rank = cumulative partition offset + intra-partition rank.
  *
  * Step 3's window partitions by the physical partition id, so every
  * partition ranks in parallel; no single-reducer stage exists.
  */
object GlobalOrder {

  /** Pin the sorted relation with RELIABLE (disk, `checkpoint()`)
    * instead of LOCAL (executor memory/disk) checkpointing. The sort
    * must be materialized once either way — the count pass and the rank
    * pass must see the SAME partitioning, and range partitioning is
    * sampled, so recomputing it twice could disagree — but at a genuine
    * 100 TB sort `localCheckpoint` pins the whole relation in executor
    * storage and dies with any executor. Set this to `true` (and
    * `SparkContext.setCheckpointDir` to durable storage) for sorts that
    * exceed cluster storage headroom or must survive executor loss;
    * local remains the default because it skips the write-to-DFS round
    * trip that reliable checkpointing costs. */
  val ReliableCheckpointConf = "spark.graft.globalorder.reliableCheckpoint"

  /** Append a 1-based dense global rank column ordered by `cols` (which
    * must form a total order for the rank to be deterministic). */
  def withGlobalRank(df: DataFrame, cols: Seq[Column], rankCol: String): DataFrame = {
    val spark = df.sparkSession
    val n = math.max(spark.sparkContext.defaultParallelism, 1)
    val staged = df
      .repartitionByRange(n, cols: _*)
      .sortWithinPartitions(cols: _*)
      .withColumn("__pid", spark_partition_id())
    // The count pass below must not re-sort (and must not re-SAMPLE the
    // range partitioner), so the sorted relation is pinned exactly once.
    val sorted =
      if (spark.conf.get(ReliableCheckpointConf, "false").toBoolean)
        staged.checkpoint()
      else Pin.pin(staged) // respects the session-wide graft.pin.mode seam
    val counts = sorted.groupBy(col("__pid")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, c)) => (pid, acc + c) }
      .init.map(_._2) // offsets(i) = rows before partition ordinal i
    // Offsets attach via a broadcast join on the partition id: N rows of
    // driver-side metadata, not an N-deep CASE expression (which would
    // stop codegen-compiling at cluster partition counts).
    val offsetDf = spark.createDataFrame(counts.map(_._1).zip(offsets).toSeq)
      .toDF("__pid", "__offset")
    val w = Window.partitionBy(col("__pid")).orderBy(cols: _*)
    sorted
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn(rankCol, row_number().over(w).cast("long") + col("__offset"))
      .drop("__pid", "__offset")
  }
}
