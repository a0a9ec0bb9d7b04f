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

  /** Append a 1-based dense global rank column ordered by `cols` (which
    * must form a total order for the rank to be deterministic). */
  def withGlobalRank(df: DataFrame, cols: Seq[Column], rankCol: String): DataFrame = {
    val spark = df.sparkSession
    val n = math.max(spark.sparkContext.defaultParallelism, 1)
    val sorted = df
      .repartitionByRange(n, cols: _*)
      .sortWithinPartitions(cols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint() // the count pass below must not re-sort
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
