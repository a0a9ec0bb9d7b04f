package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The unified multi-table stream (SURVEY §1.1 "unified topic",
  * `main.py:96-124,319-350`): changes from several tables published into
  * ONE stream in global change-index order within each produce window.
  *
  * Spark restatement: one streaming query over the UNION of the per-table
  * feeds; each micro-batch is sorted by (lsn, command, seqval, operation,
  * table) before producing — the reference's heap merge scoped per poll
  * window, exactly as it scopes it (order across windows follows from
  * per-table source order). The strict-order production assert
  * (`main.py:329-331`) becomes [[UnifiedStream.orderValidation]], run on
  * the engine's own output like the reference's validators.
  */
object UnifiedStream {

  private val idxCols = Seq(col("lsn_num"), col("command_id"),
    col("seqval_num"), col("operation"), col("src"))

  /** Run the unified publisher over per-table staged feeds until drained.
    * Each feed is a CdcPipeline-staged directory; `src` labels the table. */
  def run(spark: SparkSession, feeds: Map[String, String], sinkDir: String,
      checkpointDir: String): Unit = {
    val schema = "lsn_num LONG, command_id INT, seqval_num LONG, operation INT, " +
      "event_id LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    val unioned = feeds.toSeq.sortBy(_._1).map { case (src, dir) =>
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dir)
        .filter(col("operation") =!= 3)
        .withColumn("src", lit(src))
    }.reduce(_ unionByName _)

    val query = unioned.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Produce window = one micro-batch, sorted in global change-index
        // order; single sorted file so the produce order is materialized
        // (a Kafka sink would iterate the sorted partition the same way).
        batch.sparkSession.conf
          .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        batch.orderBy(idxCols: _*)
          .coalesce(1)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").partitionBy("batch_id")
          .parquet(sinkDir)
        ()
      }
      .start()
    query.awaitTermination()
  }

  /** E4-style self-validation over the published unified stream: within
    * every produce window (batch), rows must be non-decreasing in the
    * global change index. Returns the regressions (empty = ordered). */
  def orderValidation(spark: SparkSession, sinkDir: String): DataFrame = {
    // A single-file batch read preserves file row order within the
    // partition; capture it before any shuffle.
    val withPos = spark.read.parquet(sinkDir)
      .withColumn("pos", monotonically_increasing_id())
    val w = Window.partitionBy(col("batch_id")).orderBy(col("pos"))
    val idx = struct(col("lsn_num"), col("command_id"), col("seqval_num"),
      col("operation"))
    withPos
      .withColumn("prev_idx", lag(idx, 1).over(w))
      .filter(col("prev_idx").isNotNull && col("prev_idx") > idx)
      .select(col("batch_id"), col("pos"), col("lsn_num"), col("seqval_num"))
  }
}
