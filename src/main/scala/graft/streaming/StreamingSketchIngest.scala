package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.tools.SketchStore

/** Streaming sketch ingestion — documents stream in, each micro-batch
  * folds into HLL register maxima and appends to the persisted
  * [[SketchStore]]; serving between (or during) batches reads registers
  * only, never documents.
  *
  * The exactly-once story is STRUCTURAL, not transactional: a replayed
  * micro-batch (crash after append, before checkpoint commit) re-appends
  * the identical register rows, and register max is idempotent — the
  * served estimate cannot move. At-least-once delivery + a semilattice
  * fold = effective exactly-once with zero committed-marker bookkeeping,
  * which is exactly why production telemetry pipelines ship sketches
  * instead of raw counters (a replayed COUNTER batch double-counts; a
  * replayed REGISTER batch is a no-op). `StreamingSketchIngestSpec`
  * proves it: serve-after-stream equals the batch `sk_hll_distinct`
  * estimate through a restart AND through a deliberately duplicated
  * batch.
  */
object StreamingSketchIngest {

  /** Drop schema: lang STRING, text STRING (the documents columns the
    * fold reads). Each micro-batch appends under its batch id. */
  def run(spark: SparkSession, dropDir: String, storeDir: String,
      checkpointDir: String): Unit = {
    val schema = "doc_id LONG, lang STRING, text STRING"
    val incoming = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dropDir)
      .select("lang", "text")
    val q = incoming.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        SketchStore.appendHll(spark, batch, storeDir, s"batch-$batchId")
      }
      .start()
    q.awaitTermination()
  }
}
