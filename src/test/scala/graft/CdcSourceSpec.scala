package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CdcPipeline

/** The custom DSv2 CDC MicroBatchStream: ordered batch-size-paced windows,
  * exactly-once delivery, CdcOffset JSON in the offset log, and restart
  * resume from the checkpoint. */
class CdcSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _
  private var work: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("cdc-source-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    work = Files.createTempDirectory("cdc-source").toString
    CdcPipeline.stageChangeFeed(spark, sfDir, s"$work/feed", nChunks = 2)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def stream(): DataFrame =
    spark.readStream.format("graft.sources.CdcTableProvider")
      .option("feedDir", s"$work/feed")
      .option("tableName", "events")
      .option("batchSize", "300")
      .load()

  private def runToSink(sink: String, ckpt: String): Unit = {
    val q = stream().writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.sparkSession.conf
          .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").partitionBy("batch_id").parquet(sink)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  test("paced exactly-once delivery in change-index order") {
    val sink = s"$work/sink1"
    runToSink(sink, s"$work/ckpt1")
    val out = spark.read.parquet(sink)
    // All 1000 rows delivered exactly once.
    assert(out.count() === 1000)
    assert(out.select("seqval_num").distinct().count() === 1000)
    // Pacing: no batch exceeds batchSize; more than one window needed.
    val sizes = out.groupBy("batch_id").count().collect().map(_.getLong(1))
    assert(sizes.forall(_ <= 300), sizes.toSeq.toString)
    assert(sizes.length >= 4)
    // Windows partition the change-index order: every row in batch N+1 is
    // strictly greater than every row in batch N.
    val bounds = out
      .groupBy("batch_id")
      .agg(min(struct(col("lsn_num"), col("command_id"), col("seqval_num"),
        col("operation"))).as("lo"),
        max(struct(col("lsn_num"), col("command_id"), col("seqval_num"),
          col("operation"))).as("hi"))
      .orderBy("batch_id").collect()
    bounds.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getStruct(2).getLong(2) < b.getStruct(1).getLong(2),
          s"windows overlap: ${a} vs ${b}")
      case _ => ()
    }
  }

  test("two-dimensional offset: snapshot keyset pages drain before changes") {
    // Stage a base table (orders) for the snapshot dimension.
    val snapDir = s"$work/snapshot"
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select(lit(0L).as("lsn_num"), lit(0).as("command_id"),
        lit(0L).as("seqval_num"), lit(0).as("operation"),
        col("o_orderkey").as("event_id"), col("o_orderkey").as("user_id"),
        col("o_orderstatus").as("event_type"), col("o_totalprice").as("value"),
        col("o_orderpriority").as("props"))
      .coalesce(2).write.mode("overwrite").parquet(snapDir)
    val nSnap = spark.read.parquet(snapDir).count()

    val sink = s"$work/sink3"; val ckpt = s"$work/ckpt3"
    val q = spark.readStream.format("graft.sources.CdcTableProvider")
      .option("feedDir", s"$work/feed")
      .option("snapshotDir", snapDir)
      .option("tableName", "events")
      .option("batchSize", "300")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.sparkSession.conf
          .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").partitionBy("batch_id").parquet(sink)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()

    val out = spark.read.parquet(sink)
    // Everything delivered exactly once: full snapshot + all changes.
    assert(out.filter(col("operation") === 0).count() === nSnap)
    assert(out.filter(col("operation") =!= 0).count() === 1000)
    assert(out.select("operation", "user_id", "seqval_num").distinct().count()
      === out.count())
    // Snapshot phase completes before any change window (the source's
    // interleaving policy) and pages walk the key space downward.
    val snapMaxBatch = out.filter(col("operation") === 0)
      .agg(max("batch_id")).head().getAs[Number](0).longValue()
    val changeMinBatch = out.filter(col("operation") =!= 0)
      .agg(min("batch_id")).head().getAs[Number](0).longValue()
    assert(snapMaxBatch < changeMinBatch)
    val pageBounds = out.filter(col("operation") === 0)
      .groupBy("batch_id")
      .agg(min("user_id").as("lo"), max("user_id").as("hi"), count(lit(1)).as("n"))
      .orderBy("batch_id").collect()
    assert(pageBounds.forall(_.getAs[Number](3).longValue() <= 300))
    pageBounds.sliding(2).foreach {
      case Array(a, b) => assert(
        b.getAs[Number](2).longValue() < a.getAs[Number](1).longValue(),
        s"pages must descend: $a then $b")
      case _ => ()
    }
    // The final offset records the completed snapshot sentinel.
    val offsetFiles = new java.io.File(s"$ckpt/offsets").listFiles().sortBy(_.getName)
    val last = scala.io.Source.fromFile(offsetFiles.last).getLines().toSeq.last
    assert(last.contains("\"done\""), last)
  }

  test("snapshot pages never drop rows when duplicate keys straddle a page boundary") {
    // lineitem keyed by l_orderkey has many rows per key — paging on the
    // bare key would lose the remainder of a split group; the source
    // pages on the composite (key, event_id). event_id is a staged
    // row_number because the composite keyset key MUST be unique (the
    // reference pages on the table's true PK for the same reason — the
    // synthetic lineitem even has duplicate (orderkey, linenumber)).
    import org.apache.spark.sql.expressions.Window
    val snapDir = s"$work/snapshot_dup"
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("event_id", row_number().over(
        Window.orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_extendedprice")).cast("long"))
      .select(lit(0L).as("lsn_num"), lit(0).as("command_id"),
        lit(0L).as("seqval_num"), lit(0).as("operation"),
        col("event_id"), col("l_orderkey").as("user_id"),
        lit("line").as("event_type"), col("l_quantity").as("value"),
        lit("").as("props"))
      .coalesce(2).write.mode("overwrite").parquet(snapDir)
    val nSnap = spark.read.parquet(snapDir).count()

    val sink = s"$work/sink5"
    val q = spark.readStream.format("graft.sources.CdcTableProvider")
      .option("feedDir", s"$work/feed")
      .option("snapshotDir", snapDir)
      .option("tableName", "events")
      .option("batchSize", "97") // deliberately not aligned to group sizes
      .load()
      .writeStream
      .option("checkpointLocation", s"$work/ckpt5")
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.sparkSession.conf
          .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").partitionBy("batch_id").parquet(sink)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()

    val snapOut = spark.read.parquet(sink).filter(col("operation") === 0)
    assert(snapOut.count() === nSnap)
    assert(snapOut.select("event_id").distinct().count() === nSnap)
  }

  test("full custom stack: DSv2 source -> stateful last-wins -> compacted state") {
    import org.apache.spark.sql.expressions.Window
    val sink = s"$work/sink4"; val ckpt = s"$work/ckpt4"
    val events = stream()
      .filter(col("operation") =!= 3) // B1, applied at the pipeline layer
      .select(col("lsn_num").as("lsnNum"), col("command_id").as("commandId"),
        col("seqval_num").as("seqvalNum"), col("operation"),
        col("event_id").as("eventId"), col("user_id").as("userId"),
        col("event_type").as("eventType"), col("value"), col("props"))
      .as[CdcPipeline.CdcEvent](org.apache.spark.sql.Encoders.product[CdcPipeline.CdcEvent])
    val q = CdcPipeline.keyedUpdates(events).writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[CdcPipeline.KeyedUpdate], batchId: Long) =>
        batch.sparkSession.conf
          .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        batch.toDF().withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").partitionBy("batch_id").parquet(s"$sink/log")
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()

    val got = CdcPipeline.compactedState(spark, sink)
      .select(col("userId").as("user_id"), col("seqvalNum").as("seqval_num"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("lsn_num").desc, col("command_id").desc,
        col("seqval_num").desc, col("operation").desc)
    val exp = graft.fixtures.SyntheticCdc.changeRows(spark, sfDir)
      .filter(col("operation") =!= 3)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("operation") =!= 1)
      .select(col("user_id"), col("seqval_num"))
    assert(got.except(exp).count() === 0 && exp.except(got).count() === 0)
  }

  test("startPoint=latest: nothing existing republishes, later appends publish (r7, options.py:156-166)") {
    val feed = s"$work/feed_latest"
    // Stage chunks 0-1 of 3 — the "existing data" a latest-follow skips.
    CdcPipeline.stageChangeFeed(spark, sfDir, feed, nChunks = 3,
      chunkRange = Some(0 until 2))
    val sink = s"$work/sink_latest"; val ckpt = s"$work/ckpt_latest"
    def runLatest(): Unit = {
      val q = spark.readStream.format("graft.sources.CdcTableProvider")
        .option("feedDir", feed)
        .option("tableName", "events")
        .option("batchSize", "300")
        .option("startPoint", "latest")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(0))
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          batch.sparkSession.conf
            .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
          batch.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite").partitionBy("batch_id").parquet(sink)
          ()
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }
    runLatest()
    // Batch 0 always fires (it establishes offsets) but must be EMPTY —
    // the sink dir exists with no parquet underneath.
    def sinkCount(): Long =
      try spark.read.parquet(sink).count()
      catch { case _: org.apache.spark.sql.AnalysisException => 0L }
    assert(sinkCount() === 0L, "a latest-follow must skip all existing rows")

    // New changes arrive (chunk 2 sits strictly above chunks 0-1 in the
    // change-index order); a restart from the same checkpoint publishes
    // exactly those.
    CdcPipeline.stageChangeFeed(spark, sfDir, feed, nChunks = 3,
      chunkRange = Some(2 until 3))
    runLatest()
    val out = spark.read.parquet(sink)
    // Expected = exactly chunk 2's rows (recompute the stager's chunk
    // assignment rather than assume seqval density).
    val all = spark.read
      .schema(graft.sources.CdcTableProvider.schema).parquet(feed)
    val per = math.max(1L, (all.count() + 2) / 3)
    val expected = all.filter(floor(col("seqval_num") / per) === 2).count()
    assert(expected > 0)
    assert(out.count() === expected,
      "latest-follow must deliver exactly the appended rows")
    // And the floor is stable across restarts: re-running with the same
    // checkpoint adds nothing.
    runLatest()
    assert(spark.read.parquet(sink).count() === expected)
  }

  test("offset log holds CdcOffset JSON and restart resumes cleanly") {
    val sink = s"$work/sink2"; val ckpt = s"$work/ckpt2"
    runToSink(sink, ckpt)
    val countAfterFirst = spark.read.parquet(sink).count()
    assert(countAfterFirst === 1000)
    // The offset log speaks the engine's own offset dialect.
    val offsetFiles = new java.io.File(s"$ckpt/offsets").listFiles().sortBy(_.getName)
    val lastOffset = scala.io.Source.fromFile(offsetFiles.last).getLines().toSeq.last
    assert(lastOffset.contains("\"events\"") && lastOffset.contains("\"lsn\"") &&
      lastOffset.contains("\"snapshot\""))
    // Restart with nothing new: no duplicates appear.
    runToSink(sink, ckpt)
    assert(spark.read.parquet(sink).count() === 1000)
  }
}
