package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.metrics.{CdcMetricsListener, CollectingReporter, IntervalMetrics, LocalFileReporter}
import graft.streaming.CdcPipeline

/** The metrics surface (A12/D7): a streaming run must produce one
  * interval record per micro-batch with consistent counts, fanned out to
  * every configured reporter. */
class MetricsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var work: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .appName("metrics-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    work = Files.createTempDirectory("metrics-spec").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("listener emits one interval record per micro-batch to all reporters") {
    val collector = new CollectingReporter
    val file = s"$work/metrics.jsonl"
    val listener = new CdcMetricsListener(Seq(collector, new LocalFileReporter(file)))
    spark.streams.addListener(listener)
    try {
      CdcPipeline.stageChangeFeed(spark, "/root/testdata/sf0.001", s"$work/feed", nChunks = 4)
      CdcPipeline.runToParquet(spark, s"$work/feed", s"$work/sink", s"$work/ckpt")
    } finally spark.streams.removeListener(listener)

    // Listener delivery is async; give the bus a moment to drain.
    val deadline = System.currentTimeMillis() + 15000
    while (collector.all.size < 4 && System.currentTimeMillis() < deadline)
      Thread.sleep(200)

    val got: Seq[IntervalMetrics] = collector.all
    assert(got.size >= 4, s"expected >=4 batch records, got ${got.size}")
    assert(got.map(_.batchId).distinct.size == got.size)
    // The stream saw every published change row exactly once.
    val inputTotal = got.map(_.inputRowsCount).sum
    assert(inputTotal == 1000L, s"input rows across batches: $inputTotal")
    // Stateful operator reported key tracking.
    assert(got.exists(_.stateRowsTotal > 0))
    // File reporter wrote parseable JSON lines.
    val lines = scala.io.Source.fromFile(file).getLines().toSeq
    assert(lines.size == got.size)
    assert(lines.forall(l => l.startsWith("{") && l.endsWith("}") &&
      l.contains("\"metrics_namespace\": \"graft\"")))
  }
}
