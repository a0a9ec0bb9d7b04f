package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingNearDup

/** Streaming MinHash/LSH near-dup rejection: exact re-deliveries collide
  * on every band and must be rejected, within a run and across restarts;
  * admitted documents are signature-unique. */
class StreamingNearDupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"
  private var work: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("streaming-near-dup")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    work = Files.createTempDirectory("near-dup").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("near-dups are rejected across batches and restarts") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val drop = s"$work/drop"; val sink = s"$work/admitted"; val ckpt = s"$work/ckpt"

    // Wave 1, file A: 200 originals. File B (second micro-batch): every
    // 4th doc re-delivered verbatim under a new id — an exact near-dup
    // (all 4 bands collide) crossing a batch boundary.
    docs.filter(col("doc_id") < 200).coalesce(1)
      .write.parquet(s"$work/a")
    docs.filter(col("doc_id") < 200 && col("doc_id") % 4 === 0)
      .withColumn("doc_id", col("doc_id") + 500000).coalesce(1)
      .write.parquet(s"$work/b")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def drainInto(src: String, name: String): Unit =
      fs.listStatus(new org.apache.hadoop.fs.Path(src))
        .filter(_.getPath.getName.endsWith(".parquet")).zipWithIndex
        .foreach { case (f, i) =>
          fs.mkdirs(new org.apache.hadoop.fs.Path(drop))
          fs.rename(f.getPath, new org.apache.hadoop.fs.Path(drop, s"${name}_$i.parquet"))
        }
    drainInto(s"$work/a", "a"); drainInto(s"$work/b", "b")

    StreamingNearDup.run(spark, drop, sink, ckpt)
    val afterW1 = spark.read.parquet(sink)
    // Every re-delivered doc was rejected.
    assert(afterW1.filter(col("doc_id") >= 500000).count() === 0)
    // Admitted docs are signature-unique (the gate's invariant).
    graft.expr.GraftFunctions.register(spark)
    val sigDups = afterW1.join(docs, "doc_id")
      .select(expr("minhash_signature(text)").cast("string").as("sig"))
      .groupBy("sig").count().filter(col("count") > 1).count()
    assert(sigDups === 0)
    val admitted1 = afterW1.count()
    assert(admitted1 > 0 && admitted1 <= 200)

    // Wave 2 after restart: re-deliver 50 wave-1 docs under fresh ids
    // plus 100 genuinely new docs. The claim table must survive the
    // restart: all re-deliveries rejected, new content admitted.
    docs.filter(col("doc_id") < 50)
      .withColumn("doc_id", col("doc_id") + 900000)
      .unionByName(docs.filter(col("doc_id") >= 300 && col("doc_id") < 400))
      .coalesce(1).write.parquet(s"$work/c")
    drainInto(s"$work/c", "c")
    StreamingNearDup.run(spark, drop, sink, ckpt)

    val afterW2 = spark.read.parquet(sink)
    assert(afterW2.filter(col("doc_id") >= 900000).count() === 0,
      "re-delivered content must be rejected via the RECOVERED claim table")
    assert(afterW2.count() > admitted1, "novel content must still be admitted")
  }
}
