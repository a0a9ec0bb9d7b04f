package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.AnnIndex

/** Persisted IVF index: index-served top-k must be bit-identical to the
  * in-query `ann_ivf_topk` build, and serving must prune to the probed
  * posting-list partitions instead of scanning the corpus. */
class AnnIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"
  private var work: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("ann-index-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    work = Files.createTempDirectory("ann-index").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("index-served results equal the in-query IVF build bit-for-bit") {
    AnnIndex.build(spark, sfDir, s"$work/idx")
    val served = AnnIndex.topk(spark, s"$work/idx", Seq(0L, 1L, 2L), k = 3, nprobe = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getDouble(4)))
      .toSet
    val inQuery = SparkEntry.queries("ann_ivf_topk")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getDouble(4)))
      .toSet
    assert(served == inQuery)
  }

  test("serving scans only the probed posting-list partitions") {
    val plan = AnnIndex.topk(spark, s"$work/idx", Seq(0L, 1L, 2L), k = 3, nprobe = 2)
      .queryExecution.executedPlan.toString
    // The lists scan must carry a c_id partition filter (file-level
    // pruning); an empty PartitionFilters would read every list.
    assert(plan.contains("PartitionFilters"))
    assert(plan.contains("c_id"), s"no c_id pruning in:\n$plan")
    assert(!plan.contains("PartitionFilters: []"),
      "posting-list scan is unpruned")
  }
}
