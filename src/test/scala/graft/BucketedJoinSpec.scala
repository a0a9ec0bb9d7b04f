package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The co-located join story for 100 TB (SURVEY §4 / README scale notes):
  * bucketing both sides of a recurring equi-join by the join key removes
  * the shuffle entirely — the plan must contain a SortMergeJoin with NO
  * Exchange on either side. This is the pattern for the replayer's
  * target-vs-batch merge and any repeated key-partitioned CDC join. */
class BucketedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("bucketed-wh").toString
    spark = SparkSession.builder().master("local[4]")
      .appName("bucketed-join-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("bucketed tables join without any Exchange") {
    val dir = "/root/testdata/sf0.001"
    spark.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_bucketed")
    spark.read.parquet(s"$dir/customer.parquet")
      .withColumn("c_custkey", col("c_custkey"))
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_bucketed")

    val joined = spark.table("orders_bucketed")
      .join(spark.table("customer_bucketed"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("orders"), sum(col("o_totalprice")).as("revenue"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
    // No shuffle before the join: bucket layout IS the partitioning.
    val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
    val beforeAgg = joinSection
    assert(!beforeAgg.contains("Exchange hashpartitioning(o_custkey"),
      "orders side must not re-shuffle")
    assert(!beforeAgg.contains("Exchange hashpartitioning(c_custkey"),
      "customer side must not re-shuffle")

    // And the result is right (vs a plain non-bucketed join).
    val expected = spark.read.parquet(s"$dir/orders.parquet")
      .join(spark.read.parquet(s"$dir/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("orders"), sum(col("o_totalprice")).as("revenue"))
    // Double sums are order-sensitive across partitionings; compare with
    // tolerance (counts exactly).
    val got = joined.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exp = expected.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == exp.keySet)
    got.foreach { case (seg, (cnt, rev)) =>
      assert(cnt == exp(seg)._1, s"count mismatch for $seg")
      assert(math.abs(rev - exp(seg)._2) < 1e-3, s"revenue mismatch for $seg")
    }
  }
}
