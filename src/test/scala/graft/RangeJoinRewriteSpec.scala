package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The injected RangeJoinRewrite optimizer rule: a naive theta range join
  * written by a user who has never heard of RangeJoin must come out as a
  * bucketed equi-join (no nested loop) with identical results. */
class RangeJoinRewriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .appName("range-join-rewrite")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fixtures(): (Seq[(Long, Long)], Seq[(Long, Long, Long)]) = {
    val rnd = new scala.util.Random(3)
    val points = List.tabulate(300)(i => (i.toLong, rnd.nextLong(2000)))
    val intervals = List.tabulate(40) { i =>
      val lo = rnd.nextLong(2000)
      (i.toLong, lo, lo + rnd.nextLong(400)) // overlapping; some empty
    }
    (points, intervals)
  }

  test("naive SQL range join is rewritten: equi join on buckets, exact results") {
    val ss = spark; import ss.implicits._
    val (points, intervals) = fixtures()
    points.toDF("pid", "k").createOrReplaceTempView("pts")
    intervals.toDF("iid", "lo", "hi").createOrReplaceTempView("ivs")

    val naive = spark.sql(
      "SELECT pid, iid FROM pts JOIN ivs ON k >= lo AND k < hi")
    val plan = naive.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"rewrite did not fire:\n$plan")
    assert(plan.contains("__graft_pb") || plan.contains("__graft_ib"))

    val got = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val want = (for {
      (pid, k) <- points
      (iid, lo, hi) <- intervals if k >= lo && k < hi
    } yield (pid, iid)).sorted
    assert(got == want)
  }

  test("degenerate intervals (hi <= lo) at bucket boundaries don't crash the rewrite") {
    val ss = spark; import ss.implicits._
    // lo == hi == 256 straddles the default bucket boundary: unguarded,
    // Sequence(1, 0, step=1) THROWS in Spark (unlike generate_series).
    Seq((1L, 100L)).toDF("pid", "k").createOrReplaceTempView("pts3")
    Seq((1L, 256L, 256L), (2L, 300L, 200L), (3L, 0L, 200L))
      .toDF("iid", "lo", "hi").createOrReplaceTempView("ivs3")
    val out = spark.sql("SELECT pid, iid FROM pts3 JOIN ivs3 ON k >= lo AND k < hi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 3L))) // only the real interval matches
  }

  test("joins the rule must NOT touch still plan normally") {
    val ss = spark; import ss.implicits._
    val (points, intervals) = fixtures()
    points.toDF("pid", "k").createOrReplaceTempView("pts2")
    intervals.toDF("iid", "lo", "hi").createOrReplaceTempView("ivs2")
    // Equi join: untouched (no bucket columns in the plan).
    val equi = spark.sql("SELECT pid, iid FROM pts2 JOIN ivs2 ON k = lo")
    assert(!equi.queryExecution.executedPlan.toString.contains("__graft_"))
    // Half-open on the other end (> / <=): pattern doesn't match; still
    // correct through Spark's own nested loop.
    val other = spark.sql(
      "SELECT count(*) AS n FROM pts2 JOIN ivs2 ON k > lo AND k <= hi")
    val want = (for {
      (_, k) <- points; (_, lo, hi) <- intervals if k > lo && k <= hi
    } yield 1).size.toLong
    assert(other.collect().head.getLong(0) == want)
  }
}
