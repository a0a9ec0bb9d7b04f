package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** ts_fastdtw (r13): the oracle gate proves both engines run the same
  * coarsen→project→refine trajectory; this spec pins the ACCURACY half
  * against ground truth the oracle deliberately does not encode — the
  * full-resolution unbanded DTW, computed independently in driver
  * Scala over the same two series. The banded distance can only
  * OVER-estimate (the band restricts warp paths); the radius is the
  * accuracy knob: r = 1 overshoots on these sparse hourly series
  * (FastDTW's documented hard case), and r = 6 recovers the exact
  * optimum while still cutting cells several-fold. */
class FastDtwSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("fastdtw-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def series(dir: String): (Array[Long], Array[Long]) = {
    import graft.queries.TimeSeriesQueries.StompN
    graft.fixtures.SyntheticCdc.events(spark, dir)
      .createOrReplaceTempView("events_fd_t")
    val rows = spark.sql(
      s"""WITH b AS (SELECT min(unix_micros(ts)) AS t0 FROM events_fd_t)
         |SELECT CAST((unix_micros(ts) - b.t0) div 3600000000 AS BIGINT) AS h,
         |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |         AS BIGINT) AS cx,
         |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
         |         AS BIGINT) AS cy
         |FROM events_fd_t CROSS JOIN b
         |WHERE (unix_micros(ts) - b.t0) div 3600000000 < $StompN
         |GROUP BY 1""".stripMargin).collect()
    val x = Array.fill(StompN)(0L)
    val y = Array.fill(StompN)(0L)
    rows.foreach { r =>
      x(r.getLong(0).toInt) = r.getLong(1); y(r.getLong(0).toInt) = r.getLong(2)
    }
    (x, y)
  }

  private def fullDtw(x: Array[Long], y: Array[Long]): Long = {
    val n = x.length
    val inf = Long.MaxValue / 4
    var prev = Array.fill(n + 1)(inf)
    var cur = Array.fill(n + 1)(inf)
    for (i <- 0 until n) {
      java.util.Arrays.fill(cur, inf)
      for (j <- 0 until n) {
        val c = (x(i) - y(j)) * (x(i) - y(j))
        val best =
          if (i == 0 && j == 0) 0L
          else math.min(prev(j + 1), math.min(prev(j), cur(j)))
        cur(j + 1) = math.min(inf, c + best)
      }
      val t = prev; prev = cur; cur = t
    }
    prev(n)
  }

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"radius sweep: sound over-estimate at r=1, exact at r=6 ($sf)") {
      val dir = s"/root/testdata/$sf"
      def run(r: Int): (Long, Long, Long) = {
        val row = graft.queries.TimeSeriesQueries.tsFastDtwAt(spark, dir, r)
          .collect().head
        (row.getLong(5), row.getLong(4), row.getLong(2))
      }
      val (fast1, cells1, full) = run(1)
      val (fast6, cells6, _) = run(6)
      val (x, y) = series(dir)
      val exact = fullDtw(x, y)
      assert(fast1 >= exact && fast6 >= exact,
        "a banded DP can never beat the unrestricted optimum")
      assert(fast1 >= fast6,
        "widening the projection band can only improve the distance")
      assert(fast6 === exact,
        s"r=6 band lost the optimal path: fast=$fast6 exact=$exact")
      assert(cells1 < full / 10,
        s"r=1 refined cells $cells1 must undercut the full DP by >10x")
      assert(cells6 < full / 3,
        s"r=6 refined cells $cells6 must still undercut the full DP by >3x")
    }
  }
}
