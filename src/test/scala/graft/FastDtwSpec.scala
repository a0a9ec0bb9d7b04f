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

  /** The pyramid's fine series: quarter-hour buckets, n = FdPyrN. */
  private def pyrSeries(dir: String): (Array[Long], Array[Long]) = {
    import graft.queries.TimeSeriesQueries.FdPyrN
    graft.fixtures.SyntheticCdc.events(spark, dir)
      .createOrReplaceTempView("events_fd_t")
    val rows = spark.sql(
      s"""WITH b AS (SELECT min(unix_micros(ts)) AS t0 FROM events_fd_t)
         |SELECT CAST((unix_micros(ts) - b.t0) div 900000000 AS BIGINT) AS h,
         |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |         AS BIGINT) AS cx,
         |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
         |         AS BIGINT) AS cy
         |FROM events_fd_t CROSS JOIN b
         |WHERE (unix_micros(ts) - b.t0) div 900000000 < $FdPyrN
         |GROUP BY 1""".stripMargin).collect()
    val x = Array.fill(FdPyrN)(0L)
    val y = Array.fill(FdPyrN)(0L)
    rows.foreach { r =>
      x(r.getLong(0).toInt) = r.getLong(1); y(r.getLong(0).toInt) = r.getLong(2)
    }
    (x, y)
  }

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"2-level pyramid: sound over-estimate, monotone in r, exact at r=12 ($sf)") {
      // Two levels of projection COMPOUND the banding error (each
      // level's path is only optimal within the previous corridor), and
      // the quarter-hour series is 4x sparser per bucket than the
      // hourly one — so exactness needs a wider radius than the
      // 1-level operator's r=6: measured, r=6 lands ~1-2% high on both
      // fixtures and r=12 recovers the exact optimum on both while
      // still cutting fine-level cells ~7x. That compounding IS the
      // documented FastDTW accuracy/radius tradeoff, pinned here.
      val dir = s"/root/testdata/$sf"
      def run(r: Int): (Long, Long, Long, Long) = {
        val row = graft.queries.TimeSeriesQueries
          .tsFastDtwPyramidAt(spark, dir, r).collect().head
        // (dtw_fast, cells_l0, cells_l1, cells_full)
        (row.getLong(7), row.getLong(6), row.getLong(5), row.getLong(3))
      }
      val (fast1, l0c1, l1c1, full) = run(1)
      val (fast6, _, _, _) = run(6)
      val (fast12, l0c12, _, _) = run(12)
      val (x, y) = pyrSeries(dir)
      val exact = fullDtw(x, y)
      assert(fast1 >= exact && fast6 >= exact && fast12 >= exact,
        "a corridor-restricted DP can never beat the unrestricted optimum")
      assert(fast1 >= fast6 && fast6 >= fast12,
        "widening the per-level projection can only improve the distance")
      assert(fast12 === exact,
        s"r=12 pyramid lost the optimal path: fast=$fast12 exact=$exact")
      // The per-level ledger must show the recursion's economics: the
      // fine band a small fraction of n², and the mid band a small
      // fraction of the mid level's full DP (360²).
      assert(l0c1 < full / 20,
        s"r=1 fine band $l0c1 must undercut the full DP by >20x")
      assert(l1c1 < 360L * 360L / 4,
        s"r=1 mid band $l1c1 must undercut the mid-level full DP by >4x")
      assert(l0c12 < full / 5,
        s"r=12 fine band $l0c12 must still undercut the full DP by >5x")
    }
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
