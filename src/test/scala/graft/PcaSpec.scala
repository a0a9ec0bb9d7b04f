package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.PcaQueries

/** The PCA geometry the engine-parity oracle cannot see: the integer
  * power iteration must actually RECOVER the dominant variance direction
  * (planted-direction fixture), deterministically, with the documented
  * sign convention. */
class PcaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val D = PcaQueries.Dim

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("pca-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Deterministic LCG in [-1, 1). */
  private def lcg(seed: Long): Double = {
    val x = (seed * 6364136223846793005L + 1442695040888963407L) >>> 11
    (x % 2000000) / 1000000.0 - 1.0
  }

  /** Vectors = alpha_k * u + 0.05 * noise, alpha in [-1, 1): the variance
    * along u dominates every other direction by ~400x. */
  private def planted(): Array[Double] = {
    val u = Array.tabulate(D)(d => math.sin(d + 1.0))
    val un = math.sqrt(u.map(x => x * x).sum)
    val uHat = u.map(_ / un)
    val ss = spark; import ss.implicits._
    val rows = (0 until 400).map { k =>
      val alpha = lcg(k)
      val vec = Array.tabulate(D)(d => (alpha * uHat(d) + 0.05 * lcg(k * 100 + d)).toFloat)
      (k.toLong, vec, k % 3)
    }
    rows.toDF("vec_id", "embedding", "label").createOrReplaceTempView("embeddings")
    uHat
  }

  test("integer power iteration recovers the planted dominant direction") {
    val uHat = planted()
    val v = PcaQueries.trainTopComponentOnView(spark)
    val vd = v.map(_.toDouble)
    val vn = math.sqrt(vd.map(x => x * x).sum)
    val cos = (0 until D).map(d => vd(d) / vn * uHat(d)).sum
    assert(math.abs(cos) > 0.99, s"|cos(v, u)| = ${math.abs(cos)}")
  }

  test("deflated second component recovers the planted secondary direction") {
    // Two planted orthogonal directions with 1 : 0.45 strength; the
    // deflated iteration must find the second without re-finding the
    // first.
    val u1 = Array.tabulate(D)(d => math.sin(d + 1.0))
    val n1 = math.sqrt(u1.map(x => x * x).sum)
    val u1h = u1.map(_ / n1)
    val raw2 = Array.tabulate(D)(d => math.cos(2.0 * d + 1.0))
    val dot12 = (0 until D).map(d => raw2(d) * u1h(d)).sum
    val o2 = Array.tabulate(D)(d => raw2(d) - dot12 * u1h(d))
    val n2 = math.sqrt(o2.map(x => x * x).sum)
    val u2h = o2.map(_ / n2)
    val ss = spark; import ss.implicits._
    val rows = (0 until 400).map { k =>
      val a = lcg(k); val b = lcg(k + 7919)
      val vec = Array.tabulate(D)(d =>
        (a * u1h(d) + 0.45 * b * u2h(d) + 0.02 * lcg(k * 100 + d)).toFloat)
      (k.toLong, vec, k % 3)
    }
    rows.toDF("vec_id", "embedding", "label").createOrReplaceTempView("embeddings")
    val (v1, v2) = PcaQueries.trainTop2OnView(spark)
    def cosTo(v: Array[Long], u: Array[Double]): Double = {
      val vd = v.map(_.toDouble); val nv = math.sqrt(vd.map(x => x * x).sum)
      (0 until D).map(d => vd(d) / nv * u(d)).sum
    }
    assert(math.abs(cosTo(v1, u1h)) > 0.99, s"v1 missed u1: ${cosTo(v1, u1h)}")
    assert(math.abs(cosTo(v2, u2h)) > 0.98, s"v2 missed u2: ${cosTo(v2, u2h)}")
    val v1d = v1.map(_.toDouble); val v2d = v2.map(_.toDouble)
    val c12 = (0 until D).map(d => v1d(d) * v2d(d)).sum /
      (math.sqrt(v1d.map(x => x * x).sum) * math.sqrt(v2d.map(x => x * x).sum))
    assert(math.abs(c12) < 0.05, s"components not orthogonal: $c12")
  }

  test("training is deterministic and the sign convention holds") {
    planted()
    val a = PcaQueries.trainTopComponentOnView(spark)
    val b = PcaQueries.trainTopComponentOnView(spark)
    assert(a.toSeq == b.toSeq)
    assert(a.find(_ != 0L).exists(_ > 0L), "first nonzero component must be positive")
    // Normalization keeps the magnitude near VScale (the rescaling loop
    // neither underflows to zero nor overflows past ~2x the target).
    val m = a.map(math.abs).max
    assert(m >= PcaQueries.VScale / 2 && m <= 2 * PcaQueries.VScale, s"max |v| = $m")
  }
}
