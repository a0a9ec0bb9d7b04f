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

  test("trained-centroid index: trainer -> build -> probe recalls the brute-force top-k") {
    // The production loop closed end-to-end: spherical k-means centroids
    // feed the IVF build, and probes against the served index must
    // recall most of the TRUE (brute-force cosine) neighbors. The
    // deterministic-pick index (ann_ivf_topk parity above) is untouched.
    val (centroids, iters) = graft.tools.KMeansTrainer.train(
      spark, spark.read.parquet(s"$sfDir/embeddings.parquet"), k = 8)
    assert(iters >= 1)
    AnnIndex.buildFromCentroids(spark, sfDir, s"$work/idx_trained", centroids)

    val queries = Seq(0L, 7L, 42L, 99L, 123L, 250L, 333L, 480L)
    val k = 10
    val served = AnnIndex.topk(spark, s"$work/idx_trained", queries, k, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    // Brute-force oracle: exact cosine top-k over the whole corpus.
    graft.expr.GraftFunctions.register(spark)
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .createOrReplaceTempView("bf_emb")
    val truth = spark.sql(
      s"""WITH normed AS (
         |  SELECT vec_id, embedding,
         |         sqrt(float_dot(embedding, embedding)) AS nrm
         |  FROM bf_emb),
         |scored AS (
         |  SELECT q.vec_id AS q_id, n.vec_id,
         |         row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |           float_dot(q.embedding, n.embedding) / (q.nrm * n.nrm) DESC,
         |           n.vec_id) AS rnk
         |  FROM normed q JOIN normed n ON n.vec_id != q.vec_id
         |  WHERE q.vec_id IN (${queries.mkString(",")}))
         |SELECT q_id, vec_id FROM scored WHERE rnk <= $k""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val recalls = queries.map { q =>
      served.getOrElse(q, Set.empty).intersect(truth(q)).size.toDouble / k
    }
    val mean = recalls.sum / recalls.size
    // nprobe=2 of 8 lists on this fixture recalls ~0.9; the floor has
    // headroom for tie-order drift but still proves the index ROUTES
    // (random lists would recall ~2/8 of neighbors).
    assert(mean >= 0.5, s"mean recall $mean (per-query: $recalls)")
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
