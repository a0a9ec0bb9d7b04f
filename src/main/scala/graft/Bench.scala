package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen/parquet paths once so the first timed query
    // doesn't absorb one-time JIT + reader initialization.
    try {
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings").foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count()
      }
      spark.range(1000000).selectExpr("sum(id)", "md5(cast(id as string))").count()
      SparkEntry.queries.get("d1_count_by_operation").foreach(_(spark, sfDir).count())
    } catch { case _: Throwable => () }
    // Deterministic order (Map iteration is incidental), with one
    // dependency: dd_cluster consumes the pair stage dd_minhash_lsh
    // materializes (session-memoized), so run the producer first — the
    // order a production dedup pipeline uses — and each query's timing
    // is its marginal cost.
    val ordered = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_ == "dd_minhash_lsh")
      .flatMap(n => if (n == "dd_cluster") Seq("dd_minhash_lsh", n) else Seq(n))
    val results = ordered.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // The driver captures a bounded TAIL of stdout: in rounds 4 and 5 the
    // single ~2.8 KB 80-query JSON line lost its head to that window
    // ("parsed": null). Emission contract, revised: the full per-query map
    // goes out first as small standalone lines (for humans and logs), and
    // the LAST line — the one guaranteed to survive a tail capture — is a
    // compact (<1 KB) contract object holding the total plus the slowest
    // queries only. Locale.ROOT: a comma decimal separator would break the
    // JSON.
    def d4(v: Double) = String.format(java.util.Locale.ROOT, "%.4f", v: java.lang.Double)
    results.foreach { case (k, v) => println(s"""{"q":"$k","sec":${d4(v)}}""") }
    val total = results.map(_._2).sum
    val slowest = results.sortBy(-_._2).take(15)
      .map { case (k, v) => s""""$k":${d4(v)}""" }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${d4(total)},"unit":"sec","queries":$slowest,"sf":"$sfDir","n_queries":${results.size}}""")
    spark.stop()
  }
}
