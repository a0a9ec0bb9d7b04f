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
    // 4-decimal per-query values keep the whole line ~2 KB: the driver
    // captures a bounded tail of stdout, and full-precision nanos pushed
    // the line's head out of that window in earlier rounds (BENCH_r*.json
    // "parsed": null with a mid-line tail). Locale.ROOT: the f-interpolator
    // uses the default locale, and a comma decimal separator would break
    // the JSON again.
    def d4(v: Double) = String.format(java.util.Locale.ROOT, "%.4f", v: java.lang.Double)
    val qs = results.map { case (k, v) => s""""$k":${d4(v)}""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${d4(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
