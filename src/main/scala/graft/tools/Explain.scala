package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev loop: print the formatted physical plan (and optionally run) a
  * single catalog query — `runMain graft.tools.Explain <sfDir> <name>
  * [run]`. The plan-quality review tool: check pushed filters, join
  * strategies, exchange counts, and WholeStageCodegen spans without
  * editing test code. */
object Explain {
  def main(args: Array[String]): Unit = {
    val (sfDir, name) = (args(0), args(1))
    val run = args.length > 2 && args(2) == "run"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    if (run) {
      val t0 = System.nanoTime()
      val n = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[explain] $name: $n rows in $secs%.1f s")
    }
    spark.stop()
  }
}
