package graft.tools

import org.apache.spark.sql.SparkSession

// Temporary: dump the pipe_decontaminate_bloom executed plan.
object ScratchPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("scratch-plan").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("pipe_decontaminate_bloom")(
      spark, "/root/testdata/sf0.001")
    println("=== PLAN START ===")
    println(df.queryExecution.executedPlan.toString)
    println("=== PLAN END ===")
    spark.stop()
  }
}
