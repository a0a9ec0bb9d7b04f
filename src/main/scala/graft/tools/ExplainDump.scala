package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Plan-audit dump (r15): for each named catalog query, write the
  * FORMATTED physical plan of the final DataFrame to
  * `<outDir>/<name>_final.txt`, and — via [[graft.operators.Pin]]'s
  * explain hook — the plan of every stage the query pins to
  * `<outDir>/<name>_pinNN.txt` (the pinned builds are where the
  * interesting plans live; the returned Dataset is often just a block
  * scan over them). Usage:
  * `runMain graft.tools.ExplainDump <sfDir> <outDir> <q1,q2,...>`.
  * Runs at the given SF so join strategies (broadcast thresholds, AQE
  * decisions) are the ones the bench actually sees. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val names = args(2).split(',').toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    spark.conf.set(graft.operators.Pin.ExplainDirKey, outDir)
    names.foreach { name =>
      spark.conf.set(graft.operators.Pin.ExplainTagKey, name)
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      Files.writeString(Paths.get(s"$outDir/${name}_final.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      graft.operators.PinnedStages.sweepTransient(spark)
      println(s"[explaindump] $name done")
    }
    spark.stop()
  }
}
