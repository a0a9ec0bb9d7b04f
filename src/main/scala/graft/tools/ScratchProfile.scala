package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.fixtures.SyntheticCdc

// Temporary profiling harness for the c1_lsn_time_join regression.
object ScratchProfile {
  def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("scratch").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm up the JIT + parquet footer caches.
    (1 to 2).foreach { _ =>
      time("warmup full c1")(graft.queries.CdcQueries.c1LsnTimeJoin(spark, dir).count())
    }
    (1 to 3).foreach { i =>
      time(s"full c1 #$i")(graft.queries.CdcQueries.c1LsnTimeJoin(spark, dir).count())

      val changes = SyntheticCdc.changeRows(spark, dir)
      val mapping = SyntheticCdc.lsnTimeMapping(spark, dir)
        .select(col("lsn_num"), col("tran_end_time"))
      time(s"c1 no date_format #$i")(
        changes.join(broadcast(mapping), Seq("lsn_num"), "inner")
          .select(col("event_id"), col("tran_end_time"), col("operation")).count())

      time(s"mapping only #$i")(mapping.count())
      time(s"changes only #$i")(changes.count())
      time(s"changes+format no join #$i")(
        changes.select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSS").as("t")).count())
    }
    spark.stop()
  }
}
