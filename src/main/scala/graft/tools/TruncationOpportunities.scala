package graft.tools

import java.io.File

/** Truncation finder (SURVEY §3.3 tooling;
  * `find_truncation_opportunities.py:28-66`): every published record from
  * BEFORE the most recent completed snapshot's start is superseded by that
  * snapshot — the reference compares topic low watermarks against the
  * snapshot-start offsets and emits kafka-delete-records specs. Here the
  * published log is parquet partitioned by batch id, so the unit of
  * truncation is a `batch_id=N` partition directory: a partition is
  * reclaimable when its batch id precedes the latest COMPLETED snapshot
  * run's start batch (an incomplete run protects nothing, mirroring the
  * reference's '!NOT COMPLETE!' guard).
  *
  * Usage: runMain graft.tools.TruncationOpportunities <checkpointDir> <logDir>
  */
object TruncationOpportunities {

  final case class PartitionReport(batchId: Long, bytes: Long, truncatable: Boolean)

  def report(checkpointDir: String, logDir: String): Seq[PartitionReport] = {
    val entries = OffsetInspect.readOffsetLog(checkpointDir)
    val latestCompleted = SnapshotHistory.runs(entries).filter(_.completed)
      .sortBy(_.startBatch).lastOption
    val cutoff: Option[Long] = latestCompleted.map(_.startBatch)
    val parts = Option(new File(logDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .sortBy(_.getName.stripPrefix("batch_id=").toLong)
    parts.toSeq.map { d =>
      val id = d.getName.stripPrefix("batch_id=").toLong
      val bytes = Option(d.listFiles()).getOrElse(Array.empty).map(_.length()).sum
      PartitionReport(id, bytes, truncatable = cutoff.exists(id < _))
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2,
      "usage: TruncationOpportunities <checkpointDir> <logDir>")
    val Array(ckpt, logDir) = args
    val rows = report(ckpt, logDir)
    if (rows.isEmpty) { println("no batch partitions found"); return }
    rows.foreach { r =>
      println(f"batch_id=${r.batchId}%-6d bytes=${r.bytes}%-10d truncatable=${r.truncatable}")
    }
    val reclaim = rows.filter(_.truncatable)
    println(s"${reclaim.size} of ${rows.size} partitions truncatable, " +
      s"${reclaim.map(_.bytes).sum} bytes reclaimable")
    // The operator-facing action, analogous to the reference's emitted
    // kafka-delete-records spec: explicit partition paths to remove.
    reclaim.foreach(r => println(s"rm -r $logDir/batch_id=${r.batchId}"))
  }
}
