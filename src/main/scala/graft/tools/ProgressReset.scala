package graft.tools

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.model.ChangeIndex
import graft.sources.{CdcOffset, SnapshotNotStarted, TablePosition}

/** Progress reset (SURVEY §3.3 tooling; `progress_reset_tool.py:12-63`):
  * rewind a table's stream position so the pipeline re-delivers. The
  * reference rewrites the progress topic; here the equivalent durable
  * position is the Structured Streaming offset log, so the tool appends a
  * NEW offset-log entry (batch N+1) holding the reset position:
  *
  *   - on restart the engine replays batch N+1 as (old position → reset
  *     position], which plans as an empty batch (the range is inverted),
  *   - the next trigger's `latestOffset` then advances FROM the reset
  *     position, re-delivering everything after it.
  *
  * Appending (rather than editing history) keeps every prior entry
  * intact for audit — the same reason the reference appends reset
  * messages to its progress topic instead of truncating it.
  *
  * Kinds mirror the reference: `changes` rewinds the change index to the
  * beginning, `snapshot` restarts the backfill, `all` does both. Dry-run
  * by default; pass --execute to write (reference's safety flag).
  *
  * Usage: runMain graft.tools.ProgressReset <checkpointDir> <table>
  *        <changes|snapshot|all> [--execute]
  */
object ProgressReset {

  def resetPosition(p: TablePosition, kind: String): TablePosition = kind match {
    case "changes" => p.copy(changeIndex = ChangeIndex.Lowest)
    case "snapshot" => p.copy(snapshot = SnapshotNotStarted)
    case "all" => TablePosition(ChangeIndex.Lowest, SnapshotNotStarted)
    case other => sys.error(s"unknown progress kind: $other")
  }

  /** Append offsets/(N+1) with `table`'s position reset; header lines
    * (version + metadata) are cloned from the latest entry so the file
    * speaks the exact dialect the engine wrote. Returns the new batch id. */
  def writeReset(checkpointDir: String, table: String, kind: String): Long = {
    val dir = new File(checkpointDir, "offsets")
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    require(files.nonEmpty, s"no offset log at $dir")
    val latest = files.last
    val lines = scala.io.Source.fromFile(latest).getLines().toSeq
    val offsetLineIdx = lines.indexWhere(l =>
      l.contains("\"lsn\"") && l.contains("\"snapshot\""))
    require(offsetLineIdx >= 0, s"latest offset entry ${latest.getName} is not a CdcOffset")
    val offset = CdcOffset.fromJson(lines(offsetLineIdx))
    val pos = offset.tables.getOrElse(table,
      sys.error(s"table '$table' not present in latest offset " +
        s"(tables: ${offset.tables.keys.mkString(", ")})"))
    val updated = CdcOffset(offset.tables.updated(table, resetPosition(pos, kind)))
    val newId = latest.getName.toLong + 1
    val out = lines.updated(offsetLineIdx, updated.json).mkString("\n")
    Files.write(Paths.get(dir.getPath, newId.toString),
      out.getBytes(StandardCharsets.UTF_8))
    // An uncommitted batch N+1 is exactly the crash-replay shape the
    // engine already handles; never touch the commits dir.
    newId
  }

  def main(args: Array[String]): Unit = {
    val usage = "usage: ProgressReset <checkpointDir> <table> <changes|snapshot|all> [--execute]"
    val positional = args.filterNot(_.startsWith("--"))
    require(positional.length == 3, usage)
    val Array(ckpt, table, kind) = positional
    val execute = args.contains("--execute")

    val entries = OffsetInspect.readOffsetLog(ckpt)
    require(entries.nonEmpty, s"no CdcOffset entries under $ckpt/offsets")
    val current = entries.last.offset.tables.get(table)
    current match {
      case None =>
        println(s"no progress found for table '$table' " +
          s"(tables: ${entries.last.offset.tables.keys.mkString(", ")})")
        sys.exit(1)
      case Some(p) =>
        println(s"current position (batch ${entries.last.batchId}): " +
          s"lsn=${p.changeIndex.lsnHex} seq=${p.changeIndex.seqvalHex} snapshot=${p.snapshot}")
        println(s"reset '$kind' would set: ${resetPosition(p, kind)}")
        if (execute) {
          val id = writeReset(ckpt, table, kind)
          println(s"wrote reset as offset entry $id; restart the stream to apply")
        } else println("dry run only — pass --execute to write")
    }
  }
}
