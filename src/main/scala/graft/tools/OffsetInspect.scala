package graft.tools

import java.io.File

import graft.sources.{CdcOffset, SnapshotAt, SnapshotDone, SnapshotKey, SnapshotNotStarted}

/** Progress inspection (SURVEY §3.3 tooling: `progress_topic_validator`,
  * `show_snapshot_history`, `progress_reset_tool` — read side): walks a
  * streaming checkpoint's offset log, decodes each entry that speaks the
  * engine's [[CdcOffset]] dialect, and reports per-table positions plus
  * the invariants the reference checks — change indexes never regress,
  * snapshot keys only descend (`progress_topic_validator.py:92-153`).
  *
  * Usage: runMain graft.tools.OffsetInspect <checkpointDir>
  */
object OffsetInspect {

  final case class Entry(batchId: Long, offset: CdcOffset)

  def readOffsetLog(checkpointDir: String): Seq[Entry] = {
    val dir = new File(checkpointDir, "offsets")
    if (!dir.isDirectory) return Seq.empty
    dir.listFiles().filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
      .toSeq.flatMap { f =>
        // v1 offset files: version line, metadata line, then one offset
        // JSON per source; ours is the CdcOffset document.
        val lines = scala.io.Source.fromFile(f).getLines().toSeq
        lines.find(l => l.contains("\"lsn\"") && l.contains("\"snapshot\""))
          .map(json => Entry(f.getName.toLong, CdcOffset.fromJson(json)))
      }
  }

  /** The progress invariants: per table, the change index must be
    * non-decreasing across batches and snapshot keys non-increasing
    * (descending walk) until Done. Returns violation descriptions. */
  def invariantViolations(entries: Seq[Entry]): Seq[String] = {
    val violations = Seq.newBuilder[String]
    val tables = entries.flatMap(_.offset.tables.keys).distinct
    tables.foreach { t =>
      val positions = entries.flatMap(e => e.offset.tables.get(t).map(e.batchId -> _))
      positions.sliding(2).foreach {
        case Seq((b1, p1), (b2, p2)) =>
          if (p2.changeIndex < p1.changeIndex)
            violations += s"$t: change index regressed between batch $b1 and $b2"
          (p1.snapshot, p2.snapshot) match {
            // Compare DECODED (key, event) tuples with signed ordering —
            // raw hex compares backwards for negative keys (two's
            // complement) and misorders legacy 16-char key-only bounds.
            case (SnapshotAt(k1), SnapshotAt(k2)) if SnapshotKey.compare(k2, k1) > 0 =>
              violations += s"$t: snapshot key ascended between batch $b1 and $b2"
            case (SnapshotDone, SnapshotAt(_)) =>
              violations += s"$t: snapshot restarted after completion at batch $b2"
            case (SnapshotDone, SnapshotNotStarted) =>
              violations += s"$t: snapshot position lost after batch $b1"
            case _ => ()
          }
        case _ => ()
      }
    }
    violations.result()
  }

  def main(args: Array[String]): Unit = {
    val ckpt = args.headOption.getOrElse(sys.error("usage: OffsetInspect <checkpointDir>"))
    val entries = readOffsetLog(ckpt)
    if (entries.isEmpty) { println("no CdcOffset entries found"); return }
    entries.foreach { e =>
      e.offset.tables.toSeq.sortBy(_._1).foreach { case (t, p) =>
        val snap = p.snapshot match {
          case SnapshotDone => "done"
          case SnapshotNotStarted => "pending"
          case SnapshotAt(k) => s"below:$k"
        }
        println(s"batch=${e.batchId} table=$t lsn=${p.changeIndex.lsnHex} " +
          s"cmd=${p.changeIndex.commandId} seq=${p.changeIndex.seqvalHex} " +
          s"op=${p.changeIndex.operation} snapshot=$snap")
      }
    }
    val bad = invariantViolations(entries)
    bad.foreach(v => println(s"[FAIL] $v"))
    println(if (bad.isEmpty) s"OK: ${entries.size} offsets, invariants hold"
      else s"${bad.size} violation(s)")
    if (bad.nonEmpty) sys.exit(1)
  }
}
