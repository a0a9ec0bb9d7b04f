package graft.tools

import graft.sources.{SnapshotAt, SnapshotDone, SnapshotKey, SnapshotNotStarted, SnapshotPosition}

/** Snapshot history (SURVEY §3.3 tooling; `show_snapshot_history.py:32-128`):
  * reconstruct each table's backfill timeline from the checkpoint offset
  * log — where a snapshot run started, every keyset page it walked (the
  * descending composite-key bounds), and whether it completed. The
  * reference consumes its snapshot-logging topic for the same facts; here
  * the offset log IS the durable snapshot journal, so the history needs
  * no extra bookkeeping topic.
  *
  * Usage: runMain graft.tools.SnapshotHistory <checkpointDir>
  */
object SnapshotHistory {

  final case class HistoryEvent(batchId: Long, table: String, action: String,
      keyBound: Option[(Long, Long)])

  /** A maximal contiguous segment of not-Done snapshot positions: one
    * backfill run. `completed` when the segment ended in SnapshotDone. */
  final case class SnapshotRun(table: String, startBatch: Long,
      endBatch: Long, pages: Int, completed: Boolean)

  def history(entries: Seq[OffsetInspect.Entry]): Seq[HistoryEvent] = {
    val events = Seq.newBuilder[HistoryEvent]
    val tables = entries.flatMap(_.offset.tables.keys).distinct
    tables.foreach { t =>
      var prev: Option[SnapshotPosition] = None
      entries.foreach { e =>
        e.offset.tables.get(t).foreach { p =>
          (prev, p.snapshot) match {
            case (None | Some(SnapshotDone), s) if s != SnapshotDone =>
              events += HistoryEvent(e.batchId, t, "started",
                keyOf(s))
              if (keyOf(s).isDefined)
                events += HistoryEvent(e.batchId, t, "page", keyOf(s))
            case (Some(a), SnapshotAt(h)) if a != SnapshotAt(h) =>
              events += HistoryEvent(e.batchId, t, "page", Some(SnapshotKey.fromHex(h)))
            case (Some(a), SnapshotDone) if a != SnapshotDone =>
              events += HistoryEvent(e.batchId, t, "completed", None)
            case _ => ()
          }
          prev = Some(p.snapshot)
        }
      }
    }
    events.result().sortBy(e => (e.table, e.batchId))
  }

  private def keyOf(s: SnapshotPosition): Option[(Long, Long)] = s match {
    case SnapshotAt(h) => Some(SnapshotKey.fromHex(h))
    case _ => None
  }

  /** Backfill runs per table, newest last. */
  def runs(entries: Seq[OffsetInspect.Entry]): Seq[SnapshotRun] = {
    val evs = history(entries)
    evs.groupBy(_.table).toSeq.sortBy(_._1).flatMap { case (t, tev) =>
      val out = Seq.newBuilder[SnapshotRun]
      var start: Option[Long] = None
      var pages = 0
      var lastBatch = 0L
      tev.foreach { e =>
        lastBatch = e.batchId
        e.action match {
          case "started" => start = Some(e.batchId); pages = 0
          case "page" => pages += 1
          case "completed" =>
            start.foreach(s => out += SnapshotRun(t, s, e.batchId, pages, completed = true))
            start = None
          case _ => ()
        }
      }
      start.foreach(s => out += SnapshotRun(t, s, lastBatch, pages, completed = false))
      out.result()
    }
  }

  def main(args: Array[String]): Unit = {
    val ckpt = args.headOption.getOrElse(sys.error("usage: SnapshotHistory <checkpointDir>"))
    val entries = OffsetInspect.readOffsetLog(ckpt)
    if (entries.isEmpty) { println("no CdcOffset entries found"); return }
    history(entries).foreach { e =>
      val bound = e.keyBound.map { case (k, ev) => s" below=($k,$ev)" }.getOrElse("")
      println(f"batch=${e.batchId}%-5d table=${e.table} action=${e.action}$bound")
    }
    runs(entries).foreach { r =>
      println(s"run: table=${r.table} startBatch=${r.startBatch} endBatch=${r.endBatch} " +
        s"pages=${r.pages} completed=${r.completed}")
    }
  }
}
