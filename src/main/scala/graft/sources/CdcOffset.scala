package graft.sources

import graft.model.ChangeIndex

/** The CDC source's two-dimensional stream position (SURVEY §2 G2/G3).
  *
  * Per tracked table the source is at a `changeIndex` watermark (all
  * change rows at or below it are committed) and a snapshot position —
  * the reverse-keyset low-water mark the backfill has walked DOWN to, or
  * `SnapshotDone`. The whole map serializes as one JSON document and is
  * the payload of the Structured Streaming `Offset` for a JDBC-backed
  * deployment (Spark's offset log then gives atomic progress commit, the
  * role the reference's transactional progress topic plays,
  * `progress_tracking.py:19-87`).
  */
final case class CdcOffset(tables: Map[String, TablePosition]) {

  def json: String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    tables.toSeq.sortBy(_._1).map { case (t, p) =>
      val snap = p.snapshot match {
        case SnapshotDone => "\"done\""
        case SnapshotAt(keyHex) => s"""{"below": "${esc(keyHex)}"}"""
        case SnapshotNotStarted => "\"pending\""
      }
      s""""${esc(t)}": {"lsn": "${p.changeIndex.lsnHex}", "cmd": ${p.changeIndex.commandId}, """ +
        s""""seq": "${p.changeIndex.seqvalHex}", "op": ${p.changeIndex.operation}, "snapshot": $snap}"""
    }.mkString("{", ", ", "}")
  }
}

/** Hex codec + ordering for the composite snapshot key carried by
  * [[SnapshotAt]]. The hex rendering is two's-complement per component,
  * so LEXICOGRAPHIC comparison of the strings is wrong for negative keys
  * (and for legacy 16-char key-only bounds) — always decode and compare
  * the signed (key, event) tuple. */
object SnapshotKey {
  def toHex(k: Long, e: Long): String = f"$k%016x$e%016x"
  /** parseUnsignedLong round-trips two's-complement hex; a 16-char value
    * (written before the composite format) degrades losslessly to
    * (key, MIN) = the old key-only bound. */
  def fromHex(h: String): (Long, Long) =
    if (h.length <= 16) (java.lang.Long.parseUnsignedLong(h, 16), Long.MinValue)
    else (java.lang.Long.parseUnsignedLong(h.substring(0, 16), 16),
      java.lang.Long.parseUnsignedLong(h.substring(16), 16))
  def compare(a: String, b: String): Int = {
    val (ak, ae) = fromHex(a); val (bk, be) = fromHex(b)
    val c = java.lang.Long.compare(ak, bk)
    if (c == 0) java.lang.Long.compare(ae, be) else c
  }
}

sealed trait SnapshotPosition
/** Backfill finished (`<< completed snapshot >>` sentinel, G3). */
case object SnapshotDone extends SnapshotPosition
/** Backfill has emitted all rows with key >= this (hex-encoded composite
  * key); next page reads strictly below it. */
final case class SnapshotAt(keyHex: String) extends SnapshotPosition
case object SnapshotNotStarted extends SnapshotPosition

final case class TablePosition(changeIndex: ChangeIndex, snapshot: SnapshotPosition)

object CdcOffset {

  val empty: CdcOffset = CdcOffset(Map.empty)

  /** Minimal JSON parser for the offset document (exactly the structure
    * [[CdcOffset.json]] writes; not a general JSON reader). */
  def fromJson(s: String): CdcOffset = {
    val entry = """"((?:[^"\\]|\\.)*)":\s*\{"lsn": "([^"]*)", "cmd": (\d+), "seq": "([^"]*)", "op": (\d+), "snapshot": (\{"below": "[^"]*"\}|"done"|"pending")\}""".r
    val tables = entry.findAllMatchIn(s).map { m =>
      val snap = m.group(6) match {
        case "\"done\"" => SnapshotDone
        case "\"pending\"" => SnapshotNotStarted
        case other =>
          val hex = other.stripPrefix("{\"below\": \"").stripSuffix("\"}")
          SnapshotAt(hex)
      }
      val idx = ChangeIndex(
        ChangeIndex.fromHex(m.group(2)), m.group(3).toInt,
        ChangeIndex.fromHex(m.group(4)), m.group(5).toInt)
      unescape(m.group(1)) -> TablePosition(idx, snap)
    }.toMap
    CdcOffset(tables)
  }

  /** Exact inverse of [[CdcOffset.json]]'s esc: \uXXXX control-character
    * escapes decode too, so a table name containing a control char
    * round-trips through the checkpoint instead of silently losing its
    * position (the entry regex matches the escaped form). */
  private def unescape(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' if i + 5 < s.length =>
            out.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case n => out.append(n); i += 2
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }
}
