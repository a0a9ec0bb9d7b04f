package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Totally-ordered CDC stream position.
  *
  * Mirrors the reference's `ChangeIndex` (`cdc_kafka/change_index.py:8-80`):
  * a 10-byte log sequence number, the command id within the transaction, a
  * 10-byte in-transaction sequence value, and the operation id. Ordering is
  * lexicographic over the four fields with unsigned byte comparison on the
  * two binary members (`change_index.py:38-47`).
  *
  * Spark-side, the same ordering falls out of the native sort on a
  * `StructType(lsn BINARY, commandId INT, seqval BINARY, operation INT)`
  * column, because Spark orders BinaryType unsigned-lexicographically — so
  * `orderBy(struct(...))` is the engine's k-way merge comparator and no
  * custom ordering physical operator is needed.
  */
final case class ChangeIndex(
    lsn: Array[Byte],
    commandId: Int,
    seqval: Array[Byte],
    operation: Int) extends Ordered[ChangeIndex] {

  require(lsn.length == ChangeIndex.LsnBytes, s"lsn must be 10 bytes, got ${lsn.length}")
  require(seqval.length == ChangeIndex.LsnBytes, s"seqval must be 10 bytes, got ${seqval.length}")

  override def compare(that: ChangeIndex): Int = {
    val c1 = ChangeIndex.compareUnsigned(lsn, that.lsn)
    if (c1 != 0) return c1
    val c2 = java.lang.Integer.compare(commandId, that.commandId)
    if (c2 != 0) return c2
    val c3 = ChangeIndex.compareUnsigned(seqval, that.seqval)
    if (c3 != 0) return c3
    java.lang.Integer.compare(operation, that.operation)
  }

  /** `0x` + 20 hex chars, as the reference renders LSNs (`change_index.py:50-60`). */
  def lsnHex: String = ChangeIndex.toHex(lsn)
  def seqvalHex: String = ChangeIndex.toHex(seqval)

  /** Heartbeat sentinel recognition (`change_index.py:74-76`). */
  def isProbablyHeartbeat: Boolean =
    seqval.forall(_ == -1) && commandId == 0 && operation == 4

  override def equals(o: Any): Boolean = o match {
    case that: ChangeIndex =>
      java.util.Arrays.equals(lsn, that.lsn) && commandId == that.commandId &&
        java.util.Arrays.equals(seqval, that.seqval) && operation == that.operation
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * (31 * java.util.Arrays.hashCode(lsn) + commandId) +
      java.util.Arrays.hashCode(seqval)) + operation
}

object ChangeIndex {
  val LsnBytes = 10

  /** Column layout of a change index inside a DataFrame. */
  val schema: StructType = StructType(Seq(
    StructField("lsn", BinaryType, nullable = false),
    StructField("command_id", IntegerType, nullable = false),
    StructField("seqval", BinaryType, nullable = false),
    StructField("operation", IntegerType, nullable = false)))

  /** Sentinels (`change_index.py:79-80`). */
  val Lowest: ChangeIndex =
    ChangeIndex(Array.fill(LsnBytes)(0.toByte), 0, Array.fill(LsnBytes)(0.toByte), 0)
  val Highest: ChangeIndex =
    ChangeIndex(Array.fill(LsnBytes)(0xff.toByte), Int.MaxValue,
      Array.fill(LsnBytes)(0xff.toByte), 4)

  def compareUnsigned(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val c = java.lang.Integer.compare(a(i) & 0xff, b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(a.length, b.length)
  }

  def toHex(bytes: Array[Byte]): String =
    "0x" + bytes.map(b => f"${b & 0xff}%02x").mkString

  def fromHex(s: String): Array[Byte] = {
    val h = if (s.startsWith("0x") || s.startsWith("0X")) s.drop(2) else s
    h.grouped(2).map(p => Integer.parseInt(p, 16).toByte).toArray
  }

  /** 10-byte big-endian encoding of a non-negative long (test fixtures). */
  def lsnFromLong(v: Long): Array[Byte] = {
    val out = new Array[Byte](LsnBytes)
    var x = v
    var i = LsnBytes - 1
    while (i >= 2) { out(i) = (x & 0xff).toByte; x >>>= 8; i -= 1 }
    out
  }

  /** The strict predecessor in the total (lsn, command_id, seqval,
    * operation) order — the greatest index strictly below `i`. Used by
    * the G5 gap handler: "a row could hide between A and B" is exactly
    * `A < predecessor(B)`, and resuming from `predecessor(B)` makes a
    * strictly-after scan include B itself. */
  def predecessor(i: ChangeIndex): ChangeIndex = {
    require(i != Lowest, "the Lowest sentinel has no predecessor")
    val ffs = Array.fill(LsnBytes)(0xff.toByte)
    if (i.operation > 0) i.copy(operation = i.operation - 1)
    else if (i.seqval.exists(_ != 0))
      ChangeIndex(i.lsn, i.commandId, decrement(i.seqval), Int.MaxValue)
    else if (i.commandId > 0) ChangeIndex(i.lsn, i.commandId - 1, ffs, Int.MaxValue)
    else ChangeIndex(decrement(i.lsn), Int.MaxValue, ffs, Int.MaxValue)
  }

  /** Big-endian byte-array minus one (caller guarantees non-zero). */
  private def decrement(bytes: Array[Byte]): Array[Byte] = {
    val out = bytes.clone()
    var i = out.length - 1
    while (i >= 0) {
      if (out(i) != 0) { out(i) = (out(i) - 1).toByte; return out }
      out(i) = 0xff.toByte
      i -= 1
    }
    sys.error("decrement of all-zero byte array")
  }

  /** The numeric 4-tuple of an index whose lsn/seqval carry the
    * [[lsnFromLong]] encoding (inverse of it; the staged-feed form the
    * DSv2 source's backends compare and bind). */
  def parts(i: ChangeIndex): (Long, Int, Long, Int) =
    (java.nio.ByteBuffer.wrap(i.lsn.drop(2)).getLong, i.commandId,
      java.nio.ByteBuffer.wrap(i.seqval.drop(2)).getLong, i.operation)

  /** The change-index struct column from its four parts; sorting on this
    * column reproduces the reference's total order exactly. */
  def asStruct(lsn: Column, commandId: Column, seqval: Column, operation: Column): Column =
    struct(lsn.as("lsn"), commandId.as("command_id"), seqval.as("seqval"),
      operation.as("operation"))
}
