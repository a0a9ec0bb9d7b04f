package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.ChangeIndex

/** Ordering/codec tests for the change-index model (SURVEY §1.1, F1, F2)
  * against the reference's `ChangeIndex` semantics
  * (`cdc_kafka/change_index.py:8-80`). */
class ChangeIndexSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(7)
  private def randomIdx(): ChangeIndex = ChangeIndex(
    ChangeIndex.lsnFromLong(rng.nextLong(1L << 40)), rng.nextInt(1000),
    ChangeIndex.lsnFromLong(rng.nextLong(1L << 40)), rng.nextInt(5))

  test("ordering is lexicographic over (lsn, commandId, seqval, operation)") {
    for (_ <- 1 to 1000) {
      val a = randomIdx(); val b = if (rng.nextBoolean()) randomIdx() else a.copy()
      val model = {
        val c1 = BigInt(1, a.lsn).compare(BigInt(1, b.lsn))
        if (c1 != 0) c1 else {
          val c2 = a.commandId.compare(b.commandId)
          if (c2 != 0) c2 else {
            val c3 = BigInt(1, a.seqval).compare(BigInt(1, b.seqval))
            if (c3 != 0) c3 else a.operation.compare(b.operation)
          }
        }
      }
      assert(math.signum(a.compare(b)) == math.signum(model))
    }
  }

  test("unsigned byte comparison: 0x80 > 0x7f (no sign confusion)") {
    val lo = ChangeIndex(ChangeIndex.lsnFromLong(0x7fL), 0, ChangeIndex.lsnFromLong(0), 0)
    val hi = ChangeIndex(ChangeIndex.lsnFromLong(0x80L), 0, ChangeIndex.lsnFromLong(0), 0)
    assert(lo < hi)
  }

  test("sentinels bound everything") {
    for (_ <- 1 to 500) {
      val a = randomIdx()
      assert(ChangeIndex.Lowest <= a)
      assert(a <= ChangeIndex.Highest)
    }
  }

  test("hex roundtrip (F1)") {
    for (_ <- 1 to 500) {
      val v = rng.nextLong(Long.MaxValue)
      val bytes = ChangeIndex.lsnFromLong(v)
      val hex = ChangeIndex.toHex(bytes)
      assert(hex.startsWith("0x") && hex.length == 22)
      assert(java.util.Arrays.equals(ChangeIndex.fromHex(hex), bytes))
    }
  }

  test("predecessor is the greatest index strictly below (G5 gap arithmetic)") {
    def idx(l: Long, c: Int, s: Long, o: Int) =
      ChangeIndex(ChangeIndex.lsnFromLong(l), c, ChangeIndex.lsnFromLong(s), o)
    // Simple op decrement.
    assert(ChangeIndex.predecessor(idx(5, 1, 9, 2)) === idx(5, 1, 9, 1))
    // Borrow through operation into seqval.
    val p1 = ChangeIndex.predecessor(idx(5, 1, 9, 0))
    assert(p1.commandId === 1 && p1 < idx(5, 1, 9, 0))
    assert(java.nio.ByteBuffer.wrap(p1.seqval.drop(2)).getLong === 8L)
    // Borrow through seqval into commandId, and into lsn.
    val p2 = ChangeIndex.predecessor(idx(5, 1, 0, 0))
    assert(p2.commandId === 0 && p2 < idx(5, 1, 0, 0))
    val p3 = ChangeIndex.predecessor(idx(5, 0, 0, 0))
    assert(java.nio.ByteBuffer.wrap(p3.lsn.drop(2)).getLong === 4L)
    assert(p3 < idx(5, 0, 0, 0))
    // Strictness + "nothing fits between A and pred(B)" at the op level.
    val b = idx(7, 0, 7, 1)
    val p = ChangeIndex.predecessor(b)
    assert(p < b)
    assert(!(idx(7, 0, 7, 0) < p)) // the immediate predecessor: no gap flagged
    // Lowest has none.
    intercept[IllegalArgumentException](ChangeIndex.predecessor(ChangeIndex.Lowest))
  }

  test("heartbeat sentinel recognition (change_index.py:74-76)") {
    val hb = ChangeIndex(ChangeIndex.lsnFromLong(123), 0,
      Array.fill(10)(0xff.toByte), 4)
    assert(hb.isProbablyHeartbeat)
    assert(!hb.copy(operation = 2).isProbablyHeartbeat)
    assert(!hb.copy(commandId = 1).isProbablyHeartbeat)
  }
}
