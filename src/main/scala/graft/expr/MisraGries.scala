package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `mg_candidates(word, k)` — the Misra–Gries frequent-items summary as a
  * first-class Catalyst aggregate: keeps at most K counters and returns
  * the surviving items as an `array<string>` CANDIDATE set.
  *
  * Guarantee (Misra & Gries 1982): after one pass with K counters, every
  * item whose true count exceeds n/K is present in the summary. The
  * summaries are MERGEABLE with the same bound (Agarwal et al., PODS'12:
  * combine counters, then subtract the (K+1)-th largest count from all
  * and drop non-positives), so this is a true partial aggregate: each
  * executor folds its partitions into a K-bounded buffer and the shuffle
  * carries ≤ K (item, count) entries per group — the whole point at
  * 100 TB, where a full `GROUP BY word` shuffles the entire vocabulary
  * (billions of grams) to find a few hundred heavy hitters.
  *
  * The summary's counts are approximate and the surviving SET depends on
  * fold order, so the aggregate deliberately exposes only the candidate
  * items, not counts. Exactness comes from the caller's second pass
  * (`text_heavy_hitters`): recount ONLY the candidates exactly and filter
  * by the exact threshold — any threshold ≥ n/K makes recall total, so
  * the final output is deterministic and engine-exact even though the
  * intermediate summary is not.
  */
/** The Misra–Gries observation step, shared verbatim by the batch
  * aggregate below and the streaming state fold
  * ([[graft.streaming.StreamingHeavyHitters]]) so the two paths cannot
  * drift: increment a live counter, insert while there is room, else
  * decrement every counter (each such pass cancels K prior increments —
  * amortized O(1) per row). */
object MisraGries {
  def observe[T <: AnyRef](buf: java.util.HashMap[T, java.lang.Long],
      item: T, k: Int, intern: T => T): Unit = {
    val cur = buf.get(item)
    if (cur != null) buf.put(item, java.lang.Long.valueOf(cur + 1L))
    else if (buf.size < k) buf.put(intern(item), java.lang.Long.valueOf(1L))
    else {
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove()
        else e.setValue(java.lang.Long.valueOf(e.getValue - 1L))
      }
    }
  }
}

case class MisraGriesCandidates(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, java.lang.Long]] {

  require(k > 0, "mg_candidates: k must be positive")

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, java.lang.Long] =
    new java.util.HashMap[UTF8String, java.lang.Long]()

  override def update(buf: java.util.HashMap[UTF8String, java.lang.Long],
      input: InternalRow): java.util.HashMap[UTF8String, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      // intern = clone: eval may reuse its backing buffer.
      MisraGries.observe(buf, v.asInstanceOf[UTF8String], k, (s: UTF8String) => s.clone())
    }
    buf
  }

  override def merge(b1: java.util.HashMap[UTF8String, java.lang.Long],
      b2: java.util.HashMap[UTF8String, java.lang.Long]): java.util.HashMap[UTF8String, java.lang.Long] = {
    b2.forEach { (s, c) =>
      val cur = b1.get(s)
      b1.put(s, if (cur == null) c else java.lang.Long.valueOf(cur + c))
    }
    if (b1.size > k) {
      // Subtract the (K+1)-th largest count from every counter; at most
      // K survive and the n/K error bound is preserved (Agarwal et al.).
      val counts = new Array[Long](b1.size)
      var i = 0
      val vit = b1.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(b1.size - k - 1) // (K+1)-th largest
      val it = b1.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= cut) it.remove() else e.setValue(java.lang.Long.valueOf(e.getValue - cut))
      }
    }
    b1
  }

  override def eval(buf: java.util.HashMap[UTF8String, java.lang.Long]): Any = {
    val arr = new Array[AnyRef](buf.size)
    var i = 0
    val it = buf.keySet().iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.HashMap[UTF8String, java.lang.Long]): Array[Byte] = {
    var bytes = 4
    val sit = buf.entrySet().iterator()
    while (sit.hasNext) { bytes += 12 + sit.next().getKey.numBytes() }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    buf.forEach { (s, c) =>
      val b = s.getBytes
      bb.putInt(b.length)
      bb.put(b)
      bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.HashMap[UTF8String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      m.put(UTF8String.fromBytes(b), java.lang.Long.valueOf(bb.getLong))
      i += 1
    }
    m
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "mg_candidates"

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesCandidates =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesCandidates =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))
}
