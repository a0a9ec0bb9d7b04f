package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `bottomk_sample(hash, value, k)` — a deterministic bottom-k-by-hash
  * SAMPLE as a first-class Catalyst aggregate: keeps the values carried
  * by the K smallest distinct hashes seen (hash collisions keep the MIN
  * value — a defined rule, though 60-bit md5 hashes make it moot).
  * Result: the sampled values as an `array<long>` in hash-ascending
  * order (size = min(K, observed distinct hashes)).
  *
  * This is the scale-safe "uniform sample per group" primitive: the
  * naive spelling — `row_number() OVER (PARTITION BY g ORDER BY hash)`
  * then `rn <= K` — sorts EVERY group's full contents on one reducer
  * per group, the exact single-reducer pathology the catalog bans.
  * Bottom-k-by-hash is a semilattice (bottom-k of a union = bottom-k of
  * bottom-ks), so this is a TRUE partial aggregate: executors fold
  * their partitions into K-bounded buffers, the shuffle carries ≤ K
  * (hash, value) pairs per group, and merge is a bounded map-union —
  * the mergeable-sketch contract, but deterministic (md5-ordered), so
  * anything computed from the sample survives the binary oracle gate.
  * Consumed by `sk_sample_quantiles` (sampled order statistics).
  *
  * Buffer: a TreeMap keyed by hash — insertion dedups, `lastKey` gives
  * the eviction candidate; K is sketch-sized, so O(log K) per row is
  * noise next to the md5 itself.
  */
object BottomKSample {
  /** The ONE insertion rule — dedup by hash keeping the MIN value,
    * K-bound by evicting the largest hash — shared by the Catalyst
    * aggregate and the streaming fold
    * ([[graft.streaming.StreamingSampleQuantiles]]) so the two paths
    * cannot drift. */
  def put(buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
      h: Long, v: Long, k: Int): Unit = {
    val existing = buf.get(h)
    if (existing == null || v < existing) buf.put(h, v)
    if (buf.size > k) buf.pollLastEntry()
  }
}

case class BottomKSample(
    hashChild: Expression,
    valueChild: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Long]] {

  require(k > 0, "bottomk_sample: k must be positive")

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Long] =
    new java.util.TreeMap[java.lang.Long, java.lang.Long]()

  private def put(buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
      h: Long, v: Long): Unit = BottomKSample.put(buf, h, v, k)

  override def update(buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
      input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val h = hashChild.eval(input)
    val v = valueChild.eval(input)
    if (h != null && v != null) put(buf, h.asInstanceOf[Long], v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeMap[java.lang.Long, java.lang.Long],
      b2: java.util.TreeMap[java.lang.Long, java.lang.Long]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      put(b1, e.getKey, e.getValue)
    }
    b1
  }

  override def eval(buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    var i = 0
    val it = buf.values().iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 16)
    buf.forEach((h, v) => { bb.putLong(h); bb.putLong(v) })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val m = new java.util.TreeMap[java.lang.Long, java.lang.Long]()
    while (bb.hasRemaining) m.put(bb.getLong(), bb.getLong())
    m
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(hashChild, valueChild)
  override def prettyName: String = "bottomk_sample"

  override def withNewMutableAggBufferOffset(o: Int): BottomKSample =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKSample =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(hashChild = c(0), valueChild = c(1))
}
