package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `kmv_bottomk(hash, k)` — the KMV / bottom-k distinct sketch as a
  * first-class Catalyst aggregate: keeps the K smallest DISTINCT long
  * hashes seen. Result: the sketch contents as an ascending `array<long>`
  * (size = min(K, observed distinct hashes); `element_at(arr, -1)` is the
  * Kth minimum that feeds the (K-1)/u_K estimator — see
  * `sk_kmv_distinct`).
  *
  * Bottom-k is a semilattice (bottom-k ∘ union = bottom-k ∘ bottom-ks),
  * so this is a TRUE partial aggregate: executors fold their partitions
  * into K-bounded buffers, the shuffle carries ≤ K longs per group
  * (serialized fixed-width), and merge is a bounded set-union — the
  * mergeable-sketch contract HLL offers, but deterministic, so results
  * survive the binary oracle gate. The buffer is a TreeSet: insertion
  * dedups (KMV counts DISTINCT values) and keeps the max at hand for the
  * K-bound eviction; K is sketch-sized (≤ a few thousand), so O(log K)
  * per row is noise next to the hash itself.
  */
case class KmvBottomK(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 0, "kmv_bottomk: k must be positive")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(v.asInstanceOf[Long])
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) {
      b1.add(it.next())
      if (b1.size > k) b1.pollLast()
    }
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    // Iterate directly: going through a Scala Set wrapper would drop the
    // TreeSet's ascending order.
    val arr = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 8)
    buf.forEach(l => bb.putLong(l))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new java.util.TreeSet[java.lang.Long]()
    while (bb.hasRemaining) s.add(bb.getLong())
    s
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kmv_bottomk"

  override def withNewMutableAggBufferOffset(o: Int): KmvBottomK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvBottomK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))
}
