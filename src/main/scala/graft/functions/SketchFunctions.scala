package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Distinct-count sketching as a custom Catalyst AGGREGATE — the
  * `TypedImperativeAggregate` extension path (an arbitrary Java object
  * as aggregation buffer with explicit serialize/merge), which is how
  * engine-grade sketches (HLL, theta, quantile) plug into Spark's
  * partial-aggregation machinery: update map-side per partition,
  * serialize compact buffers through the shuffle, merge on the reduce
  * side. Complements the codegen'd scalar expressions (TextFunctions)
  * and the typed `Aggregator`s (Centroids/TopK) — together the three
  * extension APIs the survey's "custom Catalyst work" calls for.
  */
object SketchFunctions {

  /** KMV (k-minimum-values) buffer: the k smallest distinct 64-bit
    * hashes of the values seen, in unsigned order. Below k distinct
    * values the sketch IS the exact distinct count; above, the k-th
    * smallest hash estimates the density of a uniform [0,2^64) sample:
    * E = (k-1) / R where R is the k-th value normalized to [0,1).
    * Everything is a pure function of the input VALUE SET — insertion
    * order, partitioning, and merge shape cannot change the result, so
    * the aggregate is deterministic under any plan.
    */
  final class KMVBuffer(val k: Int) {
    // unsigned-ordered set of the k smallest hashes
    val heap = new java.util.TreeSet[java.lang.Long](
      (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b))
    def insert(h: Long): Unit = {
      if (heap.size() < k) { heap.add(h); () }
      else if (java.lang.Long.compareUnsigned(h, heap.last()) < 0) {
        if (heap.add(h)) heap.pollLast()
        ()
      }
    }
    def mergeIn(o: KMVBuffer): Unit = {
      val it = o.heap.iterator()
      while (it.hasNext) insert(it.next())
    }
    def estimate: Long =
      if (heap.size() < k) heap.size().toLong
      else {
        // R = kth smallest as a fraction of the full unsigned 64-bit range
        val kth = heap.last().longValue()
        val r   = (kth >>> 11).toDouble / (1L << 53).toDouble // exact: top 53 bits
        math.round((k - 1).toDouble / r)
      }
  }

  /** `kmv_distinct(col, k)` — approximate COUNT(DISTINCT col) in O(k)
    * memory per group. Input values are hashed with the same xxhash64
    * (seed 42) family as the MinHash/SimHash kernels. Null inputs are
    * ignored, matching COUNT(DISTINCT). */
  case class KMVDistinct(
      child: Expression,
      k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[KMVBuffer] {

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = LongType

    override def createAggregationBuffer(): KMVBuffer = new KMVBuffer(k)

    override def update(buf: KMVBuffer, input: InternalRow): KMVBuffer = {
      val v = child.eval(input)
      if (v != null) buf.insert(XxHash64Function.hash(v, child.dataType, 42L))
      buf
    }

    override def merge(buf: KMVBuffer, other: KMVBuffer): KMVBuffer = {
      buf.mergeIn(other); buf
    }

    override def eval(buf: KMVBuffer): Any = buf.estimate

    override def serialize(buf: KMVBuffer): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 8 * buf.heap.size())
      bb.putInt(buf.heap.size())
      val it = buf.heap.iterator()
      while (it.hasNext) bb.putLong(it.next())
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): KMVBuffer = {
      val bb  = ByteBuffer.wrap(bytes)
      val n   = bb.getInt
      val buf = new KMVBuffer(k)
      var i   = 0
      while (i < n) { buf.heap.add(bb.getLong); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): KMVDistinct =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KMVDistinct =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  }

  /** Column form of the KMV distinct sketch aggregate. */
  def kmvDistinct(col: Column, k: Int): Column =
    ColumnBridge.column(
      KMVDistinct(ColumnBridge.expression(col), k).toAggregateExpression())
}
