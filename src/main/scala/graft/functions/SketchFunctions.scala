package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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

    override def serialize(buf: KMVBuffer): Array[Byte] = kmvToBytes(buf)
    override def deserialize(bytes: Array[Byte]): KMVBuffer = kmvFromBytes(bytes, k)

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

  /** Shared KMV wire format (count + unsigned-sorted hashes) — the same
    * bytes the aggregate ships through Spark's partial-agg shuffle. A
    * sketch EMITTED by [[KMVSketch]] and later consumed by [[KMVMerge]]
    * therefore behaves exactly like a shuffled partial buffer: persisting
    * sketches to a table and merging them later is the same computation
    * as never persisting them at all. */
  private[functions] def kmvToBytes(buf: KMVBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.heap.size())
    bb.putInt(buf.heap.size())
    val it = buf.heap.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  private[functions] def kmvFromBytes(bytes: Array[Byte], k: Int): KMVBuffer = {
    val bb  = ByteBuffer.wrap(bytes)
    val n   = bb.getInt
    val buf = new KMVBuffer(k)
    var i   = 0
    while (i < n) { buf.insert(bb.getLong); i += 1 }
    buf
  }

  /** Set-operation estimates from two serialized KMV sketches — the
    * join-planning primitive: (estA, estB, estUnion, estIntersection).
    * Union = the merged sketch's estimate. Intersection uses the
    * standard K-min-values ρ-estimator (Beyer et al. 2007): over the k
    * smallest hashes of the UNION, ρ = the fraction present in BOTH
    * input sketches, and |A∩B| ≈ ρ·|A∪B| — lower variance than
    * inclusion-exclusion of three noisy estimates. When the union
    * carries fewer than k hashes the sketches ARE the exact hash sets
    * and the counts are exact. Deterministic: a pure function of the
    * two byte arrays. */
  def kmvSetEstimates(a: Array[Byte], b: Array[Byte], k: Int): (Long, Long, Long, Long) = {
    val bufA = kmvFromBytes(a, k)
    val bufB = kmvFromBytes(b, k)
    val u    = kmvFromBytes(a, k)
    u.mergeIn(bufB)
    val estU = u.estimate
    var inBoth = 0
    val it = u.heap.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (bufA.heap.contains(h) && bufB.heap.contains(h)) inBoth += 1
    }
    val estI =
      if (u.heap.size() < k) inBoth.toLong // exact regime
      else math.round(inBoth.toDouble / u.heap.size() * estU)
    (bufA.estimate, bufB.estimate, estU, estI)
  }

  /** `kmv_sketch(col, k)` — the PERSISTABLE form of [[KMVDistinct]]:
    * same buffer, same update/merge, but eval returns the serialized
    * sketch (BINARY) instead of collapsing it to an estimate. This is
    * what makes distinct-count rollup cubes possible at 100 TB: write
    * one O(k) sketch per fine-grained cell once, then answer any
    * coarser grouping by merging stored sketches ([[KMVMerge]]) without
    * ever rescanning the fact table — the re-aggregatable-summary
    * pipeline (Agarwal et al., "Mergeable Summaries", PODS'12) that
    * `approx_count_distinct` cannot express because its sketch lives
    * and dies inside a single aggregation. */
  case class KMVSketch(
      child: Expression,
      k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[KMVBuffer] {

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def createAggregationBuffer(): KMVBuffer = new KMVBuffer(k)

    override def update(buf: KMVBuffer, input: InternalRow): KMVBuffer = {
      val v = child.eval(input)
      if (v != null) buf.insert(XxHash64Function.hash(v, child.dataType, 42L))
      buf
    }

    override def merge(buf: KMVBuffer, other: KMVBuffer): KMVBuffer = {
      buf.mergeIn(other); buf
    }

    override def eval(buf: KMVBuffer): Any = kmvToBytes(buf)

    override def serialize(buf: KMVBuffer): Array[Byte] = kmvToBytes(buf)
    override def deserialize(bytes: Array[Byte]): KMVBuffer = kmvFromBytes(bytes, k)

    override def withNewMutableAggBufferOffset(o: Int): KMVSketch =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KMVSketch =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  }

  def kmvSketch(col: Column, k: Int): Column =
    ColumnBridge.column(
      KMVSketch(ColumnBridge.expression(col), k).toAggregateExpression())

  /** `kmv_merge(sketchCol, k)` — merges STORED [[KMVSketch]] binaries
    * back into one estimate. Update deserializes each input sketch and
    * set-merges it; because KMV is a pure function of the input value
    * set and merge keeps the k unsigned-smallest hashes, the merged
    * estimate is BIT-IDENTICAL to a direct [[KMVDistinct]] over the
    * original rows (pinned in SketchSpec and the sketch_rollup verdict
    * column), under any partitioning, persist granularity, or merge
    * order. */
  case class KMVMerge(
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
      if (v != null) buf.mergeIn(kmvFromBytes(v.asInstanceOf[Array[Byte]], k))
      buf
    }

    override def merge(buf: KMVBuffer, other: KMVBuffer): KMVBuffer = {
      buf.mergeIn(other); buf
    }

    override def eval(buf: KMVBuffer): Any = buf.estimate

    override def serialize(buf: KMVBuffer): Array[Byte] = kmvToBytes(buf)
    override def deserialize(bytes: Array[Byte]): KMVBuffer = kmvFromBytes(bytes, k)

    override def withNewMutableAggBufferOffset(o: Int): KMVMerge =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KMVMerge =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  }

  def kmvMerge(col: Column, k: Int): Column =
    ColumnBridge.column(
      KMVMerge(ColumnBridge.expression(col), k).toAggregateExpression())

  /** Misra-Gries heavy-hitters buffer: at most `capacity` (item →
    * counter) pairs. Update: resident item increments; a new item takes
    * a free slot, else EVERY counter decrements by one (zeros evicted) —
    * each miss burns capacity+1 total count, so any counter underestimates
    * its item's true frequency by at most N/(capacity+1). Merge (the
    * mergeable-summaries form, Agarwal et al., PODS'12): sum counters
    * pairwise, then subtract the (capacity+1)-th largest counter from
    * all and drop the non-positive — the merged bound still holds over
    * the COMBINED stream, so map-side partials through Spark's shuffle
    * lose nothing. Consequences used by the query/spec layers: every
    * item with true frequency > N/(capacity+1) is guaranteed resident,
    * and when the domain has ≤ capacity distinct items no decrement or
    * trim ever fires — the sketch is provably EXACT and merge-shape
    * invariant (the same below-k regime the KMV query leans on). */
  final class MGBuffer(val capacity: Int) {
    val counts = new java.util.HashMap[String, java.lang.Long]()
    def insert(v: String): Unit = {
      val cur = counts.get(v)
      if (cur != null) { counts.put(v, cur + 1L); () }
      else if (counts.size() < capacity) { counts.put(v, 1L); () }
      else {
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    def mergeIn(o: MGBuffer): Unit = {
      val it = o.counts.entrySet().iterator()
      while (it.hasNext) {
        val e   = it.next()
        val cur = counts.get(e.getKey)
        counts.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
      }
      if (counts.size() > capacity) {
        // subtract the (capacity+1)-th largest counter from everything
        val vals = new java.util.ArrayList[java.lang.Long](counts.values())
        java.util.Collections.sort(vals, java.util.Collections.reverseOrder())
        val d  = vals.get(capacity).longValue()
        val it2 = counts.entrySet().iterator()
        while (it2.hasNext) {
          val e = it2.next()
          if (e.getValue <= d) it2.remove() else e.setValue(e.getValue - d)
        }
      }
    }
  }

  /** `mg_topk(col, capacity)` — Misra-Gries heavy-hitters summary as a
    * map<string, long> of resident items to their (under-)counts, in
    * O(capacity) memory per group through Spark's partial-aggregation
    * machinery. Null inputs are ignored. String-typed input only (the
    * summary must carry the item values themselves). */
  case class MGTopK(
      child: Expression,
      capacity: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[MGBuffer] {

    require(capacity > 0, "mg_topk capacity must be positive")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)

    override def createAggregationBuffer(): MGBuffer = new MGBuffer(capacity)

    override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
      val v = child.eval(input)
      if (v != null) buf.insert(v.toString)
      buf
    }

    override def merge(buf: MGBuffer, other: MGBuffer): MGBuffer = {
      buf.mergeIn(other); buf
    }

    override def eval(buf: MGBuffer): Any = {
      val n    = buf.counts.size()
      val keys = new Array[Any](n)
      val vals = new Array[Any](n)
      val it   = buf.counts.entrySet().iterator()
      var i    = 0
      while (it.hasNext) {
        val e = it.next()
        keys(i) = org.apache.spark.unsafe.types.UTF8String.fromString(e.getKey)
        vals(i) = e.getValue.longValue()
        i += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayBasedMapData(keys, vals)
    }

    override def serialize(buf: MGBuffer): Array[Byte] = {
      var bytes = 4
      val it0 = buf.counts.entrySet().iterator()
      val entries = new java.util.ArrayList[(Array[Byte], Long)](buf.counts.size())
      while (it0.hasNext) {
        val e = it0.next()
        val b = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        entries.add((b, e.getValue.longValue()))
        bytes += 4 + b.length + 8
      }
      val bb = ByteBuffer.allocate(bytes)
      bb.putInt(entries.size())
      var i = 0
      while (i < entries.size()) {
        val (b, c) = entries.get(i)
        bb.putInt(b.length); bb.put(b); bb.putLong(c)
        i += 1
      }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): MGBuffer = {
      val bb  = ByteBuffer.wrap(bytes)
      val n   = bb.getInt
      val buf = new MGBuffer(capacity)
      var i   = 0
      while (i < n) {
        val len = bb.getInt
        val b   = new Array[Byte](len)
        bb.get(b)
        buf.counts.put(new String(b, java.nio.charset.StandardCharsets.UTF_8), bb.getLong)
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): MGTopK =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MGTopK =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  }

  /** Column form of the Misra-Gries heavy-hitters aggregate. */
  def mgTopK(col: Column, capacity: Int): Column =
    ColumnBridge.column(
      MGTopK(ColumnBridge.expression(col), capacity).toAggregateExpression())

  /** Count-Min buffer: depth × width counter matrix (Cormode &
    * Muthukrishnan '05). Update adds 1 to one cell per row (cell =
    * xxhash64(value, seed=row) mod width); merge is elementwise
    * addition, so partial sketches combine losslessly through Spark's
    * shuffle and the final matrix is a pure function of the input
    * MULTISET — partitioning and merge shape cannot change it. A point
    * query takes the min over the value's depth cells: never below the
    * true count (every occurrence lands in all its cells), above it
    * only by colliding mass, and each row's total collision mass is
    * bounded by N − count(v), with the min over independent rows
    * concentrating near count(v) + N/width. */
  final class CMSBuffer(val depth: Int, val width: Int) {
    val cells = new Array[Long](depth * width)
    var total = 0L
    def insert(h0: Long): Unit = {
      total += 1L
      var d = 0
      while (d < depth) {
        // derive the d-th row's hash by re-hashing the value hash with
        // the row index as seed — pairwise-independent enough for CMS
        val h   = XxHash64Function.hash(h0, LongType, d.toLong)
        val idx = (((h % width) + width) % width).toInt
        cells(d * width + idx) += 1L
        d += 1
      }
    }
    def mergeIn(o: CMSBuffer): Unit = {
      total += o.total
      var i = 0
      while (i < cells.length) { cells(i) += o.cells(i); i += 1 }
    }
    def pointQuery(h0: Long): Long = {
      var min = Long.MaxValue
      var d   = 0
      while (d < depth) {
        val h   = XxHash64Function.hash(h0, LongType, d.toLong)
        val idx = (((h % width) + width) % width).toInt
        val c   = cells(d * width + idx)
        if (c < min) min = c
        d += 1
      }
      min
    }
  }

  /** `cms_freq(col, targets, depth, width)` — Count-Min frequency
    * estimates for a fixed list of target values, as a
    * map<string, long> of target → estimated count, in O(depth·width)
    * memory per group. The estimate is ≥ the true frequency always,
    * and ≤ true + total·depth/width in the fixture regimes the query
    * layer verifies. Null inputs are ignored (they are not counted and
    * cannot be targets). String-typed input. */
  case class CMSFreq(
      child: Expression,
      targets: Seq[String],
      depth: Int,
      width: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[CMSBuffer] {

    require(depth > 0 && width > 0, "cms_freq depth and width must be positive")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)

    override def createAggregationBuffer(): CMSBuffer = new CMSBuffer(depth, width)

    private def valueHash(s: String): Long =
      XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), StringType, 42L)

    override def update(buf: CMSBuffer, input: InternalRow): CMSBuffer = {
      val v = child.eval(input)
      if (v != null) buf.insert(XxHash64Function.hash(v, child.dataType, 42L))
      buf
    }

    override def merge(buf: CMSBuffer, other: CMSBuffer): CMSBuffer = {
      buf.mergeIn(other); buf
    }

    override def eval(buf: CMSBuffer): Any = {
      val n    = targets.size
      val keys = new Array[Any](n)
      val vals = new Array[Any](n)
      var i    = 0
      while (i < n) {
        keys(i) = org.apache.spark.unsafe.types.UTF8String.fromString(targets(i))
        vals(i) = buf.pointQuery(valueHash(targets(i)))
        i += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayBasedMapData(keys, vals)
    }

    override def serialize(buf: CMSBuffer): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + 8 * buf.cells.length)
      bb.putLong(buf.total)
      var i = 0
      while (i < buf.cells.length) { bb.putLong(buf.cells(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): CMSBuffer = {
      val bb  = ByteBuffer.wrap(bytes)
      val buf = new CMSBuffer(depth, width)
      buf.total = bb.getLong
      var i = 0
      while (i < buf.cells.length) { buf.cells(i) = bb.getLong; i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): CMSFreq =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CMSFreq =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  }

  /** Column form of the Count-Min frequency aggregate. */
  def cmsFreq(col: Column, targets: Seq[String], depth: Int, width: Int): Column =
    ColumnBridge.column(
      CMSFreq(ColumnBridge.expression(col), targets, depth, width).toAggregateExpression())

  /** Bloom-filter buffer: an mBits-bit bitmap; insert sets kHashes bit
    * positions derived from the value hash (position i = xxhash64 of the
    * value hash reseeded with i, mod mBits — the CMS row-derivation
    * scheme); merge is bitwise OR, so partial filters combine losslessly
    * through Spark's shuffle and the final bitmap is a pure function of
    * the input value SET. Membership: all k bits set. A value that was
    * inserted can NEVER probe negative (its bits are set and OR never
    * clears); an absent value probes positive only when all k of its
    * positions collide — probability ≈ (1 − e^(−k·n/m))^k. */
  final class BloomBuffer(val mBits: Int, val kHashes: Int) {
    val bits = new Array[Byte](mBits >> 3)
    def insert(h0: Long): Unit = {
      var i = 0
      while (i < kHashes) {
        val p = BloomMath.bitPos(h0, i, mBits)
        bits(p >> 3) = (bits(p >> 3) | (1 << (p & 7))).toByte
        i += 1
      }
    }
    def mergeIn(o: BloomBuffer): Unit = {
      var i = 0
      while (i < bits.length) { bits(i) = (bits(i) | o.bits(i)).toByte; i += 1 }
    }
  }

  /** `bloom_agg(col, mBits, kHashes)` — Bloom-filter membership sketch
    * as a BINARY bitmap, in O(mBits/8) memory per group through Spark's
    * partial-aggregation machinery (update map-side, OR-merge through
    * the shuffle). Null inputs are ignored. Probe the result with
    * [[BloomContains]] over `xxhash64(value)` (the same seed-42 hash
    * family `update` uses). */
  case class BloomAgg(
      child: Expression,
      mBits: Int,
      kHashes: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[BloomBuffer] {

    require(mBits > 0 && (mBits & 63) == 0, "bloom mBits must be a positive multiple of 64")
    require(kHashes > 0, "bloom kHashes must be positive")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def createAggregationBuffer(): BloomBuffer = new BloomBuffer(mBits, kHashes)

    override def update(buf: BloomBuffer, input: InternalRow): BloomBuffer = {
      val v = child.eval(input)
      if (v != null) buf.insert(XxHash64Function.hash(v, child.dataType, 42L))
      buf
    }

    override def merge(buf: BloomBuffer, other: BloomBuffer): BloomBuffer = {
      buf.mergeIn(other); buf
    }

    override def eval(buf: BloomBuffer): Any = buf.bits.clone()

    override def serialize(buf: BloomBuffer): Array[Byte] = buf.bits

    override def deserialize(bytes: Array[Byte]): BloomBuffer = {
      val buf = new BloomBuffer(mBits, kHashes)
      System.arraycopy(bytes, 0, buf.bits, 0, bytes.length)
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BloomAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  }

  /** Column form of the Bloom-filter aggregate. */
  def bloomAgg(col: Column, mBits: Int, kHashes: Int): Column =
    ColumnBridge.column(
      BloomAgg(ColumnBridge.expression(col), mBits, kHashes).toAggregateExpression())

  /** Column form of the Bloom membership probe: `bloom` is the BINARY
    * bitmap from [[bloomAgg]], `hash` is `xxhash64(value)` of the probed
    * value (same column type as the aggregated one, so the hash families
    * line up). */
  def bloomContains(bloom: Column, hash: Column, kHashes: Int): Column =
    ColumnBridge.column(
      BloomContains(ColumnBridge.expression(bloom), ColumnBridge.expression(hash), kHashes))
}

/** Codegen'd Bloom membership probe: (binary bitmap, xxhash64 value hash)
  * -> boolean. `kHashes` is a plan-time constant baked into the generated
  * call (the TopCentroidIdxs convention). The bitmap side is typically a
  * broadcast 1-row aggregate, so the probe runs map-side in whole-stage
  * codegen over the (arbitrarily large) probe table. */
case class BloomContains(left: Expression, right: Expression, kHashes: Int)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(bloom: Any, hash: Any): Any =
    BloomMath.contains(bloom.asInstanceOf[Array[Byte]], hash.asInstanceOf[Long], kHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.BloomMath.contains($a, $b, $kHashes)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Static Bloom kernels — public static methods so whole-stage-codegen'd
  * Java calls them directly (the VectorMath convention). */
object BloomMath {
  import org.apache.spark.sql.catalyst.expressions.XxHash64Function

  /** bit position i of value-hash h0 in an mBits-bit filter. */
  def bitPos(h0: Long, i: Int, mBits: Int): Int = {
    val h = XxHash64Function.hash(h0, LongType, i.toLong)
    (((h % mBits) + mBits) % mBits).toInt
  }

  /** all k positions of h0 set? */
  def contains(bits: Array[Byte], h0: Long, kHashes: Int): Boolean = {
    val mBits = bits.length << 3
    var i = 0
    while (i < kHashes) {
      val p = bitPos(h0, i, mBits)
      if ((bits(p >> 3) & (1 << (p & 7))) == 0) return false
      i += 1
    }
    true
  }
}
