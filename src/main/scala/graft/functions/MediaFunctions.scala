package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Perceptual-hash kernels for binary media columns.
  *
  * Real perceptual image hashing (aHash/dHash/pHash) downsamples decoded
  * pixels to a tiny grid and emits one bit per cell vs a reference level;
  * the container has no codecs, so [[MediaMath.aHash64]] runs the exact
  * same construction over the raw payload BYTES (64 equal regions ≙ the
  * 8×8 grid, region mean vs global mean ≙ aHash's cell-vs-mean bit) — a
  * deterministic stand-in with the property that matters: small local
  * byte perturbations (a re-encode stub) flip few bits, so variants sit
  * at small Hamming distance. Swapping in a real decoder changes only
  * the byte source, not the banded-join machinery downstream.
  */
object MediaMath {

  /** 64-bit aHash over payload bytes: bit r is set iff the mean of byte
    * region r (the r-th of 64 equal position slices) exceeds the global
    * byte mean — compared exactly via 128-bit integer cross-
    * multiplication (regionSum·n vs totalSum·regionLen), so any engine
    * reproduces the bit pattern bit-for-bit at ANY payload size: the
    * DuckDB oracle cross-multiplies in HUGEINT, and a 64-bit product
    * would wrap near n ≈ 1.5e9 high-valued bytes (255·n²/64 > 2⁶³) —
    * inside the JVM's 2 GiB array ceiling, so the wide compare is load-
    * bearing, not defensive. `perturbStride > 0` emulates a re-encoded
    * variant of the SAME asset: every stride-th byte reads as 'X' (88)
    * — the deterministic stand-in for decode-then-re-encode noise.
    * Empty payloads hash to 0 (callers filter them out BEFORE pairing —
    * see `Multimodal.mediaNearDup`). One O(n) pass, no allocation
    * beyond the 64-slot accumulators. */
  def aHash64(payload: Array[Byte], perturbStride: Int): Long = {
    val n = payload.length
    if (n == 0) return 0L
    val regSum = new Array[Long](64)
    val regLen = new Array[Long](64)
    var total  = 0L
    var i      = 0
    while (i < n) {
      val b =
        if (perturbStride > 0 && i % perturbStride == 0) 88L
        else (payload(i) & 0xFF).toLong
      val r = (i.toLong * 64L / n).toInt
      regSum(r) += b
      regLen(r) += 1L
      total += b
      i += 1
    }
    var sig = 0L
    var r   = 0
    while (r < 64) {
      if (cmpProducts(regSum(r), n.toLong, total, regLen(r)) > 0) sig |= 1L << r
      r += 1
    }
    sig
  }

  /** compare a1·b1 vs a2·b2 exactly in 128 bits (all operands are
    * non-negative byte sums/counts — unsigned low-word compare). */
  private def cmpProducts(a1: Long, b1: Long, a2: Long, b2: Long): Int = {
    val h1 = Math.multiplyHigh(a1, b1)
    val h2 = Math.multiplyHigh(a2, b2)
    if (h1 != h2) java.lang.Long.compare(h1, h2)
    else java.lang.Long.compareUnsigned(a1 * b1, a2 * b2)
  }

  /** DCT-II basis cos((2i+1)·u·π/16) quantized to milli-units — the
    * SHARED integer table of [[pHash63]]: the SQL oracle embeds these
    * 64 literals verbatim (`cosqSqlValues`), so no engine ever calls
    * its own libm cos and the transform is exact integer arithmetic on
    * both sides. Positive scale factors (the DCT's α normalizers)
    * are dropped — the hash keeps only coefficient SIGNS, which they
    * cannot change. */
  val CosQ: Array[Array[Long]] =
    Array.tabulate(8, 8)((u, i) => math.round(math.cos((2 * i + 1) * u * math.Pi / 16) * 1000))

  /** the same table as SQL VALUES rows `(u, i, c)`. */
  def cosqSqlValues: String =
    (for (u <- 0 until 8; i <- 0 until 8) yield s"(${u}, ${i}, ${CosQ(u)(i)})")
      .mkString(", ")

  /** 63-bit pHash (the DCT perceptual hash, Zauner 2010 construction
    * with the sign-threshold variant): payload bytes collapse to the
    * 8×8 grid of region means in integral micros (the aHash64 region
    * slicing — a real decoder would supply luma pixels; only the byte
    * source is stubbed), then an integer 2-D DCT-II over the
    * milli-quantized [[CosQ]] basis; bit (u·8+v − 1) is the SIGN of AC
    * coefficient (u,v), DC excluded. Sign survives any positive
    * normalization, so dropping the α factors is exact, not
    * approximate. Width: |coeff| ≤ 64·10³·10³·255·10⁶ ≈ 1.6·10¹⁶ —
    * inside Long with 500× headroom. Same `perturbStride` re-encode
    * stand-in as [[aHash64]]. One O(n) byte pass + a fixed 4096-term
    * transform, no allocation beyond the 64-slot grids. */
  def pHash63(payload: Array[Byte], perturbStride: Int): Long = {
    val n = payload.length
    if (n == 0) return 0L
    val regSum = new Array[Long](64)
    val regLen = new Array[Long](64)
    var i = 0
    while (i < n) {
      val b =
        if (perturbStride > 0 && i % perturbStride == 0) 88L
        else (payload(i) & 0xFF).toLong
      val r = (i.toLong * 64L / n).toInt
      regSum(r) += b
      regLen(r) += 1L
      i += 1
    }
    val mean = new Array[Long](64) // integral micros; empty region -> 0
    var r = 0
    while (r < 64) {
      if (regLen(r) > 0) mean(r) = regSum(r) * 1000000L / regLen(r)
      r += 1
    }
    var sig = 0L
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        if (u != 0 || v != 0) {
          var coeff = 0L
          var ri = 0
          while (ri < 64) {
            coeff += CosQ(u)(ri / 8) * CosQ(v)(ri % 8) * mean(ri)
            ri += 1
          }
          if (coeff > 0) sig |= 1L << (u * 8 + v - 1)
        }
        v += 1
      }
      u += 1
    }
    sig
  }
}

/** MediaAHash64(binary, perturbStride) -> long, codegen'd via static call. */
case class MediaAHash64(child: Expression, perturbStride: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    MediaMath.aHash64(v.asInstanceOf[Array[Byte]], perturbStride)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaMath.aHash64($c, $perturbStride)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MediaPHash63(binary, perturbStride) -> long, codegen'd via static call. */
case class MediaPHash63(child: Expression, perturbStride: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    MediaMath.pHash63(v.asInstanceOf[Array[Byte]], perturbStride)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaMath.pHash63($c, $perturbStride)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MediaFunctions {

  /** perceptual-hash column over a binary payload; `perturbStride > 0`
    * hashes the deterministic re-encoded variant instead (see
    * [[MediaMath.aHash64]]). */
  def mediaAHash(payload: Column, perturbStride: Int = 0): Column =
    ColumnBridge.column(MediaAHash64(ColumnBridge.expression(payload), perturbStride))

  /** DCT perceptual-hash column (see [[MediaMath.pHash63]]). */
  def mediaPHash(payload: Column, perturbStride: Int = 0): Column =
    ColumnBridge.column(MediaPHash63(ColumnBridge.expression(payload), perturbStride))
}
