package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static text kernels callable from generated code (see VectorMath). */
object TextMath {
  /** 64-bit SimHash over an array of tokens: each token hashed with
    * xxhash64 (same function as Spark's `xxhash64`, seed 42); bit b of
    * the result is 1 iff the sum of ±1 votes from all tokens' bit b is
    * positive. Single pass, no shuffle — a pure per-row map.
    */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n      = tokens.numElements()
    var i      = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = XxHash64Function.hash(tokens.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b   = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** MinHash signature: k minimums of per-shingle hashes, hash i being
    * xxhash64 seeded with i (independent-enough hash family). Per-row,
    * map-side — the signature costs k*|shingles| hashes but no shuffle.
    */
  def minhashSignature(shingles: ArrayData, k: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i)
        var j = 0
        while (j < k) {
          val h = XxHash64Function.hash(s, StringType, j.toLong)
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    ArrayData.toArrayData(sig)
  }
}

/** SimHash64(array<string>) -> long, codegen'd via static call. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    TextMath.simhash64(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextMath.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHashSig(array<string>, k) -> array<long>, codegen'd via static call. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    TextMath.minhashSignature(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextMath.minhashSignature($c, $k)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextFunctions {

  /** whitespace tokens (single-space split, reference-style; empties kept
    * out by the caller when needed). */
  def tokens(text: Column): Column = split(text, " ")

  /** n-word shingles, joined by single spaces; empty array if the doc has
    * fewer than n tokens. */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast(ArrayType(StringType)))

  /** character n-gram shingles of a string. */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) >= n,
      transform(sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))
      .otherwise(array().cast(ArrayType(StringType)))

  def simhash(toks: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(toks)))

  def minhashSig(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), k))

  /** exact Jaccard over the *sets* of two arrays (duplicates ignored). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    val uni   = size(array_union(a, b)).cast(DoubleType)
    when(uni === 0.0, 0.0).otherwise(inter / uni)
  }

  /** polynomial rolling hash over the characters of a string:
    * fold(acc*31 + ascii(char)) mod 1e9+7 — deterministic document
    * fingerprint expressible identically in ANSI SQL (DuckDB oracle).
    */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(text)),
        i => ascii(text.substr(i, lit(1))).cast(LongType)),
      lit(0L),
      (acc, x) => (acc * 31L + x) % 1000000007L)

  /** hamming distance between two 64-bit hashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
