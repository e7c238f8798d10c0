package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Space-filling-curve helpers for multi-dimensional data CLUSTERING —
  * the file-layout lever at 100 TB: sorting by a Z-order (Morton) code
  * interleaves the bits of several dimensions, so every written file
  * covers a small hyper-rectangle and min/max footer stats prune scans
  * on ANY of the interleaved dimensions, not just the leading sort key.
  */
object LayoutMath {
  /** Morton interleave of the low 16 bits of two non-negative coords:
    * bit i of x lands at 2i, bit i of y at 2i+1 (y is the higher-order
    * dimension at equal bit index). Pure per-row map, codegen'd. */
  def interleave16(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >>> i) & 1L) << (2 * i)
      z |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Hilbert curve distance of (x, y) on the 32×32 grid — the standard
    * top-down quadrant walk (Hilbert 1891; the xy2d form popularized by
    * Warren's Hacker's Delight / the Wikipedia reference code): at each
    * scale s the quadrant index (3·rx)⊕ry contributes s²·index, then
    * the frame rotates/flips so the child quadrant sees canonical
    * orientation. Flips mask to the low bits (s−1−(v & (s−1))) — bits
    * ≥ s are already consumed, so the masked and full-width forms agree
    * on everything that remains. Unlike Morton order, consecutive
    * Hilbert distances are always 4-adjacent cells (no diagonal jumps),
    * which is why its file min/max boxes are tighter on BOTH probe
    * dimensions. Pure per-row map, codegen'd. */
  def hilbert32(x0: Long, y0: Long): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 16L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - (x & (s - 1))
          y = s - 1 - (y & (s - 1))
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** ZOrderCode(x, y) -> long: 16-bit-per-dim Morton code, codegen'd. */
case class ZOrderCode(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    LayoutMath.interleave16(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.LayoutMath.interleave16($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** HilbertCode(x, y) -> long: Hilbert distance on the 32x32 grid, codegen'd. */
case class HilbertCode(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    LayoutMath.hilbert32(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.LayoutMath.hilbert32($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object LayoutFunctions {
  def zorder(x: Column, y: Column): Column =
    ColumnBridge.column(ZOrderCode(ColumnBridge.expression(x), ColumnBridge.expression(y)))

  def hilbert(x: Column, y: Column): Column =
    ColumnBridge.column(HilbertCode(ColumnBridge.expression(x), ColumnBridge.expression(y)))

  /** The same Hilbert walk as chained ANSI-SQL CTE stages (for the
    * DuckDB oracle): each stage s ∈ {16,8,4,2,1} reads the previous
    * stage's (hx, hy, hd) and emits the updated triple; `carry` lists
    * the pass-through columns. XOR-free: the quadrant index (3·rx)⊕ry
    * is a 4-way CASE, portable to engines where `^` is exponentiation. */
  def hilbertSqlCtes(first: String, carry: Seq[String], order: Int = 5): (String, String) = {
    val stages = (0 until order).map { i =>
      val s = 1L << (order - 1 - i)
      val m = s - 1
      val prev = if (i == 0) first else s"hst${i - 1}"
      val quad =
        s"""CASE WHEN (hx & $s) = 0 AND (hy & $s) = 0 THEN 0
           |     WHEN (hx & $s) = 0 THEN 1
           |     WHEN (hy & $s) = 0 THEN 3 ELSE 2 END""".stripMargin
      val newX =
        s"""CASE WHEN (hy & $s) > 0 THEN hx
           |     WHEN (hx & $s) > 0 THEN $m - (hy & $m) ELSE hy END""".stripMargin
      val newY =
        s"""CASE WHEN (hy & $s) > 0 THEN hy
           |     WHEN (hx & $s) > 0 THEN $m - (hx & $m) ELSE hx END""".stripMargin
      s"""hst$i AS (
         |  SELECT ${carry.map(c => s"$c, ").mkString}
         |         $newX AS hx, $newY AS hy,
         |         hd + ${s * s} * ($quad) AS hd
         |  FROM $prev
         |)""".stripMargin
    }
    (stages.mkString(",\n"), s"hst${order - 1}")
  }

  /** The same Morton code as ANSI SQL over BIGINTs (for the DuckDB
    * oracle): a sum of per-bit shift terms — exact for coords < 2^bits. */
  def zorderSql(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($x >> $i) & 1) << ${2 * i})", s"((($y >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(", " + ", ")")
}
