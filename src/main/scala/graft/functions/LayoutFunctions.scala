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

object LayoutFunctions {
  def zorder(x: Column, y: Column): Column =
    ColumnBridge.column(ZOrderCode(ColumnBridge.expression(x), ColumnBridge.expression(y)))

  /** The same Morton code as ANSI SQL over BIGINTs (for the DuckDB
    * oracle): a sum of per-bit shift terms — exact for coords < 2^bits. */
  def zorderSql(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($x >> $i) & 1) << ${2 * i})", s"((($y >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(", " + ", ")")
}
