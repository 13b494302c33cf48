package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Hilbert-curve xy→d index over two pre-normalized grid coordinates in
  * `[0, 2^bits)`. The curve beats Morton for layout locality: consecutive
  * indices are ALWAYS grid-adjacent (ScaleSpec proves bijection + unit-step
  * adjacency exhaustively), so Hilbert-ordered files carry tighter zone maps
  * on both clustered columns.
  *
  * A Column-algebra formulation of the quadrant-rotation recurrence is
  * exponential in `bits` (each unrolled step references x and y several
  * times, and projection collapsing re-inlines the duplication), which is
  * why this is a native expression: the loop is O(bits) in both the
  * interpreted path and the generated code, and it participates in
  * whole-stage codegen so the layout computation stays inside the scan
  * stage.
  */
case class HilbertDExpr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"hilbert_d expects (bigint, bigint), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "hilbert_d"

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    val n = 1L << bits
    var d = 0L
    var k = bits - 1
    while (k >= 0) {
      val s = 1L << k
      val rx = (x >> k) & 1L
      val ry = (y >> k) & 1L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        val nx = if (rx == 1L) (n - 1) - y else y
        val ny = if (rx == 1L) (n - 1) - x else x
        x = nx; y = ny
      }
      k -= 1
    }
    d
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xIn, yIn) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val k = ctx.freshName("hk")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      val n = 1L << bits
      s"""
         |long $x = $xIn; long $y = $yIn; long $d = 0L;
         |for (int $k = ${bits - 1}; $k >= 0; $k--) {
         |  long $s = 1L << $k;
         |  long $rx = ($x >> $k) & 1L;
         |  long $ry = ($y >> $k) & 1L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    long $t = $x;
         |    $x = ($rx == 1L) ? (${n}L - 1L) - $y : $y;
         |    $y = ($rx == 1L) ? (${n}L - 1L) - $t : $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertDExpr =
    copy(left = newLeft, right = newRight)
}
