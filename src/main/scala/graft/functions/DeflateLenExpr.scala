package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Raw-DEFLATE compressed length of a string — the compression-ratio
  * quality signal (Gopher's "compressible = repetitive boilerplate"
  * heuristic): near-duplicate templated text compresses far below natural
  * prose, and the ratio is a scan-speed scalar with no tokenization. Level
  * and strategy are pinned (BEST_COMPRESSION, default strategy, nowrap) so
  * the length is deterministic for a given zlib; the signal is NOT
  * SQL-replayable, so its catalog entry is rows-only checked and the spec
  * pins known inputs instead.
  */
case class DeflateLenExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_len expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"

  override def nullSafeEval(input: Any): Any =
    DeflateLen.len(input.asInstanceOf[UTF8String].getBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateLen.len($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): DeflateLenExpr =
    copy(child = newChild)
}

object DeflateLen {
  /** Deterministic raw-deflate length: pinned level/strategy, fresh
    * Deflater per call (the JDK object is stateful and not thread-safe).
    */
  def len(bytes: Array[Byte]): Long = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_COMPRESSION, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}
