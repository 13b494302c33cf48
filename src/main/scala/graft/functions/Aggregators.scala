package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` extension point (SURVEY §2.6's UDAF surface).
  *
  * Sum of the k largest values per group with an O(k) aggregation buffer:
  * the declarative alternative — `row_number() OVER (ORDER BY v DESC) <= k`
  * then sum — shuffles and sorts every row of every group; this buffer
  * carries at most k doubles per group through the map-side partial
  * aggregation and merges k-vs-k at reduce, the same bounded-state idea as
  * the TopKPerGroup physical operator but at the aggregation-function
  * level (composes with any groupBy, rollup, cube, or window frame).
  */
final class TopKSumAgg(k: Int) extends Aggregator[Double, Array[Double], Double] {
  require(k > 0)

  override def zero: Array[Double] = Array.empty

  private def insert(buf: Array[Double], v: Double): Array[Double] =
    if (buf.length < k) buf :+ v
    else {
      var mi = 0
      var i = 1
      while (i < buf.length) { if (buf(i) < buf(mi)) mi = i; i += 1 }
      if (v > buf(mi)) buf(mi) = v
      buf
    }

  override def reduce(buf: Array[Double], v: Double): Array[Double] = insert(buf, v)

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    b.foldLeft(a)(insert)

  override def finish(buf: Array[Double]): Double = {
    // deterministic fold order regardless of how partials merged
    java.util.Arrays.sort(buf)
    var s = 0.0
    var i = 0
    while (i < buf.length) { s += buf(i); i += 1 }
    s
  }

  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
