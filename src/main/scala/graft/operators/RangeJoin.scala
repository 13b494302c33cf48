package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range join: pair points with the intervals containing them.
  *
  * Spark plans a bare `p.ts >= i.start AND p.ts < i.end` join as a
  * broadcast-nested-loop (or cartesian) — O(|points|·|intervals|) compared
  * work, a scale-killer the moment the interval side stops being tiny. The
  * standard fix: quantize time into fixed buckets, explode each interval
  * into the buckets it covers, equi-join point-bucket to interval-bucket
  * (hash join, shuffle on bucket), and re-check exact containment. Work
  * becomes O(|points| + |intervals|·span/bucket + |true matches|).
  *
  * `bucketWidth` tunes the explode factor vs bucket selectivity: pick it
  * near the median interval length so each interval explodes into O(1)
  * buckets.
  */
object RangeJoin {

  /** Inner join of `points` (with numeric column `ts`) to `intervals`
    * (with numeric `[start, end)` columns); emits all point×interval
    * containment pairs with both sides' columns.
    */
  def pointInInterval(points: DataFrame, ts: String,
                      intervals: DataFrame, start: String, end: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    def bucketOf(c: Column): Column = floor(c / bucketWidth).cast("long")
    val p = points.withColumn("_bucket", bucketOf(col(ts)))
    val iv = intervals
      .withColumn("_bucket",
        explode(sequence(bucketOf(col(start)), bucketOf(col(end) - 1))))
    p.join(iv, Seq("_bucket"))
      .filter(col(ts) >= col(start) && col(ts) < col(end))
      .drop("_bucket")
  }
}
