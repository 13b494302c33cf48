package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single right row with the greatest
  * "as-of" dimension value ≤ the left row's value, within the same key.
  *
  * Spark has no native as-of join; the idiomatic scalable plan is the
  * union-and-window trick: tag both sides, union on (key, dim), and carry
  * the most recent right payload forward with `last(..., ignoreNulls)` over
  * a key-partitioned, dim-ordered window. One shuffle on the key, no
  * range-explosion, no per-key collect — survives arbitrarily many rows per
  * key, unlike the join-then-max formulation which is quadratic in key
  * cardinality skew.
  */
object AsOfJoin {

  /** left(keyL, dimL, leftCols…) asof-joined to right(keyR, dimR, payload).
    * Output: all left columns + `payload` (null when no right row ≤ dim).
    * Ties on (key, dim) between left and right resolve right-before-left
    * (a right row at exactly dim matches), and among right ties the last in
    * (dim, payload) order wins — deterministic given distinct payloads.
    */
  def asOf(left: DataFrame, right: DataFrame,
           keyL: String, dimL: String, keyR: String, dimR: String,
           payload: String): DataFrame = {
    val l = left.select(
      col(keyL).as("_k"), col(dimL).cast("double").as("_dim"),
      lit(1).as("_side"), struct(left.columns.map(col).toIndexedSeq: _*).as("_lrow"),
      lit(null).cast(right.schema(payload).dataType).as("_payload"))
    val r = right.select(
      col(keyR).as("_k"), col(dimR).cast("double").as("_dim"),
      lit(0).as("_side"), lit(null).cast(l.schema("_lrow").dataType).as("_lrow"),
      col(payload).as("_payload"))
    // right sorts before left at equal dim (_side 0 < 1) so "≤" matches
    val w = Window.partitionBy("_k")
      .orderBy(col("_dim").asc, col("_side").asc, col("_payload").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_asof", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_lrow.*"), col("_asof").as(payload))
  }
}
