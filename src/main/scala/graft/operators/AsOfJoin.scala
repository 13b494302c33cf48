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
           payload: String): DataFrame =
    directional(left, right, keyL, dimL, keyR, dimR, payload, forward = false)
      .drop("_matched_dim")

  /** Forward as-of: the single right row with the SMALLEST dim ≥ the left
    * row's value within the key — "next price at or above budget". Same
    * union-and-window plan with the dim ordering reversed.
    */
  def asOfForward(left: DataFrame, right: DataFrame,
                  keyL: String, dimL: String, keyR: String, dimR: String,
                  payload: String): DataFrame =
    directional(left, right, keyL, dimL, keyR, dimR, payload, forward = true)
      .drop("_matched_dim")

  /** Nearest as-of: whichever of the backward/forward matches is closer in
    * dim; exact ties (equidistant) resolve to the backward (≤) match.
    * Two window passes over the same union shuffle — still one shuffle
    * shape per pass, no range explosion. The two passes rejoin on a
    * surrogate row id, so duplicate left rows and NULLs in left columns
    * are both preserved (an equi-join on the left columns would silently
    * drop any row containing a NULL).
    */
  def asOfNearest(left: DataFrame, right: DataFrame,
                  keyL: String, dimL: String, keyR: String, dimR: String,
                  payload: String): DataFrame = {
    // persisted (caller-must-clear-cache): the id column is evaluated once
    // per directional pass, and monotonically_increasing_id over a shuffled
    // input can assign differently between two evaluations (reducer fetch
    // order is not deterministic) — materializing the assignment makes both
    // passes see the same ids regardless of what produced `left`
    val leftId = left.withColumn("_asof_id", monotonically_increasing_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val back = directional(leftId, right, keyL, dimL, keyR, dimR, payload, forward = false)
      .withColumnRenamed(payload, "_p_back").withColumnRenamed("_matched_dim", "_d_back")
    val fwd = directional(leftId, right, keyL, dimL, keyR, dimR, payload, forward = true)
      .select(col("_asof_id"), col(payload).as("_p_fwd"), col("_matched_dim").as("_d_fwd"))
    val joined = back.join(fwd, "_asof_id")
    val dimNum = col(dimL).cast("double")
    val dBack = abs(dimNum - col("_d_back"))
    val dFwd = abs(dimNum - col("_d_fwd"))
    val nearest = when(col("_d_back").isNull, col("_p_fwd"))
      .when(col("_d_fwd").isNull, col("_p_back"))
      .when(dFwd < dBack, col("_p_fwd"))
      .otherwise(col("_p_back")) // ties and dBack <= dFwd → backward
    joined.select(left.columns.map(col).toIndexedSeq :+ nearest.as(payload): _*)
  }

  /** Backward as-of with a tolerance bound: a match further than
    * `tolerance` below the left value is nulled out (pandas
    * `merge_asof(tolerance=...)` semantics) — "most recent price, but only
    * if it's fresh enough". Pure post-filter on the window result.
    */
  def asOfTolerance(left: DataFrame, right: DataFrame,
                    keyL: String, dimL: String, keyR: String, dimR: String,
                    payload: String, tolerance: Double): DataFrame = {
    val d = directional(left, right, keyL, dimL, keyR, dimR, payload, forward = false)
    d.withColumn(payload,
        when(col(dimL).cast("double") - col("_matched_dim") <= tolerance, col(payload)))
      .drop("_matched_dim")
  }

  private def directional(left: DataFrame, right: DataFrame,
                          keyL: String, dimL: String, keyR: String, dimR: String,
                          payload: String, forward: Boolean): DataFrame = {
    val l = left.select(
      col(keyL).as("_k"), col(dimL).cast("double").as("_dim"),
      lit(1).as("_side"), struct(left.columns.map(col).toIndexedSeq: _*).as("_lrow"),
      lit(null).cast(right.schema(payload).dataType).as("_payload"))
    val r = right.select(
      col(keyR).as("_k"), col(dimR).cast("double").as("_dim"),
      lit(0).as("_side"), lit(null).cast(l.schema("_lrow").dataType).as("_lrow"),
      col(payload).as("_payload"))
    // right sorts before left at equal dim (_side 0 < 1) so the bound is
    // inclusive; descending dim order turns "greatest ≤" into "smallest ≥"
    val dimOrder = if (forward) col("_dim").desc else col("_dim").asc
    val w = Window.partitionBy("_k")
      .orderBy(dimOrder, col("_side").asc, col("_payload").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_asof", last(col("_payload"), ignoreNulls = true).over(w))
      // track the dim of the same row that supplied _asof: a right row with
      // a null payload is skipped by ignoreNulls above, so it must not
      // advance the matched dim either (freshness/distance would otherwise
      // be judged against a row that contributed no payload)
      .withColumn("_mdim", last(when(col("_side") === 0 && col("_payload").isNotNull,
        col("_dim")), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_lrow.*"), col("_asof").as(payload), col("_mdim").as("_matched_dim"))
  }
}
