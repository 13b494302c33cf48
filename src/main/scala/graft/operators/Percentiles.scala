package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact, scale-safe percentiles.
  *
  * Spark's `percentile()` buffers every group value inside the aggregation
  * buffer — exact, but a reducer OOM once a group stops fitting in memory
  * (60M rows/group at a 100× scale-up). `approx_percentile` bounds memory
  * but gives up exactness. This operator is both: compress to distinct
  * values with counts (one hash aggregate, map-side combined), cumulative
  * counts over the per-group value order (a window sort — Spark spills it
  * to disk, unlike an agg buffer), then each requested quantile is a pair
  * of rank lookups plus linear interpolation — `percentile_cont`
  * semantics, bit-matching the DuckDB `quantile_cont` oracle.
  */
object Percentiles {

  /** One row per key group; for each (name, q) an exact continuous
    * percentile column `name`, rounded to `scale` decimals.
    */
  def exactPercentiles(df: DataFrame, keys: Seq[String], value: String,
                       qs: Seq[(String, Double)], scale: Int = 4): DataFrame = {
    val v = col(value).cast("double")
    val counts = df
      // percentile()/quantile_cont ignore NULLs; without this filter a null
      // group would order first and shift every rank
      .filter(v.isNotNull)
      .groupBy((keys.map(col) :+ v.as("_v")): _*)
      .agg(count(lit(1)).as("_c"))
    val wOrd = Window.partitionBy(keys.map(col): _*).orderBy(col("_v"))
    val wAll = Window.partitionBy(keys.map(col): _*)
    val cum = counts
      .withColumn("_cum", sum("_c").over(wOrd))
      .withColumn("_n", sum("_c").over(wAll))

    def rank(q: Double): Column = lit(q) * (col("_n") - 1).cast("double")

    val aggs: Seq[Column] = qs.flatMap { case (name, q) =>
      val r = rank(q)
      Seq(
        // value at zero-based rank k = first distinct value whose
        // cumulative count exceeds k (values are totally ordered, so min
        // over the conditional is the first)
        min(when(col("_cum") > floor(r), col("_v"))).as(s"_lo_$name"),
        min(when(col("_cum") > ceil(r), col("_v"))).as(s"_hi_$name"),
        max(r - floor(r)).as(s"_frac_$name")) // constant within the group
    }
    val out = qs.map { case (name, _) =>
      round(col(s"_lo_$name") +
        (col(s"_hi_$name") - col(s"_lo_$name")) * col(s"_frac_$name"), scale).as(name)
    }
    cum
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select((keys.map(col) ++ out): _*)
  }
}
