package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers for co-located joins — the 100 TB answer to
  * "this join shuffles both sides every run".
  *
  * Writing both fact tables bucketed (and sorted) by the join key lets
  * Spark plan repeated joins with zero Exchange on either side: the
  * bucketing is a persisted hash-partitioning that survives across jobs.
  * For a pipeline that joins lineitem↔orders (or events↔users) every hour,
  * this converts the dominant shuffle into a one-time write cost.
  */
object Tables {

  /** Write `df` as a bucketed, sorted managed table. `buckets` should be
    * sized so a bucket of the largest table fits an executor's memory
    * (at 100 TB: hundreds to thousands of buckets, never the default 200
    * shuffle partitions).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").bucketBy(buckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on the bucket key — planner elides both
    * shuffles (and both sorts, when sortBy matches).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
