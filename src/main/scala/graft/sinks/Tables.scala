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

  // ---- table-format sink (Iceberg) decision record ----------------------
  //
  // The reference's roadmap names an Iceberg sink (GAP.md:14-16: Iceberg,
  // exactly-once, commit coordination). No iceberg-spark-runtime jar exists
  // in this offline environment (verified: /opt/spark/jars and the coursier
  // cache carry no table-format artifacts), so a real
  // `df.writeTo("cat.db.t").append()` cannot even be analyzed — the v2
  // catalog plugin class is absent. The boundary below is therefore:
  //  * [[icebergAvailable]] — runtime detection of the catalog plugin;
  //  * [[writeTable]] — routes to the Iceberg DataFrameWriterV2 append when
  //    the plugin is present, else to the exactly-once Spark file-sink
  //    layout (parquet + atomic task commit; for streaming the
  //    `_spark_metadata` manifest in Pipeline.streamToFilesExactlyOnce gives
  //    the same reader-visible atomicity an Iceberg snapshot commit would).
  // What Iceberg would add on top of the stand-in — snapshot isolation
  // across engines, hidden-partition evolution, compaction — is data
  // layout, not query semantics: every operator in this library reads
  // DataFrames and is oblivious to which one backs the scan.

  /** True iff an Iceberg Spark catalog can be instantiated in this JVM. */
  lazy val icebergAvailable: Boolean =
    try { Class.forName("org.apache.iceberg.spark.SparkCatalog"); true }
    catch { case _: Throwable => false }

  /** Append `df` to `table`: Iceberg v2 append when the runtime is on the
    * classpath, exactly-once parquet layout at `fallbackPath` otherwise.
    * Returns the route taken so callers/ops can assert on it.
    */
  def writeTable(df: DataFrame, table: String, fallbackPath: String): String =
    if (icebergAvailable) {
      df.writeTo(table).append()
      "iceberg"
    } else {
      df.write.mode("append").format("parquet").save(fallbackPath)
      "parquet-manifest"
    }
}
