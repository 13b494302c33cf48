package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Encode, OutputPartitioners}
import graft.queries.{AnalyticsQueries, LlmQueries, PipelineQueries}
import graft.sources.Sources

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private val all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] =
    PipelineQueries.defs ++ AnalyticsQueries.defs ++ LlmQueries.defs

  /** Flagship: the reference's whole embedded data path as one batch plan —
    * events → KafkaRecord synthesis → F2 JSON-lines encode → Hive time
    * partitioning (SURVEY §7.2's minimum end-to-end slice).
    */
  def entry(spark: SparkSession): DataFrame = {
    val records = Sources.eventsAsRecords(spark, "/root/testdata/sf0.001")
    OutputPartitioners.withTimePartitions(records)
      .transform(df => Encode.jsonLinesProjection(df, Seq("year", "month", "day", "hour")))
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, (q, _)) => k -> q }

  /** Equivalent ANSI SQL runnable by DuckDB on the same parquet tables;
    * absent for the hash-seeded approximate operators (rows-only check).
    */
  def oracleSql: Map[String, String] =
    all.collect { case (k, (_, Some(sql))) => k -> sql }
}
