package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Batch-side pipeline observability via `Dataset.observe`: named metrics
  * ride INSIDE the job (accumulator-backed, zero extra passes — the same
  * rows the plan already moves are counted as they flow), and a
  * `QueryExecutionListener` collects them when each action completes.
  * This is the batch twin of [[ProgressTracker]]: together they give the
  * `GetStatus` surface the reference declared but never implemented
  * (`service.rs:386-422`), and at 100 TB it is the ONLY affordable way to
  * count records/bytes/nulls per stage — a separate counting query would
  * re-read the input.
  */
object BatchMetrics {

  /** Attach the standard record/byte metrics to a record-shaped frame.
    * One `observe` node: counts and sums are accumulator merges, so the
    * cost is a few adds per row inside the existing scan.
    */
  def withRecordMetrics(df: DataFrame, name: String = "graft"): DataFrame =
    df.observe(name,
      count(lit(1)).as("record_cnt"),
      sum(length(col("value"))).as("value_bytes"),
      sum(when(col("key").isNull, 1L).otherwise(0L)).as("null_keys"))

  /** Dedup-filter observability (r14 verdict item 6): the survivor count
    * rides the batch as an observe metric, alongside the corpus index's
    * excluded-hot-bucket count — the recall trade-off of the banded
    * filter's `maxBucket` cap ([[graft.operators.Dedup.minhashHotBuckets]]).
    * The hot count is computed once per query (the corpus is static per
    * query) and stamped into every micro-batch's metric row, so a metrics
    * consumer sees "this batch was filtered under a live recall hole"
    * without re-deriving the index.
    */
  def withDedupMetrics(df: DataFrame, hotBucketsExcluded: Long,
                       name: String = "graft-dedup"): DataFrame =
    df.observe(name,
      count(lit(1)).as("survivor_cnt"),
      max(lit(hotBucketsExcluded)).as("hot_buckets_excluded"))

  /** Collects observed metrics per (metric-set name), newest last. */
  final class MetricsTracker(keep: Int = 32) extends QueryExecutionListener {
    private val lock = new Object
    private val metrics = mutable.Map.empty[String, Vector[Row]]

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      lock.synchronized {
        qe.observedMetrics.foreach { case (name, row) =>
          metrics(name) = (metrics.getOrElse(name, Vector.empty) :+ row).takeRight(keep)
        }
      }

    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()

    def latest(name: String): Option[Row] = lock.synchronized {
      metrics.get(name).flatMap(_.lastOption)
    }

    def history(name: String): Seq[Row] = lock.synchronized {
      metrics.getOrElse(name, Vector.empty)
    }
  }

  /** Register a tracker on the session's listener manager. */
  def track(spark: SparkSession, keep: Int = 32): MetricsTracker = {
    val t = new MetricsTracker(keep)
    spark.listenerManager.register(t)
    t
  }
}
