package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.SourceConfig

/** Sources — S1/S2 of the operator inventory.
  *
  * The real Kafka scan (`src/connector/source/kafka.rs:135-179`) maps 1:1 onto
  * Spark's Kafka streaming source; [[kafkaStream]] wires the reference's
  * option surface (`kafka.rs:399-492`) onto it. The offline test environment
  * has no broker (and no spark-sql-kafka jar), so correctness work rides on
  * [[eventsAsRecords]], which synthesizes the same record shape from the
  * driver-provided `events` parquet table — value bytes are the event's JSON
  * `props`, key is the user id, topic is "events", mirroring how a producer
  * would have keyed this stream.
  */
object Sources {

  /** S1: the streaming Kafka scan (requires the spark-sql-kafka package at
    * runtime; offline env exercises option-mapping only — see SourcesSpec).
    * Normalizes Spark's array<struct<key,binary>> headers to
    * map<string,string>, dropping non-UTF-8 header values exactly like the
    * reference (`kafka.rs:116-119` — a binary→string cast yields garbage
    * replacement chars rather than dropping, so we filter on decodability
    * via a round-trip check).
    */
  def kafkaStream(spark: SparkSession, cfg: SourceConfig): DataFrame = {
    val raw = SourceConfig.toSparkKafkaOptions(cfg)
      .foldLeft(spark.readStream.format("kafka")) { case (r, (k, v)) => r.option(k, v) }
      .option("includeHeaders", "true")
      .load()
    raw.select(
      col("topic"), col("partition"), col("offset"), col("timestamp"),
      col("key"), col("value"),
      map_from_entries(
        filter(
          transform(coalesce(col("headers"), array()),
            h => struct(
              h.getField("key").as("key"),
              h.getField("value").cast("string").as("value"),
              // UTF-8 round-trip: decode→encode preserves bytes iff valid UTF-8
              (encode(h.getField("value").cast("string"), "UTF-8") === h.getField("value")).as("ok"))),
          h => h.getField("ok")).cast("array<struct<key:string,value:string>>")
      ).as("headers"))
  }

  /** Streaming file source in the Kafka record shape: each line of each
    * file dropped into `dir` becomes one record. This is the connector class
    * that makes the daemon (`graft.Main`) runnable without a broker — the
    * file-watch directory plays the topic. Offsets are content hashes mixed
    * with the source file path (the file source's own WAL provides
    * exactly-once file pickup; a stable per-record id is all downstream
    * needs), partition is a hash mod so the default partitioner fans out as
    * it would off a real topic.
    *
    * KNOWN LIMIT: the text source exposes no per-file line position, so two
    * IDENTICAL lines in the SAME file still produce the same (topic,
    * partition, offset) id and conflate in offset-keyed consumers (RecordId
    * acks, the F4 bytes sink's `{partition}_{firstOffset}` naming). Distinct
    * lines, and identical lines in different files, are distinct. Feed
    * offset-keyed paths from files with unique lines (e.g. JSON with an id
    * field) or from a real broker source.
    */
  def fileStream(spark: SparkSession, dir: String, topic: String,
                 partitions: Int = 8): DataFrame =
    spark.readStream
      .schema("value STRING")
      .text(dir)
      .select(
        lit(topic).as("topic"),
        pmod(xxhash64(col("value")), lit(partitions)).cast("int").as("partition"),
        xxhash64(lit(topic), input_file_name(), col("value")).as("offset"),
        current_timestamp().as("timestamp"),
        lit(null).cast("binary").as("key"),
        col("value").cast("binary").as("value"),
        map().cast("map<string,string>").as("headers"))

  /** Batch analog of S1 for the offline fixtures: `events` rows → KafkaRecord
    * shape. Deterministic: partition = user_id mod `partitions`, offset =
    * event_id, key = user_id as text, value = props JSON bytes.
    */
  def eventsAsRecords(spark: SparkSession, sfDir: String, partitions: Int = 8): DataFrame =
    events(spark, sfDir).select(
      lit("events").as("topic"),
      pmod(col("user_id"), lit(partitions)).cast("int").as("partition"),
      col("event_id").as("offset"),
      col("ts").as("timestamp"),
      col("user_id").cast("string").cast("binary").as("key"),
      col("props").cast("binary").as("value"),
      map(lit("content-type"), lit("application/json")).as("headers")
    )

  /** Read back the F2 JSON-lines sink output as records — the inverse of
    * `Encode.jsonLinesProjection` + `toJsonLine`, so a pipeline can
    * re-ingest its own object-store output (reprocessing, backfills,
    * downstream jobs). Explicit schema: inference would need an extra
    * pass and can mistype empty partitions.
    */
  def jsonLinesRecords(spark: SparkSession, path: String): DataFrame = {
    val schema = "topic string, partition int, offset long, timestamp timestamp, " +
      "key_out string, key_format string, value_out string, value_format string, " +
      "headers map<string,string>"
    graft.operators.Encode.fromJsonLinesProjection(
      spark.read.schema(schema).json(path))
  }

  /** Convenience readers for the driver-provided star schema. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table's `ts` physical type has varied across testdata
    * generations: nanosecond parquet timestamps (which Spark 4 rejects by
    * default — TimestampType is microseconds) and plain microsecond
    * timestamps (read back as TIMESTAMP_NTZ). Normalize both to
    * session-tz TimestampType: nanos as long → truncate to micros
    * (matching DuckDB's CAST(ts AS TIMESTAMP) on the oracle side); NTZ →
    * reinterpret in the session zone (UTC per GraftSession), which is the
    * same instant DuckDB reads.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // the int64 branch assumes NANOseconds (the nanosAsLong
        // generation). Guard the assumption: a future generation writing
        // plain int64 MICROseconds would be silently truncated 1000×.
        // Epoch-NANOS for any date after ~1973 exceed 1e17, while
        // epoch-MICROS stay below 1e17 until year ~5138 — so a
        // sub-threshold value fails the read loudly instead.
        raw.withColumn("ts",
          when(col("ts") >= lit(100000000000000000L),
            timestamp_micros(expr("ts div 1000")))
          .otherwise(raise_error(concat(
            lit("events.ts int64 value not in the nanosecond epoch range "),
            lit("(plain-microsecond generation?): "),
            col("ts").cast("string"))).cast("timestamp")))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}
