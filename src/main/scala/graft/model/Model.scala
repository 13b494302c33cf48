package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Core data model of the engine.
  *
  * The reference engine (valdo404/franzoxide) operates on a single flat
  * record type defined in `proto/connector.proto:32-40` and used verbatim
  * in memory. We mirror it as a case class so the typed `Dataset[KafkaRecord]`
  * API is available, and expose the matching `StructType` for the DataFrame
  * edges. This is also exactly the schema Spark's own Kafka source produces
  * (modulo `headers`, which Spark delivers as array<struct<key,binary>> and we
  * normalize to map<string,string>, dropping non-UTF-8 values like the
  * reference does at `src/connector/source/kafka.rs:116-119`).
  */
final case class KafkaRecord(
    topic: String,
    partition: Int,
    offset: Long,
    timestamp: Timestamp,
    key: Array[Byte],
    value: Array[Byte],
    headers: Map[String, String]
)

object KafkaRecord {
  /** DataFrame-side schema, column order matches the proto field order. */
  val schema: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("timestamp", TimestampType, nullable = true),
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true),
    StructField("headers", MapType(StringType, StringType), nullable = true)
  ))
}

/** Output format ADT, mirroring `src/connector/sink/s3.rs:50-88`:
  * case-insensitive parse, error on unknown, fixed file extensions.
  * Avro/Parquet were declared-but-unimplemented in the reference
  * (`s3.rs:662-673`); in Spark they are first-class writer formats.
  */
sealed abstract class Format(val name: String, val extension: String)
object Format {
  case object Json extends Format("json", "json")
  case object Avro extends Format("avro", "avro")
  case object Parquet extends Format("parquet", "parquet")
  case object Bytes extends Format("bytes", "bin")

  val all: Seq[Format] = Seq(Json, Avro, Parquet, Bytes)

  /** Case-insensitive, throws on unknown — same contract as the reference. */
  def parse(s: String): Format =
    all.find(_.name == s.trim.toLowerCase)
      .getOrElse(throw new IllegalArgumentException(s"Unknown format: $s"))
}

/** Object-partitioner ADT, mirroring `s3.rs:92-116` (`default|field|time`).
  * The reference's field partitioner was a stub falling back to default
  * (`s3.rs:149-160`); here it is implemented for real.
  */
sealed abstract class PartitionerKind(val name: String)
object PartitionerKind {
  case object Default extends PartitionerKind("default")
  case object Field extends PartitionerKind("field")
  case object Time extends PartitionerKind("time")

  val all: Seq[PartitionerKind] = Seq(Default, Field, Time)

  def parse(s: String): PartitionerKind =
    all.find(_.name == s.trim.toLowerCase)
      .getOrElse(throw new IllegalArgumentException(s"Unknown partitioner: $s"))
}

/** Compression codecs declared in the reference proto
  * (`proto/connector.proto:217-222`), never implemented there.
  * In Spark these map directly onto writer codec options.
  */
sealed abstract class Compression(val name: String, val sparkCodec: String)
object Compression {
  case object None extends Compression("none", "none")
  case object Gzip extends Compression("gzip", "gzip")
  case object Snappy extends Compression("snappy", "snappy")
  val all: Seq[Compression] = Seq(None, Gzip, Snappy)
  def parse(s: String): Compression =
    all.find(_.name == s.trim.toLowerCase)
      .getOrElse(throw new IllegalArgumentException(s"Unknown compression: $s"))
}

/** Sink configuration surface, mirroring `s3.rs:357-501`.
  * Same key names and fallbacks (`format.class` | `format`,
  * `partitioner.class` | `partitioner`), same defaults
  * (flush.size 1000 `s3.rs:131`, region us-east-1 `s3.rs:409-413`).
  */
final case class SinkConfig(
    bucketName: String,
    prefix: String = "",
    format: Format = Format.Json,
    partitioner: PartitionerKind = PartitionerKind.Default,
    partitionField: String = "",
    flushSize: Int = 1000,
    region: String = "us-east-1",
    endpoint: Option[String] = None,
    accessKey: Option[String] = None,
    secretKey: Option[String] = None,
    compression: Compression = Compression.None,
    // K-family time-based rotation (`connector.proto:214`
    // `rotate_interval_ms`, declared but never read by the reference —
    // `GAP.md` lists it as a gap): in Spark the flush unit is the
    // micro-batch, so the rotation interval IS the trigger interval.
    rotateIntervalMs: Int = 1000
)

object SinkConfig {
  /** Build from the reference's string-map task config (`TaskConfig`,
    * `common.rs:72-78`). Required `s3.bucket.name` per `s3.rs:370-374`.
    */
  def fromMap(c: Map[String, String]): SinkConfig = SinkConfig(
    bucketName = c.getOrElse("s3.bucket.name",
      throw new IllegalArgumentException("s3.bucket.name is required")),
    prefix = c.getOrElse("s3.prefix", ""),
    format = Format.parse(
      c.get("format.class").orElse(c.get("format")).getOrElse("json")),
    partitioner = PartitionerKind.parse(
      c.get("partitioner.class").orElse(c.get("partitioner")).getOrElse("default")),
    partitionField = c.getOrElse("partition.field", ""),
    flushSize = c.get("flush.size").map(_.toInt).getOrElse(1000),
    region = c.getOrElse("s3.region", "us-east-1"),
    endpoint = c.get("s3.endpoint"),
    accessKey = c.get("s3.access.key"),
    secretKey = c.get("s3.secret.key"),
    compression = Compression.parse(c.getOrElse("compression", "none")),
    rotateIntervalMs = c.get("rotate.interval.ms").map { v =>
      val ms = try v.trim.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"rotate.interval.ms must be a positive integer, got '$v'")
      }
      // 0 would busy-spin the micro-batch trigger; negatives fail only at
      // query start with an opaque message — validate at the config surface
      // like the route-format checks
      if (ms <= 0) throw new IllegalArgumentException(
        s"rotate.interval.ms must be a positive integer, got '$v'")
      ms
    }.getOrElse(1000)
  )
}

/** Per-topic table route for multi-table fan-out — the reference's own
  * roadmap item (`GAP.md:17` "Multiple sink support"; its manager routes
  * EVERY record to the first sink, `manager.rs:184`). Parsed from the sink
  * connector's `route.<topic>` config keys:
  * `"route.orders" -> "orders_v2:parquet"` sends records whose `topic` is
  * `orders` to table `orders_v2` in parquet; the `:format` suffix is
  * optional (default parquet). Topics with no route fall through to the
  * connector's default sink pipeline unchanged, so adding a route never
  * changes unrouted behavior.
  */
final case class TableRoute(topic: String, table: String, format: Format)

object TableRoute {
  def fromMap(c: Map[String, String]): Seq[TableRoute] = {
    val routes = c.collect { case (k, v) if k.startsWith("route.") && k.length > "route.".length =>
      val topic = k.stripPrefix("route.")
      v.split(":", 2) match {
        case Array(t) => TableRoute(topic, t, Format.Parquet)
        case Array(t, f) =>
          val fmt = Format.parse(f)
          if (fmt == Format.Bytes) throw new IllegalArgumentException(
            s"route.$topic: raw bytes is a FileSink format, not a table format")
          TableRoute(topic, t, fmt)
      }
    }.toSeq.sortBy(_.topic)
    // Two topics routed to ONE table would collide on the sink's
    // (table, batchId) replay marker: the first topic's publish makes the
    // second topic's write look like a replay, silently dropping its rows
    // every micro-batch — permanent loss, so reject at parse time.
    val dup = routes.groupBy(_.table).collect { case (t, rs) if rs.size > 1 =>
      s"$t <- ${rs.map(_.topic).mkString(", ")}" }
    if (dup.nonEmpty) throw new IllegalArgumentException(
      s"multiple topics routed to the same table (the per-table batch " +
        s"replay marker cannot distinguish them): ${dup.mkString("; ")}")
    routes
  }
}

/** Kafka source configuration surface, mirroring `kafka.rs:399-492`:
  * required `bootstrap.servers` + `topics` (CSV), defaults
  * `group.id=rust-connect`, `poll.timeout.ms=100`, `batch.size=100`,
  * passthrough of `kafka.*`-prefixed keys.
  */
final case class SourceConfig(
    bootstrapServers: String,
    topics: Seq[String],
    groupId: String = "rust-connect",
    pollTimeoutMs: Long = 100L,
    batchSize: Long = 100L,
    kafkaPassthrough: Map[String, String] = Map.empty
)

object SourceConfig {
  def fromMap(c: Map[String, String]): SourceConfig = SourceConfig(
    bootstrapServers = c.getOrElse("bootstrap.servers",
      throw new IllegalArgumentException("bootstrap.servers is required")),
    topics = c.getOrElse("topics",
      throw new IllegalArgumentException("topics is required"))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq,
    groupId = c.getOrElse("group.id", "rust-connect"),
    pollTimeoutMs = c.get("poll.timeout.ms").map(_.toLong).getOrElse(100L),
    batchSize = c.get("batch.size").map(_.toLong).getOrElse(100L),
    kafkaPassthrough = c.collect {
      case (k, v) if k.startsWith("kafka.") => k.stripPrefix("kafka.") -> v
    }
  )

  /** Map onto Spark's Kafka streaming source options.
    * `batch.size` → `maxOffsetsPerTrigger` (micro-batch size control),
    * earliest start mirrors `auto.offset.reset=earliest` (`kafka.rs:464`).
    */
  def toSparkKafkaOptions(c: SourceConfig): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> c.bootstrapServers,
      "subscribe" -> c.topics.mkString(","),
      "kafka.group.id" -> c.groupId,
      "startingOffsets" -> "earliest",
      "maxOffsetsPerTrigger" -> c.batchSize.toString,
      "failOnDataLoss" -> "false"
    ) ++ c.kafkaPassthrough.map { case (k, v) => s"kafka.$k" -> v }
}

/** Connector lifecycle states, mirroring `common.rs:30-45`. */
sealed trait ConnectorState
object ConnectorState {
  case object Uninitialized extends ConnectorState
  case object Running extends ConnectorState
  case object Paused extends ConnectorState
  case object Failed extends ConnectorState
  case object Stopped extends ConnectorState
}
