package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._

/** Parse semantics ported from the reference's unit tests:
  * `test_format_from_str` (s3.rs:766-778), `test_partitioner_from_str`
  * (s3.rs:780-797), config surface (utils/config.rs:104-169).
  */
class ModelSpec extends AnyFunSuite {

  test("Format.parse is case-insensitive and errors on unknown") {
    assert(Format.parse("json") == Format.Json)
    assert(Format.parse("JSON") == Format.Json)
    assert(Format.parse("Avro") == Format.Avro)
    assert(Format.parse("parquet") == Format.Parquet)
    assert(Format.parse("BYTES") == Format.Bytes)
    assertThrows[IllegalArgumentException](Format.parse("xml"))
  }

  test("Format extensions match the reference (json/avro/parquet/bin)") {
    assert(Format.Json.extension == "json")
    assert(Format.Avro.extension == "avro")
    assert(Format.Parquet.extension == "parquet")
    assert(Format.Bytes.extension == "bin")
  }

  test("PartitionerKind.parse is case-insensitive and errors on unknown") {
    assert(PartitionerKind.parse("default") == PartitionerKind.Default)
    assert(PartitionerKind.parse("FIELD") == PartitionerKind.Field)
    assert(PartitionerKind.parse("Time") == PartitionerKind.Time)
    assertThrows[IllegalArgumentException](PartitionerKind.parse("hash"))
  }

  test("SinkConfig honors format.class|format and partitioner.class|partitioner fallbacks") {
    val c1 = SinkConfig.fromMap(Map("s3.bucket.name" -> "b", "format.class" -> "parquet"))
    assert(c1.format == Format.Parquet)
    val c2 = SinkConfig.fromMap(Map("s3.bucket.name" -> "b", "format" -> "bytes"))
    assert(c2.format == Format.Bytes)
    val c3 = SinkConfig.fromMap(Map("s3.bucket.name" -> "b", "partitioner" -> "time"))
    assert(c3.partitioner == PartitionerKind.Time)
    assert(c3.flushSize == 1000) // code default, s3.rs:131
    assert(c3.region == "us-east-1")
    assertThrows[IllegalArgumentException](SinkConfig.fromMap(Map.empty))
  }

  test("SourceConfig splits topics CSV and passes kafka.* through") {
    val c = SourceConfig.fromMap(Map(
      "bootstrap.servers" -> "k:9092", "topics" -> "a, b,c",
      "kafka.fetch.min.bytes" -> "1024"))
    assert(c.topics == Seq("a", "b", "c"))
    assert(c.groupId == "rust-connect")
    assert(c.batchSize == 100L)
    assert(c.kafkaPassthrough == Map("fetch.min.bytes" -> "1024"))
    val opts = SourceConfig.toSparkKafkaOptions(c)
    assert(opts("subscribe") == "a,b,c")
    assert(opts("maxOffsetsPerTrigger") == "100")
    assert(opts("startingOffsets") == "earliest")
    assert(opts("kafka.fetch.min.bytes") == "1024")
  }
}
