package graft.sinks

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row}

/** Avro container-file sink for KafkaRecord batches.
  *
  * The reference declared Avro output and returned "not implemented yet"
  * (`s3.rs:662-667`); Spark normally closes this gap with the spark-avro
  * module, which is not on this environment's classpath — but avro-core is,
  * so this writer produces standard Avro object-container files directly:
  * records are distributed by (topic, partition), each task streams its
  * groups through a `DataFileWriter` to `{path}/{topic}/{partition}_
  * {firstOffset}.avro`. Same layout contract as the bytes writer.
  *
  * On a cluster with spark-avro available, `df.write.format("avro")` is the
  * preferred path (FileSink dispatches to it when loadable); this writer is
  * the fallback and the offline-testable implementation.
  */
object AvroSink {

  /** Avro schema mirroring proto `KafkaRecord` (connector.proto:32-40). */
  val recordSchema: Schema = SchemaBuilder.record("KafkaRecord")
    .namespace("graft").fields()
    .requiredString("topic")
    .requiredInt("partition")
    .requiredLong("offset")
    .requiredLong("timestamp_ms")
    .optionalBytes("key")
    .optionalBytes("value")
    .name("headers").`type`().map().values().stringType().noDefault()
    .endRecord()

  def writeAvroObjects(records: DataFrame, path: String): String = {
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      records.sparkSession.sparkContext.hadoopConfiguration)
    val schemaJson = recordSchema.toString
    val prepared = records
      .selectExpr("topic", "partition", "offset",
        "unix_micros(timestamp) div 1000 as timestamp_ms", "key", "value", "headers")
      .repartition(org.apache.spark.sql.functions.col("topic"),
        org.apache.spark.sql.functions.col("partition"))
      .sortWithinPartitions("topic", "partition", "offset")
    prepared.foreachPartition { (rows: Iterator[Row]) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val fsConf = hadoopConf.value
      var fs: FileSystem = null
      var current: (String, Int) = null
      var writer: DataFileWriter[GenericRecord] = null
      def close(): Unit = if (writer != null) { writer.close(); writer = null }
      rows.foreach { r =>
        val grp = (r.getString(0), r.getInt(1))
        if (grp != current) {
          close()
          val p = new Path(s"$path/${grp._1}/${grp._2}_${r.getLong(2)}.avro")
          if (fs == null) fs = p.getFileSystem(fsConf)
          fs.mkdirs(p.getParent)
          writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
          writer.create(schema, fs.create(p, true))
          current = grp
        }
        val rec = new GenericData.Record(schema)
        rec.put("topic", r.getString(0))
        rec.put("partition", r.getInt(1))
        rec.put("offset", r.getLong(2))
        rec.put("timestamp_ms", r.getLong(3))
        rec.put("key", if (r.isNullAt(4)) null else java.nio.ByteBuffer.wrap(r.getAs[Array[Byte]](4)))
        rec.put("value", if (r.isNullAt(5)) null else java.nio.ByteBuffer.wrap(r.getAs[Array[Byte]](5)))
        rec.put("headers",
          if (r.isNullAt(6)) new java.util.HashMap[String, String]()
          else r.getAs[Map[String, String]](6).asJava)
        writer.append(rec)
      }
      close()
    }
    path
  }

  /** Test/verification helper: read one Avro container file back. */
  def readFile(fs: FileSystem, p: Path): Seq[GenericRecord] = {
    val in = fs.open(p)
    val bytes = try {
      val buf = new ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      var n = in.read(tmp)
      while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      buf.toByteArray
    } finally in.close()
    val reader = new org.apache.avro.file.DataFileReader[GenericRecord](
      new org.apache.avro.file.SeekableByteArrayInput(bytes),
      new GenericDatumReader[GenericRecord]())
    try reader.iterator().asScala.toList finally reader.close()
  }
}
