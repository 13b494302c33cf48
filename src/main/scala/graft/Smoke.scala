package graft

import org.apache.spark.sql.SparkSession

/** Local smoke: the driver's t1 check — SparkEntry.entry rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[4]", shufflePartitions = 4,
      quietAcceptedWarnings = true)
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(3, truncate = false)
    println(s"[smoke] entry rows=$n schema=${df.schema.simpleString}")

    // config surface: parse a reference-shaped connect.json and derive the
    // effective source/sink configs the manager would wire up
    val cfg = graft.model.ConfigLoader.parse(
      """{"kafka": {"bootstrap_servers": ["k:9092"], "group_id": "g"},
        |"connectors": [
        |  {"name": "src", "connector_class": "kafka", "connector_type": "source",
        |   "tasks_max": 2, "topics": ["t"], "config": {}},
        |  {"name": "snk", "connector_class": "s3", "connector_type": "sink",
        |   "tasks_max": 1, "topics": ["t"],
        |   "config": {"s3.bucket.name": "b", "format": "json", "partitioner": "time"}}
        |]}""".stripMargin)
    val src = graft.model.ConfigLoader.sourceConfig(cfg, cfg.connectors(0))
    val snk = graft.model.ConfigLoader.sinkConfig(cfg.connectors(1))
    println(s"[smoke] config source=${graft.model.SourceConfig.toSparkKafkaOptions(src)}")
    println(s"[smoke] config sink=bucket:${snk.bucketName} fmt:${snk.format.name} part:${snk.partitioner.name}")
    spark.stop()
  }
}
