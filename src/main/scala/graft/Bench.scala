package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every catalog query against
  * `SPARK_GRAFT_SF_DIR`, timed end-to-end with a noop-sink write so the
  * whole plan materializes (a bare `count()` would let Catalyst prune the
  * expensive projections out of the measurement).
  * Prints ONE JSON line per the driver contract.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // the session the library is designed against (AQE + skew join +
    // broadcast sizing + graft functions) — benching a different config
    // than production would measure the wrong plans
    val spark = GraftSession.getOrCreate(
      master = s"local[$cpus]", shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: pay JVM/codegen startup outside the measurements, and
    // touch every base table so no timed query is the first to pay file
    // listing + footer reads + scan codegen for its input (r4 bench showed
    // the first events-readers absorbing multi-second first-touch spikes)
    try SparkEntry.queries("q1_agg")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders",
                  "lineitem", "events", "documents", "embeddings"))
      try graft.sources.Sources.table(spark, sfDir, t)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // isolate queries: operators persist intermediate relations
      // (shingle hashes, CC labels); without eviction each query's timing
      // depends on what ran before it and the heap fills with dead caches
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
