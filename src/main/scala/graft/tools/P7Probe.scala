package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Sources

/** Phase-timing probe for the P7 chain (write → register/recover → read):
  * splits the catalog entry's cost into its three fixed-overhead phases so a
  * regression in any one (file-commit renames, partition adds, small-file
  * scan) is attributable without guessing. Run twice in one JVM — the first
  * pass carries codegen/JIT warmup.
  */
object P7Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate(quietAcceptedWarnings = true)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p7probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // Measured (sf0.1, warm): write ~5-7 s, register+recover ~0.5 s,
    // read-back ~2.4 s. The v2 file-output-committer (task-side commit)
    // was probed and is timing-identical on a local FS — the write cost is
    // the 720 per-file parquet writer initializations inside the tasks,
    // not the driver-side v1 renames, so v1's stronger commit semantics
    // stay.
    (1 to 2).foreach { pass =>
      println(s"[p7probe] pass $pass")
      val out = TmpDirs.path("p7-probe")
      val p = new org.apache.hadoop.fs.Path(out)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true): Unit
      val cfg = graft.model.SinkConfig(bucketName = "b",
        partitioner = graft.model.PartitionerKind.Time,
        format = graft.model.Format.Parquet)
      timed("write 720-partition insert") {
        graft.sinks.FileSink.writeBatch(
          Sources.eventsAsRecords(spark, dir).drop("headers"), cfg, out)
      }
      timed("register + recoverPartitions") {
        graft.sinks.Tables.registerPartitioned(spark, "p7_probe_records", out)
      }
      timed("read-back aggregate") {
        spark.table("p7_probe_records")
          .groupBy("year", "month", "day", "hour")
          .agg(count(lit(1)).as("cnt")).count(): Unit
      }
    }
    spark.stop()
  }
}
