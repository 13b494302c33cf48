package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query names — run (and emit
    // oracles for) just that subset; used by tools/check.py for fast
    // iteration on new entries
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    def selected[A](m: Map[String, A]): Map[String, A] =
      only.fold(m)(f => m.view.filterKeys(f).toMap)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // the production session config — so the oracle gate checks the same
    // plans (AQE, injected strategy, native functions) users and Bench run.
    // Recycled every 24 queries for the same reason Bench does it: a
    // driver aging across a 140-query catalog accumulates per-execution
    // state that slows later queries several-fold.
    def freshSession() = {
      val s = GraftSession.getOrCreate(s"local[$cpus]", cpus.toInt,
        quietAcceptedWarnings = true)
      s.sparkContext.setLogLevel("WARN")
      s
    }
    var spark = freshSession()
    var sinceRecycle = 0
    new java.io.File(outDir).mkdirs()
    selected(SparkEntry.queries).foreach { case (name, fn) =>
      if (sinceRecycle >= 24) {
        spark.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        spark = freshSession()
        sinceRecycle = 0
      }
      sinceRecycle += 1
      // the dedup/CC operators persist shingle/fingerprint relations they
      // can't unpersist before their lazy result materializes; without this
      // the ~70-query gate accumulates dead cached relations (Bench clears
      // the cache the same way per query)
      spark.catalog.clearCache()
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = selected(SparkEntry.oracleSql)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/queries.json"),
      selected(SparkEntry.queries).keys.toSeq.sorted.map(q).mkString("[", ",", "]"))
    // full runs refresh the generated catalog index (entry → file:line →
    // oracle kind → quiet seconds); CatalogContractSpec fails on drift
    if (only.isEmpty)
      try graft.tools.CatalogIndex.write()
      catch { case e: Throwable =>
        System.err.println(s"[verify] catalog index: ${e.getMessage}")
      }
    spark.stop()
  }
}
