package graft.tools

import graft.GraftSession
import graft.SparkEntry

/** Ad-hoc single-query timing probe: `runMain graft.tools.QueryProbe q1 q2…`
  * runs each named catalog query (twice if only one is given) against
  * `SPARK_GRAFT_SF_DIR` (default sf0.1) with a cache clear in between —
  * isolates a bench row from run-order and JVM-warmup effects.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate(quietAcceptedWarnings = true)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.length > 1) args.toSeq else Seq(args(0), args(0))
    for (q <- names) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).count()
      println(f"[probe] $q rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
