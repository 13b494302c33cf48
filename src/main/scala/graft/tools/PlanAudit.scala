package graft.tools

import graft.GraftSession
import graft.SparkEntry

/** Catalog-wide plan audit: `runMain graft.tools.PlanAudit [substring]
  * [--print]` builds every catalog query against `SPARK_GRAFT_SF_DIR`
  * (default sf0.001 — plans, not data, are the point) and flags the
  * shapes that deserve an eyeball before they reach 100 TB:
  *
  *  - `CartesianProduct` — almost always a missing join condition;
  *  - `SortMergeJoin` — legitimate for fact-fact joins, wrong for
  *    anything that should broadcast;
  *  - `Exchange rangepartitioning` — a global sort; fine behind a
  *    `TakeOrdered`/write, suspicious mid-plan.
  *  - `unpartitioned-window` — a logical `Window` with an empty
  *    partition spec funnels the whole input through ONE task. Suppressed
  *    when a `Limit` sits below the window (the catalog's benign pattern:
  *    rank-over-top-50 after `orderBy().limit(50)`), so only the
  *    scale-hostile case — an unbounded global window — flags.
  *    Accepted instances: `q_cumulative_distinct` and `q_seasonality`,
  *    whose window input is a day/month-grain aggregate (cardinality
  *    bounded by the calendar, not the corpus). Any OTHER query joining
  *    this list is a regression.
  *
  * Flags are informational (several catalog queries legitimately carry
  * them — e.g. q_pack_shards range-partitions by design); the value is
  * the diff between rounds: a NEW flag on an existing query is a plan
  * regression the bench may be too noisy to show.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val pat = args.filterNot(_.startsWith("--")).headOption.getOrElse("")
    val doPrint = args.contains("--print")
    var flagged = 0
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1) if name.contains(pat)) {
      try {
        val qe = fn(spark, dir).queryExecution
        val plan = qe.executedPlan.toString
        import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, Window => LWindow}
        val globalWindow = qe.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.isEmpty &&
            w.child.collectFirst { case _: GlobalLimit | _: LocalLimit => () }.isEmpty => w
        }.nonEmpty
        val flags = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "SortMergeJoin" -> plan.contains("SortMergeJoin"),
          "range-partition" -> plan.contains("Exchange rangepartitioning"),
          "unpartitioned-window" -> globalWindow
        ).collect { case (f, true) => f }
        if (doPrint) println(s"=== $name\n$plan")
        if (flags.nonEmpty) {
          flagged += 1
          println(s"[audit] $name: ${flags.mkString(", ")}")
        }
      } catch {
        case e: Throwable =>
          flagged += 1
          println(s"[audit] $name: BUILD ERROR ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    println(s"[audit] done: $flagged flagged of ${SparkEntry.queries.size}")
    spark.stop()
  }
}
