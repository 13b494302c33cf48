package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.tools.{BoundedCheckpoints, PlanAudit}

/** NEGATIVE tests for the three CI plan-gate detectors (r11 verdict item
  * 2): CatalogContractSpec proves the catalog is CLEAN under
  * `hasUnboundedBroadcastHint` / `hasUnboundedCrossShape` /
  * `hasUnboundedGlobalWindow`, but nothing proved the detectors still
  * FIRE — a Spark upgrade renaming a node, or a refactor inverting a
  * predicate, would turn all three gates into green no-ops silently.
  * Each gate gets a known-bad plan asserted to flag AND a known-good
  * twin asserted to pass, so a detector that stops firing (or starts
  * over-firing) fails the suite, not the next round's verdict.
  */
class PlanGateSpec extends SparkSpec {

  private def docs: DataFrame =
    spark.read.parquet(s"$sf0001/documents.parquet")
  private def nation: DataFrame =
    spark.read.parquet(s"$sf0001/nation.parquet")
  private def lineitem: DataFrame =
    spark.read.parquet(s"$sf0001/lineitem.parquet")

  private def hint(df: DataFrame): Boolean =
    PlanAudit.hasUnboundedBroadcastHint(df.queryExecution.analyzed)
  private def cross(df: DataFrame): Boolean =
    PlanAudit.hasUnboundedCrossShape(df.queryExecution.optimizedPlan)

  // ---- broadcast-hint gate ----

  test("broadcast-hint detector FIRES on a hinted SF-proportional scan") {
    assert(hint(docs.join(broadcast(docs.select(col("doc_id"), col("lang"))), "doc_id")),
      "broadcast(documents) must flag — it scales with the corpus")
  }

  test("broadcast-hint detector FIRES on broadcast(groupBy(doc_id)) — the r11 hole") {
    // the r11 verdict's named case: an aggregate keyed by a
    // corpus-proportional column has corpus-cardinality output; the old
    // blanket Aggregate trust laundered it past the gate
    val agg = docs.groupBy("doc_id").agg(count(lit(1)).as("n"))
    assert(hint(docs.join(broadcast(agg), "doc_id")),
      "broadcast over groupBy(doc_id) must flag — corpus-cardinality output")
  }

  test("broadcast-hint detector FIRES on a hinted PLAIN localCheckpoint") {
    // an UNDECLARED checkpoint cut reads as corpus-scale (r11 ADVICE:
    // the old blanket RDD-leaf trust made every checkpoint audit-blind)
    val cp = docs.select(col("doc_id"), col("lang")).localCheckpoint(true)
    assert(hint(docs.join(broadcast(cp), "doc_id")),
      "broadcast over an undeclared checkpoint must flag")
  }

  test("broadcast-hint detector passes bounded shapes") {
    assert(!hint(docs.join(broadcast(nation), col("doc_id") === col("n_nationkey"))),
      "nation is a fixed 25-row dimension at any SF")
    val byLang = docs.groupBy("lang").agg(count(lit(1)).as("n"))
    assert(!hint(docs.join(broadcast(byLang), "lang")),
      "lang is a value-domain column — the aggregate is SF-independent")
    assert(!hint(docs.join(broadcast(docs.limit(10)), "doc_id")),
      "a Limit bounds its subtree")
    val declared = BoundedCheckpoints.checkpoint(nation)
    assert(!hint(docs.join(broadcast(declared), col("doc_id") === col("n_nationkey"))),
      "a DECLARED-bounded checkpoint is trusted")
  }

  // ---- cross-shape gate ----

  test("cross-shape detector FIRES on an inequality-only self-pairing") {
    // the r10 ER blind spot: `a.id < b.id` plans as
    // BroadcastNestedLoopJoin, |corpus|^2 compute at scale
    val a = docs.select(col("doc_id").as("ida"))
    val b = docs.select(col("doc_id").as("idb"))
    assert(cross(a.join(b, col("ida") < col("idb"))),
      "an all-pairs inequality join over two corpus-scale inputs must flag")
  }

  test("cross-shape detector passes one-bounded-side and equi shapes") {
    val a = docs.select(col("doc_id").as("ida")).limit(10)
    val b = docs.select(col("doc_id").as("idb"))
    assert(!cross(a.join(b, col("ida") < col("idb"))),
      "probe-set x corpus is linear — the ANN idiom")
    assert(!cross(docs.as("x").join(docs.as("y"), Seq("lang")).select(lit(1).as("one"))),
      "an equi-keyed join is not cross-shaped")
  }

  // ---- unpartitioned-window gate ----

  test("global-window detector FIRES on an unpartitioned window over a fact table") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("l_extendedprice").desc)
    val df = lineitem.withColumn("rk", row_number().over(w))
    assert(PlanAudit.hasUnboundedGlobalWindow(df.queryExecution.optimizedPlan),
      "an unpartitioned window funnels the whole input through one task")
  }

  test("global-window detector passes the rank-over-top-k idiom") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("l_extendedprice").desc)
    val df = lineitem.orderBy(col("l_extendedprice").desc).limit(50)
      .withColumn("rk", row_number().over(w))
    assert(!PlanAudit.hasUnboundedGlobalWindow(df.queryExecution.optimizedPlan),
      "a Limit below the window bounds the funnel")
  }
}
