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
  *    Accepted instances: `q_cumulative_distinct`, `q_seasonality`, and
  *    `q_kaplan_meier`, whose window input is a day/month-grain (or
  *    distinct gap-days) aggregate — cardinality bounded by the
  *    calendar, not the corpus. Any OTHER query joining this list is a
  *    regression.
  *  - `unbounded-broadcast` — an EXPLICIT `broadcast()` hint whose input
  *    subtree is not provably bounded. A hint is the author asserting
  *    "this always fits in one executor's memory"; that assertion is only
  *    safe when the subtree contains an Aggregate or Limit (output
  *    cardinality decoupled from input), is a LocalRelation, carries a
  *    constant equality/range/isin filter on a key column (a fixed key
  *    set at any SF), or reads only the fixed-size dimensions
  *    nation/region (25/5 rows at EVERY scale factor). A hint on an
  *    SF-proportional relation (customer, orders, part, supplier,
  *    documents, embeddings…) is correct on the fixture and an OOM at
  *    100 TB — exactly the failure AQE's size-checked auto-broadcast
  *    exists to prevent. Accepted instance: `vector_knn_graph`, the
  *    DECLARED brute-force twin whose query set IS the corpus (scale
  *    path: `vector_knn_graph_pivoted`) — the flag is that declaration
  *    made visible. Any OTHER query joining this list is a regression.
  *
  * Flags are informational (several catalog queries legitimately carry
  * them — e.g. q_pack_shards range-partitions by design); the value is
  * the diff between rounds: a NEW flag on an existing query is a plan
  * regression the bench may be too noisy to show.
  */
object PlanAudit {

  /** True iff the analyzed plan carries an explicit broadcast hint whose
    * input subtree is NOT provably bounded. Boundedness is decided by a
    * RECURSIVE walk (r9 advice: the old `collectFirst`-anywhere accepted
    * `broadcast(fact.join(smallAgg))` because the Aggregate sat on ONE
    * branch — now a bounding node must sit on the path to EVERY leaf):
    *
    *  - an `Aggregate`, `Limit`, or `Deduplicate` node bounds its whole
    *    subtree (output cardinality decoupled from scan size — a distinct
    *    key set or an aggregate is the author asserting a key-set bound,
    *    with the cardinality argument at the entry; an aggregate keyed by
    *    a corpus-proportional column would defeat this — residual trust,
    *    reviewed per entry);
    *  - a `Filter` whose predicate pins an attribute to constants
    *    (equality/IN, or a constant upper range like `vec_id < 102400`)
    *    bounds its subtree — the catalog's query-set idiom; residual
    *    trust: the author asserts the column is a KEY (ids, non-negative
    *    and unique), so a fixed value range is a fixed row count at any
    *    SF;
    *  - leaves must be `LocalRelation`/`OneRowRelation`, a
    *    localCheckpoint `LogicalRDD` (the catalog checkpoints only
    *    driver-bounded relations — BPE vocab, power-iteration frames,
    *    interleave pick sets; trust documented here, reviewed per entry),
    *    or a parquet scan of the fixed-size dimensions nation/region
    *    (25/5 rows at any SF);
    *  - every other node (join, union, project, window…) is bounded only
    *    if ALL its children are.
    *
    * Anything else — customer, orders, part, supplier, documents,
    * embeddings, unfiltered or filtered on a non-constant predicate —
    * scales with the corpus, and forcing its broadcast is a 100 TB OOM
    * that AQE's size-checked auto-broadcast exists to prevent.
    */
  def hasUnboundedBroadcastHint(analyzed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.LogicalRelation

    def boundedLeaf(l: LogicalPlan): Boolean = l match {
      case _: LocalRelation | _: OneRowRelation => true
      case _: org.apache.spark.sql.execution.LogicalRDD => true
      // spark.range(a, b): numElements is a plan-time literal, so the
      // relation's size is provably SF-independent (e.g. a 9-row decile
      // axis) — as bounded as a LocalRelation of the same rows
      case _: Range => true
      case lr: LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.forall { p =>
              val s = p.toString
              s.contains("nation") || s.contains("region")
            }
          case _ => false
        }
      case _ => false
    }

    // does this predicate fix the qualifying key set regardless of SF?
    // AND: one bounding conjunct suffices (conjunction only narrows);
    // OR: every disjunct must bound. Analysis wraps literals (and
    // sometimes the column) in type-coercion Casts — strip them, and
    // accept any FOLDABLE comparand (constant at plan time).
    def stripCast(e: Expression): Expression = e match {
      case c: Cast => stripCast(c.child)
      case other => other
    }
    def isAttr(e: Expression): Boolean =
      stripCast(e).isInstanceOf[AttributeReference]
    def boundingPredicate(e: Expression): Boolean = e match {
      case And(l, r) => boundingPredicate(l) || boundingPredicate(r)
      case Or(l, r) => boundingPredicate(l) && boundingPredicate(r)
      case LessThan(a, v) if isAttr(a) && v.foldable => true
      case LessThanOrEqual(a, v) if isAttr(a) && v.foldable => true
      case GreaterThan(v, a) if isAttr(a) && v.foldable => true
      case GreaterThanOrEqual(v, a) if isAttr(a) && v.foldable => true
      case EqualTo(a, v) if isAttr(a) && v.foldable => true
      case EqualTo(v, a) if isAttr(a) && v.foldable => true
      case In(a, vs) if isAttr(a) && vs.forall(_.foldable) => true
      case InSet(a, _) if isAttr(a) => true
      case _ => false
    }

    def bounded(p: LogicalPlan): Boolean = p match {
      case _: Aggregate | _: GlobalLimit | _: LocalLimit | _: Deduplicate => true
      case f: Filter if boundingPredicate(f.condition) => true
      case l if l.children.isEmpty => boundedLeaf(l)
      case other => other.children.forall(bounded)
    }

    analyzed.collect {
      case h: ResolvedHint if h.hints.strategy.exists(
          _ == org.apache.spark.sql.catalyst.plans.logical.BROADCAST) && !bounded(h.child) => h
    }.nonEmpty
  }

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
          "unpartitioned-window" -> globalWindow,
          "unbounded-broadcast" -> hasUnboundedBroadcastHint(qe.analyzed)
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
