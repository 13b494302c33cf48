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
  *  - `cross-shape` — a join with NO equality conjunct between its
  *    sides (planned as `CartesianProduct`, or `BroadcastNestedLoopJoin`
  *    when an inequality-only condition exists) whose inputs BOTH scale
  *    with the corpus: |L|·|R| compute plus an unbounded broadcast. r10
  *    verdict: the grep-only `CartesianProduct` class missed BNLJ, so
  *    five ER evaluation entries shipped all-pairs over an
  *    SF-proportional sample silently. One bounded side is accepted
  *    (probe-set × corpus is linear — the ANN idiom). Accepted
  *    instances: the DECLARED brute-force twins whose contract IS the
  *    exhaustive pair set (`dedup_embedding_cosine`, `vector_knn_graph`,
  *    `stream_embedding_dedup_recall`, `dedup_simhash_witness`,
  *    `dedup_embedding_lsh_witness`, `dedup_semantic_witness`). Any
  *    OTHER query joining this list is a regression — enforced in CI by
  *    CatalogContractSpec.
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
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.catalyst.plans.logical._
  import org.apache.spark.sql.execution.datasources.LogicalRelation

  /** Physical-plan boundedness for CACHED subtrees: caching replaces
    * the logical subtree with an `InMemoryRelation` LEAF in the optimized
    * plan, so the Aggregate/Limit that bounds it is only visible in the
    * relation's cached PHYSICAL plan — without this walk, every persisted
    * 25-row aggregate read as "unbounded" (the r11 false-positive class:
    * q_kendall_tau's per-nation pair matrix, the theta/simhash signature
    * banks). Same node classes as the logical walk, physical spellings.
    */
  private def boundedCached(p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    import org.apache.spark.sql.execution._
    p match {
      case a: adaptive.AdaptiveSparkPlanExec => boundedCached(a.inputPlan)
      case _: aggregate.BaseAggregateExec => true
      case _: GlobalLimitExec | _: LocalLimitExec => true
      case _: TakeOrderedAndProjectExec | _: CollectLimitExec => true
      case _: LocalTableScanExec => true
      // localCheckpoint scan — same documented trust as logical LogicalRDD
      case _: RDDScanExec => true
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.forall { rp =>
          val s = rp.toString
          s.contains("nation") || s.contains("region")
        }
      case imr: columnar.InMemoryTableScanExec => boundedCached(imr.relation.cachedPlan)
      case leaf if leaf.children.isEmpty => false
      case other => other.children.forall(boundedCached)
    }
  }

  private def boundedLeaf(l: LogicalPlan): Boolean = l match {
    case _: LocalRelation | _: OneRowRelation => true
    case _: org.apache.spark.sql.execution.LogicalRDD => true
    case imr: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
      boundedCached(imr.cachedPlan)
    // spark.range(a, b): numElements is a plan-time LITERAL, so the size
    // is SF-independent — but "bounded" here means "safe to hold in one
    // executor", so the literal itself must be small (r10 advice: the old
    // unconditional accept would have blessed a broadcast of
    // spark.range(1e12)). 65536 covers every catalog axis (deciles,
    // calendar grids, k-grids) with two orders of margin.
    case r: Range => r.numElements <= BigInt(65536)
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

  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case other => other
  }

  /** Constant-predicate columns the audit TRUSTS to be keys (unique,
    * non-negative ids), so a fixed value range is a fixed row count at
    * any SF. r10 advice: the old rule accepted ANY attribute — equality
    * on a non-key column (`lang = 'en'`) selects a corpus-proportional
    * subset, so the trust must be machine-checked against a declared
    * allowlist: the synthetic tables' id columns (vec_id/doc_id/event_id)
    * and the TPC-H `*key` family. A bounding filter on any other column
    * no longer bounds its subtree.
    */
  private def isKeyAttr(e: Expression): Boolean = stripCast(e) match {
    case a: AttributeReference =>
      val n = a.name.toLowerCase
      n == "vec_id" || n == "doc_id" || n == "event_id" || n.endsWith("key")
    case _ => false
  }

  // does this predicate fix the qualifying key set regardless of SF?
  // AND: one bounding conjunct suffices (conjunction only narrows);
  // OR: every disjunct must bound. Analysis wraps literals (and
  // sometimes the column) in type-coercion Casts — strip them, and
  // accept any FOLDABLE comparand (constant at plan time).
  private def boundingPredicate(e: Expression): Boolean = e match {
    case And(l, r) => boundingPredicate(l) || boundingPredicate(r)
    case Or(l, r) => boundingPredicate(l) && boundingPredicate(r)
    case LessThan(a, v) if isKeyAttr(a) && v.foldable => true
    case LessThanOrEqual(a, v) if isKeyAttr(a) && v.foldable => true
    case GreaterThan(v, a) if isKeyAttr(a) && v.foldable => true
    case GreaterThanOrEqual(v, a) if isKeyAttr(a) && v.foldable => true
    case EqualTo(a, v) if isKeyAttr(a) && v.foldable => true
    case EqualTo(v, a) if isKeyAttr(a) && v.foldable => true
    case In(a, vs) if isKeyAttr(a) && vs.forall(_.foldable) => true
    case InSet(a, _) if isKeyAttr(a) => true
    case _ => false
  }

  /** The recursive boundedness walk shared by the broadcast-hint and
    * cross-shape classes: true iff EVERY root-to-leaf path carries a
    * bounding node (Aggregate/Limit/Deduplicate/key-constant Filter) or
    * ends at a provably small leaf.
    */
  def bounded(p: LogicalPlan): Boolean = p match {
    case _: Aggregate | _: GlobalLimit | _: LocalLimit | _: Deduplicate => true
    case f: Filter if boundingPredicate(f.condition) => true
    case l if l.children.isEmpty => boundedLeaf(l)
    case other => other.children.forall(bounded)
  }

  def hasUnboundedBroadcastHint(analyzed: LogicalPlan): Boolean =
    analyzed.collect {
      case h: ResolvedHint if h.hints.strategy.exists(
          _ == org.apache.spark.sql.catalyst.plans.logical.BROADCAST) && !bounded(h.child) => h
    }.nonEmpty

  /** True iff the plan carries a CROSS-SHAPED join — one with no
    * equality conjunct linking the two sides, which Spark executes as
    * `CartesianProduct` or (with any inequality-only condition, e.g. the
    * classic `a.id < b.id` self-pairing) `BroadcastNestedLoopJoin` —
    * where BOTH inputs scale with the corpus. That shape is |L|·|R|
    * compute AND an unbounded broadcast of one side: quadratic at 100 TB
    * no matter how green the fixture run is. r10 verdict: the audit only
    * grepped `CartesianProduct`, so five ER evaluation entries shipped
    * this shape silently behind BNLJ. One bounded side is accepted —
    * `broadcast(probe-set) join corpus ON non-equi` is linear per probe,
    * the catalog's ANN idiom.
    */
  def hasUnboundedCrossShape(optimized: LogicalPlan): Boolean = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    def linksBothSides(j: Join, l: Expression, r: Expression): Boolean =
      l.references.nonEmpty && r.references.nonEmpty &&
        ((l.references.subsetOf(j.left.outputSet) && r.references.subsetOf(j.right.outputSet)) ||
         (l.references.subsetOf(j.right.outputSet) && r.references.subsetOf(j.left.outputSet)))
    def hasEquiKeys(j: Join): Boolean = j.condition.exists { cond =>
      conjuncts(cond).exists {
        case EqualTo(l, r) => linksBothSides(j, l, r)
        case EqualNullSafe(l, r) => linksBothSides(j, l, r)
        // null-aware anti join (NOT IN): `a = b OR isnull(a = b)` — Spark's
        // ExtractEquiJoinKeys plans this as a hashed BroadcastHashJoin
        // LeftAnti, not a nested loop, so it is equi-shaped for this audit
        case Or(eq @ EqualTo(l, r), IsNull(eq2)) if eq.semanticEquals(eq2) =>
          linksBothSides(j, l, r)
        case _ => false
      }
    }
    optimized.collect {
      case j: Join if !hasEquiKeys(j) && !bounded(j.left) && !bounded(j.right) => j
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
          "unbounded-broadcast" -> hasUnboundedBroadcastHint(qe.analyzed),
          "cross-shape" -> hasUnboundedCrossShape(qe.optimizedPlan),
          // a >250 KB plan STRING (unrolled iterative rounds nesting the
          // whole lineage) is constant w.r.t. data but real driver CPU +
          // log noise per run — Spark truncates at 262 KB and warns; the
          // fix is a localCheckpoint between unroll rounds
          "giant-plan" -> (plan.length > 250000)
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
