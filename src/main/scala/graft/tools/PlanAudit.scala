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
  *    Accepted instances (the CI list in CatalogContractSpec is
  *    authoritative): `q_cumulative_distinct`, `q_seasonality`,
  *    `q_kaplan_meier`, `q_log_rank`, `q_nelson_aalen`, `q_runs_test`
  *    (day/month-grain or distinct-gap-day aggregates — cardinality
  *    bounded by the calendar, not the corpus) and
  *    `q_neyman_allocation` (|o_orderpriority|-row strata aggregate —
  *    value-domain-bounded). Any OTHER query joining this list is a
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
  *  - `small-domain-join` — a join whose ENTIRE equality key set has a
  *    machine-checkably SMALL fixed value domain (masked k-bit
  *    extraction, small literal modulus, LSH band buckets) over two
  *    SF-proportional sides, with no hot-key exclusion cap on either
  *    side: a disguised cross shape, Θ(|L|·|R|/domain) on any corpus —
  *    the r12 verdict's 4-bit hyperplane banding, which the equi-keyed
  *    `cross-shape` class structurally cannot see. The maxBucket
  *    anti-join ([[graft.operators.Imaging.dhashNearDupPairs]] and the
  *    r13 ports) is the machine-checked defense. No accepted instances.
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
    *  - a `Limit` bounds its whole subtree; an `Aggregate`/`Deduplicate`
    *    bounds its subtree ONLY when every grouping/dedup key has an
    *    SF-independent value domain (empty = global agg, calendar
    *    extractions, the fixture's enum columns, constant-modulus
    *    buckets) or its child is itself bounded — r11 verdict item 1:
    *    the old unconditional trust let `broadcast(groupBy(doc_id))`,
    *    corpus-cardinality output, pass both CI gates silently;
    *  - a `Filter` whose predicate pins an attribute to constants
    *    (equality/IN, or a constant upper range like `vec_id < 102400`)
    *    bounds its subtree — the catalog's query-set idiom; residual
    *    trust: the author asserts the column is a KEY (ids, non-negative
    *    and unique), so a fixed value range is a fixed row count at any
    *    SF;
    *  - leaves must be `LocalRelation`/`OneRowRelation`, a
    *    localCheckpoint `LogicalRDD` whose RDD id the call site DECLARED
    *    driver-bounded via `BoundedCheckpoints.checkpoint` (plain
    *    `.localCheckpoint` cuts — the corpus-scale unrolled-iterative
    *    truncations — read as unbounded; r11 ADVICE), or a parquet scan
    *    of the fixed-size dimensions nation/region (25/5 rows at any SF);
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
    * banks). Same node classes as the logical walk, physical spellings —
    * including the r12 tightening: an aggregate bounds its subtree only
    * when its grouping keys have an SF-independent domain (or its child
    * is itself bounded), and an `RDDScanExec` is trusted only when its
    * RDD id is a DECLARED-bounded checkpoint (`BoundedCheckpoints`).
    */
  private final class PhysicalCtx(scope: org.apache.spark.sql.execution.SparkPlan) extends Ctx {
    private lazy val trees = physTrees(scope)
    private lazy val defs: Map[ExprId, Expression] = physDefs(trees)
    private lazy val posIds: Set[ExprId] = physPosIds(trees)
    private lazy val genSources = physGenSources(trees)
    private lazy val rebinds: Map[ExprId, ExprId] = trees.flatMap(_.collect {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        cacheRebinds(s.relation.output, s.relation.cachedPlan.output)
    }.flatten).toMap
    private def chase(id: ExprId): ExprId = chaseRebinds(rebinds, id)
    def resolve(a: AttributeReference): Option[Expression] = defs.get(chase(a.exprId))
    def posAttr(id: ExprId): Boolean = posIds.contains(chase(id))
    def genElemSource(id: ExprId): Option[Expression] =
      genSources.get(chase(id)).collect { case ("elem", e) => e }
    def genPosSource(id: ExprId): Option[Expression] =
      genSources.get(chase(id)).collect { case ("pos", e) => e }
    // no provenance analysis on the physical side: cached plans are small
    // and self-contained; the child-recursion arm in boundedCached is the
    // fallback
    def attrBounded(a: AttributeReference, depth: Int): Boolean = false
  }

  private def boundedCached(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
    boundedCachedRec(p, 0)

  private def boundedCachedRec(p: org.apache.spark.sql.execution.SparkPlan,
      depth: Int): Boolean = {
    import org.apache.spark.sql.execution._
    if (depth > MaxDepth) return false
    p match {
      case a: adaptive.AdaptiveSparkPlanExec => boundedCachedRec(a.inputPlan, depth + 1)
      case ag: aggregate.BaseAggregateExec =>
        ag.groupingExpressions.forall(g =>
          domainBounded(g, new PhysicalCtx(ag), depth + 1)) ||
          ag.children.forall(boundedCachedRec(_, depth + 1))
      case gl: GlobalLimitExec if gl.limit <= MaxBoundLiteral => true
      case ll: LocalLimitExec if ll.limit <= MaxBoundLiteral => true
      case tk: TakeOrderedAndProjectExec if tk.limit <= MaxBoundLiteral => true
      case cl: CollectLimitExec if cl.limit <= MaxBoundLiteral => true
      case _: LocalTableScanExec => true
      // window-rank filter, physical spelling (see the logical walk)
      case f: FilterExec if rankPinnedAttr(f.condition).exists { attr =>
          val ctx = new PhysicalCtx(f)
          rankDef(attr, ctx).exists(_.forall(domainBounded(_, ctx, depth + 1)))
        } => true
      // the repo's own top-k-per-group operator: ≤ k rows per group, so
      // bounded-domain group keys bound the whole output (this is the
      // physical form the rank-filter idiom takes once RewriteRules has
      // rewritten the window — e.g. the persisted theta-sketch banks)
      case tk: graft.plans.TopKPerGroupExec =>
        tk.partitionExprs.forall(g =>
          domainBounded(g, new PhysicalCtx(tk), depth + 1)) ||
          boundedCachedRec(tk.child, depth + 1)
      // localCheckpoint scan — trusted ONLY when the call site DECLARED the
      // relation driver-bounded via BoundedCheckpoints.checkpoint (r11
      // ADVICE: blanket RDD-leaf trust let a broadcast over a corpus-scale
      // lineage cut pass both CI gates silently)
      case r: RDDScanExec => BoundedCheckpoints.contains(r.rdd.id)
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.forall { rp =>
          val s = rp.toString
          s.contains("nation") || s.contains("region")
        }
      case imr: columnar.InMemoryTableScanExec =>
        boundedCachedRec(imr.relation.cachedPlan, depth + 1)
      case leaf if leaf.children.isEmpty => false
      case other => other.children.forall(boundedCachedRec(_, depth + 1))
    }
  }

  private def boundedLeaf(l: LogicalPlan): Boolean = l match {
    case _: LocalRelation | _: OneRowRelation => true
    // localCheckpoint leaf — trusted ONLY when DECLARED bounded at the
    // call site (BoundedCheckpoints.checkpoint). Plain .localCheckpoint
    // cuts (the corpus-scale unrolled-iterative truncations) read as
    // unbounded, so a broadcast/cross-shape over them flags in CI.
    case lr: org.apache.spark.sql.execution.LogicalRDD =>
      BoundedCheckpoints.contains(lr.rdd.id)
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
    // the RANGE literal itself must be small (r12): keys are unique and
    // non-negative, so `vec_id < 102400` is ≤ 102400 rows at any SF —
    // but `doc_id < 9e18` covers the whole corpus and bounds nothing
    case LessThan(a, v) if isKeyAttr(a) && smallLiteral(v) => true
    case LessThanOrEqual(a, v) if isKeyAttr(a) && smallLiteral(v) => true
    case GreaterThan(v, a) if isKeyAttr(a) && smallLiteral(v) => true
    case GreaterThanOrEqual(v, a) if isKeyAttr(a) && smallLiteral(v) => true
    case EqualTo(a, v) if isKeyAttr(a) && v.foldable => true
    case EqualTo(v, a) if isKeyAttr(a) && v.foldable => true
    case In(a, vs) if isKeyAttr(a) && vs.forall(_.foldable) => true
    case InSet(a, _) if isKeyAttr(a) => true
    case _ => false
  }

  /** Columns whose value DOMAIN is fixed regardless of scale factor, so a
    * group-by/dedup keyed ONLY on them has SF-independent output
    * cardinality: the fixture's flag/status/priority/segment/brand/type
    * enums, the 25/5-row nation/region keys, and calendar-grain date
    * columns (distinct count bounded by the data's calendar span, not its
    * row count). r11 verdict item 1: WITHOUT this list, `groupBy(doc_id)`
    * — corpus-cardinality output — bounded its subtree and a broadcast
    * over it passed both CI gates silently.
    */
  private val valueDomainCols: Set[String] = Set(
    "l_returnflag", "l_linestatus", "l_linenumber",
    "o_orderstatus", "o_orderpriority", "c_mktsegment",
    "c_nationkey", "s_nationkey", "n_nationkey", "n_name", "n_regionkey",
    "r_regionkey", "r_name", "p_brand", "p_type", "p_size",
    "event_type", "lang", "source", "label",
    "l_shipdate", "o_orderdate")

  private def stripCastAlias(e: Expression): Expression = e match {
    case c: Cast => stripCastAlias(c.child)
    case a: Alias => stripCastAlias(a.child)
    case other => other
  }

  // date_format at a calendar grain (no hour/minute/second/fraction
  // tokens) maps a timestamp onto the calendar — SF-independent domain
  private def calendarFormat(fmt: String): Boolean =
    !fmt.exists(c => "HhKkmsSa".contains(c))

  private def conjunctsOf(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjunctsOf(l) ++ conjunctsOf(r)
    case x => Seq(x)
  }

  private def attrOf(e: Expression): Option[AttributeReference] =
    stripCastAlias(e) match {
      case a: AttributeReference => Some(a)
      case _ => None
    }

  /** "Bounded" means "safe to hold in one executor", so every literal the
    * walk trusts as a row/domain bound must itself be SMALL — the r10
    * Range fix generalized: without this, `limit(1e9)`, `pmod(x, 1e12)`,
    * a ±1e15 clamp, or `rank <= 1e9` would each bless a gigarow
    * broadcast. 2^21 covers every catalog bound (the largest is the
    * 16^5 = 2^20 bloom-bit space) with 2× margin.
    */
  private val MaxBoundLiteral = 1L << 21

  private def smallLiteral(e: Expression): Boolean = stripCastAlias(e) match {
    case Literal(v: Number, _) => math.abs(v.longValue) <= MaxBoundLiteral
    case _ => false
  }

  /** A filter conjunct pinning an attribute to at most a SMALL constant
    * (`rn <= 10`, `rn === 1`) — the raw material of the window-rank
    * idiom (see [[rankDef]]).
    */
  private def rankPinnedAttr(cond: Expression): Seq[AttributeReference] =
    conjunctsOf(cond).flatMap {
      case LessThanOrEqual(a, v) if smallLiteral(v) => attrOf(a)
      case LessThan(a, v) if smallLiteral(v) => attrOf(a)
      case EqualTo(a, v) if smallLiteral(v) => attrOf(a)
      case EqualTo(v, a) if smallLiteral(v) => attrOf(a)
      case GreaterThanOrEqual(v, a) if smallLiteral(v) => attrOf(a)
      case GreaterThan(v, a) if smallLiteral(v) => attrOf(a)
      case _ => Seq.empty
    }

  /** The shared alias/provenance resolver — ONE implementation of the
    * domain analysis for both plan layers (catalyst `Expression`s are the
    * same classes in logical and physical trees; only the scope walk
    * differs). `resolve` finds an attribute's defining alias in the
    * Projects/Aggregates/Windows below; `posAttr` marks posexplode
    * POSITION outputs (domain = max array length — record-shaped, not
    * corpus-shaped); `attrBounded` is the logical-only provenance check
    * (values drawn from a bounded relation, directly or via an
    * inner/semi equi-join).
    */
  private trait Ctx {
    def resolve(a: AttributeReference): Option[Expression]
    def posAttr(id: ExprId): Boolean
    def attrBounded(a: AttributeReference, depth: Int): Boolean
    /** Generator provenance (r13): the array expression a Generate's
      * ELEMENT output explodes, keyed by the output attr's exprId — lets
      * the domain analysis see through `posexplode(hyperplane_buckets(…))`
      * and `explode(array(struct(lit(b), sig & mask)))` to the element
      * domain (an LSH bucket is NOT corpus-shaped, it is 2^rows values).
      */
    def genElemSource(id: ExprId): Option[Expression]
    /** Same, for a posexplode POSITION output: the exploded array. */
    def genPosSource(id: ExprId): Option[Expression]
  }

  private val MaxDepth = 48

  private def integralType(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
    case _ => false
  }

  /** Does this grouping/dedup/partition expression have an SF-independent
    * value domain? Literals, booleans, calendar extractions/truncations,
    * calendar-grain `date_format`, constant-modulus buckets, two-sided
    * integral clamps, arithmetic/case-when/coalesce COMBINATIONS of
    * bounded-domain terms (|domain| ≤ product of the parts), value-domain
    * columns, posexplode positions, and aliases that RESOLVE to any of
    * the above. Everything else — ids, free text, hashes — scales with
    * the corpus and does NOT bound an aggregate.
    */
  private def domainBounded(e: Expression, ctx: Ctx, depth: Int): Boolean =
    domainSize(e, ctx, depth).isDefined

  // conservative cardinality assignments for the calendar/enum classes —
  // deliberately generous (Year covers ten millennia of data) so a false
  // flag never hinges on them, while keeping combinations QUANTIFIED
  private val CalendarDays = 36600L // a century of day-grain values
  private val EnumDomain = 16384L // any fixture enum column, with margin

  /** Quantitative domain analysis: an UPPER BOUND on the expression's
    * distinct-value count at any SF, or None when it scales with the
    * corpus. Combinations multiply (Add/Multiply of two bounded arms is
    * at most |L|·|R| values) and saturate at [[MaxBoundLiteral]] — the
    * r12 fix for the boolean version's combination hole, where two
    * individually-small moduli summed into a 2^42 domain that still
    * read as "bounded".
    */
  private def domainSize(e: Expression, ctx: Ctx, depth: Int): Option[Long] = {
    if (depth > MaxDepth) return None
    def cap(n: Long): Option[Long] =
      if (n > 0 && n <= MaxBoundLiteral) Some(n) else None
    def combine(parts: Seq[Expression], f: (Long, Long) => Long,
                unit: Long): Option[Long] =
      parts.foldLeft(Option(unit)) { (acc, p) =>
        for (a <- acc; b <- domainSize(p, ctx, depth + 1); c <- cap(f(a, b))) yield c
      }
    stripCastAlias(e) match {
      case _: Literal => Some(1L)
      case b if b.dataType == org.apache.spark.sql.types.BooleanType => Some(3L)
      case _: Month | _: Quarter | _: DayOfMonth | _: DayOfWeek |
           _: WeekDay | _: Hour | _: Minute => Some(60L)
      case _: DayOfYear | _: WeekOfYear => Some(366L)
      case _: Year => Some(10000L)
      case _: TruncDate | _: TruncTimestamp => Some(CalendarDays)
      case c: Cast if c.dataType == org.apache.spark.sql.types.DateType =>
        Some(CalendarDays)
      case d: DateFormatClass => d.right match {
        case Literal(fmt, _) if calendarFormat(String.valueOf(fmt)) =>
          Some(CalendarDays)
        case _ => None
      }
      // x & SMALL_MASK: a masked k-bit extraction is at most
      // 2^popcount(mask) values regardless of x — the r12 verdict's named
      // small-domain shape (LSH band buckets, simhash chunks). Must match
      // BEFORE the generic BinaryArithmetic arm, which would multiply the
      // unbounded operand in.
      case BitwiseAnd(_, m) if maskLiteral(m).isDefined => maskLiteral(m)
      case BitwiseAnd(m, _) if maskLiteral(m).isDefined => maskLiteral(m)
      // pmod/% with a SMALL constant modulus: at most |modulus| buckets
      case Pmod(_, m, _) if smallLiteral(m) =>
        literalLong(m).flatMap(v => cap(math.abs(v)))
      case Remainder(_, m, _) if smallLiteral(m) =>
        // % keeps the sign of the dividend: up to 2·|m| − 1 values
        literalLong(m).flatMap(v => cap(2 * math.abs(v)))
      // two-sided INTEGRAL clamp — greatest(least(x, hi), lo) or the
      // mirror — is a finite interval of integers at any SF, accepted
      // only when the interval itself is small (a ±1e15 "clamp" is not
      // a bound anyone can broadcast)
      case g: Greatest if integralType(g.dataType) => (for {
          lo <- g.children.find(_.foldable)
          inner <- g.children.collectFirst { case l: Least => l }
          hi <- inner.children.find(_.foldable)
          span <- literalSpan(hi, lo)
        } yield span).flatMap(cap)
      case l: Least if integralType(l.dataType) => (for {
          hi <- l.children.find(_.foldable)
          inner <- l.children.collectFirst { case g: Greatest => g }
          lo <- inner.children.find(_.foldable)
          span <- literalSpan(hi, lo)
        } yield span).flatMap(cap)
      case ba: BinaryArithmetic =>
        combine(Seq(ba.left, ba.right), _ * _, 1L)
      case cw: CaseWhen => // at most the SUM of the branch domains
        combine(cw.branches.map(_._2) ++ cw.elseValue, _ + _, 0L)
      case If(_, t, f) => combine(Seq(t, f), _ + _, 0L)
      case c: Coalesce => combine(c.children, _ + _, 0L)
      // struct field of an exploded literal-array-of-structs (the classic
      // explode(array(struct(lit(b), sig & mask))) banding): at most the
      // SUM of that field's per-element domains
      case gsf: GetStructField => stripCastAlias(gsf.child) match {
        case a: AttributeReference =>
          ctx.genElemSource(a.exprId)
            .map(src => arraySource(src, ctx, 8))
            .flatMap(src => elemDomain(src, ctx, depth, Some(gsf.ordinal)))
        case _ => None
      }
      case a: AttributeReference =>
        if (valueDomainCols.contains(a.name.toLowerCase)) Some(EnumDomain)
        else if (a.dataType == org.apache.spark.sql.types.DateType) Some(CalendarDays)
        // posexplode position: the array's STATIC length when the plan
        // declares one (a band count), else max array length —
        // record-shaped, not corpus-shaped (longest document, fixed dims)
        else if (ctx.posAttr(a.exprId))
          ctx.genPosSource(a.exprId)
            .map(src => arraySource(src, ctx, 8))
            .flatMap(arrayStaticLen)
            .orElse(Some(65536L))
        // generator ELEMENT of a domain-declaring array (LSH bucket
        // arrays, literal arrays): the element domain, not corpus-shaped
        else ctx.genElemSource(a.exprId)
          .map(src => arraySource(src, ctx, 8))
          .flatMap(src => elemDomain(src, ctx, depth, None))
          .orElse(ctx.resolve(a) match {
            case Some(d) => domainSize(d, ctx, depth + 1)
            // provenance: values drawn from a bounded relation — that
            // relation's row count is itself capped by the walk's limits
            case None if ctx.attrBounded(a, depth + 1) => Some(MaxBoundLiteral)
            case None => None
          })
      case _ => None
    }
  }

  /** mask → 2^popcount(mask) when that is itself a SMALL domain. */
  private def maskLiteral(e: Expression): Option[Long] = stripCastAlias(e) match {
    case Literal(v: Number, _) if v.longValue >= 0 =>
      val bits = java.lang.Long.bitCount(v.longValue)
      if (bits <= 21) Some(1L << bits) else None
    case _ => None
  }

  /** Chase an exploded-array expression back through aliases to the node
    * that declares its shape (CreateArray, hyperplane_buckets, …).
    */
  private def arraySource(e: Expression, ctx: Ctx, fuel: Int): Expression =
    stripCastAlias(e) match {
      case a: AttributeReference if fuel > 0 =>
        ctx.resolve(a).map(arraySource(_, ctx, fuel - 1)).getOrElse(a)
      case other => other
    }

  /** Plan-time array length, when statically declared. */
  private def arrayStaticLen(e: Expression): Option[Long] = e match {
    case ca: CreateArray => Some(ca.children.length.toLong)
    case h: graft.functions.HyperplaneBucketsExpr => Some(h.bands.toLong)
    case _ => None
  }

  /** Domain of an exploded array's ELEMENTS (or of struct field `ordinal`
    * of each element): LSH bucket arrays declare 2^rowsPerBand; literal
    * arrays sum their per-element domains; anything else is unknown.
    */
  private def elemDomain(src: Expression, ctx: Ctx, depth: Int,
      ordinal: Option[Int]): Option[Long] = src match {
    case h: graft.functions.HyperplaneBucketsExpr if ordinal.isEmpty =>
      if (h.rowsPerBand <= 21) Some(1L << h.rowsPerBand) else None
    case ca: CreateArray =>
      val parts = ca.children.map { e =>
        (stripCastAlias(e), ordinal) match {
          case (s: CreateNamedStruct, Some(ord)) => s.valExprs.lift(ord)
          case (el, None) => Some(el)
          case _ => None
        }
      }
      if (parts.exists(_.isEmpty)) None
      else parts.flatten.foldLeft(Option(0L)) { (acc, p) =>
        for (a <- acc; b <- domainSize(p, ctx, depth + 1)
             if a + b <= MaxBoundLiteral) yield a + b
      }
    case _ => None
  }

  private def literalSpan(hi: Expression, lo: Expression): Option[Long] =
    for (h <- literalLong(hi); l <- literalLong(lo)) yield h - l + 1

  private def literalLong(e: Expression): Option[Long] = stripCastAlias(e) match {
    case Literal(v: Number, _) => Some(v.longValue)
    case _ => None
  }

  /** If `attr` is a window RANK (`row_number` — rank/dense_rank admit
    * unbounded ties), return its partition spec.
    */
  private def rankDef(attr: AttributeReference, ctx: Ctx): Option[Seq[Expression]] =
    ctx.resolve(attr) match {
      case Some(WindowExpression(_: RowNumber, spec)) => Some(spec.partitionSpec)
      case _ => None
    }

  // ---------- logical-plan walk ----------

  /** All physical trees reachable from `p`, unfolding the cached plans
    * behind `InMemoryTableScanExec` leaves — a persisted relation's
    * aliases (and posexplode outputs) live in its OWN cached tree, and a
    * grouping key two persist-layers up still refers to them by exprId.
    */
  private def physTrees(p: org.apache.spark.sql.execution.SparkPlan,
      depth: Int = 0): Seq[org.apache.spark.sql.execution.SparkPlan] =
    if (depth > 8) Seq.empty
    else p +: p.collect {
      case imr: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        physTrees(imr.relation.cachedPlan, depth + 1)
      // the AQE wrapper is a LEAF node — collect() does not descend into
      // its inputPlan, so unfold it explicitly or every cached subtree
      // behind it is invisible to alias resolution
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        physTrees(a.inputPlan, depth + 1)
    }.flatten

  private def physDefs(trees: Seq[org.apache.spark.sql.execution.SparkPlan])
      : Map[ExprId, Expression] = {
    import org.apache.spark.sql.execution._
    trees.flatMap(_.collect {
      case p: ProjectExec => p.projectList
      case ag: aggregate.BaseAggregateExec =>
        ag.groupingExpressions ++ ag.resultExpressions
      case w: window.WindowExec => w.windowExpression
    }.flatten).collect { case a: Alias => a.exprId -> a.child }.toMap
  }

  private def physPosIds(trees: Seq[org.apache.spark.sql.execution.SparkPlan])
      : Set[ExprId] =
    trees.flatMap(_.collect {
      case g: org.apache.spark.sql.execution.GenerateExec
          if g.generator.isInstanceOf[PosExplode] =>
        g.generatorOutput.head.exprId
    }).toSet

  /** Cache-instance REBINDS (r13): a self-join over a persisted relation
    * re-instances the `InMemoryRelation` leaf with FRESH output exprIds,
    * while the aliases/generators that define those columns live in the
    * cached plan under the ORIGINAL ids — without this map, every second
    * occurrence of a cached relation was provenance-blind (the kmeans/CKA
    * false-flag class: a posexplode position behind a cache read as an
    * unbounded key).
    */
  private def cacheRebinds(outer: Seq[Attribute],
      inner: Seq[Attribute]): Seq[(ExprId, ExprId)] =
    outer.zip(inner).collect {
      case (o, c) if o.exprId != c.exprId => o.exprId -> c.exprId
    }

  private def chaseRebinds(rebinds: Map[ExprId, ExprId], id: ExprId,
      fuel: Int = 8): ExprId =
    rebinds.get(id) match {
      case Some(next) if fuel > 0 => chaseRebinds(rebinds, next, fuel - 1)
      case _ => id
    }

  /** exprId → ("pos"|"elem", exploded array expression) for every
    * array-typed Explode/PosExplode output in the trees (map explodes
    * have two value outputs and are skipped).
    */
  private def genSourcesOf(gen: Expression,
      out: Seq[Attribute]): Seq[(ExprId, (String, Expression))] = gen match {
    case PosExplode(child) if child.dataType.isInstanceOf[
        org.apache.spark.sql.types.ArrayType] && out.length == 2 =>
      Seq(out(0).exprId -> (("pos", child)), out(1).exprId -> (("elem", child)))
    case Explode(child) if child.dataType.isInstanceOf[
        org.apache.spark.sql.types.ArrayType] && out.length == 1 =>
      Seq(out(0).exprId -> (("elem", child)))
    case _ => Seq.empty
  }

  private def physGenSources(trees: Seq[org.apache.spark.sql.execution.SparkPlan])
      : Map[ExprId, (String, Expression)] =
    trees.flatMap(_.collect {
      case g: org.apache.spark.sql.execution.GenerateExec =>
        genSourcesOf(g.generator, g.generatorOutput)
    }.flatten).toMap

  private final class LogicalCtx(scope: LogicalPlan,
      memo: java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]) extends Ctx {
    // alias defs in this logical tree PLUS the cached physical trees of
    // any InMemoryRelation leaves (a persisted relation's provenance is
    // only visible in its cached plan)
    private lazy val cachedTrees = scope.collect {
      case imr: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        physTrees(imr.cachedPlan)
    }.flatten
    private lazy val defs: Map[ExprId, Expression] = scope.collect {
      case p: Project => p.projectList
      case ag: Aggregate => ag.aggregateExpressions
      case w: Window => w.windowExpressions
    }.flatten.collect { case a: Alias => a.exprId -> a.child }.toMap ++
      physDefs(cachedTrees)
    private lazy val posIds: Set[ExprId] = scope.collect {
      case g: Generate if g.generator.isInstanceOf[PosExplode] =>
        g.generatorOutput.head.exprId
    }.toSet ++ physPosIds(cachedTrees)
    private lazy val genSources: Map[ExprId, (String, Expression)] =
      scope.collect {
        case g: Generate => genSourcesOf(g.generator, g.generatorOutput)
      }.flatten.toMap ++ physGenSources(cachedTrees)
    private lazy val rebinds: Map[ExprId, ExprId] = (scope.collect {
      case imr: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        cacheRebinds(imr.output, imr.cachedPlan.output)
    }.flatten ++ cachedTrees.flatMap(_.collect {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        cacheRebinds(s.relation.output, s.relation.cachedPlan.output)
    }.flatten)).toMap
    private def chase(id: ExprId): ExprId = chaseRebinds(rebinds, id)
    def resolve(a: AttributeReference): Option[Expression] = defs.get(chase(a.exprId))
    def posAttr(id: ExprId): Boolean = posIds.contains(chase(id))
    def genElemSource(id: ExprId): Option[Expression] =
      genSources.get(chase(id)).collect { case ("elem", e) => e }
    def genPosSource(id: ExprId): Option[Expression] =
      genSources.get(chase(id)).collect { case ("pos", e) => e }
    def attrBounded(a: AttributeReference, depth: Int): Boolean =
      // provenance: the attr is OUTPUT by a bounded node (its values are
      // drawn from an SF-independent row set)…
      scope.collect {
        case n if n.output.exists(_.exprId == a.exprId) => n
      }.exists(n => boundedRec(n, memo, depth)) ||
      // …or an inner/semi equi-join below pins its surviving values to a
      // bounded side's key set (the dtab idiom: groupBy(query_id) after
      // joining the corpus to a bounded probe set on that very key)
      scope.collect { case j: Join => j }.exists { j =>
        (j.joinType == org.apache.spark.sql.catalyst.plans.Inner ||
         j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi) &&
        j.condition.toSeq.flatMap(conjunctsOf).exists {
          case EqualTo(l, r) =>
            def side(e: Expression): Option[LogicalPlan] =
              if (e.references.subsetOf(j.left.outputSet)) Some(j.left)
              else if (e.references.subsetOf(j.right.outputSet)) Some(j.right)
              else None
            (attrOf(l).exists(_.exprId == a.exprId) &&
              side(r).exists(boundedRec(_, memo, depth))) ||
            (attrOf(r).exists(_.exprId == a.exprId) &&
              side(l).exists(boundedRec(_, memo, depth)))
          case _ => false
        }
      }
  }

  /** The recursive boundedness walk shared by the broadcast-hint and
    * cross-shape classes: true iff the node's output cardinality is
    * SF-independent. r12 tightening (r11 verdict item 1 + ADVICE): an
    * Aggregate/Deduplicate bounds its subtree only when its grouping/
    * dedup keys ALL have an SF-independent domain (empty = global agg)
    * or its child is itself bounded — `groupBy(doc_id)` has
    * corpus-cardinality output and no longer launders a broadcast past
    * the CI gates. New bounding shapes the tightening required the walk
    * to actually UNDERSTAND (previously laundered by the blanket trust):
    * window `row_number() <= k` filters over bounded-domain partitions,
    * semi/anti joins (output ⊆ left), and bounded × rank-multiplicity
    * equi-joins (probe-set × top-k-per-probe, the ANN idiom).
    */
  def bounded(p: LogicalPlan): Boolean =
    boundedRec(p, new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean](), 0)

  private def boundedRec(p: LogicalPlan,
      memo: java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean],
      depth: Int): Boolean = {
    if (depth > MaxDepth) return false
    val cached = memo.get(p)
    if (cached != null) return cached.booleanValue
    memo.put(p, java.lang.Boolean.FALSE) // cycle/diamond breaker while computing
    val res = p match {
      case a: Aggregate =>
        a.groupingExpressions.forall(g =>
          domainBounded(g, new LogicalCtx(a.child, memo), depth + 1)) ||
          boundedRec(a.child, memo, depth + 1)
      case d: Deduplicate =>
        d.keys.forall(k =>
          domainBounded(k, new LogicalCtx(d.child, memo), depth + 1)) ||
          boundedRec(d.child, memo, depth + 1)
      // a Limit bounds only when its row count is itself SMALL — the
      // same executor-memory meaning of "bounded" the Range rule uses
      case gl: GlobalLimit if smallLiteral(gl.limitExpr) => true
      case ll: LocalLimit if smallLiteral(ll.limitExpr) => true
      case f: Filter if boundingPredicate(f.condition) => true
      // window-rank filter: rn <= k over partitions whose keys all have
      // bounded domain → at most k × |domain| rows at any SF
      case f: Filter if rankPinnedAttr(f.condition).exists { attr =>
          val ctx = new LogicalCtx(f.child, memo)
          rankDef(attr, ctx).exists(_.forall(domainBounded(_, ctx, depth + 1)))
        } => true
      case j: Join if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi ||
          j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti =>
        boundedRec(j.left, memo, depth + 1)
      case j: Join =>
        j.children.forall(boundedRec(_, memo, depth + 1)) ||
          equiMultBounded(j, memo, depth + 1)
      case l if l.children.isEmpty => boundedLeaf(l)
      case other => other.children.forall(boundedRec(_, memo, depth + 1))
    }
    memo.put(p, res)
    res
  }

  /** bounded × rank-multiplicity equi-join: one side is bounded and the
    * other carries a window `row_number() <= k` filter PARTITIONED BY the
    * join keys — so each bounded-side row matches at most k rows and the
    * join output is ≤ k × |bounded|. The broadcast(probes ⋈ queries)
    * idiom: probes is corpus × nProbe rows, but per query_id it is
    * exactly nProbe.
    */
  private def equiMultBounded(j: Join,
      memo: java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean],
      depth: Int): Boolean = {
    val pairs = j.condition.toSeq.flatMap(conjunctsOf).collect {
      case EqualTo(l, r) => (l, r)
      case EqualNullSafe(l, r) => (l, r)
    }
    if (pairs.isEmpty || depth > MaxDepth) return false
    def keysOn(side: LogicalPlan): Set[ExprId] = pairs.flatMap { case (l, r) =>
      Seq(l, r).filter(_.references.subsetOf(side.outputSet)).flatMap(attrOf).map(_.exprId)
    }.toSet
    def multBounded(side: LogicalPlan): Boolean = {
      val keys = keysOn(side)
      val ctx = new LogicalCtx(side, memo)
      def canon(a: AttributeReference, fuel: Int): ExprId =
        if (fuel == 0) a.exprId
        else ctx.resolve(a).flatMap(attrOf) match {
          case Some(b) => canon(b, fuel - 1)
          case None => a.exprId
        }
      val canonKeys = keys.map(id => canon(AttributeReference("k",
        org.apache.spark.sql.types.LongType)(exprId = id), 8))
      def walk(p: LogicalPlan): Boolean = p match {
        case pr: Project => walk(pr.child)
        case sa: SubqueryAlias => walk(sa.child)
        case f: Filter =>
          rankPinnedAttr(f.condition).exists { attr =>
            rankDef(attr, ctx).exists(_.forall { pe =>
              attrOf(pe).exists(a => canonKeys.contains(canon(a, 8))) ||
                domainBounded(pe, ctx, depth + 1)
            })
          } || walk(f.child)
        case _ => false
      }
      walk(side)
    }
    (boundedRec(j.left, memo, depth) && multBounded(j.right)) ||
      (boundedRec(j.right, memo, depth) && multBounded(j.left))
  }

  /** A logical `Window` with an EMPTY partition spec funnels its whole
    * input through one task — acceptable only over calendar/value-domain
    * bounded inputs (the documented accepted set in CatalogContractSpec)
    * or below a Limit (the benign rank-over-top-k idiom, suppressed here).
    * Shared by PlanAudit.main and the CI gate so a detector drift breaks
    * the negative tests instead of going silent.
    */
  def hasUnboundedGlobalWindow(optimized: LogicalPlan): Boolean =
    optimized.collect {
      case w: Window if w.partitionSpec.isEmpty &&
        w.child.collectFirst { case _: GlobalLimit | _: LocalLimit => () }.isEmpty => w
    }.nonEmpty

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
  private def linksBothSides(j: Join, l: Expression, r: Expression): Boolean =
    l.references.nonEmpty && r.references.nonEmpty &&
      ((l.references.subsetOf(j.left.outputSet) && r.references.subsetOf(j.right.outputSet)) ||
       (l.references.subsetOf(j.right.outputSet) && r.references.subsetOf(j.left.outputSet)))

  def hasUnboundedCrossShape(optimized: LogicalPlan): Boolean = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
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

  /** True iff one side of the join EXCLUDES hot keys before joining: a
    * LeftAnti join below (through unary nodes) whose equality keys cover
    * the outer join keys on that side, against a count-thresholded
    * aggregate over those keys — the `maxBucket` discipline every banded
    * family here carries ([[graft.operators.Imaging.dhashNearDupPairs]]
    * and the r13 ports). With hot keys excluded, every surviving key has
    * ≤ cap rows on that side, so the outer join's output is ≤ cap ×
    * |other side| — LINEAR in corpus size, which is what licenses a
    * small-domain equi-key.
    */
  private def hotKeyCapped(side: LogicalPlan, keys: Set[ExprId]): Boolean = {
    def hotListShaped(p: LogicalPlan): Boolean =
      p.collectFirst { case a: Aggregate => a }.nonEmpty &&
        p.collectFirst {
          case f: Filter if conjunctsOf(f.condition).exists {
              case GreaterThan(_, v) => v.foldable
              case GreaterThanOrEqual(_, v) => v.foldable
              case LessThan(v, _) => v.foldable
              case LessThanOrEqual(v, _) => v.foldable
              case _ => false
            } => f
        }.nonEmpty
    def walk(p: LogicalPlan, fuel: Int): Boolean =
      if (fuel == 0 || keys.isEmpty) false
      else p match {
        case j: Join if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti =>
          val antiKeys = j.condition.toSeq.flatMap(conjunctsOf).collect {
            case EqualTo(l, r) => Seq(l, r)
            case EqualNullSafe(l, r) => Seq(l, r)
          }.flatten.filter(_.references.subsetOf(j.left.outputSet))
            .flatMap(attrOf).map(_.exprId).toSet
          (keys.subsetOf(antiKeys) && hotListShaped(j.right)) ||
            walk(j.left, fuel - 1)
        case u: org.apache.spark.sql.catalyst.plans.logical.UnaryNode =>
          walk(u.child, fuel - 1)
        case _ => false
      }
    walk(side, MaxDepth)
  }

  /** True iff this side's PER-KEY multiplicity is bounded by an Aggregate
    * or Deduplicate below (through unary nodes / semi-anti lefts) whose
    * grouping keys are each either one of the outer join keys (≤ 1 row per
    * key tuple contribution) or a bounded-domain expression (multiplicity
    * ≤ the product of those domains): the centroid/per-group-stats shape —
    * `corpus ⋈ groupBy(cluster, idx)` on `idx` is ≤ |corpus|·|cluster
    * domain| rows, LINEAR in the corpus. An aggregate keyed by a
    * corpus-shaped column (doc_id) bounds nothing and does not clear the
    * flag.
    */
  private def keyMultiplicityBounded(side: LogicalPlan, keys: Set[ExprId],
      memo: java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]): Boolean = {
    val ctx = new LogicalCtx(side, memo)
    def canon(id: ExprId, fuel: Int): ExprId =
      if (fuel == 0) id
      else ctx.resolve(AttributeReference("k",
          org.apache.spark.sql.types.LongType)(exprId = id)).flatMap(attrOf) match {
        case Some(b) => canon(b.exprId, fuel - 1)
        case None => id
      }
    val canonKeys = keys.map(canon(_, 8))
    def groupingOk(exprs: Seq[Expression]): Boolean = {
      val (keyed, rest) = exprs.partition(g =>
        attrOf(g).exists(a => canonKeys.contains(canon(a.exprId, 8))))
      keyed.nonEmpty && rest.foldLeft(Option(1L)) { (acc, g) =>
        for (a <- acc; b <- domainSize(g, ctx, 0)
             if a * b <= MaxBoundLiteral) yield a * b
      }.isDefined
    }
    def walk(p: LogicalPlan, fuel: Int): Boolean =
      if (fuel == 0) false
      else p match {
        case a: Aggregate => groupingOk(a.groupingExpressions) ||
          walk(a.child, fuel - 1)
        case d: Deduplicate => groupingOk(d.keys) || walk(d.child, fuel - 1)
        case j: Join if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi ||
            j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti =>
          walk(j.left, fuel - 1)
        case u: org.apache.spark.sql.catalyst.plans.logical.UnaryNode =>
          walk(u.child, fuel - 1)
        case _ => false
      }
    walk(side, MaxDepth)
  }

  /** r12 verdict item 3: a join whose ENTIRE equality key set has a
    * machine-checkably SMALL fixed value domain (a masked k-bit
    * extraction, a small literal modulus, an LSH band-bucket array, a
    * literal band index) over two SF-proportional sides is a DISGUISED
    * cross shape — output Θ(|L|·|R| / domain) on ANY corpus, exactly the
    * 4-bit hyperplane banding this round replaced, and invisible to
    * `cross-shape` because the join IS equi-keyed. Accepted defenses,
    * machine-checked: a bounded side (the shared walk), or the
    * [[hotKeyCapped]] hot-key exclusion on either side. Semi/anti joins
    * are exempt (output ≤ left). The per-conjunct domain is the MIN of
    * the two sides' domains (an equi-key's joint domain is their
    * intersection); conjunct domains multiply and any unbounded conjunct
    * (ids, content hashes) clears the join.
    */
  def hasSmallDomainKeyJoin(optimized: LogicalPlan): Boolean = {
    val memo = new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]()
    optimized.collect { case j: Join => j }.exists { j =>
      val exempt = j.joinType match {
        case org.apache.spark.sql.catalyst.plans.LeftSemi |
             org.apache.spark.sql.catalyst.plans.LeftAnti => true
        case _: org.apache.spark.sql.catalyst.plans.ExistenceJoin => true
        case _ => false
      }
      if (exempt) false
      else {
        val pairs = j.condition.toSeq.flatMap(conjunctsOf).collect {
          case EqualTo(l, r) if linksBothSides(j, l, r) => (l, r)
          case EqualNullSafe(l, r) if linksBothSides(j, l, r) => (l, r)
        }
        pairs.nonEmpty && {
          val lctx = new LogicalCtx(j.left, memo)
          val rctx = new LogicalCtx(j.right, memo)
          def sideOf(e: Expression): (Expression, Ctx) =
            if (e.references.subsetOf(j.left.outputSet)) (e, lctx) else (e, rctx)
          val product = pairs.foldLeft(Option(1L)) { case (acc, (l, r)) =>
            val (le, lc) = sideOf(l)
            val (re, rc) = sideOf(r)
            val d = (domainSize(le, lc, 0), domainSize(re, rc, 0)) match {
              case (Some(a), Some(b)) => Some(math.min(a, b))
              case (Some(a), None) => Some(a)
              case (None, Some(b)) => Some(b)
              case _ => None
            }
            for (a <- acc; b <- d if a * b <= MaxBoundLiteral) yield a * b
          }
          product.isDefined &&
            !bounded(j.left) && !bounded(j.right) && {
              def keyIds(side: LogicalPlan): Set[ExprId] =
                pairs.flatMap { case (l, r) => Seq(l, r) }
                  .filter(_.references.subsetOf(side.outputSet))
                  .flatMap(attrOf).map(_.exprId).toSet
              val (lk, rk) = (keyIds(j.left), keyIds(j.right))
              !hotKeyCapped(j.left, lk) && !hotKeyCapped(j.right, rk) &&
                !keyMultiplicityBounded(j.left, lk, memo) &&
                !keyMultiplicityBounded(j.right, rk, memo)
            }
        }
      }
    }
  }

  /** r13 verdict item 2 — the model-output join-key blind spot: a join
    * whose ENTIRE equality key set resolves on BOTH sides to a
    * model/quantizer assignment (a `ScalaUDF` output — the KMeans
    * prediction column is the one black-box column family in this
    * codebase; every other derivation is native Catalyst) is
    * domain-INVISIBLE to [[hasSmallDomainKeyJoin]]: the walk cannot see
    * that `cluster` has k values, so a fixed-k assignment self-join is
    * Θ(n²/k) with no flag — exactly the old `semanticDroppedIds` shape.
    * Accepted defenses are the same machine-checked ones: a bounded side,
    * the [[hotKeyCapped]] hot-key exclusion, or [[keyMultiplicityBounded]]
    * (the centroid/per-cell-stats shape). A join against a
    * LocalRelation-derived or aggregate-derived cluster column (the IVF
    * probe idiom) does not fire — only assignment-vs-assignment does.
    *
    * KNOWN BLIND SPOT (r14 ADVICE): `dedup_semantic`'s catalog entry
    * localCheckpoints its assignment relation before the pair join, so on
    * THAT entry the cluster column resolves to a checkpoint scan, never a
    * ScalaUDF — this gate cannot fire there even if the hot-cell cap were
    * removed. Coverage for the entry comes from two other pins: the
    * library-level must-fire reconstruction in PlanGateSpec (the capped
    * `semanticDroppedIds` path itself) and CatalogContractSpec's
    * "dedup_semantic rides the capped path" test, which executes the entry
    * and requires the `hot_cells_excluded` verdict row the capped path
    * alone produces.
    */
  def hasModelKeyJoin(optimized: LogicalPlan): Boolean = {
    val memo = new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]()
    optimized.collect { case j: Join => j }.exists { j =>
      val exempt = j.joinType match {
        case org.apache.spark.sql.catalyst.plans.LeftSemi |
             org.apache.spark.sql.catalyst.plans.LeftAnti => true
        case _: org.apache.spark.sql.catalyst.plans.ExistenceJoin => true
        case _ => false
      }
      if (exempt) false
      else {
        val pairs = j.condition.toSeq.flatMap(conjunctsOf).collect {
          case EqualTo(l, r) if linksBothSides(j, l, r) => (l, r)
          case EqualNullSafe(l, r) if linksBothSides(j, l, r) => (l, r)
        }
        pairs.nonEmpty && {
          val lctx = new LogicalCtx(j.left, memo)
          val rctx = new LogicalCtx(j.right, memo)
          def ctxOf(e: Expression): Ctx =
            if (e.references.subsetOf(j.left.outputSet)) lctx else rctx
          def isModelKey(e: Expression, ctx: Ctx, fuel: Int): Boolean =
            stripCastAlias(e) match {
              case a: AttributeReference if fuel > 0 =>
                ctx.resolve(a).exists(isModelKey(_, ctx, fuel - 1))
              case _: org.apache.spark.sql.catalyst.expressions.ScalaUDF => true
              case _ => false
            }
          pairs.forall { case (l, r) =>
            isModelKey(l, ctxOf(l), 8) && isModelKey(r, ctxOf(r), 8) } &&
            !bounded(j.left) && !bounded(j.right) && {
              def keyIds(side: LogicalPlan): Set[ExprId] =
                pairs.flatMap { case (l, r) => Seq(l, r) }
                  .filter(_.references.subsetOf(side.outputSet))
                  .flatMap(attrOf).map(_.exprId).toSet
              val (lk, rk) = (keyIds(j.left), keyIds(j.right))
              !hotKeyCapped(j.left, lk) && !hotKeyCapped(j.right, rk) &&
                !keyMultiplicityBounded(j.left, lk, memo) &&
                !keyMultiplicityBounded(j.right, rk, memo)
            }
        }
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate(quietAcceptedWarnings = true)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val pat = args.filterNot(_.startsWith("--")).headOption.getOrElse("")
    val doPrint = args.contains("--print")
    var flagged = 0
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1) if name.contains(pat)) {
      try {
        val qe = fn(spark, dir).queryExecution
        val plan = qe.executedPlan.toString
        val globalWindow = hasUnboundedGlobalWindow(qe.optimizedPlan)
        val flags = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "SortMergeJoin" -> plan.contains("SortMergeJoin"),
          "range-partition" -> plan.contains("Exchange rangepartitioning"),
          "unpartitioned-window" -> globalWindow,
          "unbounded-broadcast" -> hasUnboundedBroadcastHint(qe.analyzed),
          "cross-shape" -> hasUnboundedCrossShape(qe.optimizedPlan),
          "small-domain-join" -> hasSmallDomainKeyJoin(qe.optimizedPlan),
          "model-key-join" -> hasModelKeyJoin(qe.optimizedPlan),
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
