package graft

import graft.queries.AnalyticsQueries

/** Plan-shape assertions: the properties that matter at 100 TB — filter/
  * column pushdown into the parquet scan, broadcast joins for dimensions,
  * whole-stage codegen coverage. Guards against regressions that stay
  * invisible at test scale.
  */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String = {
    val df = AnalyticsQueries.defs(name)._1(spark, sf0001)
    df.queryExecution.executedPlan.toString
  }

  test("q5 joins all dimension tables via broadcast, no sort-merge join") {
    val plan = planOf("q5_region_revenue")
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"), "dimension joins must broadcast")
  }

  test("q3 pushes the segment filter down to the customer scan") {
    val df = AnalyticsQueries.defs("q3_top_orders")._1(spark, sf0001)
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    assert(scans.exists(s => s.contains("customer.parquet") &&
      s.contains("c_mktsegment") && s.contains("PushedFilters")),
      "segment predicate should reach the parquet scan")
  }

  test("q1 reads only the columns it needs (column pruning)") {
    val df = AnalyticsQueries.defs("q1_agg")._1(spark, sf0001)
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .find(_.contains("lineitem.parquet")).get
    assert(scan.contains("l_returnflag") && scan.contains("l_quantity"))
    assert(!scan.contains("l_extendedprice"), s"over-wide ReadSchema: $scan")
  }

  test("ann_index_partitioned prunes index partitions dynamically off the probe side") {
    val df = graft.queries.LlmQueries.defs("ann_index_partitioned")._1(spark, sf0001)
    // the entry writes the partitioned index as a side effect of plan
    // construction, so the read scan below refers to real files
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .find(_.contains("ann-index")) // graft-scratch-<jvm>/ann-index (TmpDirs)
      .getOrElse(fail("no scan over the partitioned index"))
    assert(scan.contains("dynamicpruning") || scan.contains("PartitionFilters: [dynamic"),
      s"probe join should prune index partitions dynamically: $scan")
    // and the result itself is correct at this scale (cells cover queries)
    assert(df.count() > 0)
  }

  test("q_range_window shuffles once on user_id and keeps the RANGE frame") {
    val plan = planOf("q_range_window")
    assert(plan.contains("RangeFrame"), "must be a range frame, not rows")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"one window shuffle expected:\n$plan")
  }

  test("q_string_agg broadcasts the dimension side") {
    val plan = planOf("q_string_agg")
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q7 broadcasts all four dimension lookups; the fact join is the only shuffle join") {
    val plan = planOf("q7_nation_volume")
    // supplier/customer/nation×2 broadcast; lineitem↔orders may shuffle
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 4,
      s"dimension joins must broadcast:\n${plan.take(800)}")
    assert(!plan.contains("CartesianProduct"))
  }

  test("vector_matryoshka never sort-merge-joins its k-row rankings") {
    val df = graft.queries.LlmQueries.defs("vector_matryoshka")._1(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"top-k overlap relations must broadcast:\n${plan.take(800)}")
  }

  test("dq_expectations evaluates all rules in a single orders scan + one anti-join") {
    val df = AnalyticsQueries.defs("dq_expectations")._1(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // AQE roots are leaf nodes, so count scans in the rendered plan: the
    // path prints once per FileScan (rules pass + RI probe side)
    val ordersScans = "orders\\.parquet".r.findAllIn(plan).length
    assert(ordersScans == 2, s"one rules scan + one RI scan expected, got $ordersScans:\n${plan.take(600)}")
    assert(plan.contains("BroadcastHashJoin"), "RI check must broadcast")
  }

  test("text_chunks is a narrow plan (no shuffle)") {
    val df = graft.queries.LlmQueries.defs("text_chunks")._1(spark, sf0001)
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "chunking must not shuffle")
  }

  test("q_range_join pairs points and intervals with a hash join on the bucket") {
    val plan = planOf("q_range_join")
    // the point×interval containment must be a hash equi-join on _bucket
    // (the only permitted nested-loop is the 1-row min-timestamp anchor)
    assert(plan.contains("HashJoin [_bucket") || plan.contains("HashJoin [cast(_bucket"),
      s"range join must bucket into an equi-join:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("token-zipf head is a bounded TakeOrdered, not a global window over the vocabulary") {
    val df = graft.queries.LlmQueries.defs("q_token_zipf")._1(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("contamination join broadcasts the eval-span side") {
    // the eval set is orders of magnitude smaller than the training corpus;
    // a sort-merge join here would shuffle every training span
    val df = graft.queries.LlmQueries.defs("text_decontaminate")._1(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("unigram log-prob and DSIR log-ratio tables broadcast onto the token stream") {
    for (q <- Seq("text_unigram_loglik", "text_dsir_weights")) {
      val plan = graft.queries.LlmQueries.defs(q)._1(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"$q: the vocab-sized score table must broadcast\n${plan.take(2000)}")
    }
  }

  test("mixing-weight normalization broadcasts the one-row total") {
    val plan = graft.queries.LlmQueries.defs("q_mix_weights")._1(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      plan.take(2000))
    assert(!plan.contains("CartesianProduct"),
      "the total must ride a broadcast, not a cartesian shuffle")
  }

  test("q1 aggregation is partial-then-final (map-side combine)") {
    val plan = planOf("q1_agg")
    // two HashAggregate nodes around the exchange = partial + final
    assert("HashAggregate".r.findAllIn(plan).size >= 2)
    assert(plan.contains("Exchange hashpartitioning"))
  }

  test("semi/anti joins use the dedicated join types, not inner+distinct") {
    assert(planOf("q_semi_join").contains("LeftSemi"))
    assert(planOf("q_anti_join").contains("LeftAnti"))
  }

  test("top-k sort+limit plans as TakeOrderedAndProject, not a global sort") {
    val plan = planOf("q_topk_price")
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("text_heaps_fit plans with no Window and no Sort (the bucketing IS the point)") {
    val df = graft.queries.LlmQueries.defs("text_heaps_fit")._1(spark, sf0001)
    val plan = df.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Sort, Window => LWindow}
    assert(plan.collect { case w: LWindow => w }.isEmpty,
      "the power-of-two bucketing exists to avoid any window")
    assert(plan.collect { case s: Sort => s }.isEmpty,
      "no global or partial sort should survive — aggregates only")
  }

  test("vector_davies_bouldin joins only label-grain relations (no point-pair stage)") {
    // the physical joins must all sit above per-(label,dim) aggregates:
    // every join input is bounded by k*dims, never by the corpus
    val df = graft.queries.LlmQueries.defs("vector_davies_bouldin")._1(spark, sf0001)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      Seq(j.left, j.right).foreach { side =>
        assert(side.collectFirst { case a: Aggregate => a }.isDefined,
          s"join side reaches the corpus without an aggregate:\n$side")
      }
    }
  }

  test("the team draft resolves in-plan: one MapGroups, no checkpoint scans") {
    // the r12 rewrite contract: six dependent picks simulate inside ONE
    // keyed flatMapGroups, and merely CONSTRUCTING the entry runs no
    // Spark jobs (the old shape eagerly localCheckpointed per pick, so a
    // LogicalRDD leaf here means the barrier pattern crept back)
    val df = graft.queries.LlmQueries.defs("q_interleave_teamdraft")._1(spark, sf0001)
    import org.apache.spark.sql.catalyst.plans.logical.MapGroups
    val analyzed = df.queryExecution.analyzed
    val mg = analyzed.collect { case m: MapGroups => m }
    assert(mg.size == 1, s"expected exactly one MapGroups draft, got ${mg.size}")
    val rddLeaves = analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r
    }
    assert(rddLeaves.isEmpty,
      s"draft plan must not contain checkpoint cuts, got ${rddLeaves.size}")
  }

  test("q_att_matched matches with ONE partitioned window, not a per-row probe join") {
    val df = AnalyticsQueries.defs("q_att_matched")._1(spark, sf0001)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.size == 1, s"expected exactly one as-of window, got ${wins.size}")
    assert(wins.head.partitionSpec.nonEmpty, "the as-of window must be keyed")
  }

  test("whole-stage codegen covers the aggregation pipeline") {
    // AQE finalizes the plan lazily; execute before inspecting codegen spans
    val df = AnalyticsQueries.defs("q1_pricing_summary")._1(spark, sf0001)
    df.collect()
    // codegen stages render as "*(n) Operator" in the plan tree
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no codegen stage in:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"))
  }
}
