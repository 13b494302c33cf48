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

  // ---- r12 boundedness-walk shapes (pin the NEW analysis features so a
  // refactor that loses one shows up here, not as a sudden CI gate
  // failure on 432 entries) ----

  test("walk accepts rank-filter over bounded partitions; rejects over corpus keys") {
    import org.apache.spark.sql.expressions.Window
    // rn <= k per value-domain partition: <= k x |domain| rows at any SF
    val byLang = docs.withColumn("rn",
        row_number().over(Window.partitionBy("lang").orderBy(col("doc_id"))))
      .filter(col("rn") <= 3)
    assert(!hint(docs.join(broadcast(byLang.select(col("lang"), col("rn"))), "lang")),
      "row_number <= k over a value-domain partition is bounded")
    // the same filter partitioned by the corpus key is corpus x k rows
    val byDoc = docs.withColumn("rn",
        row_number().over(Window.partitionBy("doc_id").orderBy(col("n_chars"))))
      .filter(col("rn") <= 3)
    assert(hint(docs.join(broadcast(byDoc.select(col("doc_id"), col("rn"))), "doc_id")),
      "row_number <= k per corpus key is corpus-cardinality — must flag")
  }

  test("walk accepts calendar-arithmetic and boolean grouping keys") {
    val lineitem2 = lineitem
    val byMonth = lineitem2.groupBy(
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate"))).as("m"),
        (col("l_quantity") > 25).as("big"))
      .agg(count(lit(1)).as("n"))
    assert(!hint(lineitem2.join(broadcast(byMonth), col("l_orderkey") === col("n"))),
      "year*12+month and a boolean predicate are SF-independent domains")
  }

  test("walk accepts an aggregate whose key equi-joins to a bounded probe set") {
    // the PQ distance-table idiom: groupBy(query_id) AFTER an inner join
    // to a limited probe relation pins the grouping domain
    val probes = docs.select(col("doc_id")).limit(8)
    val dtab = docs.join(broadcast(probes), Seq("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    assert(!hint(docs.join(broadcast(dtab), Seq("doc_id"))),
      "grouping key equi-bounded by a probe set is bounded")
  }

  test("walk accepts bounded x rank-multiplicity equi-joins (the ANN probes idiom)") {
    import org.apache.spark.sql.expressions.Window
    // probes: top-2 buckets PER corpus doc — corpus x 2 rows, but exactly
    // 2 per doc_id; joined to an 8-row probe set on doc_id it is <= 16 rows
    val probes = docs.withColumn("rn",
        row_number().over(Window.partitionBy("doc_id").orderBy(col("n_chars"))))
      .filter(col("rn") <= 2).select(col("doc_id"), col("rn").as("bucket"))
    val q = docs.select(col("doc_id")).limit(8)
    assert(!hint(docs.join(broadcast(probes.join(q, Seq("doc_id"))), Seq("doc_id"))),
      "bounded probe set x rank-multiplicity side is bounded")
    // control: the same probes relation WITHOUT the bounded join must flag
    assert(hint(docs.join(broadcast(probes), Seq("doc_id"))),
      "the rank-multiplicity side alone is corpus-cardinality — must flag")
  }

  test("walk rejects giant literals posing as bounds") {
    // "bounded" means "fits one executor" — a gigarow limit, modulus, or
    // clamp is not a bound anyone can broadcast (the r10 Range(1e12)
    // fix, generalized to every literal the walk trusts)
    assert(hint(docs.join(broadcast(docs.limit(100000000)), "doc_id")),
      "limit(1e8) must NOT count as bounded")
    val giantMod = docs.groupBy(pmod(col("doc_id"), lit(1000000000L)).as("b"))
      .agg(count(lit(1)).as("n"))
    assert(hint(docs.join(broadcast(giantMod), col("doc_id") === col("b"))),
      "pmod by 1e9 must NOT count as a bounded domain")
    val giantClamp = docs.groupBy(
        greatest(least(col("doc_id"), lit(1000000000000L)), lit(0L)).as("b"))
      .agg(count(lit(1)).as("n"))
    assert(hint(docs.join(broadcast(giantClamp), col("doc_id") === col("b"))),
      "a +-1e12 clamp must NOT count as a bounded domain")
    // a key-range filter whose literal spans the whole id space is not a
    // bound either — only a SMALL range pins a small row count
    assert(hint(docs.join(broadcast(
        docs.filter(col("doc_id") < lit(Long.MaxValue - 1))), "doc_id")),
      "doc_id < ~2^63 covers the whole corpus — must flag")
    // the small forms stay accepted
    assert(!hint(docs.join(broadcast(docs.limit(10)), "doc_id")))
    assert(!hint(docs.join(broadcast(docs.filter(col("doc_id") < 1024)), "doc_id")))
    val smallMod = docs.groupBy(pmod(col("doc_id"), lit(64)).as("b"))
      .agg(count(lit(1)).as("n"))
    assert(!hint(docs.join(broadcast(smallMod), col("doc_id") === col("b"))))
  }

  test("walk quantifies combinations: two small moduli can still compose too big") {
    // the boolean version's hole: each arm individually small, the
    // composite domain |L| x |R| far past anything broadcastable
    val big = docs.groupBy((pmod(col("doc_id"), lit(2000L)) * 2000L
        + pmod(col("n_chars"), lit(2000L))).as("b"))
      .agg(count(lit(1)).as("n"))
    assert(hint(docs.join(broadcast(big), col("doc_id") === col("b"))),
      "2000 x 2000 composite buckets exceed the broadcastable domain — must flag")
    val small = docs.groupBy((pmod(col("doc_id"), lit(100L)) * 100L
        + pmod(col("n_chars"), lit(100L))).as("b"))
      .agg(count(lit(1)).as("n"))
    assert(!hint(docs.join(broadcast(small), col("doc_id") === col("b"))),
      "100 x 100 composite buckets are a bounded domain")
  }

  // ---- small-domain-key join gate (r13) ----

  private def smallKey(df: DataFrame): Boolean =
    PlanAudit.hasSmallDomainKeyJoin(df.queryExecution.optimizedPlan)

  test("small-domain-join detector FIRES on the r12 4-bit LSH banding shape") {
    // faithful reconstruction of the pre-r13 hyperplaneBuckets: 32-bit
    // packed signature, 8 bands x 4 bits — a 16-value-per-band bucket
    // domain whose equi-self-join is Θ(n²) candidates on ANY corpus (the
    // r12 verdict's lead finding, invisible to cross-shape because the
    // join IS equi-keyed)
    graft.functions.GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val buckets = emb.select(col("vec_id"),
        graft.functions.Vectors.hyperplaneSignature(col("embedding"), 64, 32).as("sig"))
      .select(col("vec_id"), explode(array((0 until 8).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * 4).bitwiseAND(15L).as("bucket"))): _*)).as("bb"))
      .select(col("vec_id"), col("bb.band"), col("bb.bucket"))
    val joined = buckets.as("a").join(buckets.as("b"),
      col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
    assert(smallKey(joined), "the 4-bit banding self-join must flag")
  }

  test("small-domain-join detector: capped wide banding passes, uncapped flags") {
    import graft.operators.Dedup
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    // the r13 production shape: 8 bands x 16 rows, maxBucket hot-key
    // exclusion — candidates <= bands·maxBucket·n, linear
    assert(!smallKey(Dedup.embeddingLshPairs(emb, dim = 64, threshold = 0.9)),
      "the capped wide banding is the accepted defense — must pass")
    // WITHOUT the cap even a 65,536-value bucket domain is a fixed domain
    // (n -> infinity still packs every bucket quadratically)
    assert(smallKey(Dedup.embeddingLshPairs(emb, dim = 64, threshold = 0.9,
        maxBucket = 0)),
      "uncapped banding over two corpus-scale sides must flag")
    // simhash chunks are the same shape through a DIFFERENT spelling
    // (explode of struct literals + shiftright/mask): capped passes,
    // uncapped fires — pins the GetStructField/elemDomain analysis
    val fp = Dedup.simhashFingerprints(docs)
    assert(!smallKey(Dedup.simhashPairsFromFp(fp)))
    assert(smallKey(Dedup.simhashPairsFromFp(fp, maxBucket = 0)))
    // scope guard: id-keyed joins (unbounded key domain) never flag…
    assert(!smallKey(docs.as("x").join(docs.as("y"), Seq("doc_id"))
      .select(col("x.doc_id"))))
    // …nor does MinHash banding even uncapped — its bucket VALUE domain is
    // content-derived xxhash64 (2^64), so the domain analysis correctly
    // clears it (its cap defends degenerate content cliques, which no
    // static domain analysis can see)
    assert(!smallKey(Dedup.minhashLshPairs(docs, maxBucket = 0)))
    // one bounded side is linear — the ANN probe idiom stays accepted
    val probeBuckets = Dedup.hyperplaneBuckets(
      emb.filter(col("vec_id") < 8), "query_id", 64, 4, 8, 0)
    val corpusBuckets = Dedup.hyperplaneBuckets(emb, "vec_id", 64, 4, 8, 0)
    assert(!smallKey(corpusBuckets.join(broadcast(probeBuckets),
        Seq("band", "bucket"))),
      "bounded probe set x corpus on bucket keys is linear — must pass")
  }

  // ---- model-output-key join gate (r14) ----

  private def modelKey(df: DataFrame): Boolean =
    PlanAudit.hasModelKeyJoin(df.queryExecution.optimizedPlan)

  test("model-key-join detector FIRES on the r13 fixed-cell SemDeDup shape") {
    // faithful reconstruction of the pre-r14 semanticDroppedIds: a
    // fixed-16-cell KMeans assignment self-joined on `cluster` with full
    // embedding payloads on BOTH shuffle sides — Θ(n²/16) candidate pairs
    // at ANY corpus size, invisible to small-domain-join because the
    // cluster column is a model output (a ScalaUDF) whose 16-value domain
    // no plan walk can see (the r13 verdict's lead finding)
    import graft.operators.Dedup
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val assigned = Dedup.semanticAssignments(emb, nClusters = 16)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val oldShape = assigned
      .select(col("cluster"), col("vec_id").as("id_a"), col("embedding").as("emb_a"))
      .join(assigned.select(col("cluster"), col("vec_id").as("id_b"),
        col("embedding").as("emb_b")), Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
    assert(modelKey(oldShape),
      "the uncapped fixed-cell assignment self-join must flag")
    // the r14 production shape passes: ids-only pair stage behind the
    // hot-cell cap anti-join (the hotKeyCapped defense, both sides)
    assert(!modelKey(Dedup.semanticDroppedIds(assigned, tau = 0.45)),
      "the capped ids-only SemDeDup pair stage is the accepted defense")
    // explicit pinned cap takes the same shape
    assert(!modelKey(Dedup.semanticDroppedIds(assigned, tau = 0.45, maxCell = 100)))
    // scope guards: the IVF probe idiom joins the assignment against a
    // CENTROID-derived cluster key (LocalRelation, not a model output on
    // both sides) — must not fire…
    import graft.operators.Similarity
    assert(!modelKey(Similarity.ivfTopK(emb, emb.limit(4), k = 3,
        nCentroids = 4, nProbe = 2)),
      "IVF probe join (assignment vs broadcast centroid probes) must pass")
    // …nor do plain id-keyed joins over the same assignment
    assert(!modelKey(assigned.as("x").join(assigned.as("y"), Seq("vec_id"))
      .select(col("x.cluster"))))
    assigned.unpersist(); ()
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
