package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph analytics over pair frames (the same (doc_a, doc_b) shape the
  * dedup pair generators emit). Connected components lives in [[Dedup]];
  * this holds the score-propagation side.
  *
  * Cache lifetime (caller-must-clear-cache): the operators persist their
  * edge/degree relations, read by every unrolled round of one lazy plan —
  * they cannot unpersist before the result materializes. Long-lived
  * sessions should `spark.catalog.clearCache()` between corpora.
  */
object Graph {

  /** PageRank over an undirected pair graph, a FIXED number of unrolled
    * power iterations — deterministic by construction (no convergence
    * test, no RNG), which is what makes it oracle-checkable: the DuckDB
    * twin chains the same `iters` join+aggregate rounds as plain CTEs.
    *
    * Each round is one shuffle join (ranks → edges) + one hash aggregate
    * (sum of neighbor contributions) — the standard DataFrame PageRank;
    * degrees and edges are computed once and persisted across rounds.
    * Every vertex of a pair graph has degree ≥ 1, so there is no dangling
    * mass term. Ranks sum to 1 per iteration.
    *
    * Returns (doc_id, rank) for every vertex incident to a pair, rank
    * rounded to 8 decimals so cross-engine float summation order cannot
    * surface in the last printed digit.
    */
  /** Both directions of every pair in ONE pass over the pair pipeline —
    * explode, not `select(a,b) union select(b,a)`: the union's two
    * branches are sibling scans of the SAME upstream, and whether cached
    * or not they run concurrently (AQE submits independent map stages
    * together), so a lazily-persisted pair pipeline is computed twice by
    * racing cache fills (r15 profile: duplicate "Block rdd_N already
    * exists" fills under every pageRank-family entry). One row-doubling
    * generate needs no persist, no race, and half the upstream work — at
    * any scale.
    */
  private def symmetrized(pairs: DataFrame): DataFrame =
    pairs.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))

  def pageRank(pairs: DataFrame, iters: Int = 3, damping: Double = 0.85): DataFrame = {
    // localCheckpoint, not persist: each unrolled round EMBEDS the edge
    // relation's plan subtree (and under it the whole upstream pair
    // pipeline — typically an LSH join) once more, so with persist alone
    // the analyzer/optimizer re-walks ~iters copies of that subtree per
    // action even though execution dedups through the cache. Truncating
    // lineage makes every round's plan start at the materialized blocks
    // (the same driver-cost fix as the CC loop; the iteration structure
    // stays one lazy plan).
    val edges = symmetrized(pairs).localCheckpoint(eager = true)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    // vertex count as a broadcast relation, not a driver-side collect —
    // the rank column needs 1/n and (1-d)/n as plan-side values
    val nodes = edges.select(col("src").as("doc_id")).distinct()
      .localCheckpoint(eager = true)
    val n = nodes.agg(count(lit(1)).as("n"))
    // a FIXED iteration count needs no per-round materialization (nothing
    // to inspect between rounds, unlike the CC fixpoint's convergence
    // test): the `iters` rounds chain into ONE lazy plan and a single
    // action evaluates them, reusing the persisted edges/nodes relations
    // at each round instead of paying a job + persist per iteration.
    var ranks = nodes.crossJoin(broadcast(n))
      .select(col("doc_id"), (lit(1.0) / col("n")).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(ranks, edges("src") === ranks("doc_id"))
        .join(deg, Seq("src"))
        .groupBy(col("dst")).agg(sum(col("rank") / col("deg")).as("w"))
      ranks = nodes.crossJoin(broadcast(n))
        .join(contrib, nodes("doc_id") === contrib("dst"), "left")
        .select(nodes("doc_id"),
          ((lit(1.0) - damping) / col("n") + lit(damping) * coalesce(col("w"), lit(0.0))).as("rank"))
    }
    ranks.select(col("doc_id"), round(col("rank"), 8).as("rank"))
  }

  /** Personalized PageRank: teleport mass flows only to a SEED set (the
    * retrieval/expansion primitive — "rank everything by proximity to
    * these documents"), same fixed-iteration unrolled power method as
    * [[pageRank]]. `seedPred` selects seeds by doc_id; non-seeds start at
    * 0 and receive mass only through edges, so the result ranks the
    * seed-rooted neighborhood. Total mass stays 1 (pair graphs have no
    * dangling vertices). Deterministic — the DuckDB twin chains the same
    * rounds as CTEs.
    */
  def personalizedPageRank(pairs: DataFrame, seedPred: Column, iters: Int = 3,
                           damping: Double = 0.85): DataFrame = {
    val edges = symmetrized(pairs).localCheckpoint(eager = true)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("is_seed", seedPred)
      .localCheckpoint(eager = true)
    val nS = nodes.filter(col("is_seed")).agg(count(lit(1)).as("ns"))
    var ranks = nodes.crossJoin(broadcast(nS))
      .select(col("doc_id"),
        when(col("is_seed"), lit(1.0) / col("ns")).otherwise(lit(0.0)).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(ranks, edges("src") === ranks("doc_id"))
        .join(deg, Seq("src"))
        .groupBy(col("dst")).agg(sum(col("rank") / col("deg")).as("w"))
      ranks = nodes.crossJoin(broadcast(nS))
        .join(contrib, nodes("doc_id") === contrib("dst"), "left")
        .select(nodes("doc_id"),
          (when(col("is_seed"), (lit(1.0) - damping) / col("ns")).otherwise(lit(0.0))
            + lit(damping) * coalesce(col("w"), lit(0.0))).as("rank"))
    }
    ranks.select(col("doc_id"), round(col("rank"), 8).as("rank"))
  }

  /** HITS hubs-and-authorities over a DIRECTED pair graph, `iters`
    * unrolled rounds in exact integer fixed point — the link-analysis
    * companion to [[pageRank]] that separates "points at good content"
    * (hub) from "is pointed at" (authority). Direction contract: pair
    * frames arrive as (doc_a < doc_b); the edge is doc_a → doc_b (the
    * lower id — the earlier/original document — endorses the higher).
    *
    * Each round is the standard double matvec: authority = Σ hub over
    * in-edges, renormalized; hub = Σ authority over out-edges,
    * renormalized. Scores are non-negative integers at `scale` fixed
    * point and the renormalizer is `max(score) div scale` — all sums
    * exact, all divisions on non-negative operands where Spark `div` and
    * DuckDB `//` agree, so every round replays bit-for-bit as a CTE (the
    * same discipline as [[graft.operators.Similarity.pcaPowerQ]], without
    * even needing the sign split). Overflow: score ≤ ~scale after each
    * normalize, so a matvec sum is ≤ deg·scale ≤ n·10⁴ — long-safe past
    * 10¹⁴ vertices.
    *
    * Per round: two shuffle join + hash-aggregate pairs over the edge
    * relation (ids and integer scores only — never payloads), the same
    * scale shape as PageRank. Returns (doc_id, hub, authority).
    */
  def hits(pairs: DataFrame, iters: Int = 2, scale: Long = 10000L): DataFrame = {
    // single read of the pair pipeline — no persist needed before the cut
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .localCheckpoint(eager = true) // read by every unrolled round
    val nodes = edges.select(col("src").as("doc_id"))
      .union(edges.select(col("dst").as("doc_id"))).distinct()
      .localCheckpoint(eager = true)
    def renorm(raw: DataFrame, c: String): DataFrame = {
      val m = raw.agg(greatest(expr(s"max($c) div $scale"), lit(1L)).as("m"))
      // nodes with no contributing edge keep 0 via the left join
      nodes.join(raw, Seq("doc_id"), "left").crossJoin(broadcast(m))
        .select(col("doc_id"),
          (coalesce(col(c), lit(0L)).cast("long")).as("raw"), col("m"))
        .select(col("doc_id"), expr("raw div m").as(c))
        // truncate per produced iterate: each round embeds the previous
        // round's plan twice (the m aggregate + the join) — the same
        // analyzer-cost fix as the PCA/CC loops
        .localCheckpoint(eager = true)
    }
    var hub = nodes.select(col("doc_id"), lit(scale).as("hub"))
    var auth = nodes.select(col("doc_id"), lit(0L).as("authority"))
    for (_ <- 1 to iters) {
      auth = renorm(
        edges.join(hub.select(col("doc_id").as("src"), col("hub")), "src")
          .groupBy(col("dst").as("doc_id")).agg(sum("hub").as("authority")),
        "authority")
      hub = renorm(
        edges.join(auth.select(col("doc_id").as("dst"), col("authority")), "dst")
          .groupBy(col("src").as("doc_id")).agg(sum("authority").as("hub")),
        "hub")
    }
    hub.join(auth, "doc_id")
      .select(col("doc_id"), col("hub").cast("long").as("hub"),
        col("authority").cast("long").as("authority"))
  }

  /** Katz centrality over an undirected pair graph, `iters` unrolled
    * rounds in exact integer fixed point: x ← β + α·A·x with β = `scale`
    * and α = 1/`attDen`, i.e. attenuated path counting — every walk of
    * length L arriving at a vertex contributes scale/attDen^L. Unlike
    * [[pageRank]] there is no degree normalization, so prolific hubs
    * score by their raw reach — the "how much of the graph can copy-
    * propagate INTO this document" number. All arithmetic is long adds
    * plus one non-negative `div` per round (floor = truncate on ≥0), so
    * both engines replay the rounds bit-for-bit. Convergence contract
    * (standard Katz): α must be < 1/λ_max of the adjacency matrix or the
    * iteration diverges — at production degree distributions pick attDen
    * above the largest hub degree (the iterate is monotone in rounds, so
    * a divergent configuration shows up as overflow, not silent error).
    */
  def katz(pairs: DataFrame, iters: Int = 3, scale: Long = 10000L,
           attDen: Long = 8L): DataFrame = {
    val edges = symmetrized(pairs)
      .localCheckpoint(eager = true) // read by every unrolled round
    val nodes = edges.select(col("src").as("doc_id")).distinct()
      .localCheckpoint(eager = true)
    var x = nodes.select(col("doc_id"), lit(scale).as("katz"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(x.select(col("doc_id").as("src"), col("katz")), "src")
        .groupBy(col("dst").as("doc_id")).agg(sum("katz").as("c"))
      x = nodes.join(contrib, Seq("doc_id"), "left")
        .select(col("doc_id"),
          (lit(scale) + expr(s"coalesce(c, 0L) div ${attDen}L")).as("katz"))
        // truncate per iterate: each round otherwise embeds the previous
        // round's join+aggregate subtree again (the PCA/CC analyzer fix)
        .localCheckpoint(eager = true)
    }
    x.select(col("doc_id"), col("katz").cast("long").as("katz"))
  }

  /** Minimum hop distance (≤ `maxHops`) from a seed set — k-hop
    * neighborhood materialization, the exact-distance companion to
    * [[personalizedPageRank]]'s soft proximity: BFS by `maxHops` unrolled
    * frontier expansions, each one semi-join-shaped (frontier → edges →
    * new vertices minus visited). Vertices beyond `maxHops` are absent —
    * the bounded-output contract of a k-hop query (materializing the
    * whole component would be [[graft.operators.Dedup.connectedComponents]]'
    * job). Deterministic; each round replays as a SQL CTE.
    */
  def hopDistances(pairs: DataFrame, seedPred: Column, maxHops: Int = 3): DataFrame = {
    val edges = symmetrized(pairs).localCheckpoint(eager = true)
    var visited = edges.select(col("src").as("doc_id")).distinct()
      .filter(seedPred)
      .select(col("doc_id"), lit(0L).as("hops"))
    var frontier = visited
    for (h <- 1 to maxHops) {
      val next = edges
        .join(frontier.select(col("doc_id").as("src")), "src")
        .select(col("dst").as("doc_id")).distinct()
        .join(visited.select("doc_id"), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), lit(h.toLong).as("hops"))
        .localCheckpoint(eager = true) // visited feeds every later round
      visited = visited.unionAll(next)
      frontier = next
    }
    visited
  }

  /** Landmark harmonic centrality — exact closeness is Θ(n·m) (a BFS per
    * vertex) and dead at any scale; the standard estimator runs BFS from a
    * small deterministic landmark set L and scores every vertex by
    * Σ_{ℓ∈L, d(ℓ,v)≥1} 1/d(ℓ,v) (harmonic, so unreachable landmarks
    * contribute 0 and no ∞ bookkeeping is needed — the reason harmonic,
    * not classic closeness, is the distributed-setting formulation).
    *
    * Shape at scale: frontier state is (landmark, vertex, hops) — ids
    * only, never payloads — so each round is one equi-join on the frontier
    * keyed by vertex plus one (lm, vertex) anti-join against the visited
    * set; total state is |L| × reachable, the |L| multiplier being the
    * user's accuracy/cost dial. `localCheckpoint` truncates lineage each
    * round (the CC/k-core idiom). The harmonic sum is folded in FLOORED
    * MICRO-INTEGERS (1000000 div hops, summed as longs) — order-independent
    * and engine-exact, where a float Σ1/d would drift by summation order.
    */
  def landmarkHarmonic(pairs: DataFrame, seedPred: Column, maxHops: Int = 3): DataFrame = {
    val edges = symmetrized(pairs).localCheckpoint(eager = true)
    var visited = edges.select(col("src").as("doc_id")).distinct()
      .filter(seedPred)
      .select(col("doc_id").as("lm"), col("doc_id"), lit(0L).as("hops"))
      .localCheckpoint(eager = true)
    var frontier = visited
    for (h <- 1 to maxHops) {
      val next = edges
        .join(frontier.select(col("lm"), col("doc_id").as("src")), "src")
        .select(col("lm"), col("dst").as("doc_id")).distinct()
        .join(visited.select("lm", "doc_id"), Seq("lm", "doc_id"), "left_anti")
        .select(col("lm"), col("doc_id"), lit(h.toLong).as("hops"))
        .localCheckpoint(eager = true) // visited feeds every later round
      visited = visited.unionAll(next)
      frontier = next
    }
    visited.filter(col("hops") > 0)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_reached"),
        sum(expr("1000000 div hops")).as("harmonic_x1e6"))
  }

  /** Per-vertex triangle counts over an undirected pair graph — the
    * clustering-structure readout for a near-dup graph (a document inside
    * a dense triangle cluster is a much stronger dedup candidate than one
    * on an isolated edge).
    *
    * Compact-forward orientation: every edge is directed from its
    * lower-(degree, id) endpoint to the higher one, wedges are built only
    * among out-neighbors, and each triangle is found exactly once at its
    * lowest-rank vertex. Orienting by DEGREE (id only as tie-break) is
    * what makes this survive scale-up: out-degree is bounded by ~sqrt(2m)
    * for any graph, so the wedge self-join never explodes on a hub vertex
    * the way id-ordering would when a low-id vertex happens to be a hub.
    * The (deg, id) rank is deterministic, so a SQL twin chaining the same
    * joins agrees exactly.
    *
    * Returns (doc_id, triangles) for every vertex in ≥ 1 triangle.
    */
  def triangleCounts(pairs: DataFrame): DataFrame =
    triangleCountsFromUnd(canonicalUnd(pairs))

  /** Canonical undirected edge set (guard against either input order),
    * checkpointed — localCheckpoint, not persist: the oriented relation
    * embeds this subtree (and the pair pipeline under it) in each of its
    * THREE wedge-join references — truncating here keeps those plans
    * starting at materialized blocks (same driver-cost fix as pageRank).
    */
  private def canonicalUnd(pairs: DataFrame): DataFrame =
    pairs.select(
        least(col("doc_a"), col("doc_b")).as("a"),
        greatest(col("doc_a"), col("doc_b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(eager = true)

  private def triangleCountsFromUnd(und: DataFrame): DataFrame = {
    val lvl = StorageLevel.MEMORY_AND_DISK
    val deg = und.select(col("a").as("v")).union(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    // orient src -> dst by (deg, id) rank; read 3x (two wedge sides +
    // closing edge), so persist the oriented relation, not the raw pairs
    def rk(degc: Column, idc: Column) = struct(degc.as("d"), idc.as("v"))
    val oriented = und
      .join(deg.select(col("v").as("a"), col("deg").as("dega")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("degb")), "b")
      .select(
        when(rk(col("dega"), col("a")) < rk(col("degb"), col("b")), col("a"))
          .otherwise(col("b")).as("src"),
        when(rk(col("dega"), col("a")) < rk(col("degb"), col("b")),
          rk(col("degb"), col("b"))).otherwise(rk(col("dega"), col("a"))).as("dstrk"))
      .select(col("src"), col("dstrk").getField("v").as("dst"),
        col("dstrk").as("dst_rank"))
      .persist(lvl)
    // wedges among out-neighbors, ordered by dst rank so each unordered
    // {v, w} appears once; close with the oriented edge v->w
    val tri = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst_rank") < col("e2.dst_rank"))
      .select(col("e1.src").as("u"), col("e1.dst").as("v"), col("e2.dst").as("w"))
      .join(oriented.as("e3"),
        col("v") === col("e3.src") && col("w") === col("e3.dst"))
      .select("u", "v", "w")
    tri.select(explode(array(col("u"), col("v"), col("w"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("triangles"))
  }

  /** Local clustering coefficient per vertex: c = 2T / (d(d−1)) as a
    * floored ×1e6 integer, for every degree-≥2 vertex (zero-triangle
    * vertices included via the left join — their absence is the signal).
    * Triangles come from the same degree-oriented compact-forward wedge
    * machinery as [[triangleCounts]]; the coefficient adds one degree
    * aggregate and one join on top, nothing pairwise.
    */
  def clusteringCoefficients(pairs: DataFrame): DataFrame = {
    // ONE canonical edge set feeds both the triangle machinery and the
    // degree aggregate (r15: the old shape read the persisted pair
    // pipeline twice — racing cache fills — and deduped `und` twice)
    val und = canonicalUnd(pairs)
    val tri = triangleCountsFromUnd(und)
    val deg = und.select(col("a").as("doc_id")).union(und.select(col("b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("deg"))
    deg.filter(col("deg") >= 2)
      .join(tri, Seq("doc_id"), "left")
      .select(col("doc_id"), col("deg"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        floor(lit(1e6) * lit(2.0) * coalesce(col("triangles"), lit(0L)).cast("double")
          / (col("deg").cast("double") * (col("deg").cast("double") - 1.0)))
          .cast("long").as("coeff_micro"))
  }

  /** Degree histogram of an undirected pair graph: how many vertices have
    * each degree — the one-line shape check (heavy-tail vs uniform) that
    * decides whether the pair-join downstream needs skew handling. Two
    * hash aggregates, no joins.
    */
  def degreeHistogram(pairs: DataFrame): DataFrame = {
    // both union branches read this — persist, or the upstream pair
    // generation (typically a shingle self-join) runs twice
    val und = pairs.select(
        least(col("doc_a"), col("doc_b")).as("a"),
        greatest(col("doc_a"), col("doc_b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    und.select(col("a").as("v")).union(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("node_cnt"))
  }

  /** k-core decomposition (restricted to one k): the maximal subgraph in
    * which every vertex keeps degree ≥ k, by iterative peeling — each
    * round recomputes degrees over the surviving edge set and drops
    * vertices below k, converging when a round removes nothing. The
    * density triage for a near-dup graph: a 2-core vertex sits in a
    * cycle-bearing cluster (template families), while tree-shaped chains
    * of borderline matches peel away entirely — a cheaper, structural
    * complement to [[triangleCounts]].
    *
    * Peeling is monotone (the edge set only shrinks), so edge-COUNT
    * equality across a round IS the fixpoint test — no content signature
    * needed, unlike the CC loop. Each round is two hash aggregates and
    * one semi join, `localCheckpoint`ed to keep round r's plan from
    * embedding rounds 1..r-1 (the same driver-cost fix as the CC loop).
    * Rounds are bounded by the graph's degeneracy ordering depth, ~O(log
    * n) on near-dup graphs; `maxRounds` guards pathological chains and
    * the throw keeps an unrolled SQL twin honest (never a silently
    * deeper loop than the oracle replays).
    *
    * Returns (doc_id, core_degree) for the k-core's vertices, with the
    * vertex's degree INSIDE the core.
    */
  def kCore(pairs: DataFrame, k: Int, maxRounds: Int = 30): DataFrame =
    kCoreWithRounds(pairs, k, maxRounds)._1

  /** [[kCore]] plus the number of peel rounds executed (including the
    * final nothing-removed confirmation round) — exposed for ScaleSpec's
    * round-count assertion.
    */
  def kCoreWithRounds(pairs: DataFrame, k: Int, maxRounds: Int = 30): (DataFrame, Int) = {
    var edges = pairs.select(
        least(col("doc_a"), col("doc_b")).as("a"),
        greatest(col("doc_a"), col("doc_b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(eager = true)
    var nEdges = edges.count()
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val deg = edges.select(col("a").as("v")).union(edges.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select("v")
      val next = edges
        .join(keep.select(col("v").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("v").as("b")), Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint(eager = true)
      val n = next.count()
      converged = n == nEdges
      nEdges = n
      edges = next
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"kCore(k=$k) did not converge in $maxRounds peel rounds — " +
          "raise maxRounds (and the oracle's unrolled depth)")
    val core = edges.select(col("a").as("doc_id"))
      .union(edges.select(col("b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("core_degree"))
    (core, rounds)
  }

  /** Adamic–Adar link prediction: score every NON-adjacent pair that
    * shares ≥ 1 neighbor by Σ_z 1/ln(deg(z)) over the common neighbors z
    * — rare shared neighbors say more than hub-shared ones. In a
    * near-dup graph the top predictions are the pairs the threshold
    * *just* missed (cluster-completion candidates worth a second, more
    * expensive verification pass).
    *
    * Per-center contributions are floored micros summed as integers
    * (ln(deg) is one identical IEEE chain on integer degrees in either
    * engine), so the ranking replays exactly in SQL. Wedge centers with
    * one neighbor generate nothing, so deg ≥ 2 and ln > 0 wherever a
    * contribution exists.
    *
    * Scale shape: the wedge self-join fans out deg² per CENTER — unlike
    * [[triangleCounts]] no orientation trick bounds it, because AA needs
    * every wedge; production at 100 TB caps or samples hub centers
    * (`maxDeg`), the declared accuracy trade (dropping a hub center
    * removes only its ~0 contributions). Top-N is sort+limit — bounded
    * per-partition heaps, no global window.
    */
  def adamicAdar(pairs: DataFrame, topN: Int = 20, maxDeg: Long = Long.MaxValue): DataFrame = {
    val und = pairs.select(
        least(col("doc_a"), col("doc_b")).as("a"),
        greatest(col("doc_a"), col("doc_b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(eager = true) // read by adjacency AND the anti join
    val adj = und.select(col("a").as("z"), col("b").as("n"))
      .union(und.select(col("b").as("z"), col("a").as("n")))
    val deg = adj.groupBy("z").agg(count(lit(1)).as("deg"))
      .filter(col("deg") <= maxDeg)
    // deg-1 centers produce no wedges, but their ln(1) = 0 would trip
    // ANSI divide-by-zero while the contribution column evaluates — keep
    // the expression total by scoring only wedge-capable centers
    val contrib = deg.filter(col("deg") >= 2).select(col("z"),
      floor(lit(1e6) / log(col("deg").cast("double"))).cast("long").as("c"))
    // cap rides the adjacency BEFORE wedge fan-out, so an over-cap hub
    // never materializes its deg² wedges at all
    val adjC = adj.join(deg.select("z"), "z")
    val wedges = adjC.as("l").join(adjC.as("r"),
        col("l.z") === col("r.z") && col("l.n") < col("r.n"))
      .select(col("l.z").as("z"), col("l.n").as("a"), col("r.n").as("b"))
    val scored = wedges
      .join(und, Seq("a", "b"), "left_anti") // predictions, not existing edges
      .join(contrib, "z")
      .groupBy("a", "b").agg(sum("c").as("aa_micro"))
    scored
      .orderBy(col("aa_micro").desc, col("a"), col("b")).limit(topN)
      .select(col("a").as("doc_a"), col("b").as("doc_b"), col("aa_micro"))
  }

  /** Neighbor-set Jaccard link prediction: for every NON-adjacent pair
    * (a, b) sharing at least one neighbor, J = |Γ(a)∩Γ(b)| /
    * |Γ(a)∪Γ(b)|, emitted ×1000 integer (common / (deg(a) + deg(b) −
    * common)). The structural sibling of [[adamicAdar]] — same
    * hub-capped wedge machinery (the cap rides the adjacency BEFORE
    * wedge fan-out, so an over-cap hub never materializes its deg²
    * wedges), but normalized by the union so a candidate pair whose
    * shared neighbors are most of BOTH neighborhoods outranks one that
    * merely touches a popular vertex. Top `topN`, ties toward low ids.
    */
  def jaccardLinkPred(pairs: DataFrame, topN: Int = 20,
                      maxDeg: Long = Long.MaxValue): DataFrame = {
    val und = pairs.select(
        least(col("doc_a"), col("doc_b")).as("a"),
        greatest(col("doc_a"), col("doc_b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(eager = true) // read by adjacency AND the anti join
    val adj = und.select(col("a").as("z"), col("b").as("n"))
      .union(und.select(col("b").as("z"), col("a").as("n")))
    val deg = adj.groupBy("z").agg(count(lit(1)).as("deg"))
      .filter(col("deg") <= maxDeg)
    val adjC = adj.join(deg.select("z"), "z")
    val wedges = adjC.as("l").join(adjC.as("r"),
        col("l.z") === col("r.z") && col("l.n") < col("r.n"))
      .select(col("l.z").as("z"), col("l.n").as("a"), col("r.n").as("b"))
    val common = wedges
      .join(und, Seq("a", "b"), "left_anti") // predictions, not existing edges
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
    common
      .join(deg.select(col("z").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("z").as("b"), col("deg").as("db")), "b")
      .select(col("a"), col("b"),
        expr("common * 1000 div (da + db - common)").as("jx1000"))
      .orderBy(col("jx1000").desc, col("a"), col("b")).limit(topN)
      .select(col("a").as("doc_a"), col("b").as("doc_b"), col("jx1000"))
  }

  /** Community detection by synchronous label propagation (Raghavan et
    * al. 2007), a FIXED number of unrolled rounds — deterministic by
    * construction: every vertex simultaneously adopts the most frequent
    * label among its neighbors, ties broken toward the LOWEST label (no
    * RNG, no visit order), so the rounds replay as plain SQL CTEs.
    * Communities are finer than connected components (a CC splits where
    * neighborhood majorities disagree) — the triage between "same
    * component" and "same template cluster" in a near-dup graph.
    *
    * Synchronous LPA can oscillate on bipartite structures; a fixed
    * round count makes that a defined, replayable output rather than a
    * convergence hazard. Each round is one shuffle join (labels →
    * edges) + one (vertex, label) count + one per-vertex arg-max window
    * keyed by vertex — bounded by degree, never global.
    */
  /** Degree assortativity (Newman 2002): the Pearson correlation of
    * endpoint degrees over directed edge copies — positive when hubs link
    * to hubs (social shape), negative when hubs link to leaves
    * (hub-and-spoke, the shape near-dup boilerplate clusters take). The
    * whole statistic reduces to five exact integer sums over the edge
    * relation (degrees joined on, never materialized per pair beyond the
    * edge rows that already exist), then one rounded double expression —
    * no window, no pair blow-up beyond 2m rows. Returns one row:
    * (m_directed, assortativity); NULL when the graph is degree-regular
    * (zero variance).
    */
  def assortativity(pairs: DataFrame): DataFrame = {
    val p = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    val edges = p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      // lineage break before joining the degree relation back onto its own
      // source — the same-lineage self-join otherwise mis-resolves the key
      // (the adamicAdar pattern)
      .localCheckpoint(eager = true)
    val deg = edges.groupBy(col("src").as("v")).agg(count(lit(1)).as("d"))
    val x = edges.as("e")
      .join(deg.as("da"), col("e.src") === col("da.v"))
      .join(deg.as("db"), col("e.dst") === col("db.v"))
      .select(col("da.d").as("dx"), col("db.d").as("dy"))
    val a = x.agg(count(lit(1)).as("m"),
      sum("dx").as("sx"), sum("dy").as("sy"),
      sum(col("dx") * col("dy")).as("sxy"),
      sum(col("dx") * col("dx")).as("sx2"),
      sum(col("dy") * col("dy")).as("sy2"))
    val varX = (col("m").cast("double") * col("sx2")
      - col("sx").cast("double") * col("sx"))
    val varY = (col("m").cast("double") * col("sy2")
      - col("sy").cast("double") * col("sy"))
    a.select(col("m").as("m_directed"),
      when(varX * varY === 0.0, lit(null).cast("double"))
        .otherwise(round((col("m").cast("double") * col("sxy")
          - col("sx").cast("double") * col("sy")) / sqrt(varX * varY), 6))
        .as("assortativity"))
  }

  def labelPropagation(pairs: DataFrame, iters: Int = 3): DataFrame = {
    val edges = symmetrized(pairs)
      .localCheckpoint(eager = true) // one lazy plan over `iters` rounds
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("community"))
    for (_ <- 1 to iters) {
      val counted = edges
        .join(labels.withColumnRenamed("doc_id", "src"), "src")
        .groupBy(col("dst").as("doc_id"), col("community"))
        .agg(count(lit(1)).as("cnt"))
      // top-1 label per node as a hash AGGREGATE, not a row_number
      // window (r16): max(struct(cnt, -community)) is the identical
      // argmax — highest count, then LOWEST community on ties (labels
      // are node ids ≥ 0, so negation reverses the order exactly) —
      // with map-side partial aggregation where the window buffered and
      // sorted each node's label rows in one unsplittable partition
      labels = counted
        .groupBy("doc_id")
        .agg(max(struct(col("cnt"), (-col("community")).as("nc"))).as("m"))
        .select(col("doc_id"), (-col("m.nc")).as("community"))
    }
    labels
  }
}
