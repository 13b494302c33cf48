package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph analytics over pair frames (the same (doc_a, doc_b) shape the
  * dedup pair generators emit). Connected components lives in [[Dedup]];
  * this holds the score-propagation side.
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
  def pageRank(pairs: DataFrame, iters: Int = 3, damping: Double = 0.85): DataFrame = {
    val lvl = StorageLevel.MEMORY_AND_DISK
    val p = pairs.persist(lvl)
    val edges = p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist(lvl)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    // vertex count as a broadcast relation, not a driver-side collect —
    // the rank column needs 1/n and (1-d)/n as plan-side values
    val nodes = edges.select(col("src").as("doc_id")).distinct().persist(lvl)
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
}
