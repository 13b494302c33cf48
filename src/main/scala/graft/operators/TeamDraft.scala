package graft.operators

/** Fixed-coin team-draft interleaving (Radlinski et al., "How does
  * clickthrough data reflect retrieval quality?", CIKM 2008) — the
  * per-query simulation behind `q_interleave_teamdraft` /
  * `q_interleave_winrate`.
  *
  * Two rankers each contribute a top-k list per query; the merged list
  * is built by alternating drafts (team A first every round — the coin
  * is FIXED so the result is deterministic and SQL-replayable), each
  * team picking its best not-yet-drafted document. A team whose whole
  * list is already drafted yields NO pick at its position (the position
  * number still advances) — the empty-argmin behavior of the step-wise
  * formulation and of the DuckDB oracle's six-CTE unroll.
  *
  * This is a PURE per-group function: the candidate pool per query is
  * ≤ |A's top-k| + |B's top-k| rows, so the whole draft resolves inside
  * one `flatMapGroups` over query_id — one shuffle at any scale, versus
  * the naive step-wise plan of one anti-join + window + checkpoint PER
  * PICK (six dependent jobs).
  */
object TeamDraft {

  /** One draft over a query's candidate pool.
    *
    * @param qid    the query id (threaded through to the output rows)
    * @param cands  (query_id, doc_id, rank, isTeamA) candidate rows —
    *               each team's rows carry its own 1-based rank
    * @param rounds draft rounds (each round = one team-A pick then one
    *               team-B pick); positions run 1..2·rounds
    * @param teamA  label credited to first-coin picks
    * @param teamB  label credited to second-coin picks
    * @return (query_id, doc_id, position, team) picks in draft order;
    *         ties within a team break by (rank, doc_id) ascending
    */
  def draftPicks(qid: Long, cands: Iterator[(Long, Long, Int, Boolean)],
      rounds: Int = 3, teamA: String = "lex", teamB: String = "dense")
      : Iterator[(Long, Long, Long, String)] = {
    val all = cands.toArray
    val aList = all.filter(_._4).sortBy(c => (c._3, c._2))
    val bList = all.filter(!_._4).sortBy(c => (c._3, c._2))
    val picked = scala.collection.mutable.HashSet.empty[Long]
    val out = List.newBuilder[(Long, Long, Long, String)]
    var pos = 0L
    for (_ <- 0 until rounds; (lst, team) <- Seq((aList, teamA), (bList, teamB))) {
      pos += 1
      lst.find(c => !picked.contains(c._2)).foreach { c =>
        picked += c._2
        out += ((qid, c._2, pos, team))
      }
    }
    out.result().iterator
  }
}
