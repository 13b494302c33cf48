package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the 100 TB pattern for "filter a huge fact
  * table by a key set that is too big to broadcast as an exact set but
  * whose *bloom filter* is tiny": build k hashed bit positions from the
  * build side, reduce them to one small distinct-position relation, and
  * prune the probe side with k broadcast hash-joins against it before any
  * exact (shuffling) join runs. False positives only ever cost a little
  * extra work in the exact verify; false negatives are impossible, which
  * the catalog entry (`q_bloom_join`) asserts as a verdict column.
  *
  * This is the manual, observable twin of Spark's own runtime bloom
  * filter (`spark.sql.optimizer.runtime.bloomFilter.enabled`) — written
  * out as an operator so the pruning is part of the declared plan (and so
  * an engine without the optimizer rule, e.g. the DuckDB oracle, can
  * replay it bit-for-bit).
  *
  * Hashing: k functions from the universal family
  * `h_j(x) = (a_j * x + b_j) mod P mod m` with P = 2^31 - 1 (prime) and
  * fixed odd multipliers — deterministic, overflow-free in 64-bit
  * arithmetic for any key < ~2.8e9 (9.2e18 / 3.27e9), and expressible in
  * ANSI SQL, which is what makes the oracle exact. For arbitrary-width
  * keys in production, swap `position` for the native `xxhash64(key, j)`
  * — same plan shape, no other change.
  */
object BloomJoin {

  private val P = 2147483647L
  private val A = Seq(2654435761L, 2246822519L, 3266489917L, 668265263L)
  private val B = Seq(1013904223L, 374761393L, 2654435769L, 2246822507L)

  /** Bit position for hash function j of a non-negative integral key. */
  def position(key: Column, j: Int, m: Int): Column =
    pmod(pmod(lit(A(j)) * key + lit(B(j)), lit(P)), lit(m))

  /** The filter itself: the distinct bit positions set by the build-side
    * keys. At most `min(m, |build| * k)` rows of one int each — for
    * m = 64k that is a ≤ 512 KB relation regardless of build-side row
    * count, always broadcastable. One explode + one hash aggregate.
    */
  def bits(build: DataFrame, key: String, m: Int, k: Int): DataFrame = {
    require(k >= 1 && k <= A.length, s"k must be in [1, ${A.length}]")
    build
      .select(explode(array((0 until k).map(j => position(col(key), j, m)): _*)).as("bit"))
      .distinct()
      // structural no-op (distinct positions mod m are ≤ m BY DEFINITION —
      // this can never truncate): states the bloom filter's defining row
      // bound in a form PlanAudit's boundedness walk can verify, so the
      // broadcast in prune() is machine-checkably safe at any SF
      .limit(m)
  }

  /** Probe rows whose key passes the bloom membership test (all k
    * positions present in `bitsDf`). k broadcast LEFT SEMI joins — the
    * probe side never shuffles and never moves; each join only tests a
    * derived int column against the broadcast position set.
    */
  def prune(probe: DataFrame, key: String, bitsDf: DataFrame, m: Int, k: Int): DataFrame = {
    require(k >= 1 && k <= A.length, s"k must be in [1, ${A.length}]")
    (0 until k).foldLeft(probe) { (df, j) =>
      df.join(
        broadcast(bitsDf.select(col("bit").as(s"_bloom_pos_$j"))),
        position(col(key), j, m) === col(s"_bloom_pos_$j"), "left_semi")
    }
  }
}
