package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` extension point (SURVEY §2.6's UDAF surface).
  *
  * Sum of the k largest values per group with an O(k) aggregation buffer:
  * the declarative alternative — `row_number() OVER (ORDER BY v DESC) <= k`
  * then sum — shuffles and sorts every row of every group; this buffer
  * carries at most k doubles per group through the map-side partial
  * aggregation and merges k-vs-k at reduce, the same bounded-state idea as
  * the TopKPerGroup physical operator but at the aggregation-function
  * level (composes with any groupBy, rollup, cube, or window frame).
  */
final class TopKSumAgg(k: Int) extends Aggregator[Double, Array[Double], Double] {
  require(k > 0)

  override def zero: Array[Double] = Array.empty

  private def insert(buf: Array[Double], v: Double): Array[Double] =
    if (buf.length < k) buf :+ v
    else {
      var mi = 0
      var i = 1
      while (i < buf.length) { if (buf(i) < buf(mi)) mi = i; i += 1 }
      if (v > buf(mi)) buf(mi) = v
      buf
    }

  override def reduce(buf: Array[Double], v: Double): Array[Double] = insert(buf, v)

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    b.foldLeft(a)(insert)

  override def finish(buf: Array[Double]): Double = {
    // deterministic fold order regardless of how partials merged
    java.util.Arrays.sort(buf)
    var s = 0.0
    var i = 0
    while (i < buf.length) { s += buf(i); i += 1 }
    s
  }

  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** Top-k (score, id) rows per group with an O(k) aggregation buffer and
  * map-side partial combine — the distribution-safe top-k-per-group when
  * group cardinality is LOW (per-domain caps: a handful of domains over
  * 100 TB of rows). Both the `row_number()` window plan and the
  * TopKPerGroup physical operator cluster every row by group first, which
  * funnels a low-cardinality group column through #groups tasks; this
  * aggregator ships only #partitions × #groups × k pairs to the reduce
  * side. Ordering is (score DESC, id ASC) — id is the deterministic
  * tie-break, so the result is engine-reproducible.
  *
  * Input is the (score, id) pair; group keys stay outside (any typed
  * groupByKey / relational groupBy composes).
  */
final class TopKDocsAgg(k: Int)
    extends Aggregator[(Long, Long), Array[(Long, Long)], Seq[(Long, Long)]] {
  require(k > 0)

  override def zero: Array[(Long, Long)] = Array.empty

  // (a beats b) under (score DESC, id ASC)
  private def beats(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Array[(Long, Long)], v: (Long, Long)): Array[(Long, Long)] =
    if (buf.length < k) buf :+ v
    else {
      // replace the worst kept pair iff v beats it
      var wi = 0
      var i = 1
      while (i < buf.length) { if (beats(buf(wi), buf(i))) wi = i; i += 1 }
      if (beats(v, buf(wi))) buf(wi) = v
      buf
    }

  override def reduce(buf: Array[(Long, Long)], v: (Long, Long)): Array[(Long, Long)] =
    insert(buf, v)

  override def merge(a: Array[(Long, Long)], b: Array[(Long, Long)]): Array[(Long, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: Array[(Long, Long)]): Seq[(Long, Long)] =
    buf.sortWith(beats).toSeq

  override def bufferEncoder: Encoder[Array[(Long, Long)]] =
    ExpressionEncoder[Array[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}

/** Space-Saving heavy hitters (Metwally et al.): top-`k` most frequent keys
  * with a buffer bounded at `capacity` counters regardless of input size —
  * the sketch that replaces an exact groupBy+count over a billions-distinct
  * key space (web tokens, URLs, user ids) when only the head matters.
  *
  * Each counter is (estimate, err): classic SS invariant on a single stream
  * is `true ≤ estimate ≤ true + err`. Partials merge as mergeable
  * summaries (Agarwal et al.): keys present in both sides add
  * componentwise; a key absent from one side is seeded with that side's
  * *floor* — its minimum counter when at capacity, 0 otherwise — added to
  * both estimate and err, because the SS invariant bounds any untracked
  * key's true count by the min counter. This keeps `true ≤ est ≤ true+err`
  * per key even for keys evicted in one partial that reappear in another
  * (they don't restart from the reappearing partial's count alone). If the
  * union overflows, only the top-`capacity` counters survive; survivors'
  * bounds are unaffected by dropping smaller counters, and the new min
  * counter ≥ every evicted estimate, so the floor invariant is preserved.
  * With `capacity ≥` the distinct key count no eviction ever happens and
  * the result is exact and split-agnostic — the regime the catalog entry
  * runs in (its DuckDB oracle recomputes exact counts); eviction behavior
  * is property-tested in ScalaTest.
  *
  * Output: top-`k` (estimate desc, key asc) as (key, estimate, err) —
  * deterministic tie order so results are reproducible run to run.
  */
/** Count-min sketch over long keys: the frequency twin of the HLL distinct
  * sketch (`q_hll_merge`) — a depth×width grid of counters where every key
  * increments one cell per row and a point estimate reads the MIN of its
  * cells. Linearity makes it exactly mergeable (cellwise sum), so Spark's
  * partial aggregation IS the sketch merge — per-partition sketches combine
  * at reduce with no row ever leaving its partition. Guarantees: estimates
  * NEVER undercount (each cell only ever adds), and overshoot exceeds
  * e·N/width with probability ≤ e^-depth per query (Markov on the ≤N/width
  * expected collision mass per cell, minimized over depth independent
  * rows). Row hashes are splitmix64 finalizers over (key, row-seed) —
  * deterministic across partitions, sessions, and engines.
  */
object CountMin {
  def cellIndex(row: Int, key: Long, width: Int): Int = {
    var h = key + 0x9e3779b97f4a7c15L * (row + 1)
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^= (h >>> 31)
    row * width + ((h & Long.MaxValue) % width).toInt
  }

  def estimate(sketch: Array[Long], key: Long, width: Int, depth: Int): Long = {
    var m = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = sketch(cellIndex(r, key, width))
      if (c < m) m = c
      r += 1
    }
    m
  }

  /** Count-min inner product (AMS-style): min over rows of the per-row
    * cell-wise dot product estimates Σ_k f_a(k)·f_b(k) — the equi-join
    * OUTPUT CARDINALITY of the two sketched key streams. Never
    * undercounts; the overcount is bounded by e·N_a·N_b/width w.h.p. —
    * the classic sketch a distributed optimizer uses to size a join
    * without touching either table twice.
    *
    * Overflow-safe at 100 TB counts (r10 advice): with per-side counts
    * ~1e11 the row dot product can pass 2^63, and a silent wrap would
    * return a negative/tiny "min" that VIOLATES the never-undercount
    * contract. Each product is checked via `Math.multiplyHigh` and each
    * accumulation via the sign rule (all cells are non-negative counts);
    * an overflowing row SATURATES to Long.MaxValue — a uselessly loose
    * but contract-true estimate the min over the other rows then beats.
    */
  def innerProduct(a: Array[Long], b: Array[Long], width: Int, depth: Int): Long = {
    var m = Long.MaxValue
    var r = 0
    while (r < depth) {
      var s = 0L
      var c = 0
      while (c < width && s >= 0) {
        val x = a(r * width + c)
        val y = b(r * width + c)
        val lo = x * y
        // non-negative operands: product overflowed iff the high 64 bits
        // are not the sign-extension of the low word's sign bit
        if (Math.multiplyHigh(x, y) != (lo >> 63)) s = -1L
        else {
          s += lo
          // x,y ≥ 0 ⇒ lo ≥ 0 ⇒ a valid running sum only grows; a drop
          // below the previous value means the add wrapped past 2^63
          if (s < lo) s = -1L
        }
        c += 1
      }
      val rowEst = if (s < 0) Long.MaxValue else s
      if (rowEst < m) m = rowEst
      r += 1
    }
    m
  }
}

final class CountMinAgg(width: Int, depth: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(width > 0 && depth > 0, s"width/depth must be positive: $width/$depth")

  override def zero: Array[Long] = new Array[Long](width * depth)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    var r = 0
    while (r < depth) { buf(CountMin.cellIndex(r, key, width)) += 1; r += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

final class SpaceSavingAgg(capacity: Int, k: Int)
    extends Aggregator[String, Map[String, (Long, Long)], Seq[(String, Long, Long)]] {
  require(capacity > 0 && k > 0 && k <= capacity)

  override def zero: Map[String, (Long, Long)] = Map.empty

  override def reduce(buf: Map[String, (Long, Long)], key: String): Map[String, (Long, Long)] =
    buf.get(key) match {
      case Some((c, e)) => buf.updated(key, (c + 1L, e))
      case None if buf.size < capacity => buf.updated(key, (1L, 0L))
      case None =>
        // evict the minimum counter: the newcomer inherits its estimate + 1
        // with err = that estimate (it may have occurred up to min times
        // while untracked) — the classic SS replacement step
        val (minKey, (minC, _)) = buf.minBy { case (kk, (c, _)) => (c, kk) }
        (buf - minKey).updated(key, (minC + 1L, minC))
    }

  // an SS summary's untracked-key bound: any key not in the buffer has true
  // count ≤ the min counter (0 while under capacity — every seen key is
  // tracked until the first eviction)
  private def floor(buf: Map[String, (Long, Long)]): Long =
    if (buf.size < capacity) 0L else buf.valuesIterator.map(_._1).min

  override def merge(a: Map[String, (Long, Long)],
                     b: Map[String, (Long, Long)]): Map[String, (Long, Long)] = {
    val fA = floor(a)
    val fB = floor(b)
    val union = (a.keySet ++ b.keySet).iterator.map { kk =>
      (a.get(kk), b.get(kk)) match {
        case (Some((cA, eA)), Some((cB, eB))) => kk -> (cA + cB, eA + eB)
        case (Some((cA, eA)), None)           => kk -> (cA + fB, eA + fB)
        case (None, Some((cB, eB)))           => kk -> (cB + fA, eB + fA)
        case (None, None)                     => throw new IllegalStateException(kk)
      }
    }.toMap
    if (union.size <= capacity) union
    else union.toSeq.sortBy { case (kk, (c, _)) => (-c, kk) }.take(capacity).toMap
  }

  override def finish(buf: Map[String, (Long, Long)]): Seq[(String, Long, Long)] =
    buf.toSeq.sortBy { case (kk, (c, _)) => (-c, kk) }
      .take(k).map { case (kk, (c, e)) => (kk, c, e) }

  override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
    ExpressionEncoder[Map[String, (Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
    ExpressionEncoder[Seq[(String, Long, Long)]]()
}
