package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns.
  *
  * All built-in higher-order functions (`zip_with`/`aggregate`) — fully
  * codegen'd, no UDF serialization, so a cosine ride-along in a join
  * condition stays inside whole-stage codegen. Math is promoted to double
  * before summation for cross-engine-stable results.
  */
object Vectors {

  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  /** Σ aᵢ·bᵢ */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** a / ‖a‖₂ as array<double>; null on zero norm. Pre-normalizing each side
    * once turns every pairwise cosine into a single dot product — the
    * difference between O(pairs·3·dim) and O(pairs·dim) work in similarity
    * joins, where `pairs` is the quadratic term.
    */
  def unit(a: Column): Column = {
    val n = l2Norm(a)
    // zip_with against a repeated-norm array: putting `n` inside a
    // transform lambda would re-evaluate the O(dim) norm per element
    // (HOF lambdas re-execute their captured subtrees)
    when(n === 0.0, lit(null).cast("array<double>"))
      .otherwise(zip_with(d(a), array_repeat(n, size(a)), (x, nn) => x / nn))
  }

  /** Dot product of two already-unit vectors (see [[unit]]); null-safe. */
  def unitCosine(ua: Column, ub: Column): Column =
    when(ua.isNull || ub.isNull, lit(null).cast("double"))
      .otherwise(aggregate(zip_with(ua, ub, (x, y) => x * y), lit(0.0), (acc, x) => acc + x))

  /** cosine(a, b); null-safe on zero norms. */
  def cosine(a: Column, b: Column): Column = {
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na === 0.0 || nb === 0.0, lit(null).cast("double"))
      .otherwise(dot(a, b) / (na * nb))
  }

  /** Euclidean distance. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x))

  /** Random-hyperplane LSH signature: the sign bits of `a · hᵢ` for a fixed,
    * deterministic bank of hyperplanes, packed into a long. Used for
    * bucketed (sub-quadratic) cosine similarity search at scale.
    * Hyperplanes are derived from a seeded xorshift so every executor and
    * every run agrees without shipping state.
    */
  def hyperplaneSignature(a: Column, dim: Int, bits: Int, seed: Long = 42L): Column = {
    val planes = deterministicPlanes(dim, bits, seed)
    val bitCols = planes.zipWithIndex.map { case (p, i) =>
      val lits = array(p.map(v => lit(v)): _*)
      when(dot(a, lits) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Deterministic pseudo-random unit-free hyperplanes (xorshift64*). */
  private[graft] def deterministicPlanes(dim: Int, bits: Int, seed: Long): Seq[Array[Double]] = {
    var s = seed
    def next(): Double = {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      // map to (-1, 1)
      (s * 2.3283064365386963e-19) // 2^-62, roughly uniform in (-2, 2) — sign is all we use
    }
    Seq.fill(bits)(Array.fill(dim)(next()))
  }
}
