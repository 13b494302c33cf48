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

  /** Per-vector scalar int8 quantization: min-max scaled to [0, 255] as
    * array<bigint> (a constant vector quantizes to all-zeros). The 4×
    * footprint cut (float32 → one byte) is the standard first compression
    * step before ANN indexing at corpus scale. Deterministic double algebra
    * (`floor((x-mn)*255/(mx-mn))` with a clamp for the IEEE edge at x=mx),
    * so any engine reproduces it bit-for-bit.
    *
    * min/max/range ride in via `array_repeat`, NOT inside the lambdas — HOF
    * lambdas re-evaluate captured subtrees per element, which would make
    * this O(dim²) per row (see [[unit]]).
    */
  def quantizeInt8(a: Column): Column = {
    val v = d(a)
    val mn = array_min(v)
    val rng = array_max(v) - mn
    val shifted = zip_with(v, array_repeat(mn, size(v)), (x, m) => x - m)
    when(rng === 0.0, transform(v, _ => lit(0L)))
      .otherwise(zip_with(shifted, array_repeat(rng, size(v)),
        (xm, r) => least(lit(255L), floor(xm * 255.0 / r))))
  }

  /** Random-hyperplane LSH signature: the sign bits of `a · hᵢ` for a fixed,
    * deterministic bank of hyperplanes, packed into a long. Used for
    * bucketed (sub-quadratic) cosine similarity search at scale.
    * Hyperplanes are derived from a seeded xorshift so every executor and
    * every run agrees without shipping state.
    */
  def hyperplaneSignature(a: Column, dim: Int, bits: Int, seed: Long = 42L): Column =
    // native codegen expression (see SketchExprs.HyperplaneSigExpr) — the
    // column-algebra formulation was `bits` interpreted HOF reductions/row.
    // Bit-identical to it: same plane stream, same fold order, same >= 0.
    // PRECONDITION: the session must have graft functions registered
    // (GraftSession.getOrCreate, GraftExtensions, or
    // GraftFunctions.register) — analysis fails with "Undefined function"
    // otherwise. All graft operators register before calling this.
    call_function("hyperplane_sig", a, lit(dim), lit(bits), lit(seed))

  /** Per-band hyperplane-LSH buckets: `bands` values, each in
    * [0, 2^rowsPerBand) — the wide-band signature for banded candidate
    * joins (see SketchExprs.HyperplaneBucketsExpr: a packed-long signature
    * caps the bank at 64 planes, forcing the tiny bucket domains the r12
    * verdict flagged as Θ(n²) candidate volume). Same plane stream as
    * [[hyperplaneSignature]]: for bands·rows ≤ 64 the elements equal that
    * signature's band slices bit-for-bit. Same registration PRECONDITION.
    */
  def hyperplaneBandBuckets(a: Column, dim: Int, bands: Int, rowsPerBand: Int,
                            seed: Long = 42L): Column =
    call_function("hyperplane_buckets", a, lit(dim), lit(bands),
      lit(rowsPerBand), lit(seed))

  /** Deterministic pseudo-random hyperplanes (xorshift64*), grouped per bit. */
  private[graft] def deterministicPlanes(dim: Int, bits: Int, seed: Long): Seq[Array[Double]] =
    graft.functions.SketchMath.hyperplanes(dim, bits, seed)
      .grouped(dim).toSeq
}
