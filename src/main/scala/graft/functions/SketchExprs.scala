package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native sketch expressions over pre-hashed token/shingle arrays
  * (`array<long>`): MinHash signatures and 64-bit SimHash. Both are the
  * tight-loop replacements for their HOF formulations — per-element lambda
  * dispatch and per-seed array allocation dominate the interpreted path at
  * corpus scale; here each document costs one allocation (the signature)
  * and a JIT-friendly nested loop, inlined into whole-stage codegen.
  *
  * Seed mixing is splitmix64 — deterministic everywhere, no dependency on
  * Spark's hash implementations.
  */
object SketchMath {
  /** splitmix64 finalizer over (hash ⊕ seeded golden-ratio step). */
  @inline def mix(h: Long, seed: Int): Long = {
    var z = h + (seed + 1) * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** True iff any slot of the array is null — `getLong`/`getFloat` on a
    * null slot reads garbage, so every expression over a possibly-
    * containsNull array must gate on this and return null instead.
    */
  def hasNullElement(a: ArrayData): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** One-pass word-n-gram shingle hashing: tokenize on single spaces
    * (keeping empty tokens, like `split(text, " ")`), hash each token
    * once with XXH64, chain each n-token window's hashes with
    * `XXH64.hashLong`, and emit FIRST-OCCURRENCE-ordered distinct window
    * hashes. This replaces the four-stage column pipeline
    * (split → zip_with-concat n-grams → array_distinct → per-shingle
    * xxhash64) that allocated an intermediate string per window; here a
    * window costs n chained multiplies and no allocation.
    *
    * Distinctness is by hash value, not by string — two different windows
    * collide with probability ~2⁻⁶⁴, the usual sketch-hash contract.
    * Chaining per-token hashes (not hashing the '|'-joined text) also
    * removes the delimiter ambiguity a token containing '|' would cause.
    * Empty text → empty array (TextAnalysis.tokens semantics).
    *
    * ORACLE CONTRACT: the DuckDB oracles replay shingles as
    * length-prefixed token concatenations (`len(tok) || ':' || tok` per
    * token, no joiner) — an INJECTIVE encoding of the token tuple, so no
    * token content (including '|' or ':') can make the oracle merge
    * windows this kernel keeps distinct. Distinctness-by-string then
    * equals distinctness-by-tuple, which equals this kernel's
    * distinctness-by-chained-hash up to the ~2⁻⁶⁴ collision contract.
    */
  def shingleHashes(text: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val win = windowHashes(text, n)
    val nWin = win.length
    if (nWin == 0) return new GenericArrayData(win)
    // first-occurrence dedupe via open addressing; 0 handled by a flag
    var cap = 8
    while (cap < nWin * 2) cap <<= 1
    val table = new Array[Long](cap)
    var seenZero = false
    val out = new Array[Long](nWin)
    var m = 0
    var w = 0
    while (w < nWin) {
      val h = win(w)
      if (h == 0L) {
        if (!seenZero) { seenZero = true; out(m) = 0L; m += 1 }
      } else {
        var slot = (h.toInt & (cap - 1))
        while (table(slot) != 0L && table(slot) != h) slot = (slot + 1) & (cap - 1)
        if (table(slot) == 0L) { table(slot) = h; out(m) = h; m += 1 }
      }
      w += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  /** Positional variant of [[shingleHashes]]: EVERY window's hash, in
    * window order (element w = the window starting at token w), no
    * dedupe — the kernel under span-level operators where positions are
    * the evidence (`posexplode` over this array yields the
    * (position, window-hash) relation directly). Same per-token XXH64 +
    * chained window hash and the same oracle contract as the distinct
    * kernel.
    */
  def shingleHashesPos(text: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData =
    new GenericArrayData(windowHashes(text, n))

  /** The shared one-pass token-window hashing both shingle kernels sit
    * on: tokenize on single spaces (keeping empty tokens), XXH64 each
    * token once, chain each n-token window's token hashes with
    * `XXH64.hashLong`. Returns one hash per window, in order; empty
    * text or fewer than n tokens → empty.
    */
  private def windowHashes(text: org.apache.spark.unsafe.types.UTF8String, n: Int): Array[Long] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val bytes = text.getBytes
    val len = bytes.length
    if (len == 0) return Array.empty[Long]
    var spaces = 0
    var i = 0
    while (i < len) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val nTok = spaces + 1
    if (nTok < n) return Array.empty[Long]
    // token k spans [starts(k), ends(k))
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var k = 0
    starts(0) = 0
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { ends(k) = i; k += 1; starts(k) = i + 1 }
      i += 1
    }
    ends(k) = len
    val off = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
    val tokHash = new Array[Long](nTok)
    k = 0
    while (k < nTok) {
      tokHash(k) = XXH64.hashUnsafeBytes(bytes, off + starts(k), ends(k) - starts(k), 42L)
      k += 1
    }
    val nWin = nTok - n + 1
    val win = new Array[Long](nWin)
    var w = 0
    while (w < nWin) {
      var h = 42L
      var t = w
      while (t < w + n) { h = XXH64.hashLong(tokHash(t), h); t += 1 }
      win(w) = h
      w += 1
    }
    win
  }

  def minhash(hs: ArrayData, numHashes: Int): ArrayData = {
    val n = hs.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var s = 0
      while (s < numHashes) {
        val m = mix(h, s)
        if (m < sig(s)) sig(s) = m
        s += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Exact Jaccard similarity ×1000 (floor) between two hash arrays in ONE
    * pass — the fused form of
    * `size(array_intersect(a,b))*1000 / size(array_union(a,b))`, which
    * builds two intermediate arrays plus their hash sets per pair. This is
    * the verification step of every LSH candidate pair, i.e. the tightest
    * loop in the dedup family. Duplicate elements are counted once (set
    * semantics, like the composition it replaces); both-empty → 0.
    */
  def jaccardX1000(a: ArrayData, b: ArrayData): Long = {
    val na0 = a.numElements()
    val nb0 = b.numElements()
    val setA = new java.util.HashSet[java.lang.Long](Math.max(8, na0 * 2))
    var i = 0
    while (i < na0) { setA.add(a.getLong(i)); i += 1 }
    val seenB = new java.util.HashSet[java.lang.Long](Math.max(8, nb0 * 2))
    var inter = 0L
    var j = 0
    while (j < nb0) {
      val v: java.lang.Long = b.getLong(j)
      if (seenB.add(v) && setA.contains(v)) inter += 1L
      j += 1
    }
    val union = setA.size().toLong + seenB.size().toLong - inter
    if (union == 0L) 0L else inter * 1000L / union
  }

  /** [[jaccardX1000]] with the null-element gate the user-callable SQL
    * function requires: array<bigint> with containsNull passes the type
    * check, and `getLong` on a null slot would silently fold garbage into
    * the similarity. Null elements → null result.
    */
  def jaccardX1000Checked(a: ArrayData, b: ArrayData): java.lang.Long =
    if (hasNullElement(a) || hasNullElement(b)) null
    else java.lang.Long.valueOf(jaccardX1000(a, b))

  /** [[minhash]] with the same null-element gate (null → null signature). */
  def minhashChecked(hs: ArrayData, numHashes: Int): ArrayData =
    if (hasNullElement(hs)) null else minhash(hs, numHashes)

  /** [[simhash64]] with the same null-element gate. */
  def simhash64Checked(hs: ArrayData): java.lang.Long =
    if (hasNullElement(hs)) null else java.lang.Long.valueOf(simhash64(hs))

  /** Integer dot product of two equal-length `array<long>` columns — the
    * scoring kernel for quantized (int8-coded) ANN candidate generation,
    * where the HOF formulation (`aggregate(zip_with(...))`) would pay two
    * interpreted lambda dispatches per element per candidate pair. Null for
    * length mismatch or null elements (same malformed-input contract as
    * [[hyperplaneSigChecked]]). Callers keep magnitudes small (quantized
    * codes ≤ 255), so the i64 accumulator cannot overflow in practice.
    */
  def dotI64(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    if (hasNullElement(a) || hasNullElement(b)) return null
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    java.lang.Long.valueOf(s)
  }

  /** Unsigned-byte dot product over two packed code arrays (`binary`
    * columns) — the 1-byte-per-dimension ADC scoring kernel. Null on
    * length mismatch (a truncated dot ranks wrong-but-plausibly).
    */
  def dotU8(a: Array[Byte], b: Array[Byte]): java.lang.Long = {
    if (a.length != b.length) return null
    var s = 0L
    var i = 0
    while (i < a.length) { s += (a(i) & 0xFF).toLong * (b(i) & 0xFF).toLong; i += 1 }
    java.lang.Long.valueOf(s)
  }

  /** One-pass int8 quantization metadata: min-max affine codes packed into
    * a byte array plus every scalar the approximate-dot algebra needs.
    * Returns null for empty vectors or null elements. Matches
    * `Vectors.quantizeInt8`'s code values exactly (floor with clamp; a
    * constant vector codes to all-zeros with scale 0).
    *
    * Output row: (code: binary, mn: double, scale: double,
    * csum: bigint, cdot: bigint).
    */
  def quantizeMeta(a: ArrayData): InternalRow = {
    val n = a.numElements()
    if (n == 0 || hasNullElement(a)) return null
    var mn = Double.MaxValue
    var mx = Double.MinValue
    var i = 0
    while (i < n) {
      val v = a.getFloat(i).toDouble
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    val rng = mx - mn
    val code = new Array[Byte](n)
    var csum = 0L
    var cdot = 0L
    i = 0
    while (i < n) {
      val c =
        if (rng == 0.0) 0L
        else math.min(255L, math.floor((a.getFloat(i).toDouble - mn) * 255.0 / rng).toLong)
      code(i) = (c & 0xFF).toByte
      csum += c
      cdot += c * c
      i += 1
    }
    new GenericInternalRow(Array[Any](code, mn, rng / 255.0, csum, cdot))
  }

  /** Deterministic hyperplane bank for random-hyperplane LSH, flattened
    * row-major (plane b occupies [b*dim, (b+1)*dim)). xorshift64* stream —
    * the exact sequence `Vectors.deterministicPlanes` has always produced,
    * so signatures stay bit-identical to the HOF formulation it replaces.
    */
  def hyperplanes(dim: Int, bits: Int, seed: Long): Array[Double] = {
    var s = seed
    val out = new Array[Double](dim * bits)
    var i = 0
    while (i < out.length) {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      out(i) = s * 2.3283064365386963e-19 // ~2^-62: uniform-ish, sign is all we use
      i += 1
    }
    out
  }

  /** Sign bits of a · hᵦ packed into a long; summation order matches the
    * sequential `aggregate(zip_with(...))` fold for bit-identical doubles.
    * Assumes a well-formed input (exactly `dim` non-null elements) — callers
    * going through the expression use [[hyperplaneSigChecked]].
    */
  def hyperplaneSig(a: ArrayData, planes: Array[Double], dim: Int, bits: Int): Long = {
    val n = math.min(a.numElements(), dim)
    var sig = 0L
    var b = 0
    while (b < bits) {
      val off = b * dim
      var dot = 0.0
      var i = 0
      while (i < n) { dot += a.getFloat(i).toDouble * planes(off + i); i += 1 }
      if (dot >= 0.0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** [[hyperplaneSig]] with the malformed-vector handling the expression
    * contract requires: null (not a silently mis-bucketed signature) when
    * the vector's length differs from the plane dimension or any element is
    * null — `getFloat` on a null slot reads garbage, and truncation/padding
    * would bucket the vector somewhere wrong-but-plausible.
    */
  def hyperplaneSigChecked(a: ArrayData, planes: Array[Double], dim: Int,
                           bits: Int): java.lang.Long = {
    val n = a.numElements()
    if (n != dim) return null
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      i += 1
    }
    java.lang.Long.valueOf(hyperplaneSig(a, planes, dim, bits))
  }

  /** Per-band hyperplane-LSH bucket values: band `b`'s bucket packs the
    * sign bits of a · h_{b·rows+j} (j < rows) — the SAME plane stream and
    * fold order as [[hyperplaneSig]], so for `bands·rows ≤ 64` element `b`
    * equals `(hyperplaneSig >> b·rows) & ((1<<rows)-1)` bit-for-bit. The
    * wide form exists because a packed-long signature caps the TOTAL bank
    * at 64 planes: sub-quadratic banding needs wide bands (2^rows bucket
    * values per band), and 8 bands × 16 rows is already 128 planes.
    * Null (not a silently mis-bucketed array) on malformed vectors, same
    * contract as [[hyperplaneSigChecked]].
    */
  def hyperplaneBucketsChecked(a: ArrayData, planes: Array[Double], dim: Int,
                               bands: Int, rows: Int): ArrayData = {
    val n = a.numElements()
    if (n != dim) return null
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var j = 0
      while (j < rows) {
        val off = (b * rows + j) * dim
        var dot = 0.0
        var k = 0
        while (k < n) { dot += a.getFloat(k).toDouble * planes(off + k); k += 1 }
        if (dot >= 0.0) bucket |= (1L << j)
        j += 1
      }
      out(b) = bucket
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def simhash64(hs: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** Decode a UTF8String to an array of Unicode code points without
    * materializing a java.lang.String — the unit Spark's own
    * `levenshtein` compares, so swapping algorithms can't change which
    * pairs match on non-ASCII text.
    */
  private def codePoints(s: org.apache.spark.unsafe.types.UTF8String): Array[Int] = {
    val bytes = s.getBytes
    val out = new Array[Int](s.numChars())
    // clamped continuation-byte read: a TRUNCATED multi-byte sequence at
    // the end of the buffer (possible via binary→string cast, which Spark
    // does not validate) must degrade gracefully like Spark's own
    // levenshtein, not read past the array
    def cont(idx: Int): Int = if (idx < bytes.length) bytes(idx) & 0x3F else 0
    var i = 0
    var o = 0
    while (i < bytes.length) {
      val b0 = bytes(i) & 0xFF
      if (b0 < 0x80) { out(o) = b0; i += 1 }
      else if (b0 < 0xE0) {
        out(o) = ((b0 & 0x1F) << 6) | cont(i + 1); i += 2
      } else if (b0 < 0xF0) {
        out(o) = ((b0 & 0x0F) << 12) | (cont(i + 1) << 6) |
          cont(i + 2); i += 3
      } else {
        out(o) = ((b0 & 0x07) << 18) | (cont(i + 1) << 12) |
          (cont(i + 2) << 6) | cont(i + 3); i += 4
      }
      o += 1
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  /** Classic banded Levenshtein DP — the long-string fallback of
    * [[boundedLevenshtein]]: O(k·n) time, O(m) memory, same contract
    * (distance if ≤ k, else -1). The Myers kernel's Peq table is
    * O(m²/32) bytes per evaluation, fine for Dedup's 100-char prefixes
    * but pathological when the session function meets full documents —
    * past [[MyersMaxPattern]] code points this path takes over.
    */
  private def bandedLevenshtein(p: Array[Int], t: Array[Int], k: Int): Long = {
    val m = p.length
    val n = t.length
    val INF = Int.MaxValue / 2
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 0
    while (i <= m) { prev(i) = if (i <= k) i else INF; i += 1 }
    var j = 1
    while (j <= n) {
      java.util.Arrays.fill(cur, INF)
      if (j <= k) cur(0) = j
      val lo = math.max(1, j - k)
      val hi = math.min(m, j + k)
      var best = cur(0)
      var ii = lo
      while (ii <= hi) {
        val sub = prev(ii - 1) + (if (p(ii - 1) == t(j - 1)) 0 else 1)
        val del = prev(ii) + 1
        val ins = cur(ii - 1) + 1
        val v = math.min(sub, math.min(del, ins))
        cur(ii) = v
        if (v < best) best = v
        ii += 1
      }
      if (best > k) return -1L
      val tmp = prev; prev = cur; cur = tmp
      j += 1
    }
    if (prev(m) <= k) prev(m).toLong else -1L
  }

  /** Pattern-length ceiling for the Myers kernel: at 4096 code points the
    * Peq table is ≤ 8192·64 longs (4 MB) per evaluation; past it the
    * banded DP (O(m) memory) takes over, and the Int overflow of
    * `cap·nb` around m≈370k can never be reached.
    */
  private val MyersMaxPattern = 4096

  /** Bounded Levenshtein distance via Myers' bit-parallel algorithm
    * (Myers, JACM 1999), with Hyyrö's block extension for patterns past
    * one machine word: distance if ≤ k, else -1 — the same contract as
    * Spark's 3-arg `levenshtein`, but ~an order of magnitude fewer ops
    * per pair. The banded DP costs O(min(m, 2k+1)·n) cell updates; here a
    * text character costs ~15 word ops per 64 pattern rows, so a
    * 100×100 comparison is ~3k word ops instead of ~10k multi-op cells.
    * This is the hot kernel of [[graft.operators.Dedup.editDistancePairs]],
    * where it runs once per blocked candidate pair.
    *
    * Mechanics: one bit per pattern row tracks the vertical delta of the
    * DP column (VP/VN = +1/-1); a text character updates all 64 rows of a
    * block in a constant number of word ops, and blocks chain through the
    * horizontal delta at their boundary row (hin/hout ∈ {-1,0,+1}). The
    * score is maintained at the last pattern row only. Early exit: the
    * score can drop by at most 1 per remaining text column, so
    * `score - remaining > k` is unrecoverable.
    */
  def boundedLevenshtein(aS: org.apache.spark.unsafe.types.UTF8String,
                         bS: org.apache.spark.unsafe.types.UTF8String,
                         k: Int): Long = {
    if (k < 0) return -1L
    val aCp = codePoints(aS)
    val bCp = codePoints(bS)
    // pattern = shorter string: fewer blocks, and |n - m| prunes first
    val (p, t) = if (aCp.length <= bCp.length) (aCp, bCp) else (bCp, aCp)
    val m = p.length
    val n = t.length
    if (n - m > k) return -1L
    if (m == 0) return n.toLong // n - 0 <= k already checked
    if (m > MyersMaxPattern) return bandedLevenshtein(p, t, k)
    val nb = (m + 63) >>> 6
    // Peq: code point -> per-block bitmask of matching pattern rows,
    // open-addressed (cap = pow2 >= 2m), parallel key/value-block arrays
    var cap = 8
    while (cap < m * 2) cap <<= 1
    val keys = new Array[Int](cap)
    val used = new Array[Boolean](cap)
    val masks = new Array[Long](cap * nb)
    var i = 0
    while (i < m) {
      val c = p(i)
      val h = c * 0x9E3779B1
      var slot = (h ^ (h >>> 15)) & (cap - 1)
      while (used(slot) && keys(slot) != c) slot = (slot + 1) & (cap - 1)
      used(slot) = true
      keys(slot) = c
      masks(slot * nb + (i >>> 6)) |= 1L << (i & 63)
      i += 1
    }
    val vp = new Array[Long](nb)
    val vn = new Array[Long](nb)
    java.util.Arrays.fill(vp, -1L)
    val lastBlock = nb - 1
    val scoreBit = 1L << ((m - 1) & 63)
    var score = m
    var j = 0
    while (j < n) {
      val c = t(j)
      val h = c * 0x9E3779B1
      var slot = (h ^ (h >>> 15)) & (cap - 1)
      while (used(slot) && keys(slot) != c) slot = (slot + 1) & (cap - 1)
      val eqBase = if (used(slot)) slot * nb else -1
      // hin: horizontal delta entering the block's row 0 boundary;
      // +1 at block 0 every column (DP row 0 is D[0][j] = j)
      var hin = 1
      var bi = 0
      while (bi < nb) {
        val pv = vp(bi)
        val mv = vn(bi)
        var eq = if (eqBase >= 0) masks(eqBase + bi) else 0L
        val xv = eq | mv
        if (hin < 0) eq |= 1L
        val xh = (((eq & pv) + pv) ^ pv) | eq
        var ph = mv | ~(xh | pv)
        var mh = pv & xh
        if (bi == lastBlock) {
          if ((ph & scoreBit) != 0L) score += 1
          else if ((mh & scoreBit) != 0L) score -= 1
        }
        val hout = (if ((ph & 0x8000000000000000L) != 0L) 1 else 0) -
          (if ((mh & 0x8000000000000000L) != 0L) 1 else 0)
        ph <<= 1
        mh <<= 1
        if (hin > 0) ph |= 1L
        else if (hin < 0) mh |= 1L
        vp(bi) = mh | ~(xv | ph)
        vn(bi) = ph & xv
        hin = hout
        bi += 1
      }
      j += 1
      // each remaining column can lower the score by at most 1
      if (score - (n - j) > k) return -1L
    }
    if (score <= k) score.toLong else -1L
  }
}

/** minhash_sig(hashes: array<long>, numHashes: int-literal) → array<long>.
  * Empty input yields an all-Long.MaxValue signature (documents with no
  * shingles never collide with real content buckets by accident — callers
  * should still filter empties before LSH).
  */
case class MinHashSignatureExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private lazy val numHashes: Int = right match {
    case Literal(v: Int, IntegerType) => v
    case _ => throw new IllegalArgumentException("minhash_sig: numHashes must be an int literal")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right) match {
      case (ArrayType(LongType, _), Literal(_: Int, IntegerType)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "minhash_sig expects (array<bigint>, int literal)")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  // null is also the result for a hash array containing null elements
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    SketchMath.minhashChecked(a.asInstanceOf[ArrayData], numHashes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (hs, _) => {
      s"""
         |${ev.value} = graft.functions.SketchMath.minhashChecked($hs, $numHashes);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSignatureExpr =
    copy(left = newLeft, right = newRight)
}

/** jaccard_x1000(a: array<long>, b: array<long>) → bigint: exact per-mille
  * Jaccard in one fused pass (see [[SketchMath.jaccardX1000]]). Integer
  * floor semantics match the `size(intersect)*1000 / size(union)` column
  * composition for non-negative counts, so thresholds (`>= pctX10`) and
  * DuckDB oracles are unchanged.
  */
case class JaccardX1000Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "jaccard_x1000 expects (array<bigint>, array<bigint>)")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "jaccard_x1000"

  // null is also the result for arrays containing null elements — see
  // SketchMath.jaccardX1000Checked
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    SketchMath.jaccardX1000Checked(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("jac")
      s"""
         |java.lang.Long $boxed = graft.functions.SketchMath.jaccardX1000Checked($a, $b);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardX1000Expr =
    copy(left = newLeft, right = newRight)
}

/** hyperplane_sig(embedding: array<float>, dim, bits, seed literals) → bigint.
  *
  * Native replacement for the `when(dot(a, lits) >= 0, 1L << i)` column sum:
  * that formulation evaluates `bits` interpreted `aggregate(zip_with(...))`
  * reductions per row — O(bits·dim) lambda dispatches and `bits`
  * intermediate arrays. Here the plane bank is materialized once per task
  * (codegen reference object) and each row costs one allocation-free nested
  * loop, inlined into whole-stage codegen.
  */
case class HyperplaneSigExpr(child: Expression, dim: Int, bits: Int, seed: Long)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 64, "hyperplane_sig: bits must be in [1, 64]")
  require(dim >= 1, "hyperplane_sig: dim must be positive")

  @transient private lazy val planes: Array[Double] =
    SketchMath.hyperplanes(dim, bits, seed)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("hyperplane_sig expects array<float>")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  // null is also the result for malformed vectors (length != dim, or a null
  // element) — see SketchMath.hyperplaneSigChecked
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    SketchMath.hyperplaneSigChecked(a.asInstanceOf[ArrayData], planes, dim, bits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("hyperplanes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val boxed = ctx.freshName("sig")
      s"""
         |java.lang.Long $boxed =
         |  graft.functions.SketchMath.hyperplaneSigChecked($a, $planesRef, $dim, $bits);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.longValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigExpr =
    copy(child = newChild)
}

/** hyperplane_buckets(embedding: array<float>, dim, bands, rows, seed
  * literals) → array<bigint> of length `bands`: band b's LSH bucket value
  * in [0, 2^rows). The WIDE-band successor to [[HyperplaneSigExpr]] for
  * banded candidate joins (r12 verdict: a 64-bit packed signature caps
  * rows-per-band at 64/bands — 4-bit buckets at 8 bands — and a 16-value
  * bucket domain makes any corpus self-join Θ(n²) in candidates; wide
  * bands need `bands·rows` planes, past what one long can carry).
  * Same plane stream/fold as hyperplane_sig: for bands·rows ≤ 64 the
  * elements equal that signature's band slices bit-for-bit.
  */
case class HyperplaneBucketsExpr(child: Expression, dim: Int, bands: Int,
                                 rowsPerBand: Int, seed: Long)
    extends UnaryExpression {
  require(dim >= 1, "hyperplane_buckets: dim must be positive")
  require(bands >= 1, "hyperplane_buckets: bands must be positive")
  require(rowsPerBand >= 1 && rowsPerBand <= 63,
    "hyperplane_buckets: rows per band must be in [1, 63]")
  require(bands * rowsPerBand <= 4096,
    "hyperplane_buckets: plane bank capped at 4096 planes")

  @transient private lazy val planes: Array[Double] =
    SketchMath.hyperplanes(dim, bands * rowsPerBand, seed)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("hyperplane_buckets expects array<float>")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  // null is also the result for malformed vectors (length != dim, or a
  // null element) — see SketchMath.hyperplaneBucketsChecked
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    SketchMath.hyperplaneBucketsChecked(
      a.asInstanceOf[ArrayData], planes, dim, bands, rowsPerBand)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("hyperplanes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val arr = ctx.freshName("buckets")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $arr =
         |  graft.functions.SketchMath.hyperplaneBucketsChecked(
         |    $a, $planesRef, $dim, $bands, $rowsPerBand);
         |if ($arr == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $arr;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketsExpr =
    copy(child = newChild)
}

/** dot_i64(a: array<long>, b: array<long>) → bigint: integer dot product
  * (see [[SketchMath.dotI64]]). Null on length mismatch or null elements —
  * a silently truncated dot would rank a candidate wrong-but-plausibly.
  */
case class DotI64Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "dot_i64 expects (array<bigint>, array<bigint>)")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_i64"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    SketchMath.dotI64(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dot")
      s"""
         |java.lang.Long $boxed = graft.functions.SketchMath.dotI64($a, $b);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotI64Expr =
    copy(left = newLeft, right = newRight)
}

/** simhash64(hashes: array<long>) → bigint. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("simhash64 expects array<bigint>")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  // null is also the result for a hash array containing null elements
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    SketchMath.simhash64Checked(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val boxed = ctx.freshName("fp")
      s"""
         |java.lang.Long $boxed = graft.functions.SketchMath.simhash64Checked($hs);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** dot_u8(a: binary, b: binary) → bigint: unsigned-byte dot product over
  * packed int8 code arrays (see [[SketchMath.dotU8]]). Null on length
  * mismatch. With codes packed as binary, the ADC scoring path really is
  * one byte per dimension in memory, in shuffles, and at rest — unlike
  * `array<bigint>` codes, which cost 8 bytes per element everywhere.
  */
case class DotU8Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("dot_u8 expects (binary, binary)")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_u8"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    SketchMath.dotU8(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dot")
      s"""
         |java.lang.Long $boxed = graft.functions.SketchMath.dotU8($a, $b);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotU8Expr =
    copy(left = newLeft, right = newRight)
}

/** quantize_meta(embedding: array<float>) →
  * struct<code: binary, mn: double, scale: double, csum: bigint,
  * cdot: bigint> — the whole per-vector quantized-ANN index record in ONE
  * pass (see [[SketchMath.quantizeMeta]]): codes bit-packed to one byte
  * per dimension plus the four scalars the approximate-dot algebra needs.
  * Null for empty vectors or null elements.
  */
case class QuantizeMetaExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("quantize_meta expects array<float>")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("code", BinaryType, nullable = false),
    StructField("mn", DoubleType, nullable = false),
    StructField("scale", DoubleType, nullable = false),
    StructField("csum", LongType, nullable = false),
    StructField("cdot", LongType, nullable = false)))
  override def prettyName: String = "quantize_meta"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    SketchMath.quantizeMeta(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.SketchMath.quantizeMeta($a);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeMetaExpr =
    copy(child = newChild)
}

/** shingle_hashes(text: string, n: int-literal) → array<bigint>: distinct
  * word-n-gram shingle hashes in one codegen'd pass (see
  * [[SketchMath.shingleHashes]]) — the scan-side kernel under every
  * shingle-overlap dedup operator. Null text → null.
  */
case class ShingleHashesExpr(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("shingle_hashes expects (string, int literal)")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(t: Any): Any =
    SketchMath.shingleHashes(t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.SketchMath.shingleHashes($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

/** shingle_hashes_pos(text: string, n: int-literal) → array<bigint>:
  * ALL word-n-gram window hashes in window order, no dedupe (see
  * [[SketchMath.shingleHashesPos]]) — the positional kernel under
  * span-level dedup ([[graft.operators.Dedup.sharedSpans]]). Null text
  * → null.
  */
case class ShingleHashesPosExpr(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("shingle_hashes_pos expects (string, int literal)")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes_pos"

  override def nullSafeEval(t: Any): Any =
    SketchMath.shingleHashesPos(t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.SketchMath.shingleHashesPos($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesPosExpr =
    copy(child = newChild)
}

/** bounded_levenshtein(a: string, b: string, k: int-literal) → bigint:
  * Levenshtein distance over code points if ≤ k, else -1 — contract-
  * identical to Spark's 3-arg `levenshtein`, computed with Myers'
  * bit-parallel algorithm ([[SketchMath.boundedLevenshtein]]). The drop-in
  * hot kernel for blocked edit-distance joins, where the distance runs as
  * the join's residual predicate once per candidate pair. Null on null
  * input (either side).
  */
case class BoundedLevenshteinExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "bounded_levenshtein expects (string, string, int literal)")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "bounded_levenshtein"

  override def nullSafeEval(a: Any, b: Any): Any =
    SketchMath.boundedLevenshtein(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SketchMath.boundedLevenshtein($a, $b, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedLevenshteinExpr =
    copy(left = newLeft, right = newRight)
}
