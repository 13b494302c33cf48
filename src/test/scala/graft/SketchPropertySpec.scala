package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{SketchMath, TopKSumAgg}

/** Algebraic properties of the sketch/aggregation math — stronger than
  * example tests because they pin the invariants the LSH constructions
  * depend on (set semantics, mergeability), not specific values.
  */
class SketchPropertySpec extends AnyFunSuite {

  /** Deterministic sampling in place of the scalatest-scalacheck bridge
    * (not on the offline classpath): n values from fixed seeds.
    */
  private def forAllSampled[A](gen: Gen[A], n: Int = 80)(check: A => Unit): Unit =
    Iterator.iterate(Seed(42L))(_.next).take(n)
      .map(seed => gen.pureApply(Gen.Parameters.default, seed))
      .foreach(check)

  private val hashes: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))

  private def sig(xs: Seq[Long], n: Int = 16): Seq[Long] = {
    val s = SketchMath.minhash(new GenericArrayData(xs.toArray), n)
    (0 until n).map(s.getLong)
  }

  test("shingleHashes preserves pairwise intersection cardinality vs string n-grams") {
    import org.apache.spark.unsafe.types.UTF8String
    // the property EVERY shingle-overlap operator depends on: for any two
    // texts, |native(A) ∩ native(B)| must equal the distinct shared
    // string n-grams — equal token windows hash equal, distinct windows
    // hash distinct (w.h.p.), including empty tokens from repeated spaces
    val word: Gen[String] = Gen.oneOf("a", "b", "cc", "dd", "", "ee", "longword")
    val text: Gen[String] = Gen.listOfN(12, word).map(_.mkString(" "))
    def native(t: String, n: Int): Set[Long] = {
      val a = SketchMath.shingleHashes(UTF8String.fromString(t), n)
      (0 until a.numElements()).map(a.getLong).toSet
    }
    def strings(t: String, n: Int): Set[String] =
      if (t.isEmpty) Set.empty
      else t.split(" ", -1).toList.sliding(n).filter(_.size == n)
        .map(_.mkString("|")).toSet
    forAllSampled(Gen.zip(text, text)) { case (ta, tb) =>
      for (n <- Seq(2, 3)) {
        val (na, nb) = (native(ta, n), native(tb, n))
        val (sa, sb) = (strings(ta, n), strings(tb, n))
        assert(na.size == sa.size, s"cardinality n=$n for '$ta'")
        assert(nb.size == sb.size, s"cardinality n=$n for '$tb'")
        assert(na.intersect(nb).size == sa.intersect(sb).size,
          s"intersection n=$n for '$ta' × '$tb'")
      }
    }
  }

  test("minhash is permutation- and duplicate-invariant (set semantics)") {
    forAllSampled(hashes) { xs =>
      val shuffled = new scala.util.Random(xs.hashCode).shuffle(xs)
      assert(sig(xs) == sig(shuffled))
      assert(sig(xs) == sig(xs ++ xs))
    }
  }

  test("minhash of a union is the elementwise min of the signatures (mergeable)") {
    forAllSampled(Gen.zip(hashes, hashes)) { case (a, b) =>
      val merged = sig(a).zip(sig(b)).map { case (x, y) => math.min(x, y) }
      assert(sig(a ++ b) == merged)
    }
  }

  test("simhash is permutation-invariant") {
    forAllSampled(hashes) { xs =>
      val shuffled = new scala.util.Random(xs.hashCode).shuffle(xs)
      assert(SketchMath.simhash64(new GenericArrayData(xs.toArray)) ==
        SketchMath.simhash64(new GenericArrayData(shuffled.toArray)))
    }
  }

  test("SpaceSavingAgg is exact and split-agnostic when capacity covers the key space") {
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.chooseNum(0, 9).map(i => s"k$i")),
      Gen.chooseNum(0, 100))
    forAllSampled(gen) { case (keys, splitSeed) =>
      val agg = new graft.functions.SpaceSavingAgg(capacity = 16, k = 10)
      val cut = splitSeed % (keys.size + 1)
      val (l, r) = keys.splitAt(cut)
      val merged = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
      val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expected = exact.toSeq.sortBy { case (k0, c) => (-c, k0) }.take(10)
        .map { case (k0, c) => (k0, c, 0L) }
      assert(merged == expected, s"keys=$keys got=$merged want=$expected")
    }
  }

  test("CountMinAgg never undercounts and is split-agnostic (linearity)") {
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.chooseNum(-50L, 50L)),
      Gen.chooseNum(0, 100))
    forAllSampled(gen) { case (keys, splitSeed) =>
      val width = 32 // deliberately tiny so collisions actually happen
      val depth = 4
      val agg = new graft.functions.CountMinAgg(width, depth)
      val cut = splitSeed % (keys.size + 1)
      val (l, r) = keys.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      val whole = keys.foldLeft(agg.zero)(agg.reduce)
      // linearity: merging partials == sketching the whole stream
      assert(merged.toSeq == whole.toSeq, s"keys=$keys")
      // one-sided error: the estimate can collide upward, never down
      val exact = keys.groupBy(identity).view.mapValues(_.size.toLong)
      exact.foreach { case (k0, c) =>
        val est = graft.functions.CountMin.estimate(merged, k0, width, depth)
        assert(est >= c, s"undercount for $k0: est=$est exact=$c")
        assert(est <= keys.size, s"estimate above stream length for $k0")
      }
    }
  }

  test("SpaceSavingAgg under eviction keeps the SS bounds: true <= est <= true + err") {
    // single-stream (reduce-only) path, capacity far below distinct keys;
    // a zipf-ish stream so there IS a head to find
    val gen = Gen.nonEmptyListOf(Gen.frequency(
      8 -> Gen.chooseNum(0, 2).map(i => s"hot$i"),
      2 -> Gen.chooseNum(0, 400).map(i => s"cold$i")))
    forAllSampled(gen) { keys =>
      val agg = new graft.functions.SpaceSavingAgg(capacity = 8, k = 8)
      val out = agg.finish(keys.foldLeft(agg.zero)(agg.reduce))
      val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      out.foreach { case (k0, est, err) =>
        val truth = exact.getOrElse(k0, 0L)
        assert(truth <= est && est <= truth + err,
          s"key=$k0 true=$truth est=$est err=$err keys=${keys.take(50)}")
      }
      // a key that dominates the stream can never be absent from the summary
      val (maxKey, maxCnt) = exact.maxBy { case (k0, c) => (c, k0) }
      if (maxCnt > keys.size / 2)
        assert(out.exists(_._1 == maxKey), s"dominant $maxKey missing from $out")
    }
  }

  test("SpaceSavingAgg merge keeps SS bounds when partials evict (mergeable-summaries floor)") {
    // capacity far below distinct keys AND the stream split into several
    // partials, so keys get evicted in one partial and reappear in another —
    // the regime where a merge without floor seeding undercounts
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.frequency(
        8 -> Gen.chooseNum(0, 2).map(i => s"hot$i"),
        2 -> Gen.chooseNum(0, 400).map(i => s"cold$i"))),
      Gen.chooseNum(2, 5))
    forAllSampled(gen) { case (keys, nSplits) =>
      val agg = new graft.functions.SpaceSavingAgg(capacity = 8, k = 8)
      val partials = keys.grouped(math.max(1, keys.size / nSplits)).toSeq
        .map(_.foldLeft(agg.zero)(agg.reduce))
      val out = agg.finish(partials.reduce(agg.merge))
      val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      out.foreach { case (k0, est, err) =>
        val truth = exact.getOrElse(k0, 0L)
        assert(truth <= est && est <= truth + err,
          s"key=$k0 true=$truth est=$est err=$err splits=$nSplits keys=${keys.take(50)}")
      }
    }
  }

  test("dot_i64 equals the BigInt dot product on any same-length long arrays") {
    val gen = Gen.chooseNum(1, 64).flatMap { n =>
      Gen.zip(Gen.listOfN(n, Gen.chooseNum(0L, 255L)), Gen.listOfN(n, Gen.chooseNum(0L, 255L)))
    }
    forAllSampled(gen) { case (a, b) =>
      val expect = a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      val got = SketchMath.dotI64(
        new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
      assert(BigInt(got.longValue()) == expect)
    }
    // length mismatch is null, not a truncated partial dot
    assert(SketchMath.dotI64(
      new GenericArrayData(Array(1L, 2L)), new GenericArrayData(Array(1L))) == null)
  }

  test("quantized approximate cosine stays within 0.05 of exact for random vectors") {
    // the end-to-end guarantee behind ann_quantized_topk's candidate
    // ranking: reconstruct the approx-cos formula from quantize_meta's
    // fields exactly as Similarity.approxCos does and bound its error
    // against the float-exact cosine
    val vec = Gen.listOfN(64, Gen.chooseNum(-1.0f, 1.0f))
    forAllSampled(Gen.zip(vec, vec)) { case (va, vb) =>
      val a = va.toArray
      val b = vb.toArray
      def meta(x: Array[Float]) =
        SketchMath.quantizeMeta(new GenericArrayData(x))
      val (ma, mb) = (meta(a), meta(b))
      val d = a.length.toDouble
      def f(m: org.apache.spark.sql.catalyst.InternalRow) =
        (m.getBinary(0), m.getDouble(1), m.getDouble(2),
          m.getLong(3).toDouble, m.getLong(4).toDouble)
      val (ca, mna, sa, csa, cda) = f(ma)
      val (cb, mnb, sb, csb, cdb) = f(mb)
      val approxDot = mna * mnb * d + mnb * sa * csa + mna * sb * csb +
        sa * sb * SketchMath.dotU8(ca, cb).toDouble
      val nsqA = mna * mna * d + 2.0 * mna * sa * csa + sa * sa * cda
      val nsqB = mnb * mnb * d + 2.0 * mnb * sb * csb + sb * sb * cdb
      val approxCos = approxDot / math.sqrt(nsqA * nsqB)
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val exactCos = dot / math.sqrt(
        a.map(x => x.toDouble * x.toDouble).sum * b.map(x => x.toDouble * x.toDouble).sum)
      assert(math.abs(approxCos - exactCos) < 0.05,
        s"approx=$approxCos exact=$exactCos")
    }
  }

  test("int8 quantization stays in [0,255] with min at 0 and max at 255 for any vector") {
    // pure-JVM reimplementation of the column algebra's contract, driven by
    // generated vectors (the Spark-side unit test pins exact values; this
    // pins range + endpoint properties across the input space)
    val vec = Gen.nonEmptyListOf(Gen.chooseNum(-1e4f, 1e4f))
    forAllSampled(vec) { xs =>
      val mn = xs.min.toDouble
      val mx = xs.max.toDouble
      val q = xs.map { x =>
        if (mx == mn) 0L
        else math.min(255L, math.floor((x - mn) * 255.0 / (mx - mn)).toLong)
      }
      assert(q.forall(v => v >= 0L && v <= 255L))
      if (mx != mn) {
        assert(q(xs.indexOf(xs.min)) == 0L)
        assert(q(xs.indexOf(xs.max)) == 255L)
      }
    }
  }

  test("TopKSumAgg equals the sum of the k largest under any reduce/merge split") {
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6)),
      Gen.chooseNum(1, 8), Gen.chooseNum(0, 100))
    forAllSampled(gen) { case (xs, k, splitSeed) =>
      val agg = new TopKSumAgg(k)
      // split the input at an arbitrary point and combine via merge — the
      // map-side/reduce-side path must agree with a straight fold
      val cut = splitSeed % (xs.size + 1)
      val (l, r) = xs.splitAt(cut)
      val merged = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
      val expected = xs.sorted.takeRight(k).sum
      assert(math.abs(merged - expected) <= math.abs(expected) * 1e-12 + 1e-9,
        s"k=$k xs=$xs got=$merged want=$expected")
    }
  }

  test("boundedLevenshtein equals the classic DP, bounded, over random strings") {
    import org.apache.spark.unsafe.types.UTF8String
    def dp(a: String, b: String): Int = {
      val (m, n) = (a.codePointCount(0, a.length), b.codePointCount(0, b.length))
      val ac = a.codePoints().toArray
      val bc = b.codePoints().toArray
      val d = Array.tabulate(m + 1, n + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to m; j <- 1 to n)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (ac(i - 1) == bc(j - 1)) 0 else 1))
      d(m)(n)
    }
    def bounded(a: String, b: String, k: Int): Long =
      SketchMath.boundedLevenshtein(
        UTF8String.fromString(a), UTF8String.fromString(b), k)
    // small alphabet → interesting distances; includes empty strings and
    // non-ASCII (2- and 3-byte UTF-8) so the code-point decode is exercised
    val ch: Gen[Char] = Gen.frequency(
      (8, Gen.oneOf('a', 'b', 'c')), (1, Gen.oneOf('é', '中', '|', ' ')))
    val str: Gen[String] = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, ch).map(_.mkString))
    forAllSampled(Gen.zip(str, str, Gen.chooseNum(0, 45)), n = 300) {
      case (a, b, k) =>
        val exact = dp(a, b)
        val expected = if (exact <= k) exact.toLong else -1L
        assert(bounded(a, b, k) === expected,
          s"a=$a b=$b k=$k exact=$exact")
    }
  }

  test("boundedLevenshtein crosses the 64-bit block boundary correctly") {
    import org.apache.spark.unsafe.types.UTF8String
    def bounded(a: String, b: String, k: Int): Long =
      SketchMath.boundedLevenshtein(
        UTF8String.fromString(a), UTF8String.fromString(b), k)
    // patterns of length 60..200 exercise 1, 2 and 4 blocks; mutate a base
    // string with known numbers of edits and check exact distances
    val base = ("abcdefghij" * 20).take(197) // length 197 → 4 blocks
    assert(bounded(base, base, 0) === 0L)
    assert(bounded(base, base.drop(3), 5) === 3L) // 3 deletions
    val sub = base.updated(70, 'x').updated(130, 'y').updated(196, 'z')
    assert(bounded(base, sub, 3) === 3L)
    assert(bounded(base, sub, 2) === -1L)
    val ins = base.substring(0, 65) + "qq" + base.substring(65)
    assert(bounded(base, ins, 4) === 2L)
    // length-difference prune: |n - m| > k
    assert(bounded(base, base.take(10), 50) === -1L)
    assert(bounded("", base.take(30), 29) === -1L)
    assert(bounded("", base.take(30), 30) === 30L)
  }

  test("boundedLevenshtein survives malformed UTF-8 (truncated multi-byte tail)") {
    import org.apache.spark.unsafe.types.UTF8String
    // a truncated 3-byte sequence at the end of the buffer — reachable via
    // binary→string cast, which Spark does not validate; must degrade
    // gracefully (like Spark's levenshtein), not read past the array
    val truncated = UTF8String.fromBytes(Array('a'.toByte, 'b'.toByte, 0xE4.toByte, 0xB8.toByte))
    val whole = UTF8String.fromString("ab中")
    assert(SketchMath.boundedLevenshtein(truncated, truncated, 5) === 0L)
    assert(SketchMath.boundedLevenshtein(truncated, whole, 5) >= 0L)
    val loneLead = UTF8String.fromBytes(Array('x'.toByte, 0xC3.toByte))
    assert(SketchMath.boundedLevenshtein(loneLead, UTF8String.fromString("x"), 5) === 1L)
  }

  test("boundedLevenshtein long-pattern fallback equals the Myers kernel's contract") {
    import org.apache.spark.unsafe.types.UTF8String
    def bounded(a: String, b: String, k: Int): Long =
      SketchMath.boundedLevenshtein(
        UTF8String.fromString(a), UTF8String.fromString(b), k)
    // patterns past MyersMaxPattern (4096) take the O(m)-memory banded DP
    // path; known-edit mutations must still give exact distances
    val base = ("abcdefghij" * 500).take(4500)
    assert(bounded(base, base, 0) === 0L)
    assert(bounded(base, base.drop(4), 6) === 4L)
    val sub = base.updated(100, 'x').updated(2500, 'y').updated(4400, 'z')
    assert(bounded(base, sub, 3) === 3L)
    assert(bounded(base, sub, 2) === -1L)
    // and one side short keeps the short side as the pattern (Myers path)
    assert(bounded(base.take(50), base.take(54), 10) === 4L)
  }

  test("bounded_levenshtein accepts any foldable int threshold, rejects negatives") {
    val spark = SparkSpec.session
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    val df = Seq(("kitten", "sitting")).toDF("a", "b")
    // CAST(...) and arithmetic are foldable-but-not-literal — Spark's own
    // 3-arg levenshtein accepts them, so must we
    assert(df.select(expr("bounded_levenshtein(a, b, CAST(55 AS INT))"))
      .collect().head.getLong(0) === 3L)
    assert(df.select(expr("bounded_levenshtein(a, b, 50 + 5)"))
      .collect().head.getLong(0) === 3L)
    assertThrows[Exception](
      df.select(expr("bounded_levenshtein(a, b, -1)")).collect())
  }

  test("bounded_levenshtein expression matches Spark's 3-arg levenshtein end-to-end") {
    val spark = SparkSpec.session
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions.{call_function, col, levenshtein, lit}
    val ch: Gen[Char] = Gen.frequency(
      (8, Gen.oneOf('a', 'b', 'c', 'd')), (1, Gen.oneOf('é', '中')))
    val strGen: Gen[String] = Gen.chooseNum(0, 120).flatMap(n =>
      Gen.listOfN(n, ch).map(_.mkString))
    val rows = Iterator.iterate(Seed(7L))(_.next).take(120)
      .map(s => Gen.zip(strGen, strGen).pureApply(Gen.Parameters.default, s))
      .toSeq
    val df = rows.toDF("a", "b")
    val got = df.select(
        levenshtein(col("a"), col("b"), 55).cast("long").as("spark_lev"),
        call_function("bounded_levenshtein", col("a"), col("b"), lit(55)).as("graft_lev"))
      .collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1), r.toString))
  }

  test("JaroWinkler matches the oracle engine's golden doubles bit-for-bit") {
    import graft.functions.JaroWinkler
    def jw(a: String, b: String): Double =
      JaroWinkler.sim(a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    // golden values read directly from the oracle engine (DuckDB
    // jaro_winkler_similarity) — bitwise equality is the contract that
    // lets er_jaro_winkler emit the raw double across the gate. The set
    // covers: standard textbook pairs, the 0.7 Winkler gate (bab/bb stays
    // at its unboosted Jaro), the equal-string short-circuit at length 1
    // (whose match window would otherwise be empty), and both empty-string
    // conventions.
    assert(jw("MARTHA", "MARHTA") === 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") === 0.8133333333333332)
    assert(jw("DWAYNE", "DUANE") === 0.8400000000000001)
    assert(jw("bab", "bb") === 0.611111111111111)
    assert(jw("e", "e") === 1.0)
    assert(jw("", "x") === 0.0)
    assert(jw("", "") === 0.0)
  }

  test("JaroWinkler is symmetric, in [0,1], and 1 iff equal (random strings)") {
    import graft.functions.JaroWinkler
    def jw(a: String, b: String): Double =
      JaroWinkler.sim(a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    val ch: Gen[Char] = Gen.oneOf('a', 'b', 'c', 'd', 'e')
    val strGen: Gen[String] = Gen.chooseNum(0, 16).flatMap(n =>
      Gen.listOfN(n, ch).map(_.mkString))
    forAllSampled(Gen.zip(strGen, strGen), n = 300) { case (a, b) =>
      val s = jw(a, b)
      assert(s === jw(b, a), s"asymmetric on $a/$b")
      assert(s >= 0.0 && s <= 1.0, s"out of range on $a/$b: $s")
      if (a == b && a.nonEmpty) assert(s === 1.0)
      if (s == 1.0) assert(a == b, s"1.0 on unequal $a/$b")
    }
  }
}
