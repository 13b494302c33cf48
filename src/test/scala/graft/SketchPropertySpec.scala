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
}
