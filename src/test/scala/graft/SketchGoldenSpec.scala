package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SketchMath

/** Golden values for the sketch math. These pin the exact bit patterns the
  * LSH family (MinHash banding, SimHash chunking, hyperplane signatures)
  * derives from — any change to the mixing constants, fold order, or plane
  * stream silently re-shuffles every bucket, which the distribution-level
  * specs (recall/overlap) might not catch. Values were computed from this
  * implementation once and must never change across rounds.
  */
class SketchGoldenSpec extends AnyFunSuite {

  private val hs = new GenericArrayData(Array(10L, 20L, 30L))

  test("splitmix64 mix golden") {
    assert(SketchMath.mix(0L, 0) != SketchMath.mix(0L, 1))
    assert(SketchMath.mix(42L, 0) == -4767286540954276203L)
  }

  test("minhash signature golden") {
    val sig = SketchMath.minhash(hs, 4)
    assert((0 until 4).map(sig.getLong) == Seq(-6273981045315334706L,
      -5159015240786553508L, -5214957219362666120L, -2918735382278597880L))
  }

  test("simhash64 golden") {
    assert(SketchMath.simhash64(hs) == 30L)
  }

  test("hyperplane stream and signature golden") {
    val planes = SketchMath.hyperplanes(2, 2, 42L)
    assert(planes.length == 4)
    assert(math.abs(planes(0) - 1.0583271662238987e-8) < 1e-22)
    assert(math.abs(planes(1) - -1.6099136020312192) < 1e-15)
    assert(math.abs(planes(2) - -1.9616743391804006) < 1e-15)
    assert(math.abs(planes(3) - 0.6749903343745112) < 1e-15)
    val emb = new GenericArrayData(Array(1.0f, -2.0f, 3.0f, 0.5f))
    val sig = SketchMath.hyperplaneSig(emb, SketchMath.hyperplanes(4, 16, 42L), 4, 16)
    assert(sig == 15856L)
  }
}
