package graft

import org.apache.spark.sql.functions._

import graft.operators.Audio

/** Real-codec audio operators: hand-written RIFF/WAV container →
  * javax.sound decode → format fields + PCM sample stats.
  */
class AudioSpec extends SparkSpec {
  import spark.implicits._

  test("WAV round-trip: AudioSystem decode returns exactly the encoded samples") {
    for (id <- Seq(0L, 1L, 99L, 256L, 499L)) {
      val n = Audio.nSamples(id)
      val samples = Array.tabulate(n)(i => Audio.sample(id, i))
      val (fmt, decoded) = Audio.decodeWav(Audio.encodeWav(Audio.sampleRate(id), samples))
      assert(fmt.sampleRate == Audio.sampleRate(id))
      assert(fmt.channels == 1 && fmt.bits == 16 && fmt.frames == n)
      assert(decoded.sameElements(samples), s"sample mismatch doc=$id")
    }
  }

  test("negative amplitudes survive the PCM16LE encode/decode (sign extension)") {
    val samples = Array(-2000, -1, 0, 1, 2000, -32768, 32767)
    val (_, decoded) = Audio.decodeWav(Audio.encodeWav(8000, samples))
    assert(decoded.sameElements(samples))
  }

  test("pcmStats matches a direct formula computation") {
    val ids = spark.range(0, 50).select(col("id").as("doc_id")).as[Long]
    val stats = Audio.pcmStats(ids).collect().map(s => s.doc_id -> s).toMap
    for (id <- Seq(0L, 7L, 49L)) {
      val n = Audio.nSamples(id)
      val a = Array.tabulate(n)(i => Audio.sample(id, i))
      assert(stats(id).n_samples == n)
      assert(stats(id).sum_amp == a.map(_.toLong).sum)
      assert(stats(id).max_abs == a.map(v => math.abs(v).toLong).max)
      val zc = (1 until n).count(i => (a(i) >= 0) != (a(i - 1) >= 0))
      assert(stats(id).zero_cross == zc)
    }
    // the formula must actually produce sign changes for the screen to screen
    assert(stats.values.forall(_.zero_cross > 0))
  }

  test("spectral fingerprint: class dups collide, bump plants small-hamming near-dups") {
    val ids = spark.range(0, 500).select(col("id").as("doc_id")).as[Long]
    val fps = Audio.spectralFingerprints(ids).collect().map(f => f.doc_id -> f.afp).toMap
    // same doc_id % 256 AND same bump status → first 256 samples identical
    // → identical fingerprint (ids 7 and 263: neither is % 5 == 0)
    assert(fps(7L) == fps(263L))
    // bumped vs unbumped members of one class differ in frame 0 only:
    // hamming >= 1 and <= 8 (the bump window is inside frame 0's 8 bits)
    val base = fps(90L) // 90 % 5 == 0 (bumped); 346 = 90 + 256, not bumped
    val ham = java.lang.Long.bitCount(base ^ fps(346L))
    assert(ham >= 1 && ham <= 8, s"bump hamming $ham outside (0, 8]")
    // and the fingerprint matches a direct formula computation (no codec
    // dependence in the planted bits)
    val direct = Audio.spectralFp(Array.tabulate(Audio.FpSamples)(i => Audio.sample(90L, i)))
    assert(direct == base)
  }

  test("spectral fingerprint is volume-invariant (DCT linearity preserves signs)") {
    // the property a robust audio hash exists for: re-mastering at a
    // different gain must not change the fingerprint. Positive scaling is
    // linear through block sums and the DCT, so every coefficient scales
    // by the same positive factor and no sign flips — exact, not banded.
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      val samples = Array.fill(Audio.FpSamples)(rnd.nextInt(4001) - 2000)
      val fp = Audio.spectralFp(samples)
      assert(Audio.spectralFp(samples.map(_ * 2)) == fp)
      assert(Audio.spectralFp(samples.map(_ * 7)) == fp)
    }
  }

  test("wavMeta reports what the decoder parsed, per doc") {
    val ids = spark.range(0, 20).select(col("id").as("doc_id")).as[Long]
    Audio.wavMeta(ids).collect().foreach { m =>
      assert(m.sample_rate == Audio.sampleRate(m.doc_id))
      assert(m.n_frames == Audio.nSamples(m.doc_id))
      assert(m.channels == 1 && m.bits == 16)
    }
  }
}
