package graft.operators

import java.io.ByteArrayInputStream
import javax.sound.sampled.AudioSystem

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Real audio-content operators — the audio half of the multimodal pillar,
  * built the same way as [[Imaging]]: the test corpus has no audio files,
  * so each document gets a deterministic PCM16 waveform from a closed-form
  * integer formula, serialized as a real RIFF/WAV container **by a
  * hand-written writer** and decoded back through the JDK's real audio
  * codec (`javax.sound.sampled.AudioSystem` — in the JDK, no external
  * deps). The DuckDB oracles recompute every output from the sample
  * formula alone, never seeing the bytes, so a container-layout or
  * decode-path bug is an oracle mismatch.
  *
  * Sample contract (all integer, exact in both engines):
  * {{{
  *   s           = doc_id % 256
  *   n_samples   = 400 + (doc_id % 100) * 8
  *   sample_rate = 8000 + (doc_id % 2) * 8000
  *   amp(i)      = ((s + 1) * ((i*i) % 97) + 13*i) % 4001 - 2000 + bump
  *   bump        = 1500 when doc_id % 5 == 0 && i < 24, else 0
  * }}}
  * `(i*i) % 97` makes the wave noisy enough to have sign changes (zero
  * crossings) while staying exactly replayable; amplitudes sit in
  * [-2000, 3500], well inside PCM16. The first 256 samples depend only on
  * `s` (and the bump), so docs sharing `doc_id % 256` are planted
  * fingerprint-duplicate classes — and the bump perturbs one in five
  * docs' first frame, planting small-hamming NEAR-dups, exactly like the
  * diagonal bump in [[Imaging]].
  *
  * At 100 TB the shape is identical to image decode: embarrassingly
  * parallel mapPartitions, codec state per task, no shuffle; only the
  * per-doc integer stats leave the task.
  */
object Audio {

  final case class WavMeta(doc_id: Long, sample_rate: Long, channels: Long,
                           bits: Long, n_frames: Long)
  final case class PcmStats(doc_id: Long, n_samples: Long, sum_amp: Long,
                            max_abs: Long, zero_cross: Long)

  /** The sample formula — the single source of truth the DuckDB oracle
    * mirrors in SQL. Keep in lockstep with the query SQL in LlmQueries.
    */
  def sample(docId: Long, i: Int): Int = {
    val s = (docId % 256).toInt
    val bump = if (docId % 5 == 0 && i < 24) 1500 else 0
    (((s + 1) * ((i.toLong * i % 97).toInt) + 13 * i) % 4001) - 2000 + bump
  }

  def nSamples(docId: Long): Int = 400 + (docId % 100).toInt * 8
  def sampleRate(docId: Long): Int = 8000 + (docId % 2).toInt * 8000

  /** Hand-written RIFF/WAV container (PCM_SIGNED, mono, 16-bit,
    * little-endian) — independent of Java's writer, so the `AudioSystem`
    * *decode* below is tested against a foreign writer, exactly like the
    * BMP/ImageIO pair in [[Imaging]].
    */
  def encodeWav(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    def putAscii(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(out, off)
    def put16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    def put32(off: Int, v: Int): Unit = {
      put16(off, v & 0xFFFF); put16(off + 2, (v >>> 16) & 0xFFFF)
    }
    putAscii(0, "RIFF"); put32(4, 36 + dataSize); putAscii(8, "WAVE")
    putAscii(12, "fmt "); put32(16, 16)
    put16(20, 1) // PCM
    put16(22, 1) // mono
    put32(24, sampleRate)
    put32(28, sampleRate * 2) // byte rate = rate * channels * bits/8
    put16(32, 2) // block align
    put16(34, 16) // bits
    putAscii(36, "data"); put32(40, dataSize)
    var i = 0
    while (i < samples.length) {
      put16(44 + i * 2, samples(i) & 0xFFFF)
      i += 1
    }
    out
  }

  /** Real codec decode: format fields come from `AudioSystem`'s parsed
    * header, samples from the decoded stream (PCM16LE frames).
    */
  def decodeWav(bytes: Array[Byte]): (WavFormat, Array[Int]) = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val f = in.getFormat
      val fmt = WavFormat(f.getSampleRate.toLong, f.getChannels.toLong,
        f.getSampleSizeInBits.toLong, in.getFrameLength)
      val data = in.readAllBytes()
      val samples = new Array[Int](data.length / 2)
      var i = 0
      while (i < samples.length) {
        samples(i) = ((data(2 * i) & 0xFF) | (data(2 * i + 1) << 8)).toShort.toInt
        i += 1
      }
      (fmt, samples)
    } finally in.close()
  }

  final case class WavFormat(sampleRate: Long, channels: Long, bits: Long,
                             frames: Long)

  private def synth(docId: Long): Array[Byte] = {
    val n = nSamples(docId)
    val samples = Array.tabulate(n)(i => sample(docId, i))
    encodeWav(sampleRate(docId), samples)
  }

  /** Per-doc WAV → real `AudioSystem` decode → the format fields the
    * DECODER parsed out of the container (not the values we encoded).
    */
  def wavMeta(docIds: Dataset[Long]): Dataset[WavMeta] = {
    import docIds.sparkSession.implicits._
    Imaging.spread(docIds).mapPartitions { ids =>
      ids.map { id =>
        val (fmt, _) = decodeWav(synth(id))
        WavMeta(id, fmt.sampleRate, fmt.channels, fmt.bits, fmt.frames)
      }
    }
  }

  /** Spectral sign fingerprint — the audio analog of [[Imaging.dHash64]],
    * and the shape of Philips-style robust audio hashing: an 8×8
    * time-frequency grid over the first [[FpSamples]] DECODED samples
    * (8 frames × 32 samples; per frame, 8 block sums of 4 samples pushed
    * through the 8-point integer DCT basis shared with [[Imaging.DctBasis]]),
    * bit (t·8+u) set iff coefficient (t,u) > 0. All integer, so the
    * DuckDB oracle replays the exact bits from the waveform formula.
    * Frame 0 covers the bump window (samples 0-23): bumped docs flip a
    * few frame-0 signs and land at small hamming from their class base.
    */
  val FpSamples = 256
  val FpFrames = 8
  val FpFrameLen = 32

  /** The 8 integer DCT coefficients of frame `t` (8 block sums of 4
    * samples against the shared [[Imaging.DctBasis]]) — the one per-frame
    * kernel behind BOTH the sign fingerprint and the windowed alignment
    * signatures, so the framing/basis math cannot diverge between them.
    */
  private def frameCoeffs(samples: Array[Int], t: Int): Array[Long] = {
    val bs = new Array[Long](8)
    var x = 0
    while (x < 8) {
      var acc = 0L
      var j = 0
      while (j < 4) { acc += samples(FpFrameLen * t + 4 * x + j); j += 1 }
      bs(x) = acc
      x += 1
    }
    val out = new Array[Long](8)
    var u = 0
    while (u < 8) {
      var acc = 0L
      var x2 = 0
      while (x2 < 8) { acc += bs(x2) * Imaging.DctBasis(u)(x2); x2 += 1 }
      out(u) = acc
      u += 1
    }
    out
  }

  def spectralFp(samples: Array[Int]): Long = {
    require(samples.length >= FpSamples,
      s"fingerprint needs $FpSamples samples, got ${samples.length}")
    var fp = 0L
    var t = 0
    while (t < FpFrames) {
      val coefs = frameCoeffs(samples, t)
      var u = 0
      while (u < 8) {
        if (coefs(u) > 0) fp |= (1L << (t * 8 + u))
        u += 1
      }
      t += 1
    }
    fp
  }

  final case class AudioFp(doc_id: Long, afp: Long)

  /** Per-doc WAV → real decode → spectral sign fingerprint over the first
    * 256 samples (every doc has ≥400). Embarrassingly parallel; only the
    * 8-byte fingerprint leaves the task.
    */
  def spectralFingerprints(docIds: Dataset[Long]): Dataset[AudioFp] = {
    import docIds.sparkSession.implicits._
    Imaging.spread(docIds).mapPartitions { ids =>
      ids.map { id =>
        val (_, samples) = decodeWav(synth(id))
        AudioFp(id, spectralFp(samples))
      }
    }
  }

  final case class AudioWin(doc_id: Long, t: Long, sig: Array[Long])

  /** Windowed spectral signatures over the FULL decoded track (not just
    * the fingerprint prefix): per 32-sample window, 8 block sums pushed
    * through the shared integer DCT basis — the signature is the exact
    * 8-coefficient tuple, not its sign bits, so distinct audio content
    * essentially never collides while identical content matches exactly.
    * Trailing samples short of a full window are dropped (n/32 windows).
    */
  def windowSignatures(docIds: Dataset[Long]): Dataset[AudioWin] = {
    import docIds.sparkSession.implicits._
    Imaging.spread(docIds).mapPartitions { ids =>
      ids.flatMap { id =>
        val (_, samples) = decodeWav(synth(id))
        val nW = samples.length / FpFrameLen
        (0 until nW).map(t => AudioWin(id, t.toLong, frameCoeffs(samples, t)))
      }
    }
  }

  /** Audio clip alignment — the Shazam-shaped sync detector, and the
    * audio twin of `Video.clipAlignments`: for each pair of tracks, the
    * longest run of consecutive windows whose spectral signatures match
    * at a constant offset (gaps-and-islands on the diag = a_t − b_t
    * match diagonal). Emits the best alignment per pair (longest, then
    * lowest diag/start) for runs ≥ `minLen` windows. The signature tuple
    * is the join bucket; the shuffle carries ids, window indices and the
    * 64-byte signature — never samples.
    */
  def audioAlignments(docIds: Dataset[Long], minLen: Int = 2): DataFrame = {
    // both sides of the self-join read this — persist or decode twice
    // (caller-must-clear-cache: released when the session cache clears)
    val wins = windowSignatures(docIds).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = wins.as("a")
      .join(wins.as("b"),
        col("a.sig") === col("b.sig") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.t").as("ai"), (col("a.t") - col("b.t")).as("diag"))
      .distinct()
    // island/tie-break tail shared with the video aligner — one place to
    // fix run semantics for both modalities
    Video.bestAlignments(m, minLen)
  }

  /** PCM stats over DECODED samples: count, amplitude sum, peak |amp|,
    * and zero crossings (sign flips, zero counted as non-negative) — the
    * silence/clipping/energy screens an audio curation pipeline runs.
    */
  def pcmStats(docIds: Dataset[Long]): Dataset[PcmStats] = {
    import docIds.sparkSession.implicits._
    Imaging.spread(docIds).mapPartitions { ids =>
      ids.map { id =>
        val (_, samples) = decodeWav(synth(id))
        var sum = 0L
        var maxAbs = 0L
        var zc = 0L
        var i = 0
        while (i < samples.length) {
          val v = samples(i)
          sum += v
          if (math.abs(v) > maxAbs) maxAbs = math.abs(v)
          if (i > 0 && ((v >= 0) != (samples(i - 1) >= 0))) zc += 1
          i += 1
        }
        PcmStats(id, samples.length.toLong, sum, maxAbs, zc)
      }
    }
  }

  final case class VadStats(doc_id: Long, n_windows: Long, n_active: Long,
                            n_segments: Long, longest_run: Long)

  /** Energy-gated activity screen over DECODED samples — the decision
    * layer of silence trimming / speech-segment extraction: full
    * 64-sample windows, a window is ACTIVE when Σ|amp| clears the
    * threshold, segments are maximal runs of active windows
    * (gaps-and-islands over the window sequence). Same decode shape as
    * [[pcmStats]] (mapPartitions, codec per task, integers out); the
    * oracle replays window energies from the waveform formula.
    */
  def vadStats(docIds: Dataset[Long], window: Int = 64,
               threshold: Long = 66000L): Dataset[VadStats] = {
    import docIds.sparkSession.implicits._
    Imaging.spread(docIds).mapPartitions { ids =>
      ids.map { id =>
        val (_, samples) = decodeWav(synth(id))
        val nWin = samples.length / window
        var active = 0L
        var segs = 0L
        var run = 0L
        var longest = 0L
        var w = 0
        while (w < nWin) {
          var en = 0L
          var i = w * window
          val end = i + window
          while (i < end) { en += math.abs(samples(i)); i += 1 }
          if (en > threshold) {
            active += 1
            if (run == 0) segs += 1
            run += 1
            if (run > longest) longest = run
          } else run = 0
          w += 1
        }
        VadStats(id, nWin.toLong, active, segs, longest)
      }
    }
  }
}
