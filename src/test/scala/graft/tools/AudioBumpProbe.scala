package graft.tools

import graft.operators.Audio

/** Throwaway probe: hamming distance between bumped and unbumped members
  * of each planted audio class, for a range of candidate bump magnitudes —
  * used to size the waveform bump so near-dup classes actually land at
  * hamming 1..8 instead of 0.
  */
object AudioBumpProbe {
  def fpWithBump(docId: Long, bump: Int, bumped: Boolean): Long = {
    val samples = Array.tabulate(Audio.FpSamples) { i =>
      val s = (docId % 256).toInt
      val base = (((s + 1) * ((i.toLong * i % 97).toInt) + 13 * i) % 4001) - 2000
      base + (if (bumped && i < 24) bump else 0)
    }
    Audio.spectralFp(samples)
  }

  def main(args: Array[String]): Unit = {
    for (bump <- Seq(300, 800, 1500, 2500)) {
      val hams = (0L until 256L).map { id =>
        java.lang.Long.bitCount(fpWithBump(id, bump, bumped = true) ^
          fpWithBump(id, bump, bumped = false))
      }
      val dist = hams.groupBy(identity).view.mapValues(_.size).toMap.toSeq.sorted
      println(s"bump=$bump zero=${hams.count(_ == 0)}/256 dist=$dist")
    }
  }
}
