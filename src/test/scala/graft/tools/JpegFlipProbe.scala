package graft.tools

import graft.operators.Imaging

/** Throwaway probe: how many dHash/pHash bits flip when the hash canvas
  * goes through a JPEG roundtrip instead of lossless BMP — sizes the
  * tolerance bands of the hash-robustness catalog entry.
  */
object JpegFlipProbe {
  def main(args: Array[String]): Unit = {
    var worstD = 0; var sumD = 0L
    var worstP = 0; var sumP = 0L
    for (id <- 0L until 500L) {
      val bmp = Imaging.decode(Imaging.encodeBmp(
        Imaging.HashW, Imaging.HashH, (x, y) => Imaging.pixel(id, x, y)))
      val jpg = Imaging.decode(Imaging.encodeJpeg(
        Imaging.HashW, Imaging.HashH, (x, y) => Imaging.pixel(id, x, y)))
      val dFlips = java.lang.Long.bitCount(Imaging.dHash64(bmp) ^ Imaging.dHash64(jpg))
      val pFlips = java.lang.Long.bitCount(Imaging.pHash64(bmp) ^ Imaging.pHash64(jpg))
      worstD = math.max(worstD, dFlips); sumD += dFlips
      worstP = math.max(worstP, pFlips); sumP += pFlips
    }
    println(s"dHash: worst=$worstD mean=${sumD / 500.0}; pHash: worst=$worstP mean=${sumP / 500.0}")
  }
}
