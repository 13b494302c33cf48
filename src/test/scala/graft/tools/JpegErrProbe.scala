package graft.tools

import graft.operators.Imaging

/** Throwaway probe: max/mean pixel error of the ImageIO JPEG roundtrip
  * over the first 500 doc ids — used to size the tolerance bands in
  * `media_jpeg_meta` with real margin, not guesses.
  */
object JpegErrProbe {
  def main(args: Array[String]): Unit = {
    var worstMax = 0L
    var worstMeanX1000 = 0L
    for (id <- 0L until 500L) {
      val (w, h) = Imaging.dims(id)
      val img = Imaging.decode(Imaging.encodeJpeg(w, h, (x, y) => Imaging.pixel(id, x, y)))
      val raster = img.getRaster
      var sumErr = 0L; var maxErr = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val err = math.abs(raster.getSample(x, y, 0) - Imaging.pixel(id, x, y)).toLong
        sumErr += err; if (err > maxErr) maxErr = err
      }
      val meanX1000 = sumErr * 1000L / (w * h)
      if (maxErr > worstMax) worstMax = maxErr
      if (meanX1000 > worstMeanX1000) worstMeanX1000 = meanX1000
      assert(img.getWidth == w && img.getHeight == h && raster.getNumBands == 1,
        s"geometry mismatch for doc $id")
    }
    println(s"worst max err = $worstMax, worst mean err x1000 = $worstMeanX1000")
  }
}
