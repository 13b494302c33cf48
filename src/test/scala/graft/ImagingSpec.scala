package graft

import org.apache.spark.sql.functions._

import graft.operators.Imaging

/** Real-codec imaging operators: hand-written BMP container → javax.imageio
  * decode → perceptual hashes, PNG encode → binary header parse, and the
  * dHash band-LSH near-dup join.
  */
class ImagingSpec extends SparkSpec {
  import spark.implicits._

  test("BMP round-trip: ImageIO decode returns exactly the encoded pixels") {
    for (id <- Seq(0L, 5L, 17L, 255L, 256L, 499L)) {
      val (w, h) = Imaging.dims(id)
      val img = Imaging.decode(Imaging.encodeBmp(w, h, (x, y) => Imaging.pixel(id, x, y)))
      assert(img.getWidth == w && img.getHeight == h)
      for (x <- 0 until w; y <- 0 until h)
        assert((img.getRGB(x, y) & 0xFF) == Imaging.pixel(id, x, y),
          s"pixel mismatch doc=$id ($x,$y)")
    }
  }

  test("BMP rows are bottom-up with 4-byte padding (odd widths decode right)") {
    // w=17 → rowBytes 51 → pad 1; a decoder ignoring padding would shear rows
    val img = Imaging.decode(Imaging.encodeBmp(17, 3, (x, y) => (x * 10 + y) % 256))
    for (x <- 0 until 17; y <- 0 until 3)
      assert((img.getRGB(x, y) & 0xFF) == (x * 10 + y) % 256)
  }

  test("dHash/aHash from decoded pixels match direct block-sum computation") {
    for (id <- Seq(1L, 60L, 255L, 320L)) {
      val img = Imaging.decode(
        Imaging.encodeBmp(Imaging.HashW, Imaging.HashH, (x, y) => Imaging.pixel(id, x, y)))
      // independent recomputation straight from the formula, no codec
      val bs = Array.ofDim[Long](8, 9)
      for (x <- 0 until Imaging.HashW; y <- 0 until Imaging.HashH)
        bs(y / 2)(x / 2) += Imaging.pixel(id, x, y)
      var dh = 0L
      for (by <- 0 until 8; bx <- 0 until 8)
        if (bs(by)(bx) > bs(by)(bx + 1)) dh |= 1L << (by * 8 + bx)
      val total = (for (by <- 0 until 8; bx <- 0 until 8) yield bs(by)(bx)).sum
      var ah = 0L
      for (by <- 0 until 8; bx <- 0 until 8)
        if (64L * bs(by)(bx) > total) ah |= 1L << (by * 8 + bx)
      assert(Imaging.dHash64(img) == dh, s"dhash doc=$id")
      assert(Imaging.aHash64(img) == ah, s"ahash doc=$id")
    }
  }

  test("same doc_id % 256 class yields identical images; bump plants near-dups") {
    val ids = spark.range(0, 500).select(col("id").as("doc_id")).as[Long]
    val hashes = Imaging.imageHashes(ids).collect().map(h => h.doc_id -> h.dhash).toMap
    // docs 7 and 263 share seed 7, neither is %5==0 → exact dup
    assert(hashes(7L) == hashes(263L))
    // doc 260 (%5==0, bumped) vs 4 (seed 4, unbumped): small nonzero hamming
    val d = java.lang.Long.bitCount(hashes(260L) ^ hashes(4L))
    assert(d > 0 && d <= 8, s"bump should plant a small-hamming near-dup, got $d")
  }

  test("pHash: DCT median split sets ~half the AC bits; planted dups collide") {
    val ids = spark.range(0, 500).select(col("id").as("doc_id")).as[Long]
    val ph = Imaging.imagePHashes(ids).collect().map(p => p.doc_id -> p.phash).toMap
    // strict > against the 32nd-smallest of 63: between 0 and 31 bits set
    ph.values.foreach { h =>
      val bits = java.lang.Long.bitCount(h)
      assert(bits >= 8 && bits <= 31, s"median split out of range: $bits bits")
      assert((h & 1L) == 0L, "DC bit (0,0) must stay 0")
    }
    // same seed class, neither bumped → identical frequency structure
    assert(ph(7L) == ph(263L))
    // different seeds → hashes differ for at least most pairs probed
    val distinct = Seq(1L, 2L, 3L, 4L, 6L, 8L, 9L, 11L).map(ph).distinct
    assert(distinct.size >= 7)
  }

  test("PNG header parse recovers ImageIO-encoded dimensions from raw bytes") {
    val ids = spark.range(0, 40).select(col("id").as("doc_id")).as[Long]
    val parsed = Imaging.pngColumn(ids).toDF()
      .select(col("doc_id"),
        expr("CAST(conv(hex(substring(png, 17, 4)), 16, 10) AS BIGINT)").as("w"),
        expr("CAST(conv(hex(substring(png, 21, 4)), 16, 10) AS BIGINT)").as("h"),
        (expr("hex(substring(png, 1, 8))") === lit("89504E470D0A1A0A")).as("sig"))
      .collect()
    assert(parsed.length == 40)
    parsed.foreach { r =>
      val (w, h) = Imaging.dims(r.getLong(0))
      assert(r.getLong(1) == w && r.getLong(2) == h && r.getBoolean(3))
    }
  }

  test("JPEG roundtrip: geometry exact, pixel error inside the tolerance band") {
    for (id <- Seq(0L, 5L, 17L, 255L, 256L, 499L)) {
      val (w, h) = Imaging.dims(id)
      val img = Imaging.decode(Imaging.encodeJpeg(w, h, (x, y) => Imaging.pixel(id, x, y)))
      // lossy codec, exact geometry: the decoder must report the encoded
      // dims and a single gray band
      assert(img.getWidth == w && img.getHeight == h)
      assert(img.getRaster.getNumBands == 1)
      var sumErr = 0L; var maxErr = 0L
      for (x <- 0 until w; y <- 0 until h) {
        val err = math.abs(img.getRaster.getSample(x, y, 0) - Imaging.pixel(id, x, y)).toLong
        sumErr += err; maxErr = math.max(maxErr, err)
      }
      // bands from the catalog entry, which carry >=1.7x margin over the
      // measured corpus worst case (mean x1000 = 1703, max = 9)
      assert(sumErr * 1000L <= 3000L * w * h, s"doc $id mean err out of band: $sumErr/${w * h}")
      assert(maxErr <= 24L, s"doc $id max err out of band: $maxErr")
    }
  }

  test("dHash is brightness-shift invariant (gradient direction, not level)") {
    // the property dHash exists for: a global exposure change must not
    // move the hash. Adding a constant to every pixel preserves every
    // block-sum comparison — exact, not banded (until values clip).
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 20) {
      val base = Array.fill(Imaging.HashH, Imaging.HashW)(rnd.nextInt(200))
      def img(shift: Int) = Imaging.decode(Imaging.encodeBmp(
        Imaging.HashW, Imaging.HashH, (x, y) => base(y)(x) + shift))
      val h0 = Imaging.dHash64(img(0))
      assert(Imaging.dHash64(img(20)) == h0)
      assert(Imaging.dHash64(img(55)) == h0)
    }
  }

  test("perceptual hashes survive the JPEG roundtrip inside the measured bands") {
    val ids = spark.range(0, 100).select(col("id").as("doc_id")).as[Long]
    val rows = graft.operators.Imaging.jpegHashRobustness(ids).collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      // lossless-path dHash must equal the direct formula hash
      val img = Imaging.decode(Imaging.encodeBmp(Imaging.HashW, Imaging.HashH,
        (x, y) => Imaging.pixel(r.doc_id, x, y)))
      assert(r.dhash == Imaging.dHash64(img))
      assert(r.dflips_le_24 && r.pflips_le_20,
        s"doc ${r.doc_id} flips out of band")
    }
  }

  test("mirror dHash equals the dHash of the actually mirrored image") {
    for (id <- Seq(3L, 10L, 77L, 200L)) {
      val orig = Imaging.decode(Imaging.encodeBmp(
        Imaging.HashW, Imaging.HashH, (x, y) => Imaging.pixel(id, x, y)))
      // encode the truly mirrored canvas (x → 17−x) and hash it plainly
      val mirrored = Imaging.decode(Imaging.encodeBmp(
        Imaging.HashW, Imaging.HashH,
        (x, y) => Imaging.pixel(id, Imaging.HashW - 1 - x, y)))
      assert(Imaging.dHashMirror64(orig) == Imaging.dHash64(mirrored), s"doc=$id")
      // involution: the mirror of the mirror is the original hash
      assert(Imaging.dHashMirror64(mirrored) == Imaging.dHash64(orig), s"doc=$id")
      // vertical flip is a pure row permutation of the hash: flipping the
      // canvas (y → 15−y) must equal reverseBytes of the plain hash
      val flipped = Imaging.decode(Imaging.encodeBmp(
        Imaging.HashW, Imaging.HashH,
        (x, y) => Imaging.pixel(id, x, Imaging.HashH - 1 - y)))
      assert(Imaging.dHashFlipV64(Imaging.dHash64(orig)) == Imaging.dHash64(flipped),
        s"doc=$id")
      // 180° = mirror ∘ flip
      val rotated = Imaging.decode(Imaging.encodeBmp(
        Imaging.HashW, Imaging.HashH,
        (x, y) => Imaging.pixel(id, Imaging.HashW - 1 - x, Imaging.HashH - 1 - y)))
      assert(Imaging.dHashFlipV64(Imaging.dHashMirror64(orig)) == Imaging.dHash64(rotated),
        s"doc=$id")
      // the canonical form is identical across all four orientations —
      // the property that makes it the dedup index key
      def canon(img: java.awt.image.BufferedImage): Long = {
        val d = Imaging.dHash64(img); val m = Imaging.dHashMirror64(img)
        math.min(math.min(d, m),
          math.min(Imaging.dHashFlipV64(d), Imaging.dHashFlipV64(m)))
      }
      assert(Seq(mirrored, flipped, rotated).forall(canon(_) == canon(orig)), s"doc=$id")
    }
  }

  test("EXIF APP1 splice parses back at fixed offsets and still decodes") {
    val ids = spark.range(0, 40).select(col("id").as("doc_id")).as[Long]
    val parsed = graft.SparkEntry.queries("media_exif_triage")(spark, sf0001)
    // catalog entry runs over the documents table; spot-check shape here
    // with a direct pass over a small id range
    val rows = Imaging.jpegExifColumn(ids).collect()
    rows.foreach { r =>
      val (w, _) = Imaging.dims(r.doc_id)
      // the spliced stream must still be a decodable JPEG: decoders skip
      // unknown APP segments
      val img = Imaging.decode(r.jpeg)
      assert(img.getWidth == w)
      // APP1 at fixed offsets: marker, Exif id, TIFF LE header
      assert((r.jpeg(2) & 0xFF) == 0xFF && (r.jpeg(3) & 0xFF) == 0xE1)
      assert(new String(r.jpeg.slice(6, 10), "US-ASCII") == "Exif")
      assert(r.jpeg(12) == 'I'.toByte && r.jpeg(13) == 'I'.toByte)
      // little-endian values: orientation short at 1-based 43 (0-based 42)
      val orient = (r.jpeg(42) & 0xFF) | ((r.jpeg(43) & 0xFF) << 8)
      assert(orient == 1 + (r.doc_id % 8), s"doc ${r.doc_id}: orientation $orient")
    }
    assert(parsed.columns.toSeq == Seq("doc_id", "app1_ok", "exif_ok",
      "tiff_le_ok", "ifd_entries", "exif_width", "orientation"))
  }

  test("near-dup histogram finds planted classes and carries no pixels through the shuffle") {
    val ids = spark.range(0, 500).select(col("id").as("doc_id")).as[Long]
    val hist = Imaging.dhashNearDupHistogram(Imaging.imageHashes(ids).toDF())
    val rows = hist.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 244 seed classes of 2 docs → pairs at hamming 0 (both or neither bumped)
    assert(rows.getOrElse(0L, 0L) > 100, s"expected many exact-dup pairs, got $rows")
    assert(rows.keys.exists(h => h > 0 && h <= 8), s"expected bump near-dups, got $rows")
    // the join must shuffle (band, doc_id, hash) only — never the media column
    val plan = hist.queryExecution.optimizedPlan.toString
    assert(!plan.contains("media"), "near-dup join must not carry media bytes")
  }
}
