package graft

import org.apache.spark.sql.functions._

import graft.operators.{Imaging, Video}

/** Real-codec video operators: animated GIF container → javax.imageio
  * multi-frame decode → per-frame dHash → scene-cut detection.
  */
class VideoSpec extends SparkSpec {
  import spark.implicits._

  test("animated GIF round-trip: every frame decodes to the exact formula pixels") {
    for (id <- Seq(0L, 1L, 5L, 17L, 255L, 256L, 499L)) {
      val frames = Video.decodeFrames(Video.encodeGif(id))
      assert(frames.size == Video.nFrames(id), s"frame count doc=$id")
      frames.zipWithIndex.foreach { case (img, f) =>
        assert(img.getWidth == Video.W && img.getHeight == Video.H)
        for (x <- 0 until Video.W; y <- 0 until Video.H)
          assert((img.getRGB(x, y) & 0xFF) == Video.framePixel(id, f, x, y),
            s"pixel mismatch doc=$id frame=$f ($x,$y)")
      }
    }
  }

  test("within-scene steps stay under the cut threshold; scene changes clear it") {
    // empirical separation over a doc sample: jitter transitions (same
    // scene) flip few dHash bits, scene boundaries flip many
    for (id <- 0L until 60L) {
      val hashes = Video.decodeFrames(Video.encodeGif(id)).map(Imaging.dHash64)
      hashes.sliding(2).zipWithIndex.foreach { case (Seq(a, b), i) =>
        val step = java.lang.Long.bitCount(a ^ b)
        val sameScene = (i + 1) / 3 == i / 3
        if (sameScene)
          assert(step <= Video.CutThreshold, s"doc=$id step $i: $step (jitter)")
        else
          assert(step > Video.CutThreshold, s"doc=$id step $i: $step (cut)")
      }
    }
  }

  test("frameHashes emits one row per frame with formula-exact dHash") {
    val ids = spark.range(0, 40).as[Long]
    val rows = Video.frameHashes(ids).collect()
    assert(rows.length == (0L until 40L).map(Video.nFrames(_)).sum)
    val byDoc = rows.groupBy(_.doc_id)
    for (id <- 0L until 40L) {
      val expect = Video.decodeFrames(Video.encodeGif(id)).map(Imaging.dHash64)
      val got = byDoc(id).sortBy(_.frame_idx).map(_.dhash).toSeq
      assert(got == expect, s"doc=$id")
    }
  }

  test("sceneCuts counts exactly the scene boundaries the formula plants") {
    val ids = spark.range(0, 60).as[Long]
    val cuts = Video.sceneCuts(Video.frameHashes(ids).toDF())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (id <- 0L until 60L) {
      // boundaries at f=3 and f=6 when the doc has that many frames
      val n = Video.nFrames(id)
      val expect = Seq(3, 6).count(_ < n)
      assert(cuts(id) == expect, s"doc=$id n=$n")
    }
  }

  test("gifMeta reports decoder frame count, geometry and whole-video pixel sum") {
    val ids = spark.range(0, 30).as[Long]
    val metas = Video.gifMeta(ids).collect()
    assert(metas.length == 30)
    metas.foreach { m =>
      val n = Video.nFrames(m.doc_id)
      var sum = 0L
      for (f <- 0 until n; x <- 0 until Video.W; y <- 0 until Video.H)
        sum += Video.framePixel(m.doc_id, f, x, y)
      assert(m.n_frames == n && m.width == Video.W && m.height == Video.H)
      assert(m.pix_sum == sum, s"doc=${m.doc_id}")
    }
  }

  test("videoNearDupPairs: same doc_id%256 class gives 100% containment") {
    // docs 3 and 259 share s = 3: the shorter video's distinct frames are
    // a subset of the longer's (same per-scene content, same jitter)
    val ids = Seq(3L, 259L, 7L).toDS()
    val pairs = Video.videoNearDupPairs(Video.frameHashes(ids).toDF()).collect()
    assert(pairs.length == 1)
    val p = pairs.head
    assert(p.getLong(0) == 3L && p.getLong(1) == 259L)
    assert(p.getLong(3) == 100L, s"containment ${p.getLong(3)}")
  }

  test("scene-cut plan shuffles hashes, never frames or media bytes") {
    val ids = spark.range(0, 20).as[Long]
    val plan = Video.sceneCuts(Video.frameHashes(ids).toDF())
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("binary"), "media bytes leaked past the decode stage")
  }
}
