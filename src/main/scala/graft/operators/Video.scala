package graft.operators

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO}
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Real video-content operators — the temporal third of the multimodal
  * pillar (images: [[Imaging]], audio: [[Audio]]). A "video" here is a real
  * multi-frame container: an animated GIF written and read through the
  * JDK's `javax.imageio` GIF codec. GIF is palette-indexed LZW — lossless —
  * so with an explicit 256-level gray palette the decoded frames reproduce
  * the encoded samples bit-for-bit, and the DuckDB oracle can recompute
  * every downstream number from the closed-form frame formula without ever
  * seeing the bytes (the same codec-vs-formula cross-check the image and
  * audio families use; reference's media surface is an opaque byte channel,
  * `lib.rs` record value passthrough — frame semantics are this rebuild's
  * extension).
  *
  * Frame contract (all integer, exact in both engines):
  * {{{
  *   n_frames = 3 + doc_id % 6                        (3..8 frames)
  *   scene(f) = f / 3                                 (cut every 3 frames)
  *   v(f,x,y) = (s*31 + x*7 + y*13 + x*y*(s + 3 + 11*scene(f))
  *               + jitter) % 256,   s = doc_id % 256
  *   jitter   = 64 when f % 3 == 1 && x == y && x < 4, else 0
  * }}}
  * Within a scene, consecutive frames differ only by the 4-pixel diagonal
  * jitter (a few dHash bits — camera noise); across a scene boundary the
  * `x*y` coefficient changes (most bits — a hard cut). That separation is
  * what [[sceneCuts]] detects from hashes alone.
  *
  * At 100 TB the shape holds: encode/decode + per-frame hashing is
  * embarrassingly parallel (`mapPartitions`, codec state per task, no
  * shuffle, one decode per doc emitting all frames), and everything
  * downstream — scene cuts, near-dup search — runs on `(doc_id, frame_idx,
  * hash)` rows, 24 bytes/frame, never pixels. Scene-cut detection is a
  * per-doc `lag` window: partitioned by doc_id, bounded by frames-per-doc.
  *
  * CODEC BOUNDARY (see SCALE.md "Video" for the full statement): animated
  * GIF is the only multi-frame codec the JDK ships; production H.264/MP4
  * needs an ffmpeg/JNI frame extractor at the decode seam. Everything
  * downstream of the `(doc_id, frame_idx, hash)` relation is
  * codec-agnostic — the claim is "temporal media over JDK codecs", not
  * "video solved".
  */
object Video {

  /** Same fixed canvas as [[Imaging.HashW]]×[[Imaging.HashH]] so the 9×8
    * dHash block grid is an exact 2×2 sum — no resampling to disagree on.
    */
  val W: Int = Imaging.HashW
  val H: Int = Imaging.HashH

  /** Hamming step between consecutive frame dHashes above which the
    * transition counts as a hard cut. Within-scene jitter moves 2 block
    * sums (≤ 3 bits); a scene change re-randomizes most of the 64.
    */
  val CutThreshold = 10

  def nFrames(docId: Long): Int = 3 + (docId % 6).toInt

  /** The frame formula — single source of truth, mirrored by the oracle
    * SQL in LlmQueries. Keep in lockstep.
    */
  def framePixel(docId: Long, f: Int, x: Int, y: Int): Int = {
    val s = (docId % 256).toInt
    val scene = f / 3
    val jitter = if (f % 3 == 1 && x == y && x < 4) 64 else 0
    (s * 31 + x * 7 + y * 13 + x * y * (s + 3 + 11 * scene) + jitter) % 256
  }

  /** 256-level grayscale palette: index i → RGB(i,i,i). With samples
    * written as palette indices the GIF LZW roundtrip is lossless.
    */
  private val grayPalette: IndexColorModel = {
    val g = Array.tabulate(256)(_.toByte)
    new IndexColorModel(8, 256, g, g, g)
  }

  /** Animated GIF for one doc via the JDK's sequence writer: one full-size
    * indexed frame per `writeToSequence` call (no inter-frame deltas).
    */
  def encodeGif(docId: Long): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      val n = nFrames(docId)
      var f = 0
      while (f < n) {
        val img = new BufferedImage(W, H, BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        val raster = img.getRaster
        var y = 0
        while (y < H) {
          var x = 0
          while (x < W) { raster.setSample(x, y, 0, framePixel(docId, f, x, y)); x += 1 }
          y += 1
        }
        writer.writeToSequence(new IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Real codec read-back: all frames of a GIF byte array, decoded once. */
  def decodeFrames(bytes: Array[Byte]): IndexedSeq[BufferedImage] = {
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      (0 until n).map(reader.read(_))
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  final case class GifBytes(doc_id: Long, gif: Array[Byte])
  final case class GifMeta(doc_id: Long, n_frames: Long, width: Long,
                           height: Long, pix_sum: Long)

  /** The raw container bytes as a binary column — for schema-on-read
    * header parsing downstream (signature + logical screen descriptor),
    * the path a pipeline takes to triage foreign media without decoding.
    */
  def gifColumn(docIds: Dataset[Long]): Dataset[GifBytes] = {
    import docIds.sparkSession.implicits._
    Imaging.spread(docIds).mapPartitions(ids => ids.map(id => GifBytes(id, encodeGif(id))))
  }
  final case class FrameHash(doc_id: Long, frame_idx: Long, dhash: Long)
  final case class FrameStats(doc_id: Long, frame_idx: Long,
                              px_sum: Long, px_sq_sum: Long)

  /** Encode → real GIF decode → decoder-reported frame count + geometry +
    * pixel sum over ALL frames. A container-writer or codec bug shows up
    * against the formula oracle.
    */
  def gifMeta(docIds: Dataset[Long]): Dataset[GifMeta] = {
    import docIds.sparkSession.implicits._
    Imaging.spread(docIds).mapPartitions { ids =>
      ids.map { id =>
        val frames = decodeFrames(encodeGif(id))
        var sum = 0L
        frames.foreach { img =>
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) { sum += (img.getRGB(x, y) & 0xFF); x += 1 }
            y += 1
          }
        }
        GifMeta(id, frames.size.toLong, frames.head.getWidth.toLong,
          frames.head.getHeight.toLong, sum)
      }
    }
  }

  /** One decode per doc → per-frame dHash rows. The video analog of
    * [[Imaging.imageHashes]]; everything downstream is ids+hashes only.
    */
  def frameHashes(docIds: Dataset[Long]): Dataset[FrameHash] = {
    import docIds.sparkSession.implicits._
    Imaging.spread(docIds).mapPartitions { ids =>
      ids.flatMap { id =>
        decodeFrames(encodeGif(id)).zipWithIndex.map { case (img, f) =>
          FrameHash(id, f.toLong, Imaging.dHash64(img))
        }
      }
    }
  }

  /** One decode per doc → per-frame pixel sum and sum of squares — the
    * integer moments behind frame-quality triage: contrast
    * `n·Σx² − (Σx)²` (scaled population variance) is 0 exactly for a
    * blank frame and low for near-blank ones, the frames a vision
    * pipeline drops before embedding. All integer, so the quality
    * numbers replay exactly from the frame formula.
    */
  def frameStats(docIds: Dataset[Long]): Dataset[FrameStats] = {
    import docIds.sparkSession.implicits._
    Imaging.spread(docIds).mapPartitions { ids =>
      ids.flatMap { id =>
        decodeFrames(encodeGif(id)).zipWithIndex.map { case (img, f) =>
          var s = 0L
          var s2 = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val v = (img.getRGB(x, y) & 0xFF).toLong
              s += v; s2 += v * v; x += 1
            }
            y += 1
          }
          FrameStats(id, f.toLong, s, s2)
        }
      }
    }
  }

  /** Keyframe selection from frame hashes alone: frame 0 plus every frame
    * whose hamming step from its predecessor exceeds `threshold` (a scene
    * start) — the frames a vision-training pipeline actually decodes and
    * embeds, chosen without re-decoding anything. Emits (doc_id,
    * frame_idx, dhash); same per-doc `lag` window shape as [[sceneCuts]].
    */
  def keyframes(frameHashes: DataFrame, threshold: Int = CutThreshold): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    frameHashes
      .withColumn("prev", lag(col("dhash"), 1).over(w))
      .filter(col("prev").isNull ||
        bit_count(expr("dhash ^ prev")).cast("long") > threshold)
      .select(col("doc_id"), col("frame_idx"), col("dhash"))
  }

  /** Video-level near-duplicate pairs from frame hashes alone — the clip/
    * containment detector: two videos are near-dups when they share many
    * distinct frame hashes, and `containment_pct` (shared ÷ the smaller
    * video's distinct-frame count) is 100 when one video's content is a
    * subset of the other's (a clip). The join key IS the frame hash — the
    * natural bucket, already content-addressed — and the shuffle carries
    * only (doc_id, dhash). Distinct-per-doc first, so a frame repeated
    * within one video (static scenes) can't inflate pair multiplicity.
    */
  def videoNearDupPairs(frameHashes: DataFrame, minShared: Int = 2,
                        maxDf: Int = 1000): DataFrame = {
    // the distinct hash relation feeds both sides of the self-join AND the
    // per-doc sizes — without this the GIF decode pass runs three times
    // (caller-must-clear-cache: released when the session cache clears)
    val dh = frameHashes.select(col("doc_id"), col("dhash")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = dh.groupBy("doc_id").agg(count(lit(1)).as("nd"))
    // document-frequency cap on the frame-hash posting lists — the same
    // discipline as Dedup.shingleIndex's maxDf (r11 verdict item 5): a
    // ubiquitous frame content (black/blank frames, standard intro cards)
    // is a hot posting list whose pair count grows QUADRATICALLY in its
    // df at corpus scale, and it is boilerplate, not evidence. Pruning is
    // an aggregate + anti join (no broadcast hint: heavy-hash cardinality
    // grows with the corpus); the per-doc sizes keep coming from the
    // UNPRUNED relation — pruning removes evidence, not set cardinality.
    // maxDf <= 0 disables (exact mode).
    val pruned = if (maxDf <= 0) dh else {
      val heavy = dh.groupBy("dhash").agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDf).select("dhash")
      dh.join(heavy, Seq("dhash"), "left_anti")
    }
    pruned.as("a")
      .join(pruned.as("b"),
        col("a.dhash") === col("b.dhash") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .join(sizes.select(col("doc_id").as("doc_a"), col("nd").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("nd").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_shared").cast("long").as("n_shared"),
        expr("n_shared * 100 div least(na, nb)").as("containment_pct"))
  }

  /** Incoming doc ids whose videos share ≥ `minShared` distinct frame
    * hashes with a CORPUS frame-hash index — the cross-relation form of
    * [[videoNearDupPairs]], for incremental ingestion. The corpus side
    * needs only its distinct hash set (8 bytes/frame-content); the join
    * moves (doc_id, dhash) rows only.
    */
  def videoMatchedIds(corpusFrameHashes: DataFrame, incomingFrameHashes: DataFrame,
                      minShared: Int = 2): DataFrame = {
    val corpus = corpusFrameHashes.select(col("dhash")).distinct()
    incomingFrameHashes.select(col("doc_id"), col("dhash")).distinct()
      .join(corpus, "dhash")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select("doc_id")
  }

  /** Clip alignment — the video twin of the span-level text dedup
    * (`Dedup.sharedSpans`): for each near-dup pair, the longest run of
    * CONSECUTIVE frames matching at a constant index offset. Matches are
    * (a_idx, b_idx) hash-equality pairs; a run lives on one diagonal
    * (diag = a_idx − b_idx), found with gaps-and-islands keyed by (pair,
    * diag) — exactly the diagonal trick the text operator uses on shingle
    * positions. Emits the best alignment per pair (longest, then lowest
    * diag/start): where the shared clip sits in both videos — the
    * surgical coordinates a curation pipeline needs to cut a duplicated
    * segment rather than drop a whole video. Runs ≥ `minLen` frames.
    * Shuffles only (ids, frame indices); the hash is the join bucket.
    */
  def clipAlignments(frameHashes: DataFrame, minLen: Int = 2): DataFrame = {
    // both sides of the self-join read this — persist or decode twice
    // (caller-must-clear-cache: released when the session cache clears)
    val fh = frameHashes.select(col("doc_id"), col("frame_idx"), col("dhash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = fh.as("a")
      .join(fh.as("b"),
        col("a.dhash") === col("b.dhash") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.frame_idx").as("ai"),
        (col("a.frame_idx") - col("b.frame_idx")).as("diag"))
      .distinct()
    bestAlignments(m, minLen)
  }

  /** Shared gaps-and-islands best-alignment tail, used by the video AND
    * audio aligners so their run/tie-break semantics cannot diverge:
    * from a `(doc_a, doc_b, ai, diag)` match relation, the longest
    * constant-offset run per pair (ties toward lowest diag, then lowest
    * start), keeping runs ≥ `minLen`.
    */
  private[operators] def bestAlignments(matches: DataFrame, minLen: Int): DataFrame = {
    val wd = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("ai")
    val islands = matches
      .withColumn("grp", col("ai") - row_number().over(wd))
      .groupBy("doc_a", "doc_b", "diag", "grp")
      .agg(min("ai").as("start_a"), count(lit(1)).as("len"))
      .filter(col("len") >= minLen)
    val wp = Window.partitionBy("doc_a", "doc_b")
      .orderBy(col("len").desc, col("diag"), col("start_a"))
    islands.withColumn("rn", row_number().over(wp)).filter(col("rn") === 1)
      .select(col("doc_a"), col("doc_b"), col("len").cast("long").as("len"),
        col("diag").cast("long").as("diag"), col("start_a").cast("long").as("start_a"))
  }

  /** Hard-cut detection from frame hashes alone: hamming step between
    * consecutive frame dHashes per doc (`lag` window keyed by doc_id —
    * bounded by frames-per-doc, safe at scale), a step > `threshold` is a
    * cut. Emits per-doc cut count, max step and total drift — the shot-
    * boundary triage a video curation pipeline runs before sampling
    * keyframes.
    */
  def sceneCuts(frameHashes: DataFrame, threshold: Int = CutThreshold): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    frameHashes
      .withColumn("prev", lag(col("dhash"), 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("step", bit_count(expr("dhash ^ prev")).cast("long"))
      .groupBy("doc_id")
      .agg(
        sum(when(col("step") > threshold, 1L).otherwise(0L)).as("n_cuts"),
        max("step").as("max_step"),
        sum("step").as("hamming_sum"))
  }
}
