package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with a typed metadata struct, plus batched per-partition feature
  * extraction.
  *
  * This file is the GENERIC plumbing layer (schema, binary columns, the
  * mapPartitions batch shape with per-task extractor state — the Scala
  * contract of a `mapInPandas` decoder); the pluggable
  * [[FeatureExtractor]] here uses a deterministic byte-histogram for
  * model-style float features. The REAL codec paths live beside it:
  * [[Imaging]] (hand-written BMP container → `javax.imageio` decode →
  * dHash/aHash/DCT-pHash, PNG header schema-on-read, band-LSH near-dup)
  * and [[Audio]] (RIFF/WAV writer → `javax.sound` decode → PCM stats) —
  * both oracle-checked against closed-form pixel/sample formulas. Only
  * codecs absent from the JDK (JPEG-decode-free video, model inference)
  * stay behind this extractor seam.
  */
object Multimodal {

  final case class MediaMeta(mime: String, width: Int, height: Int, durationMs: Long)
  final case class MediaRow(doc_id: Long, media: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(doc_id: Long, byte_len: Int,
                                 features: Array[Float], bins: Array[Long])

  private val mimes = Seq("image/png", "image/jpeg", "audio/wav")

  /** Attach media columns to the documents table: the binary payload is the
    * UTF-8 bytes of the text (a deterministic stand-in for real image
    * bytes), metadata derived from doc_id. In production this select reads
    * real binary columns from parquet — the schema is the contract.
    */
  def withMediaColumns(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        element_at(array(mimes.map(lit): _*), (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("mime"),
        (pmod(col("doc_id"), lit(64)) * 16 + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) * 16 + 16).cast("int").as("height"),
        (pmod(col("doc_id"), lit(1000)) * 40L).as("durationMs")
      ).as("meta")
    )

  final case class SniffRow(doc_id: Long, media: Array[Byte])

  /** A MIXED-container binary column — each doc carries a real encoded
    * payload in one of the five container formats this library decodes
    * (BMP, PNG, JPEG, animated GIF, RIFF/WAV), chosen by doc_id % 5.
    * This is the ingest-side reality a sniffing dispatcher faces: a
    * binary column of unknown per-row format. All five payloads come
    * from the REAL encoders (hand-written BMP/WAV, ImageIO PNG/JPEG,
    * the GIF sequence writer), so magic-byte detection downstream tests
    * actual container headers, not fixtures.
    */
  def mixedContainers(docIds: Dataset[Long]): Dataset[SniffRow] = {
    import docIds.sparkSession.implicits._
    Imaging.spread(docIds).mapPartitions { ids =>
      ids.map { id =>
        val bytes = (id % 5) match {
          case 0 => Imaging.encodeBmp(8, 6, (x, y) => Imaging.pixel(id, x, y))
          case 1 => Imaging.encodePng(8, 6, (x, y) => Imaging.pixel(id, x, y))
          case 2 => Imaging.encodeJpeg(8, 6, (x, y) => Imaging.pixel(id, x, y))
          case 3 => Video.encodeGif(id)
          case _ => Audio.encodeWav(8000,
            Array.tabulate(64)(i => ((id % 97) * i % 2000).toInt))
        }
        SniffRow(id, bytes)
      }
    }
  }

  /** The stubbed decoder: a real implementation would decode the media
    * bytes (image decode / audio PCM) and emit model features. The
    * deterministic fake — a 16-bin byte histogram, L1-normalized — keeps
    * the pipeline testable end-to-end with exact expected values.
    */
  trait FeatureExtractor extends Serializable {
    def extract(media: Array[Byte]): Array[Float]
    /** Integer evidence behind the features, when the extractor has any —
      * comparison-stable across engines (floats aren't), so the driver's
      * correctness gate hashes these instead of the float vector.
      */
    def extractCounts(media: Array[Byte]): Array[Long] = Array.empty
  }

  object ByteHistogramExtractor extends FeatureExtractor {
    override def extractCounts(media: Array[Byte]): Array[Long] = {
      val bins = new Array[Long](16)
      var i = 0
      while (i < media.length) { bins((media(i) & 0xFF) >> 4) += 1; i += 1 }
      bins
    }
    def extract(media: Array[Byte]): Array[Float] = {
      val n = math.max(media.length, 1).toFloat
      extractCounts(media).map(_ / n)
    }
  }

  /** Batched per-partition feature extraction. The extractor is constructed
    * once per partition (≙ loading a model/codec once per task), then
    * streamed over the rows — the Scala shape of `mapInPandas`.
    */
  def extractFeatures(media: Dataset[MediaRow],
                      extractor: FeatureExtractor = ByteHistogramExtractor): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val ex = extractor // per-partition init point
      rows.map { r =>
        val m = if (r.media == null) Array.empty[Byte] else r.media
        MediaFeatures(r.doc_id, m.length, ex.extract(m), ex.extractCounts(m))
      }
    }
  }

  /** Frame-sampling plan for timed media: which frame timestamps a decoder
    * task should extract, at `fps`, capped at `maxFrames` per document.
    * This is the Spark-side half of video/audio feature extraction — the
    * decode itself stays behind [[FeatureExtractor]] (no codecs offline),
    * but the work plan (row explosion, per-frame keys, deterministic
    * timestamps) is the real contract a `mapInPandas` decoder consumes.
    * Zero-length media yields no frames.
    */
  def framePlan(media: DataFrame, fps: Int = 1, maxFrames: Int = 32): DataFrame = {
    // fps above 1000 would make the millisecond gap 0 (divide-by-zero in
    // the plan); media shorter than one gap yields no frames by design
    require(fps >= 1 && fps <= 1000, s"fps must be in [1, 1000], got $fps")
    require(maxFrames >= 1, s"maxFrames must be positive, got $maxFrames")
    val frameGapMs = 1000L / fps
    val n = least(floor(col("meta.durationMs") / frameGapMs), lit(maxFrames)).cast("int")
    media
      .select(col("doc_id"), n.as("n"))
      .filter(col("n") >= 1)
      .select(col("doc_id"), posexplode(sequence(lit(0), col("n") - 1)))
      .select(col("doc_id"), col("pos").cast("long").as("frame_idx"),
        (col("col") * frameGapMs).cast("long").as("frame_ts_ms"))
  }

  /** Typed view of the media frame. */
  def asMediaDataset(df: DataFrame): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.as[MediaRow]
  }
}
