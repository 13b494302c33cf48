package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with a typed metadata struct, plus batched per-partition feature
  * extraction.
  *
  * The decode step itself (JPEG/audio codecs) is STUBBED — no media
  * libraries ship in this environment — behind [[FeatureExtractor]], with a
  * deterministic byte-histogram fake standing in. Everything Spark-side is
  * real and load-bearing: the schema, the binary column handling, the
  * partition-batched extraction shape (mapPartitions with reusable
  * per-partition state ≙ model/codec instantiated once per task, the same
  * contract a Pandas-UDF/`mapInPandas` batch has in PySpark), and the
  * downstream join of features back onto document ids.
  */
object Multimodal {

  final case class MediaMeta(mime: String, width: Int, height: Int, durationMs: Long)
  final case class MediaRow(doc_id: Long, media: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(doc_id: Long, byte_len: Int, features: Array[Float])

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

  /** The stubbed decoder: a real implementation would decode the media
    * bytes (image decode / audio PCM) and emit model features. The
    * deterministic fake — a 16-bin byte histogram, L1-normalized — keeps
    * the pipeline testable end-to-end with exact expected values.
    */
  trait FeatureExtractor extends Serializable {
    def extract(media: Array[Byte]): Array[Float]
  }

  object ByteHistogramExtractor extends FeatureExtractor {
    def extract(media: Array[Byte]): Array[Float] = {
      val bins = new Array[Int](16)
      var i = 0
      while (i < media.length) { bins((media(i) & 0xFF) >> 4) += 1; i += 1 }
      val n = math.max(media.length, 1).toFloat
      bins.map(_ / n)
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
      rows.map(r => MediaFeatures(r.doc_id,
        if (r.media == null) 0 else r.media.length,
        ex.extract(if (r.media == null) Array.empty else r.media)))
    }
  }

  /** Typed view of the media frame. */
  def asMediaDataset(df: DataFrame): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.as[MediaRow]
  }
}
