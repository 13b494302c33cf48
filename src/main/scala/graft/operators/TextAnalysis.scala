package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-training-data pipelines: token stats,
  * quality scoring, language ID, fingerprinting. All pure column algebra —
  * narrow maps over the document scan, no shuffle, codegen-friendly, so at
  * 100 TB they run at scan speed.
  */
object TextAnalysis {

  /** Whitespace tokens; empty text → empty array (not [""]). */
  def tokens(text: Column): Column =
    when(length(text) === 0, array().cast("array<string>"))
      .otherwise(split(text, " "))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Token statistics per document. */
  def tokenStats(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    docs.select(
      col("doc_id"),
      length(col("text")).as("char_len"),
      size(t).as("token_cnt"),
      size(array_distinct(t)).as("uniq_token_cnt"),
      coalesce(array_max(transform(t, w => length(w))), lit(0)).as("max_token_len")
    )
  }

  private val stopwords = Seq("the", "a", "and", "of", "to", "in", "is", "it")

  /** Quality-scoring signals: stopword hits, long-word count, and a
    * uniqueness score in integer thousandths (integer math keeps the
    * DuckDB oracle bit-exact).
    */
  def qualitySignals(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val stop = array(stopwords.map(lit): _*)
    // integer thousandths via floor — exact for these magnitudes, and
    // identical to DuckDB's `//` integer division on non-negatives
    val uniqX1000 = when(size(t) === 0, lit(0L))
      .otherwise(floor(size(array_distinct(t)).cast("long") * 1000L / size(t)))
    docs.select(
      col("doc_id"),
      size(filter(t, w => array_contains(stop, w))).as("stopword_cnt"),
      size(filter(t, w => length(w) > 5)).as("longword_cnt"),
      uniqX1000.cast("long").as("uniq_x1000")
    )
  }

  /** The quality *filter* a training pipeline actually applies: keep
    * documents inside token-count bounds with enough lexical diversity.
    * Pure predicate — pushes into the scan, composes with dedup filters.
    */
  def qualityFilter(docs: DataFrame, minTokens: Int = 20, maxTokens: Int = 5000,
                    minUniqX1000: Int = 300): DataFrame = {
    val t = tokens(col("text"))
    docs.filter(
      size(t) >= minTokens && size(t) <= maxTokens &&
        (size(array_distinct(t)).cast("long") * 1000L >= lit(minUniqX1000.toLong) * size(t)))
  }

  /** Character-trigram language-ID heuristic. With no external models
    * available, scores each candidate language by hits against a tiny
    * built-in trigram profile and picks the argmax (ties → 'en'). The
    * pipeline shape — profile broadcast, per-doc scoring as column algebra —
    * is the production design; swapping in real profiles is data, not code.
    */
  def languageId(docs: DataFrame): DataFrame = {
    val profiles: Map[String, Seq[String]] = Map(
      "en" -> Seq("th", "he", "in", "er", "an"),
      "de" -> Seq("ei", "ch", "en", "un", "sch"),
      "es" -> Seq("de", "la", "os", "el", "ar"),
      "zh" -> Seq("zh", "sh", "ng", "xi", "qi")
    )
    val lowered = lower(col("text"))
    val scores = profiles.toSeq.sortBy(_._1).map { case (lang, grams) =>
      val hits = grams.map(g => when(lowered.contains(g), 1).otherwise(0)).reduce(_ + _)
      struct(hits.cast("int").as("score"), lit(lang).as("lang"))
    }
    docs.select(
      col("doc_id"),
      greatest(scores: _*).getField("lang").as("predicted_lang"),
      col("lang").as("labeled_lang")
    )
  }

  /** Content-defined fingerprint: md5 of the text (exact-dup key) plus a
    * 64-bit rolling polynomial hash over tokens (shift-resistant key used by
    * the near-dup operators). The polynomial fold is a built-in `aggregate`
    * HOF — long arithmetic wraps identically on every executor.
    */
  def fingerprints(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    docs.select(
      col("doc_id"),
      md5(col("text")).as("md5_fp"),
      // order-sensitive chained hash; xxhash64(acc, w) instead of the
      // classic acc*31+h so ANSI mode never sees a long overflow
      aggregate(t, lit(1125899906842597L),
        (acc, w) => xxhash64(acc, w)).as("rolling_fp")
    )
  }
}
