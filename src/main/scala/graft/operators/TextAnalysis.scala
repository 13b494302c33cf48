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

  /** Sliding-window document chunking — the context-window prep step of a
    * training pipeline: overlapping token windows of `chunkTokens` with
    * `overlap` tokens shared between neighbors. The token array is
    * materialized once per document in a projection and the window starts
    * come from `posexplode(sequence(...))` — keeping the per-chunk `slice`
    * OUT of a higher-order-function lambda, where the captured token
    * subtree would re-split the text once per chunk. Narrow (no shuffle);
    * empty documents produce no chunks.
    */
  def chunk(docs: DataFrame, chunkTokens: Int = 128, overlap: Int = 32): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens, "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    docs
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"), col("t"),
        posexplode(sequence(lit(0), size(col("t")) - 1, lit(stride)))
          .as(Seq("chunk_idx", "start")))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        array_join(slice(col("t"), col("start") + 1, lit(chunkTokens)), " ").as("chunk_text"),
        least(col("start") + chunkTokens, size(col("t")))
          .minus(col("start")).cast("long").as("chunk_tokens"))
  }

  /** Corpus normalization: lowercase, collapse whitespace runs, trim — the
    * canonical pre-dedup text cleanup (near-dup detection over raw text
    * splits clusters on formatting noise). Scan-speed column algebra.
    */
  def normalize(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("norm_text"))

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val longNumRe = "\\d{6,}"

  /** PII scrubbing: redact email addresses and long digit runs (ids, phone
    * numbers) with typed placeholders, and count what was redacted — the
    * audit trail a compliance pass needs. Patterns are RE2-compatible so
    * the DuckDB oracle runs them verbatim. Emails are replaced before
    * numbers so digits inside an address never double-redact. Pure column
    * algebra, scan speed.
    */
  def redactPii(docs: DataFrame): DataFrame = {
    val emailsOut = regexp_replace(col("text"), lit(emailRe), lit("<EMAIL>"))
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(emailRe), lit(0))).cast("long").as("email_cnt"),
      // counted AFTER email redaction so the audit count equals the number
      // of <NUM> placeholders actually emitted (digits inside an address
      // are consumed by the email pass)
      size(regexp_extract_all(emailsOut, lit(longNumRe), lit(0))).cast("long").as("number_cnt"),
      regexp_replace(emailsOut, lit(longNumRe), lit("<NUM>")).as("redacted"))
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
