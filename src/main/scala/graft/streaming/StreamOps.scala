package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming operators beyond the reference's surface — the pieces the
  * reference's own gap analysis wanted but its architecture couldn't give
  * (exactly-once-ish delivery, time-windowed processing): watermarked
  * tumbling-window aggregation and stateful within-watermark dedup.
  *
  * Both are incremental and state-bounded: the watermark caps state size,
  * so they run indefinitely at any input rate — the property that matters
  * when the topic feeds 100 TB/day.
  */
object StreamOps {

  /** Tumbling-window record counts + byte totals per topic, with a
    * watermark bounding state and handling late data. Output mode
    * append-compatible (the window closes when the watermark passes it).
    */
  def windowedTopicStats(records: DataFrame,
                         windowLength: String = "1 hour",
                         watermark: String = "10 minutes"): DataFrame =
    records
      .withWatermark("timestamp", watermark)
      .groupBy(window(col("timestamp"), windowLength), col("topic"))
      .agg(
        count(lit(1)).as("record_cnt"),
        sum(length(col("value"))).as("value_bytes"),
        approx_count_distinct(col("key")).as("approx_keys"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("topic"), col("record_cnt"), col("value_bytes"), col("approx_keys"))

  /** Windowed heavy hitters: the Space-Saving sketch as a streaming
    * aggregate — top-`k` keys per tumbling window from a buffer bounded at
    * `capacity` counters, regardless of key cardinality. The state the
    * watermark must hold per open window is O(capacity), not O(distinct
    * keys) — the property that makes "top URLs per hour" runnable forever
    * on a billions-distinct stream where an exact groupBy's state grows
    * without bound. On a batch frame the same plan runs as a normal
    * aggregation (watermark is streaming-only), which is how the catalog
    * entry oracles it: with `capacity ≥` the window's distinct keys the
    * sketch is exact and DuckDB recomputes it.
    *
    * Output: (window_start_ms, key, est, err, rnk) — est desc, key asc.
    */
  def windowedHeavyHitters(records: DataFrame, keyCol: String,
                           capacity: Int = 4096, k: Int = 10,
                           windowLength: String = "1 hour",
                           watermark: String = "10 minutes"): DataFrame = {
    val in = if (records.isStreaming) records.withWatermark("timestamp", watermark)
             else records
    val ss = udaf(new graft.functions.SpaceSavingAgg(capacity, k),
      org.apache.spark.sql.Encoders.STRING)
    in.groupBy(window(col("timestamp"), windowLength))
      .agg(ss(col(keyCol).cast("string")).as("hh"))
      .select(expr("unix_micros(window.start) div 1000").as("window_start_ms"),
        posexplode(col("hh")).as(Seq("i", "s")))
      .select(col("window_start_ms"), col("s._1").as("key"), col("s._2").as("est"),
        col("s._3").as("err"), (col("i") + 1).cast("long").as("rnk"))
  }

  /** Streaming twin of the `q_quantile_hist_merge` sketch: per-window
    * log₂-bucket histograms of an integer-cents value, maintained
    * incrementally — each micro-batch's partial counts ADD into the open
    * window's state (integer addition is the sketch merge, so streaming
    * partials, daily batch partials, and any rollup are the same
    * arithmetic). State per open window is ≤ 64 counters per key, the
    * watermark closes windows, and a quantile read later brackets the true
    * value within a factor of 2 exactly as in the batch entry. On a batch
    * frame the same plan is a plain aggregation — how StreamingSpec proves
    * stream/batch parity.
    *
    * Output: (window_start_ms, key, bucket, cnt).
    */
  def windowedBucketHistogram(events: DataFrame, keyCol: String,
                              valueCol: String = "value",
                              windowLength: String = "1 hour",
                              watermark: String = "10 minutes"): DataFrame = {
    val in = if (events.isStreaming) events.withWatermark("ts", watermark)
             else events
    val cents = floor(col(valueCol) * 100).cast("long")
    val bucket = when(cents <= 0, lit(0L))
      .otherwise(length(bin(cents)).cast("long"))
    in.groupBy(window(col("ts"), windowLength), col(keyCol).as("key"),
        bucket.as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(expr("unix_micros(window.start) div 1000").as("window_start_ms"),
        col("key"), col("bucket"), col("cnt"))
  }

  /** At-least-once → effectively-once: drop re-delivered records by their
    * (topic, partition, offset) identity, keeping state only within the
    * watermark horizon. This is the dedup the reference's
    * commit-before-flush hole (SURVEY §2.1 S5) would have needed.
    */
  def dedupWithinWatermark(records: DataFrame,
                           watermark: String = "10 minutes"): DataFrame =
    records
      .withWatermark("timestamp", watermark)
      .dropDuplicatesWithinWatermark("topic", "partition", "offset")

  /** Stream-stream interval join: pair each left record with right records
    * of the same key whose timestamp falls within `[left.ts - maxDelayMs,
    * left.ts + maxDelayMs]`. Watermarks on both sides bound the join state
    * (Spark evicts buffered rows once the watermark passes the interval) —
    * without them a stream-stream join's state grows forever.
    * Column requirements: both frames need `ts` (timestamp) and the key.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   maxDelayMs: Long, watermark: String = "10 minutes",
                   joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark("ts", watermark).alias("l")
    val r = right.withWatermark("ts", watermark).alias("r")
    // a literal MILLISECOND interval: keeps sub-second bounds exact
    // (integer SECONDS would truncate 1500 ms → 1 s) AND stays analyzable
    // by StreamingJoinHelper's state-watermark extraction — outer joins
    // reject conditions it can't see through (make_dt_interval isn't
    // foldable to it, a bare literal is)
    val delay = expr(s"INTERVAL $maxDelayMs MILLISECOND")
    // joinType "leftOuter": unmatched left rows ARE emitted, but only once
    // the watermark has passed their interval — Spark must be sure no
    // matching right row can still arrive. A test (or drained batch) that
    // never advances the watermark past the interval will see inner-join
    // results only; that's the streaming contract, not a bug.
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col("r.ts") >= col("l.ts") - delay &&
        col("r.ts") <= col("l.ts") + delay,
      joinType)
  }

  /** Stream-static enrichment: join each streaming record against a batch
    * dimension table. The static side broadcasts (re-read per micro-batch,
    * so dimension updates between batches are picked up — the Spark analog
    * of a connector's config/metadata lookaside); the stream never
    * shuffles for the join.
    */
  def enrich(records: DataFrame, dim: DataFrame, key: String,
             joinType: String = "left"): DataFrame =
    records.join(broadcast(dim), Seq(key), joinType)

  /** Streaming incremental dedup: filter each micro-batch of documents
    * against the accepted static corpus with
    * [[graft.operators.Dedup.incrementalFilter]] (minhash band buckets,
    * ids-only shuffle, exact-Jaccard verify) and hand the survivors to
    * `sink`. `foreachBatch` is the right home — the filter needs a per-doc
    * verdict (anti-join against the verified-match set), which append-mode
    * streaming can't express as one continuous plan, and per-batch
    * semantics are exactly what an ingestion pipeline wants: each batch
    * dedups against the corpus as of that batch. Batch-internal dups pass
    * through (they're the nightly compaction's job; same contract as the
    * batch operator).
    *
    * At scale `corpus` is the persisted bucket-index table; re-reading it
    * per micro-batch picks up nightly index rebuilds for free.
    */
  def dedupAgainstCorpus(docs: DataFrame, corpus: DataFrame,
                         sink: DataFrame => Unit,
                         onHotBuckets: Long => Unit = _ => (),
                         maxBucket: Int = 1000): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // the corpus index is static: shingle it ONCE per query, not per batch
    // (caller-must-clear-cache: it lives as long as the streaming query)
    val corpusHs = graft.operators.Dedup.shingleRelation(corpus).persist(lvl)
    // surface the filter's recall trade-off (Dedup.incrementalFilterAgainst
    // caller contract): how many corpus index buckets the cap excludes —
    // non-zero means a near-dup of a hot corpus cluster will pass this
    // filter. One bounded aggregate over the static index, once per query
    // (which IS per batch: the corpus doesn't change between
    // micro-batches); the count ALSO rides every micro-batch as the
    // `hot_buckets_excluded` observe metric (r14 verdict item 6), so a
    // metrics pipeline sees the live recall hole without the callback.
    val hotBuckets = graft.operators.Dedup
      .minhashHotBuckets(corpusHs, maxBucket = maxBucket).count()
    onHotBuckets(hotBuckets)
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // per-batch relation is read twice (buckets + verify); persist for
        // the batch, release before the next one — no cache growth over an
        // unbounded stream
        val batchHs = graft.operators.Dedup.shingleRelation(batch).persist(lvl)
        try sink(BatchMetrics.withDedupMetrics(
          graft.operators.Dedup.incrementalFilterAgainst(
            corpusHs, batchHs, batch, maxBucket = maxBucket), hotBuckets))
        finally batchHs.unpersist()
      }
  }

  /** Paragraph-containment twin of [[dedupAgainstCorpus]] — the SIXTH
    * streaming incremental-dedup modality (text shingles, image dHash,
    * audio fingerprint, embedding cosine, video frame hashes, and now
    * text paragraphs): the corpus index is the distinct paragraph-hash
    * set (16 bytes per distinct paragraph), and an incoming (doc_id,
    * text) doc drops when ≥ `dropPm` per-mille of its paragraphs already
    * exist in the index — containment, so a doc assembled mostly from
    * known boilerplate drops even if never seen verbatim. Same bounded
    * per-batch cache discipline as the other twins.
    * (caller-must-clear-cache: the corpus index lives as long as the
    * streaming query.)
    */
  def paragraphDedupAgainstCorpus(docs: DataFrame, corpus: DataFrame,
                                  sink: DataFrame => Unit, dropPm: Int = 600):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val corpusPh = graft.operators.Dedup.paragraphHashes(corpus)
      .select(col("ph")).distinct().persist(lvl)
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val batchPh = graft.operators.Dedup.paragraphHashes(batch).persist(lvl)
        try {
          val matched = graft.operators.Dedup
            .paragraphMatchedIds(corpusPh, batchPh, dropPm)
          sink(batch.join(matched, Seq("doc_id"), "left_anti"))
        } finally batchPh.unpersist()
      }
  }

  /** Winnowing-fingerprint twin of [[dedupAgainstCorpus]] — the SEVENTH
    * streaming incremental-dedup modality (text shingles, image dHash,
    * audio fingerprint, embedding cosine, video frame hashes, text
    * paragraphs, and now winnowing fingerprints): the corpus index is
    * the distinct selected-minimum set (8 bytes per kept k-gram,
    * ~2/(w+1) of them), and an incoming doc drops when ≥ `dropPm`
    * per-mille of its fingerprints already exist — winnowing's detection
    * floor makes this position-robust, so a doc stitched from known
    * ≥ w+k−1-token passages drops even when no paragraph boundary (or
    * verbatim hash) aligns. Same bounded per-batch cache discipline as
    * the other twins. (caller-must-clear-cache: the corpus index lives
    * as long as the streaming query.)
    */
  def winnowingDedupAgainstCorpus(docs: DataFrame, corpus: DataFrame,
                                  sink: DataFrame => Unit, dropPm: Int = 600):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val corpusFp = graft.operators.Dedup.winnowingFingerprints(corpus)
      .select(col("fp")).distinct().persist(lvl)
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val batchFp = graft.operators.Dedup.winnowingFingerprints(batch).persist(lvl)
        try {
          val matched = graft.operators.Dedup
            .winnowingMatchedIds(corpusFp, batchFp, dropPm)
          sink(batch.join(matched, Seq("doc_id"), "left_anti"))
        } finally batchFp.unpersist()
      }
  }

  /** Streaming model-based quality filter: each micro-batch of (doc_id,
    * text) rows is scored against a STATIC unigram log-prob table (the
    * LM trained batch-side on a reference corpus, floored-micro integer
    * log-probs) and docs whose mean token log-prob falls below
    * `minAvgLogpX1e6` are dropped — the in-stream form of perplexity
    * filtering, where dedup twins drop known content and this drops
    * improbable content. Tokens absent from the LM score `oovLpX1e6`
    * (a floor penalty). The LM table is persisted once per query and
    * broadcast into each batch join; per-batch state is nothing.
    * (caller-must-clear-cache: the LM table lives as long as the query.)
    */
  def lmFilterStream(docs: DataFrame, lmTable: DataFrame,
                     sink: DataFrame => Unit, minAvgLogpX1e6: Long,
                     oovLpX1e6: Long):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val lm = lmTable.persist(lvl)
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val scored = batch
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .filter(length(col("tok")) > 0)
          .join(broadcast(lm), Seq("tok"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            sum(coalesce(col("lp"), lit(oovLpX1e6))).as("sum_logp_x1e6"))
          .filter(col("sum_logp_x1e6") >= col("n_tokens") * minAvgLogpX1e6)
          .select("doc_id")
        sink(batch.join(scored, Seq("doc_id"), "left_semi"))
      }
  }

  /** Streaming incremental MEDIA dedup — the dHash twin of
    * [[dedupAgainstCorpus]], composing the two r7 pillars: each
    * micro-batch of image docs is decoded and perceptually hashed
    * ([[graft.operators.Imaging.imageHashes]] — real codec, per-task
    * state, no shuffle), then dropped when a band-LSH match with hamming
    * ≤ `maxHamming` exists in the persisted corpus hash index
    * ([[graft.operators.Imaging.dhashMatchedIds]] — the cross-relation
    * band join, ids+hashes only). Survivors go to `sink`. Same
    * `foreachBatch` rationale as the text form: the verdict is an
    * anti-join, and per-batch semantics (dedup against the corpus as of
    * this batch) are what ingestion wants. Batch-internal dups pass
    * through, the nightly compaction's job.
    *
    * At scale `corpusHashes` is the persisted 16-bytes/doc index table —
    * re-reading it per micro-batch picks up index rebuilds for free;
    * pixels never cross a batch boundary or a shuffle.
    */
  def mediaDedupAgainstCorpus(docIds: DataFrame, corpusHashes: DataFrame,
                              sink: DataFrame => Unit, maxHamming: Int = 16):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // static index: hash once per query, not per batch
    // (caller-must-clear-cache: it lives as long as the streaming query)
    val corpus = corpusHashes.persist(lvl)
    docIds.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import batch.sparkSession.implicits._
        // batch hashes are read twice (band join + anti-join); persist for
        // the batch, release before the next — no cache growth
        val hs = graft.operators.Imaging
          .imageHashes(batch.select(col("doc_id")).as[Long]).toDF().persist(lvl)
        try {
          val matched = graft.operators.Imaging.dhashMatchedIds(corpus, hs, maxHamming)
          sink(batch.join(matched, Seq("doc_id"), "left_anti"))
        } finally hs.unpersist()
      }
  }

  /** Audio twin of [[mediaDedupAgainstCorpus]]: micro-batches of audio
    * docs are decoded and spectrally fingerprinted
    * ([[graft.operators.Audio.spectralFingerprints]]), then dropped when
    * the band-LSH join finds a corpus fingerprint at hamming ≤
    * `maxHamming` — default 8, tighter than the image threshold, because
    * 64 sign-bits carry less entropy than a gradient dHash. Same
    * per-batch semantics, same ids+hashes-only shuffle; the corpus index
    * is 8 bytes/doc.
    */
  def audioDedupAgainstCorpus(docIds: DataFrame, corpusFps: DataFrame,
                              sink: DataFrame => Unit, maxHamming: Int = 8):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // (caller-must-clear-cache: lives as long as the streaming query)
    val corpus = corpusFps.persist(lvl)
    docIds.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import batch.sparkSession.implicits._
        val fps = graft.operators.Audio
          .spectralFingerprints(batch.select(col("doc_id")).as[Long]).toDF().persist(lvl)
        try {
          val matched = graft.operators.Imaging
            .dhashMatchedIds(corpus, fps, maxHamming, hashCol = "afp")
          sink(batch.join(matched, Seq("doc_id"), "left_anti"))
        } finally fps.unpersist()
      }
  }

  /** Video twin of [[mediaDedupAgainstCorpus]] — the fifth member of the
    * streaming incremental-dedup family (text shingles, image dHash,
    * audio fingerprint, embedding cosine, video frame hashes): each
    * micro-batch of video doc ids is decoded frame-by-frame (one GIF
    * decode per doc), and a doc drops when
    * [[graft.operators.Video.videoMatchedIds]] finds ≥ `minShared` of its
    * distinct frame hashes in the corpus index — clip-level dedup, so a
    * re-upload that trims or extends a known video still matches. The
    * corpus index is the distinct frame-hash set: 8 bytes per distinct
    * frame content.
    */
  def videoDedupAgainstCorpus(docIds: DataFrame, corpusFrameHashes: DataFrame,
                              sink: DataFrame => Unit, minShared: Int = 2):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // (caller-must-clear-cache: lives as long as the streaming query)
    val corpus = corpusFrameHashes.persist(lvl)
    docIds.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import batch.sparkSession.implicits._
        val fh = graft.operators.Video
          .frameHashes(batch.select(col("doc_id")).as[Long]).toDF().persist(lvl)
        try {
          val matched = graft.operators.Video.videoMatchedIds(corpus, fh, minShared)
          sink(batch.join(matched, Seq("doc_id"), "left_anti"))
        } finally fh.unpersist()
      }
  }

  /** Vector twin of [[dedupAgainstCorpus]] — completes the streaming
    * incremental-dedup quartet (text shingles, image dHash, audio
    * fingerprint, embedding cosine): each micro-batch of `(vec_id,
    * embedding)` rows is dropped when
    * [[graft.operators.Dedup.embeddingMatchedIds]] finds a corpus vector at
    * cosine ≥ `threshold` through the shared hyperplane-LSH band index.
    * Survivors go to `sink`; per-batch semantics as the other three
    * (batch-internal dups pass through — the nightly compaction's job).
    *
    * At scale `corpus` is the persisted embedding table next to its
    * signature index; the band join shuffles ids+buckets only and the
    * bounded verification joins embeddings back by id — a batch of new
    * vectors never crosses a shuffle with its float payload replicated
    * per band.
    */
  def embeddingDedupAgainstCorpus(vecs: DataFrame, corpus: DataFrame,
                                  sink: DataFrame => Unit, dim: Int,
                                  threshold: Double = 0.45,
                                  rowsPerBand: Int = 16, bands: Int = 8,
                                  maxBucket: Int = 1000,
                                  onHotBuckets: Long => Unit = _ => ()):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // static index: signature-banded once per query, not per batch
    // (caller-must-clear-cache: it lives as long as the streaming query)
    val corpusRel = corpus.persist(lvl)
    // recall-trade-off observable, as in [[dedupAgainstCorpus]]: excluded
    // hot index buckets at this cap, once per query over the static corpus
    onHotBuckets(graft.operators.Dedup
      .embeddingHotBuckets(corpusRel, dim, rowsPerBand, bands, maxBucket).count())
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // batch embeddings are read twice (band join + verify); persist for
        // the batch, release before the next — no cache growth
        val b = batch.persist(lvl)
        try {
          val matched = graft.operators.Dedup
            .embeddingMatchedIds(corpusRel, b, dim, threshold, rowsPerBand,
              bands, maxBucket)
          sink(b.join(matched, Seq("vec_id"), "left_anti"))
        } finally b.unpersist()
      }
  }

  // ---- custom state: gap-based sessionization --------------------------

  final case class SessionEvent(user_id: Long, ts_ms: Long, value: Double)
  final case class SessionState(sessionStartMs: Long, lastTsMs: Long,
                                events: Int, valueSum: Double)
  final case class Session(user_id: Long, session_start_ms: Long,
                           session_end_ms: Long, events: Int, value_sum: Double)

  /** Gap-based sessionization with `flatMapGroupsWithState`: a session
    * closes when no event arrives for `gapMs` (event time, enforced by the
    * state timeout tied to the watermark). Emits one row per closed
    * session; state per user is O(1) — the canonical custom-state operator
    * the built-in windowed aggregations can't express.
    */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long,
                 watermark: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", watermark)
      .as[(Long, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, Double, java.sql.Timestamp)],
         state: GroupState[SessionState]) =>
          var closed = List.empty[Session]
          var cur = state.getOption
          // process in event-time order within the batch
          rows.toSeq.sortBy(_._2).foreach { case (_, tsMs, v, _) =>
            cur match {
              case Some(st) if tsMs - st.lastTsMs <= gapMs =>
                cur = Some(st.copy(lastTsMs = tsMs, events = st.events + 1,
                  valueSum = st.valueSum + v))
              case Some(st) =>
                closed ::= Session(user, st.sessionStartMs, st.lastTsMs,
                  st.events, st.valueSum)
                cur = Some(SessionState(tsMs, tsMs, 1, v))
              case None =>
                cur = Some(SessionState(tsMs, tsMs, 1, v))
            }
          }
          if (state.hasTimedOut) {
            cur.foreach(st => closed ::= Session(user, st.sessionStartMs,
              st.lastTsMs, st.events, st.valueSum))
            state.remove()
            cur = None
          }
          cur.foreach { st =>
            state.update(st)
            state.setTimeoutTimestamp(st.lastTsMs + gapMs)
          }
          closed.reverseIterator
      }
  }

  final case class CappedDoc(source: String, doc_id: Long, admit_rank: Long)

  /** Per-key admission cap across the stream's lifetime: each key (a
    * domain, a source) admits at most `cap` rows TOTAL — the per-domain
    * corpus cap enforced while the data streams in, instead of a post-hoc
    * batch pass (the streaming sibling of the `text_domain_cap` batch
    * entry). Within a micro-batch, candidates are admitted in ascending id
    * order via a bounded heap — O(cap) memory, one pass over the group
    * iterator, never a full-group buffer; across batches the only carried
    * state is the admitted count (one long per key, O(#keys) total).
    * Earlier batches win over later ones (admission is by arrival);
    * within a batch the smallest ids win deterministically.
    *
    * Batch execution (the oracle twin `stream_domain_cap`): every key
    * arrives as one group with no prior state, so exactly the `cap`
    * smallest ids are admitted — `row_number() OVER (PARTITION BY key
    * ORDER BY id) <= cap` replayed by the DuckDB oracle.
    */
  def capPerKey(docs: Dataset[(String, Long)], cap: Int): Dataset[CappedDoc] = {
    import docs.sparkSession.implicits._
    require(cap > 0, s"cap must be positive, got $cap")
    docs.groupByKey(_._1)
      .flatMapGroupsWithState[Long, CappedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Long)], state: GroupState[Long]) =>
          val admitted = state.getOption.getOrElse(0L)
          val room = cap - admitted.toInt
          if (room <= 0) Iterator.empty
          else {
            // bounded max-heap of the `room` smallest ids (head = largest kept)
            val heap = scala.collection.mutable.PriorityQueue.empty[Long]
            rows.foreach { case (_, id) =>
              if (heap.size < room) heap += id
              else if (id < heap.head) { heap.dequeue(); heap += id: Unit }
            }
            val take = heap.toArray
            java.util.Arrays.sort(take)
            state.update(admitted + take.length)
            take.iterator.zipWithIndex.map { case (id, i) =>
              CappedDoc(key, id, admitted + i + 1) }
          }
      }
  }

  final case class ReservoirItem(doc_id: Long, weight: Long, k6: Long, rnk: Long)

  /** Lifetime weighted sample of size `k` over a stream
    * (Efraimidis–Spirakis): every doc carries a deterministic sort key
    * k6/weight (the fixed-point ln(u)/w the batch `q_weighted_reservoir`
    * entry derives), and the reservoir is simply the k best keys seen so
    * far — because the key is a pure function of the doc, the lifetime
    * result is BATCHING-INDEPENDENT: any split of the same docs into
    * micro-batches converges to the same k rows, which is what makes an
    * exact oracle possible for a streaming sampler. Emits the refreshed
    * reservoir each micro-batch (Update-style; readers take the latest).
    *
    * Scale shape: a per-partition bounded heap pre-reduces each batch to
    * ≤ k rows per partition BEFORE the single-key stateful merge, so the
    * one-group stage sees k×#partitions candidate rows, never the batch;
    * carried state is the k-row reservoir itself.
    */
  def weightedReservoir(docs: Dataset[(Long, Long, Long)], k: Int): Dataset[ReservoirItem] = {
    import docs.sparkSession.implicits._
    require(k > 0, s"k must be positive, got $k")
    // (eskey DESC, doc_id ASC); eskey = k6/w as ONE double division of
    // exact integer operands — the same arithmetic the SQL oracle runs
    def better(a: (Long, Long, Long), b: (Long, Long, Long)): Boolean = {
      val (ka, kb) = (a._3.toDouble / a._2, b._3.toDouble / b._2)
      ka > kb || (ka == kb && a._1 < b._1)
    }
    def topK(iter: Iterator[(Long, Long, Long)]): Array[(Long, Long, Long)] = {
      // "better" elements rank LOWER, so the queue's max head = worst kept
      val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Long, Long)](
        Ordering.fromLessThan((x, y) => better(x, y)))
      iter.foreach { r =>
        if (heap.size < k) heap += r
        else if (better(r, heap.head)) { heap.dequeue(); heap += r: Unit }
      }
      heap.toArray
    }
    docs.mapPartitions(it => topK(it).iterator)
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[Array[(Long, Long, Long)], ReservoirItem](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: Int, rows: Iterator[(Long, Long, Long)],
         state: GroupState[Array[(Long, Long, Long)]]) =>
          val merged = topK(rows ++ state.getOption.getOrElse(Array.empty).iterator)
            .sortWith(better)
          state.update(merged)
          merged.iterator.zipWithIndex.map { case ((id, w, k6), i) =>
            ReservoirItem(id, w, k6, i + 1L) }
      }
  }

  final case class EwmaState(lastTsMs: Long, ewma: Double, n: Long)
  final case class EwmaRow(user_id: Long, ewma: Double, n: Long)

  /** Per-key exponential smoothing as streaming state: one double per key,
    * updated by the same `e ← (1-α)e + αx` fold the batch `q_ewma` catalog
    * entry runs — StreamingSpec asserts stream and batch agree on the same
    * data. Emits the refreshed EWMA for every key touched by a micro-batch
    * (Update mode). State is O(1) per key and never grows with events;
    * within a batch rows fold in event-time order so replays are
    * deterministic. Late rows older than the key's last-seen timestamp are
    * dropped (they would silently reorder the recurrence); a watermark on
    * the caller's side bounds how late that can happen.
    */
  def ewmaPerKey(events: Dataset[SessionEvent], alpha: Double): Dataset[EwmaRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[EwmaState, EwmaRow](GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[SessionEvent], state: GroupState[EwmaState]) =>
          var st = state.getOption.getOrElse(EwmaState(Long.MinValue, Double.NaN, 0L))
          rows.toSeq.sortBy(_.ts_ms).foreach { ev =>
            if (ev.ts_ms >= st.lastTsMs) {
              val e = if (st.n == 0L) ev.value
                      else (1 - alpha) * st.ewma + alpha * ev.value
              st = EwmaState(ev.ts_ms, e, st.n + 1)
            }
          }
          state.update(st)
          EwmaRow(user, st.ewma, st.n)
      }
  }

  final case class TypedEvent(user_id: Long, ts_ms: Long, event_id: Long, event_type: String)
  final case class TransState(lastTsMs: Long, lastEventId: Long, lastType: String)
  final case class Transition(user_id: Long, src_type: String, dst_type: String)

  /** Streaming first-order transitions: the event-sequence bigrams the
    * batch `q_markov_transitions` entry computes with a lead() window,
    * produced incrementally with O(1) state per key (the last event seen).
    * Emits one Transition row per consecutive pair as it is observed —
    * the running transition matrix is then a plain streaming count over
    * this append stream. Within a micro-batch rows fold in
    * (ts_ms, event_id) order; rows older than the key's last-seen
    * position are dropped, same late-data contract as [[ewmaPerKey]].
    * StreamingSpec proves stream and batch agree on the same data split
    * across micro-batch boundaries.
    */
  def transitionsPerKey(events: Dataset[TypedEvent]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[TypedEvent], state: GroupState[TransState]) =>
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ListBuffer.empty[Transition]
          rows.toSeq.sortBy(e => (e.ts_ms, e.event_id)).foreach { ev =>
            if (st == null) {
              st = TransState(ev.ts_ms, ev.event_id, ev.event_type)
            } else if (ev.ts_ms > st.lastTsMs ||
                       (ev.ts_ms == st.lastTsMs && ev.event_id > st.lastEventId)) {
              // strict ordering: an at-least-once replay of the last-seen
              // event must not emit a spurious self-transition
              out += Transition(user, st.lastType, ev.event_type)
              st = TransState(ev.ts_ms, ev.event_id, ev.event_type)
            }
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  final case class MomentsState(n: Long, mean: Double, m2: Double)
  final case class MomentsRow(user_id: Long, n: Long, mean: Double, var_pop: Double)

  /** Per-key running mean/variance via Welford's online update — the
    * numerically stable O(1)-state form (naive sum-of-squares cancels
    * catastrophically once mean² ≫ variance). This is the streaming state
    * behind online anomaly scoring: each emitted row carries the moments
    * a consumer needs to z-score the next value. Update order within a
    * batch is value-arrival order after an event-time sort, and Welford
    * is permutation-dependent only in the last ulps — StreamingSpec
    * asserts agreement with the batch avg/var_pop to 1e-9.
    */
  def momentsPerKey(events: Dataset[SessionEvent]): Dataset[MomentsRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[MomentsState, MomentsRow](GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[SessionEvent], state: GroupState[MomentsState]) =>
          var st = state.getOption.getOrElse(MomentsState(0L, 0.0, 0.0))
          rows.toSeq.sortBy(_.ts_ms).foreach { ev =>
            val n1 = st.n + 1
            val d = ev.value - st.mean
            val mean1 = st.mean + d / n1
            st = MomentsState(n1, mean1, st.m2 + d * (ev.value - mean1))
          }
          state.update(st)
          MomentsRow(user, st.n, st.mean, if (st.n == 0) 0.0 else st.m2 / st.n)
      }
  }

  final case class HashedElem(key: String, h: Long)
  final case class KmvRow(key: String, n_mins: Long, theta: Long, estimate: Long)

  /** Streaming KMV ("theta") distinct-count sketch: per-key state is the
    * k minimum hash values seen (sorted, distinct) — a k-bounded merge
    * per micro-batch that is ORDER-INSENSITIVE by construction, so any
    * split of the stream into batches (and any replay/reshard) produces
    * the identical sketch the batch twin (`q_theta_sketch`) computes;
    * StreamingSpec asserts that split-parity. This is the streaming leg
    * of the persist-daily/rollup-anywhere sketch family: unlike the HLL
    * state Spark's own `approx_count_distinct` would keep, a KMV sketch
    * also INTERSECTS downstream (the batch entry's pairwise estimates).
    *
    * Estimate: exact count while the sketch holds < k values (θ emitted
    * as 0 — "sketch not yet saturated"), else (k−1)·2⁴⁸ div θ with θ the
    * kth minimum — callers feed 48-bit hashes (the md5-derived portable
    * hash the batch twin uses) so the division stays in long range.
    */
  def kmvDistinctPerKey(elems: Dataset[HashedElem], k: Int = 64): Dataset[KmvRow] = {
    import elems.sparkSession.implicits._
    elems
      .groupByKey(_.key)
      .mapGroupsWithState[Array[Long], KmvRow](GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[HashedElem], state: GroupState[Array[Long]]) =>
          val prev = state.getOption.getOrElse(Array.empty[Long])
          val merged = (prev ++ rows.map(_.h)).distinct.sorted.take(k)
          state.update(merged)
          if (merged.length < k)
            KmvRow(key, merged.length.toLong, 0L, merged.length.toLong)
          else
            KmvRow(key, k.toLong, merged.last,
              (k - 1).toLong * 281474976710656L / merged.last)
      }
  }

  final case class CmsItem(key: String, item: String)
  final case class CmsEstimate(key: String, probe: String, est: Long)

  /** Streaming Count-Min sketch per key: 4 rows × 256 buckets of counts,
    * bucket j of an item = two hex digits of its md5 (engine-portable,
    * like the KMV sketch's hash) — the FREQUENCY complement to
    * [[kmvDistinctPerKey]]'s distinct counting. State updates are pure
    * addition, so micro-batch merge is commutative: any split or replay
    * order produces the identical matrix, and the batch twin's exact SQL
    * replay IS the stream's converged answer (StreamingSpec asserts
    * split-parity). Per batch, emits the current estimate — min over the
    * 4 rows, the classic CM upper bound: est ≥ true count, inflated only
    * by collisions — for each of the fixed `probes`.
    *
    * Scale: state is 4·256 longs (8 KB) per key forever; the emitted
    * relation is |probes| rows per key per batch.
    */
  def countMinPerKey(items: Dataset[CmsItem], probes: Seq[String]): Dataset[CmsEstimate] = {
    import items.sparkSession.implicits._
    def buckets(item: String): Array[Int] = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(item.getBytes("UTF-8")).map("%02x".format(_)).mkString
      Array.tabulate(4)(j => Integer.parseInt(hex.substring(j * 2, j * 2 + 2), 16))
    }
    items
      .groupByKey(_.key)
      .flatMapGroupsWithState[Array[Long], CmsEstimate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[CmsItem], state: GroupState[Array[Long]]) =>
          val m = state.getOption.getOrElse(new Array[Long](4 * 256))
          rows.foreach { r =>
            val bs = buckets(r.item)
            var j = 0
            while (j < 4) { m(j * 256 + bs(j)) += 1L; j += 1 }
          }
          state.update(m)
          probes.iterator.map { p =>
            val bs = buckets(p)
            CmsEstimate(key, p, (0 until 4).map(j => m(j * 256 + bs(j))).min)
          }
      }
  }

  final case class KeyedRecord(shard: Int, key: String, payload: String)

  /** Streaming dedup with BOUNDED state: a bloom filter per shard instead
    * of the exact seen-key set `dropDuplicates` keeps. Exact streaming
    * dedup state grows with distinct keys forever (or needs a watermark
    * that forgets); a bloom filter is a fixed `m/8`-byte array per shard
    * no matter how many keys flow through — the trade every long-running
    * 100 TB/day dedup makes. Guarantee direction: a key once admitted is
    * NEVER admitted again (no duplicates downstream); a genuinely new key
    * can be falsely dropped with probability ~(set_bits/m)^k, sized by
    * m against expected cardinality. Emits admitted records (Append).
    * Shard by `hash(key) mod nShards` upstream so state parallelizes and
    * each filter sees ~1/nShards of the keyspace.
    */
  def bloomDedup(records: Dataset[KeyedRecord], mBits: Int = 1 << 16,
                 k: Int = 3): Dataset[KeyedRecord] = {
    require(mBits > 0 && mBits % 8 == 0, s"mBits must be a positive multiple of 8, got $mBits")
    require(k >= 1, s"k must be >= 1, got $k")
    import records.sparkSession.implicits._
    records
      .groupByKey(_.shard)
      .flatMapGroupsWithState[Array[Byte], KeyedRecord](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Int, rows: Iterator[KeyedRecord], state: GroupState[Array[Byte]]) =>
          val bits = state.getOption.getOrElse(new Array[Byte](mBits / 8))
          def probe(key: String, set: Boolean): Boolean = {
            var all = true
            var j = 0
            while (j < k) {
              // xxhash-style avalanche over (key, seed) — cheap, stateless
              var h = scala.util.hashing.MurmurHash3.stringHash(key, j * 0x9e3779b9)
              h = (h & Int.MaxValue) % mBits
              val (byte, bit) = (h >> 3, 1 << (h & 7))
              if ((bits(byte) & bit) == 0) {
                all = false
                if (set) bits(byte) = (bits(byte) | bit).toByte
              }
              j += 1
            }
            all
          }
          val out = rows.filter(r => !probe(r.key, set = true)).toList
          state.update(bits)
          out.iterator
      }
  }

  final case class DailyCount(key: String, day: Long, cnt: Long, ref: Long)
  final case class CusumState(lastDay: Long, s: Long)
  final case class CusumRow(key: String, day: Long, cnt: Long, ref: Long,
                            cusum: Long, alarm: Boolean)

  /** Streaming CUSUM: the `dq_cusum_shift` recurrence s ← max(0, s+(x−ref))
    * as O(1) per-key state — sustained-shift drift monitoring that raises
    * the alarm while the stream runs instead of at the nightly batch. Rows
    * fold in day order within a micro-batch; a day at or before the key's
    * last-seen day is dropped (replaying it would double-count into the
    * cumulative sum — the same late-data contract as [[ewmaPerKey]]).
    * StreamingSpec asserts the stream agrees with the batch fold across
    * micro-batch boundaries.
    */
  def cusumPerKey(counts: Dataset[DailyCount], alarmDays: Long = 5L): Dataset[CusumRow] = {
    import counts.sparkSession.implicits._
    counts
      .groupByKey(_.key)
      .flatMapGroupsWithState[CusumState, CusumRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[DailyCount], state: GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(CusumState(Long.MinValue, 0L))
          val out = scala.collection.mutable.ListBuffer.empty[CusumRow]
          rows.toSeq.sortBy(_.day).foreach { r =>
            if (r.day > st.lastDay) {
              val s1 = math.max(0L, st.s + (r.cnt - r.ref))
              st = CusumState(r.day, s1)
              out += CusumRow(key, r.day, r.cnt, r.ref, s1, s1 > alarmDays * r.ref)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  final case class ChangeEvent(key: Long, ts_ms: Long, seq: Long, op: String, payload: String)
  final case class CompactState(ts_ms: Long, seq: Long, op: String, payload: String)
  final case class CompactedRow(key: Long, ts_ms: Long, seq: Long, op: String,
                                payload: String, is_tombstone: Boolean)

  /** CDC log compaction: the materialized "current row per key" view of a
    * change stream — Kafka compacted-topic / CDC-upsert semantics as one
    * stateful operator. State is the newest change per key by the total
    * order (ts_ms, seq); ties and replays are absorbed because max is
    * idempotent and commutative — unlike the fold operators above, NO
    * within-batch sort is needed, so at-least-once redelivery in any
    * order converges to the same state. Emits the refreshed compacted row
    * for every key a micro-batch touches (Update mode); a tombstone op
    * keeps the key's burial visible downstream (the consumer deletes it
    * from the serving store — dropping it here would lose the delete).
    * O(1) state per key; the same operator in batch execution is the
    * oracle-checked `stream_latest_by_key` catalog entry.
    */
  def latestByKey(changes: Dataset[ChangeEvent],
                  tombstoneOp: String = "delete"): Dataset[CompactedRow] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.key)
      .mapGroupsWithState[CompactState, CompactedRow](GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[ChangeEvent], state: GroupState[CompactState]) =>
          var st = state.getOption.orNull
          rows.foreach { ev =>
            if (st == null || ev.ts_ms > st.ts_ms ||
                (ev.ts_ms == st.ts_ms && ev.seq > st.seq))
              st = CompactState(ev.ts_ms, ev.seq, ev.op, ev.payload)
          }
          state.update(st)
          CompactedRow(key, st.ts_ms, st.seq, st.op, st.payload, st.op == tombstoneOp)
      }
  }
}
