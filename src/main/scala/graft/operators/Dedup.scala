package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Deduplication operators for LLM-training-data pipelines.
  *
  * Scale design notes (the whole point of these implementations):
  *  - Exact dedup is one hash aggregate — Spark's map-side partial
  *    aggregation makes it a single shuffle of (hash, id) pairs, not text.
  *  - MinHash/SimHash/embedding near-dup all follow the LSH pattern:
  *    signature (narrow map) → band/bucket explode → shuffle on bucket →
  *    candidate pairs within buckets only → verify. The shuffle carries
  *    signatures (dozens of bytes/doc), never documents, and candidate
  *    verification joins back to per-doc shingle sets by id. Nothing is
  *    quadratic in the corpus; the only quadratic term is within-bucket,
  *    bounded by bucket size (salt/band-count tunes it).
  *  - The brute-force variants exist as correctness oracles and for small
  *    dimension tables; production entry points are the LSH ones.
  *  - Cache lifetime (caller-must-clear-cache): the near-dup operators
  *    persist their shingle-hash / fingerprint relations (read 2-4× by
  *    one plan) and cannot unpersist them before the lazily-consumed
  *    result is materialized. Long-lived sessions running many corpora
  *    should `spark.catalog.clearCache()` between batches (Bench does
  *    exactly this); one-shot jobs need nothing.
  */
object Dedup {

  /** Persist AND eagerly fill the cache before a plan fans out over it.
    *
    * A lazily-persisted relation read by several SIBLING query stages is
    * materialized by whichever readers get there first — and AQE submits
    * independent shuffle-map stages CONCURRENTLY, so the racing readers
    * EACH recompute the cached plan (the fill is per-block, uncoordinated;
    * symptom: "Asked to cache already cached data" / "Block rdd_N already
    * exists" warnings). r15 profile: `medoidRepresentatives`' shingle-hash
    * relation was computed 4× — four near-identical 6-task-second map
    * stages — behind one `persist`. One `count()` pays the pass exactly
    * once, up front; every fan-out reader then scans the cache. At 100 TB
    * the duplicated pass is a full corpus tokenize+hash, so the eager fill
    * is strictly cheaper whenever the fan-out is ≥ 2 (every caller here).
    * (`count()` on a freshly-persisted frame builds the full column
    * batches — InMemoryRelation materialization is not column-pruned.)
    */
  private[graft] def eagerPersist(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    p.count()
    p
  }

  /** Word n-gram shingles (distinct) per document.
    *
    * Built with nested `zip_with` over shifted slices instead of
    * `transform(sequence(...), i => slice(t, i, n))`: higher-order functions
    * are interpreted, so any subtree inside the lambda re-evaluates per
    * element — the slice formulation re-splits the text once per shingle
    * position (O(T²) per document). Here each slice evaluates the token
    * array a constant number of times and the lambdas touch only their
    * arguments.
    */
  def shingles(text: Column, n: Int = 3): Column =
    array_distinct(TextAnalysis.ngrams(text, n))

  /** Exact dedup: group identical texts, keep the smallest doc_id as the
    * representative. One hash aggregate over (md5, id) — at 100 TB group on
    * the md5, not the text, so the shuffle never carries document bodies.
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .select(md5(col("text")).as("fp"), col("doc_id"))
      .groupBy("fp")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("dup_cnt"))

  /** Exact n-gram Jaccard near-dup pairs via an inverted shingle index:
    * explode distinct shingles → self-join on shingle (hashed, not raw
    * text) → common-count per pair → integer-arithmetic threshold test
    * `common * 100 >= pct * (|A| + |B| - common)` (no floating point, so
    * any engine agrees bit-for-bit). Returns (doc_a < doc_b) pairs with
    * shingle counts.
    *
    * At scale: the join key is the 64-bit shingle hash; frequent shingles
    * (stopword runs) are the skew risk — cap them with a document-frequency
    * filter (`maxDf`), the standard trick, which also removes useless
    * evidence pairs.
    */
  /** Shared inverted-index preamble for the shingle-overlap operators:
    * the exploded (doc_id, n_sh, shingle-hash) relation (persisted —
    * every caller reads it at least twice), `maxDf`-pruned when asked.
    *
    * Persisted MEMORY_AND_DISK so a 100 TB corpus spills rather than
    * OOMs; ~24 bytes per (doc, shingle) — a fraction of the text it
    * derives from.
    *
    * Each posting row carries its doc's UNPRUNED distinct-shingle count
    * `n_sh` (`shingle_hashes` is distinct by construction, so
    * `size(hs)` = the old `groupBy(doc_id).count()`): the similarity
    * denominators ride the pair aggregate as `max(n_sh)` instead of two
    * doc-keyed count-joins AFTER it — r15 optimization, the
    * [[medoidRepresentatives]] discipline applied family-wide. Plan
    * effect per caller: the `counts` aggregate and both its join
    * exchanges disappear (6 → 3 exchanges in [[ngramJaccardPairs]]) for
    * +8 bytes per posting row in the one self-join shuffle.
    *
    * maxDf <= 0 disables document-frequency pruning (exact mode). Heavy
    * shingles are found with an aggregate (map-side partial counts,
    * shuffle at distinct-shingle cardinality) and removed with an
    * anti-join. No broadcast hint: the heavy-key count grows with corpus
    * size (~total occurrences / maxDf in the worst case), so forcing a
    * driver collect would be its own scale-killer — AQE broadcasts when
    * the aggregate output is actually small and shuffles otherwise.
    * Either way this beats the window count, which would shuffle AND
    * sort the exploded shingle table (the biggest intermediate in the
    * pipeline) just to compute document frequency.
    *
    * Note the deliberate asymmetry every caller shares: `n_sh` (the
    * similarity denominators) counts the UNPRUNED set, while pair
    * evidence joins on the pruned postings — pruning removes useless
    * evidence, not set cardinality.
    */
  private def shingleIndex(docs: DataFrame, n: Int, maxDf: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // eager fill: the posting relation is read by 2-3 SIBLING stages
    // (self-join sides, df prune) that would otherwise race the cache.
    // In EXACT mode (maxDf <= 0) the cache is HASH-PARTITIONED BY `h`
    // (r16): both pair self-join sides key on h, so paying ONE exchange
    // at cache build time lets the cached partitioning satisfy both join
    // inputs (guide §2.4: operations keyed the same way share one
    // exchange) — same bytes as ONE of the two old join exchanges, and
    // the same per-key skew those exchanges already had. With a maxDf
    // cap the cache deliberately stays unpartitioned: a pre-prune
    // repartition would concentrate every capped-out hot shingle's rows
    // in one task BEFORE the prune removes them, while the committed
    // shape's only full h-exchange carries post-prune (≤ maxDf per key)
    // rows — the skew bound the cap exists to provide.
    val raw = docs
      .select(col("doc_id"), call_function("shingle_hashes", col("text"), lit(n)).as("hs"))
      .select(col("doc_id"), size(col("hs")).cast("long").as("n_sh"),
        explode(col("hs")).as("h"))
    val sh = eagerPersist(if (maxDf <= 0) raw.repartition(col("h")) else raw)
    if (maxDf <= 0) sh else {
      val heavy = sh.groupBy("h").agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDf)
        .select("h")
      sh.join(heavy, Seq("h"), "left_anti")
    }
  }

  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, pct: Int = 80,
                        maxDf: Int = 1000): DataFrame = {
    val pruned = shingleIndex(docs, n, maxDf)
    pruned.as("a")
      .join(pruned.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      // n_sh is functionally dependent on the doc id — max() just carries it
      .agg(count(lit(1)).as("common"),
        max(col("a.n_sh")).as("n_sh_a"), max(col("b.n_sh")).as("n_sh_b"))
      .filter(col("common") * 100 >= lit(pct) * (col("n_sh_a") + col("n_sh_b") - col("common")))
      .select(col("doc_a"), col("doc_b"), col("common"), col("n_sh_a"), col("n_sh_b"))
  }

  /** Near-dup pairs TOUCHING a new-document batch: the probe side of the
    * shingle join is restricted to `isNew` docs while the index side
    * stays the full corpus — the daily-increment shape (cost ∝ batch ×
    * affected postings, not corpus²). Emits each qualifying pair once:
    * new-new pairs via the canonical `<` half, new-old pairs with the
    * new doc on the probe side regardless of id order. Old-old pairs are
    * deliberately ABSENT — an incremental consumer already holds
    * yesterday's labels for them (see `dedup_cc_incremental`, which
    * proves labels(labelEdges ∪ these pairs) == labels(all pairs)).
    * Same integer Jaccard threshold as [[ngramJaccardPairs]].
    */
  def incrementalPairs(docs: DataFrame, isNew: Column => Column, n: Int = 3,
                       pct: Int = 80, maxDf: Int = 0): DataFrame = {
    val pruned = shingleIndex(docs, n, maxDf)
    val probe = pruned.filter(isNew(col("doc_id")))
    probe.as("a")
      .join(pruned.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") =!= col("b.doc_id") &&
          (col("a.doc_id") < col("b.doc_id") || !isNew(col("b.doc_id"))))
      .groupBy(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      // denominators ride the aggregate, keyed to the canonical order
      .agg(count(lit(1)).as("common"),
        max(when(col("a.doc_id") < col("b.doc_id"), col("a.n_sh"))
          .otherwise(col("b.n_sh"))).as("n_sh_a"),
        max(when(col("a.doc_id") < col("b.doc_id"), col("b.n_sh"))
          .otherwise(col("a.n_sh"))).as("n_sh_b"))
      .filter(col("common") * 100 >= lit(pct) * (col("n_sh_a") + col("n_sh_b") - col("common")))
      .select(col("doc_a"), col("doc_b"))
  }

  /** Asymmetric near-dup detection: shingle CONTAINMENT |A∩B| / |A|
    * instead of Jaccard — the signal Jaccard misses when a small document
    * is wholly quoted inside a much larger one (|A∩B|/|A∪B| stays low
    * because the union is dominated by the big doc). This is the
    * Broder containment measure, the standard test for "is this document
    * subsumed by another" in training-data curation.
    *
    * Returns DIRECTED pairs (doc_in, doc_of, common, n_sh_in) where
    * ≥ pct% of doc_in's distinct shingles appear in doc_of — integer
    * threshold algebra (`common * 100 >= pct * |A|`), no floats, so any
    * engine agrees exactly. Same inverted-index shape and `maxDf` skew
    * cap as [[ngramJaccardPairs]]; the only structural difference is the
    * one-sided denominator and `!=` instead of `<` (containment is not
    * symmetric).
    */
  def containmentPairs(docs: DataFrame, n: Int = 3, pct: Int = 90,
                       maxDf: Int = 1000): DataFrame = {
    val pruned = shingleIndex(docs, n, maxDf)
    // common-shingle counts are symmetric: join/aggregate the canonical
    // a<b half once, then emit both directions — halves the heaviest
    // stage vs a direct `<>` self-join, which would feed every pair twice.
    // Both sides' denominators ride the aggregate (the shingleIndex n_sh
    // rule), so each emitted direction carries its own n_sh_in directly.
    val half = pruned.as("a")
      .join(pruned.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
      .agg(count(lit(1)).as("common"),
        max(col("a.n_sh")).as("n_sh_x"), max(col("b.n_sh")).as("n_sh_y"))
    // both directions from ONE generate (explode) — the old two-branch
    // union re-ran the persisted pair aggregate through racing cache fills
    half.select(explode(array(
        struct(col("x").as("doc_in"), col("y").as("doc_of"),
          col("common"), col("n_sh_x").as("n_sh_in")),
        struct(col("y").as("doc_in"), col("x").as("doc_of"),
          col("common"), col("n_sh_y").as("n_sh_in")))).as("s"))
      .select(col("s.doc_in").as("doc_in"), col("s.doc_of").as("doc_of"),
        col("s.common").as("common"), col("s.n_sh_in").as("n_sh_in"))
      .filter(col("common") * 100 >= lit(pct) * col("n_sh_in"))
  }

  /** The scale path for [[containmentPairs]]: PPJoin-style PREFIX
    * filtering with guaranteed total recall. A doc A is pct%-contained in
    * B only if at most `miss = floor((100-pct)·|A|/100)` of A's shingles
    * are absent from B — so ANY fixed subset of `miss + 1` of A's
    * shingles must share at least one element with B (pigeonhole).
    * Candidate generation therefore joins only A's first `miss + 1`
    * shingles (in canonical hash order) against the inverted index —
    * ~(100-pct)% of the probe volume instead of all of it — and the
    * exact intersection count is then computed for candidate pairs only.
    * Output EQUALS [[containmentPairs]] row-for-row; the driver checks it
    * against the same exact-SQL oracle.
    *
    * Refinement at 100 TB: order the prefix by ascending document
    * frequency (rarest shingles first, the PPJoin ordering) instead of
    * raw hash — same recall guarantee, far fewer candidates when the
    * corpus has heavy shingles. Hash order is kept here because it needs
    * no df pass and is deterministic for the oracle.
    */
  def containmentPairsPrefix(docs: DataFrame, n: Int = 3, pct: Int = 90,
                             maxDf: Int = 1000): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val pruned0 = shingleIndex(docs, n, maxDf)
    // shingleIndex already persisted the unpruned relation; only the
    // maxDf-pruned anti-join result is a new relation worth caching
    val pruned = if (maxDf > 0) pruned0.persist(lvl) else pruned0
    // prefix = first miss+1 shingles per doc in ascending-hash order:
    // rk <= (100-pct)·n_sh/100 + 1 ⟺ 100·rk <= (100-pct)·n_sh + 100.
    // maxDf <= 0 (the oracle path): derive it as a NARROW map over the
    // per-doc distinct hash array — no shuffle/sort of the exploded
    // shingle relation. maxDf > 0: the prefix must rank the PRUNED
    // relation (a pruned heavy shingle has no postings, so keeping it in
    // the prefix would silently spend miss budget on unmatchable keys),
    // which costs one doc_id-partitioned window over the pruned rows.
    val prefix =
      if (maxDf <= 0)
        shingleRelation(docs, n).select(col("doc_id"),
          explode(expr(s"slice(array_sort(hs), 1, (size(hs) * ${100 - pct}) div 100 + 1)"))
            .as("h"))
      else {
        // n_sh rides every posting row (shingleIndex), so the prefix rank
        // test needs no counts join
        val w = Window.partitionBy("doc_id").orderBy("h")
        pruned
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") * 100 <= (lit(100 - pct)) * col("n_sh") + lit(100))
          .select(col("doc_id"), col("h"))
      }
    val cand = prefix.as("a")
      .join(pruned.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("doc_in"), col("b.doc_id").as("doc_of"))
      .distinct()
      .persist(lvl)
    // exact verify for candidates only: A's shingles fanned onto the
    // candidate pairs, kept when present in B (semi-join on (doc_of, h));
    // the probe side's n_sh rides the aggregate — no counts join after
    cand
      .join(pruned.as("x"), col("doc_in") === col("x.doc_id"))
      .select(col("doc_in"), col("doc_of"), col("x.h").as("_ah"),
        col("x.n_sh").as("n_sh_in"))
      .join(pruned.as("y"),
        col("doc_of") === col("y.doc_id") && col("_ah") === col("y.h"), "left_semi")
      .groupBy("doc_in", "doc_of")
      .agg(count(lit(1)).as("common"), max(col("n_sh_in")).as("n_sh_in"))
      .filter(col("common") * 100 >= lit(pct) * col("n_sh_in"))
      .select(col("doc_in"), col("doc_of"), col("common"), col("n_sh_in"))
  }

  /** Pre-hashed distinct shingles for a document — the native one-pass
    * kernel (`shingle_hashes`, SketchExprs.scala): tokenize, hash each
    * token once, chain per window, dedupe; no intermediate n-gram
    * strings. Callers must have graft functions registered (GraftSession
    * does; operator entry points re-register defensively).
    */
  def shingleHashes(text: Column, n: Int = 3): Column =
    call_function("shingle_hashes", text, lit(n))

  /** Passage-level duplication: pairs of documents sharing at least one
    * n-token span (default 16 — long enough that a shared span is copied
    * text, not coincidence), with the count of shared distinct spans. The
    * span-granular sibling of document-level near-dup: training pipelines
    * use it to find boilerplate (headers, license blocks, templated pages)
    * that document-level Jaccard dilutes away.
    *
    * Same inverted-index shape as [[ngramJaccardPairs]]: explode spans,
    * self-join on the 64-bit span hash, count per pair. At scale the skew
    * risk IS the target — boilerplate spans have huge document frequency —
    * so `maxDf` both bounds the within-span quadratic term and drops spans
    * too common to be interesting evidence; the oracle path (maxDf = 0)
    * keeps everything.
    */
  def sharedSpanPairs(docs: DataFrame, n: Int = 16, maxDf: Int = 1000): DataFrame = {
    // same native-kernel index as the document-level operators — at n=16
    // spans the per-window string allocation the kernel removes is at its
    // most expensive
    val pruned = shingleIndex(docs, n, maxDf)
    pruned.as("a")
      .join(pruned.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_spans"))
  }

  /** The MAXIMAL shared token span per document pair — the surgical-removal
    * operator ("deduplicating training data makes language models better"):
    * [[sharedSpanPairs]] says WHICH pairs share copied text; this says
    * WHERE and HOW LONG, so a curation pipeline can cut the span instead of
    * dropping a document. Output per (doc_a < doc_b) pair: the longest
    * shared run's token length (`span_tokens`), its 0-based start token in
    * each document (`start_a`/`start_b`, deterministic smallest-position
    * tie-break), and the number of distinct shared runs (`n_spans`).
    *
    * Plan shape: the POSITIONAL shingle kernel (`shingle_hashes_pos` —
    * every n-token window's chained hash, in order) explodes to a
    * (doc_id, pos, h) index; matching windows join on the 64-bit hash
    * (ids+positions only — the shuffle never carries text); a shared run
    * is then a gaps-and-islands problem on the match diagonal: matches of
    * one contiguous copied region all satisfy `pos_a - pos_b = const` with
    * consecutive `pos_a`, so `pos_a - row_number()` within
    * (pair, diagonal) labels islands, and an L-window island is an
    * (L + n - 1)-token shared span. Every window is partitioned by
    * (doc_a, doc_b[, diag]) — nothing global.
    *
    * At 100 TB the skew risk is boilerplate windows with huge document
    * frequency (the within-window quadratic term of the hash join):
    * `maxDf` drops window hashes seen in more than that many DOCUMENTS
    * before the self-join, the same cap [[sharedSpanPairs]] applies — it
    * truncates runs through boilerplate regions (those regions get their
    * own heavy-span report) while bounding candidate volume by
    * `df² · |distinct windows|`. maxDf <= 0 keeps everything (exact mode).
    */
  def sharedSpans(docs: DataFrame, n: Int = 16, maxDf: Int = 1000): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val idx = docs
      .select(col("doc_id"),
        posexplode(call_function("shingle_hashes_pos", col("text"), lit(n)))
          .as(Seq("pos", "h")))
      // caller-must-clear-cache: read by both sides of the window join and
      // by the df prune; lives until the lazy result materializes
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pruned = if (maxDf <= 0) idx else {
      // df = distinct DOCUMENTS containing the window (positions repeat
      // within a doc); aggregate output is ~heavy-hash cardinality — AQE
      // broadcasts the anti-join side when it is actually small
      val heavy = idx.groupBy("h")
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") > maxDf)
        .select("h")
      idx.join(heavy, Seq("h"), "left_anti")
    }
    val matches = pruned.as("a")
      .join(pruned.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.pos").cast("long").as("pa"), col("b.pos").cast("long").as("pb"))
    // islands: within one (pair, diagonal), pa is unique (pb = pa - diag),
    // so consecutive matched windows differ by exactly 1 in pa
    val iw = Window.partitionBy("doc_a", "doc_b", "diag").orderBy(col("pa").asc)
    val islands = matches
      .withColumn("diag", col("pa") - col("pb"))
      .withColumn("isl", col("pa") - row_number().over(iw))
      .groupBy("doc_a", "doc_b", "diag", "isl")
      .agg(count(lit(1)).as("run_len"), min("pa").as("start_a"), min("pb").as("start_b"))
    val bw = Window.partitionBy("doc_a", "doc_b")
    val best = Window.partitionBy("doc_a", "doc_b")
      .orderBy(col("run_len").desc, col("start_a").asc, col("start_b").asc)
    islands
      .withColumn("n_spans", count(lit(1)).over(bw))
      .withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("doc_a"), col("doc_b"),
        (col("run_len") + lit(n - 1)).cast("long").as("span_tokens"),
        col("start_a"), col("start_b"), col("n_spans"))
  }

  /** MinHash + LSH banding: signature → `bands` buckets of `rows` hashes
    * each → explode (band, bucket-hash) → candidates share any bucket →
    * verified by exact Jaccard on shingle hashes. Output: candidate pairs
    * with their estimated (signature-agreement) and exact Jaccard×1000.
    */
  def minhashLshPairs(docs: DataFrame, numHashes: Int = 64, bands: Int = 16,
                      n: Int = 3, jaccardPctX10: Int = 800,
                      maxBucket: Int = 1000): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // shingle-hash array materialized once; signature and verification both
    // derive from it (one string-hash pass over the corpus total). Documents
    // with no shingles (< n tokens) are excluded — their degenerate
    // signatures would otherwise form one giant candidate clique.
    // Persisted: the plan reads this four times (bucket self-join sides +
    // verify joins); without it Spark re-runs scan→shingle→hash per read.
    // ~8·|shingles| bytes/doc, MEMORY_AND_DISK spills at corpus scale —
    // the same design MLlib's MinHashLSH applies to its transformed input.
    // eager fill (Dedup.eagerPersist): four sibling readers (bucket
    // self-join sides + verify joins) would otherwise race the cache and
    // re-tokenize the corpus each
    val withHs = eagerPersist(
      docs.select(col("doc_id"), shingleHashes(col("text"), n).as("hs"))
        .filter(size(col("hs")) > 0))
    minhashLshPairsFromHs(withHs, numHashes, bands, jaccardPctX10, maxBucket)
  }

  /** [[minhashLshPairs]] over a precomputed (doc_id, hs) shingle-hash
    * relation — callers that also need the hash arrays downstream (the
    * medoid's affinity postings) pass ONE persisted relation here instead
    * of tokenizing and hashing the corpus twice.
    */
  def minhashLshPairsFromHs(withHs: DataFrame, numHashes: Int = 64,
                            bands: Int = 16, jaccardPctX10: Int = 800,
                            maxBucket: Int = 1000): DataFrame = {
    graft.functions.GraftFunctions.register(withHs.sparkSession)
    // band bucket = hash of the band's signature slice (statically unrolled)
    val buckets = bandBuckets(withHs, numHashes, bands, maxBucket)
    val candidates = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // verify candidates with exact Jaccard over shingle-hash sets — the
    // fused native expression: one pass per pair, no intermediate
    // intersect/union arrays (this is the tightest loop in the family)
    val sets = withHs
    candidates
      .join(sets.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sets.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        call_function("jaccard_x1000", col("sa.hs"), col("sb.hs")).as("jaccard_x1000"))
      // both sides are per-mille: jaccardPctX10 = 800 means j >= 0.800
      .filter(col("jaccard_x1000") >= jaccardPctX10)
  }

  /** Estimator audit for the minhash family: every verified near-dup
    * pair scored BOTH ways — signature agreement (matching components ×
    * 1000 / numHashes, the estimate LSH banding is built on) beside the
    * exact Jaccard the verification already computed. The absolute error
    * is binomial: σ = √(j(1−j)/numHashes) ≈ 0.05 at j = 0.8, n = 64, so
    * the catalog entry's 250‰ band is 5σ — a violation means the
    * signature kernel (not sampling noise) is broken. One zip_with fold
    * per pair over already-verified pairs only — the audit costs nothing
    * at corpus scale.
    */
  def minhashEstimateError(docs: DataFrame, numHashes: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val sigs = docs
      .select(col("doc_id"), shingleHashes(col("text"), 3).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("doc_id"),
        call_function("minhash_sig", col("hs"), lit(numHashes)).as("sig"))
    minhashLshPairs(docs, numHashes)
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("siga")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sigb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("jaccard_x1000"),
        expr(s"""aggregate(zip_with(siga, sigb, (a, b) -> IF(a = b, 1L, 0L)),
          0L, (acc, x) -> acc + x) * 1000 div $numHashes""").as("est_x1000"))
  }

  /** (doc_id, band, bucket) LSH band buckets from a (doc_id, hs) relation —
    * ids only, the payload joins back by id (the shuffle-volume rule every
    * LSH operator here follows). Shared by the self-join pair finder and the
    * incremental batch-vs-corpus filter.
    *
    * `maxBucket > 0` drops buckets holding more doc_ids than that (per
    * band) before any candidate join — the [[graft.operators.Imaging
    * .dhashNearDupPairs]] hot-bucket discipline, ported here per the r12
    * verdict: the bucket VALUE domain is content-derived (xxhash64, 2^64)
    * so random collisions are no concern, but k documents with identical
    * signatures — exact-dup cliques, 30-60% of crawl text — form ONE
    * bucket and k²·bands candidate rows. "Run exact dedup first" is
    * convention; the cap is the contract. A clique past the cap still
    * dedups: exact/[[exactNormalized]] owns identical text, and the capped
    * clique's members keep their OTHER evidence only if genuinely similar
    * to something outside it. maxBucket <= 0 disables (exact mode).
    */
  private def bandBuckets(withHs: DataFrame, numHashes: Int, bands: Int,
                          maxBucket: Int): DataFrame = {
    val rows = numHashes / bands
    val rawPlan = withHs
      .select(col("doc_id"),
        call_function("minhash_sig", col("hs"), lit(numHashes)).as("sig"))
      .select(
        col("doc_id"),
        explode(array((0 until bands).map { b =>
          val cols = (1 to rows).map(k => element_at(col("sig"), b * rows + k))
          struct(lit(b).as("band"), xxhash64(cols :+ lit(b): _*).as("bucket"))
        }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
    // eager-persisted on the prune path (r16): the 64-chain minhash
    // signature pass is the expensive part, and with a cap this relation
    // has 3 readers (hot-bucket aggregate, anti-join probe, and the
    // caller's self-join sides read its output twice) that each re-ran
    // it — the cache holds (doc_id, band, bucket) rows only, never the
    // hash arrays. Exact mode stays lazy: its single-reader callers
    // (hot-bucket observables, witness twins) would pay the fill job
    // for nothing.
    val raw = if (maxBucket <= 0) rawPlan else eagerPersist(rawPlan)
    if (maxBucket <= 0) raw else {
      // aggregate + anti join, no broadcast hint (hot-bucket cardinality
      // grows with the corpus)
      val hot = raw.groupBy("band", "bucket").agg(count(lit(1)).as("bn"))
        .filter(col("bn") > maxBucket).select("band", "bucket")
      raw.join(hot, Seq("band", "bucket"), "left_anti")
    }
  }

  /** Incremental dedup — the shape a production corpus runs daily: filter an
    * incoming batch against the already-accepted corpus, without re-pairing
    * the corpus against itself. Both sides get minhash band buckets; the
    * batch→corpus bucket equi-join (ids only) proposes candidates, exact
    * Jaccard over the shingle-hash sets verifies them, and the batch
    * anti-joins away every doc with a verified corpus near-dup.
    *
    * At scale the corpus side is a persisted index table keyed
    * (band, bucket) — this relation IS that index's schema, so the daily
    * cost is one batch-sized scan + an equi-join into it, never a corpus
    * self-join. Batch-internal duplicates are deliberately untouched
    * (that's [[minhashLshPairs]] + [[dropNearDuplicates]] on the batch).
    */
  /** (doc_id, hs) shingle-hash relation — the per-document set both the
    * bucket index and the Jaccard verify derive from. Callers that read it
    * more than once (every LSH composition here does) persist it; the
    * streaming wrapper persists the corpus side once per query, not per
    * micro-batch.
    */
  def shingleRelation(docs: DataFrame, n: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id"), shingleHashes(col("text"), n).as("hs"))
      .filter(size(col("hs")) > 0)
  }

  /** (doc_id, ph) DISTINCT md5 hashes of `words`-token paragraphs — the
    * index unit of paragraph-level dedup (the streaming twin of the
    * `text_paragraph_dedup` catalog entry's granularity). 16 bytes per
    * distinct paragraph; document text never leaves the map stage.
    */
  def paragraphHashes(docs: DataFrame, words: Int = 10): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 1)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, (size(t) + ${words - 1}) div $words - 1), " +
          s"i -> md5(array_join(slice(t, i * $words + 1, $words), ' ')))")).as("ph"))
      .distinct()

  /** Batch doc ids whose paragraph-hash CONTAINMENT in the corpus index
    * reaches `dropPm` per-mille — a doc assembled mostly from known
    * boilerplate drops even if never seen verbatim (containment, not
    * equality, is the right predicate at paragraph granularity). One
    * equi-join on 16-byte hashes + one per-doc aggregate.
    */
  def paragraphMatchedIds(corpusPh: DataFrame, batchPh: DataFrame,
                          dropPm: Int = 600): DataFrame = {
    val known = corpusPh.select(col("ph")).distinct()
      .withColumn("known", lit(1L))
    batchPh.join(known, Seq("ph"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("total"),
        sum(coalesce(col("known"), lit(0L))).as("shared"))
      .filter(col("shared") * 1000 >= lit(dropPm) * col("total"))
      .select(col("doc_id"))
  }

  def incrementalFilter(corpus: DataFrame, batch: DataFrame,
                        numHashes: Int = 64, bands: Int = 16,
                        n: Int = 3, jaccardPctX10: Int = 800,
                        maxBucket: Int = 1000): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // each side read twice (bucket build + Jaccard verify) — persist both
    val corpusHs = shingleRelation(corpus, n).persist(lvl)
    val batchHs = shingleRelation(batch, n).persist(lvl)
    incrementalFilterAgainst(corpusHs, batchHs, batch, numHashes, bands,
      jaccardPctX10, maxBucket)
  }

  /** The corpus-side minhash buckets [[incrementalFilterAgainst]] EXCLUDES
    * at cap `maxBucket` — the observable for the cap's recall trade-off:
    * `(band, bucket, bn)` per hot bucket. One aggregate over the ids-only
    * bucket relation; a streaming caller computes it once per query (the
    * corpus index is static per query) and surfaces the count to
    * operators ([[graft.streaming.StreamOps.dedupAgainstCorpus]]'s
    * `onHotBuckets`).
    */
  def minhashHotBuckets(corpusHs: DataFrame, numHashes: Int = 64,
                        bands: Int = 16, maxBucket: Int = 1000): DataFrame =
    bandBuckets(corpusHs, numHashes, bands, maxBucket = 0)
      .groupBy("band", "bucket").agg(count(lit(1)).as("bn"))
      .filter(col("bn") > maxBucket)

  /** [[incrementalFilter]] with caller-managed shingle relations — the
    * streaming path: the corpus index is persisted once per query and each
    * micro-batch's relation is unpersisted after its sink commits.
    *
    * CALLER-FACING RECALL CONTRACT (r13 ADVICE — the default changed in
    * r13 from uncapped to `maxBucket = 1000`): a batch document whose ONLY
    * corpus evidence lives in buckets hotter than the cap PASSES the
    * filter. Concretely, a NEAR-duplicate (not byte-identical) of a
    * corpus cluster with more than `maxBucket` members is admitted by
    * default; exact/[[exactNormalized]] dedup owns byte-identical text,
    * but the near-dup residue of a hot cluster is this cap's deliberate,
    * bounded recall hole — the price of the candidates ≤ bands·maxBucket·n
    * guarantee. Operators who need to SEE the trade-off query
    * [[minhashHotBuckets]] (same cap, same banding) — a non-empty result
    * means the hole is live on this corpus; `maxBucket <= 0` restores the
    * old uncapped behavior where the index itself is known-clean.
    */
  def incrementalFilterAgainst(corpusHs: DataFrame, batchHs: DataFrame,
                               batch: DataFrame,
                               numHashes: Int = 64, bands: Int = 16,
                               jaccardPctX10: Int = 800,
                               maxBucket: Int = 1000): DataFrame = {
    graft.functions.GraftFunctions.register(batch.sparkSession)
    // hot-bucket cap on the CORPUS index side (the side that grows without
    // bound); a micro-batch is operator-bounded by construction
    val candidates = bandBuckets(batchHs, numHashes, bands, maxBucket = 0).as("nb")
      .join(bandBuckets(corpusHs, numHashes, bands, maxBucket).as("cb"),
        col("nb.band") === col("cb.band") && col("nb.bucket") === col("cb.bucket"))
      .select(col("nb.doc_id").as("batch_id"), col("cb.doc_id").as("corpus_id"))
      .distinct()
    val matched = candidates
      .join(batchHs.as("sa"), col("batch_id") === col("sa.doc_id"))
      .join(corpusHs.as("sb"), col("corpus_id") === col("sb.doc_id"))
      .filter(call_function("jaccard_x1000", col("sa.hs"), col("sb.hs")) >= jaccardPctX10)
      .select(col("batch_id").as("doc_id")).distinct()
    batch.join(matched, Seq("doc_id"), "left_anti")
  }

  /** Blocked edit-distance near-dup pairs — the entity-resolution
    * formulation: candidate pairs come from an equi-join on a cheap
    * blocking key (source + length bucket), and only those pairs pay the
    * Levenshtein DP. The distance runs on a bounded prefix with an
    * early-exit threshold (Spark's 3-arg `levenshtein` is banded
    * O(len·maxDist), returning -1 past the bound), so per-pair cost is
    * capped regardless of document size.
    *
    * At scale: the blocking join is an ordinary shuffle equi-join on
    * (source, bucket) — pair count is Σ block², controlled by the bucket
    * width, never corpus². Pairs straddling a bucket boundary are missed
    * by design (the declared blocking contract); run a second pass with
    * buckets offset by half a width when boundary recall matters, or use
    * [[minhashLshPairs]] when blocking keys aren't available.
    *
    * The DP runs as the join's residual predicate (Catalyst pushes the
    * `dist >= 0` filter into the join), so DP parallelism = join STREAM
    * side width. The build side is bounded (ids + 100-char prefixes) and
    * broadcasts, which leaves the stream side at SCAN-split width — a
    * corpus that fits in one parquet split would run the only
    * compute-bound loop of the pipeline single-task (measured: the whole
    * sf0.1 DP serialized into one task behind a 594 KB scan). The
    * explicit round-robin repartition pins the stream side to the
    * configured shuffle width instead: it moves only the bounded
    * projection (never full text), and AQE cannot coalesce an
    * explicit-N repartition. CPU-bound stages size by cores, not bytes —
    * size-based split/coalesce logic is the wrong ruler here.
    */
  def editDistancePairs(docs: DataFrame, prefixLen: Int = 100, maxDist: Int = 55,
                        bucketChars: Int = 25): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val b = docs.select(col("doc_id"), col("source"),
      expr(s"n_chars div $bucketChars").as("len_bucket"),
      substring(col("text"), 1, prefixLen).as("prefix"))
    val shufflePartitions = docs.sparkSession.sessionState.conf.numShufflePartitions
    // bounded_levenshtein = Myers bit-parallel kernel, contract-identical
    // to levenshtein(a, b, maxDist): ~15 word ops per text char per 64
    // pattern rows vs the banded DP's O(len·maxDist) cell updates
    b.repartition(shufflePartitions).as("a").join(b.as("b"),
        col("a.source") === col("b.source") &&
        col("a.len_bucket") === col("b.len_bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        call_function("bounded_levenshtein",
          col("a.prefix"), col("b.prefix"), lit(maxDist)).as("dist"))
      .filter(col("dist") >= 0)
  }

  /** The dedup *filter*: keep one representative per near-duplicate
    * cluster — the operation a training pipeline actually applies after
    * pair detection. Greedy by id: a document survives unless it is the
    * higher-id member of some near-dup pair. (For chains a–b, b–c this
    * keeps only `a` — transitive dedup without iterative connected
    * components, the standard corpus-dedup compromise; exact CC would need
    * an iterative join loop.) Pairs come from [[ngramJaccardPairs]] (exact)
    * or [[minhashLshPairs]] (scale path) — any (doc_a < doc_b) pair frame.
    */
  def dropNearDuplicates(docs: DataFrame, pairs: DataFrame): DataFrame =
    docs.join(pairs.select(col("doc_b").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")

  /** Transitive near-dup clustering: connected components over the pair
    * graph by alternating large-star/small-star contraction (Kiveris et
    * al., "Connected Components in MapReduce and Beyond"). Each round
    * rewrites the canonical `(hi, lo)` edge set twice:
    *
    *  - large-star: every node links its LARGER neighbors to the minimum
    *    of its closed neighborhood, halving long paths;
    *  - small-star: every node links its smaller neighbors (and itself)
    *    to that minimum, collapsing the result toward a star.
    *
    * The edge set converges to a star forest rooted at each component's
    * minimum id in ~log₂(diameter) rounds — vs the diameter-many rounds
    * of plain min-label propagation, where a localCheckpoint barrier per
    * round made long chains (and contended boxes) multiply a fixed
    * scheduler cost. One `localCheckpoint` per round (after small-star)
    * truncates lineage — a round's plan embeds several copies of the
    * previous round's, so without truncation the driver-side optimizer
    * cost doubles per round (the same fix GraphFrames ships for its CC
    * loop). Each star phase is one partitioned WINDOW (min over the
    * neighborhood key) feeding its emit projection — r15: the old
    * groupBy+join spelling shuffled the adjacency twice per phase and left
    * a persisted intermediate that small-star's two readers raced
    * (duplicate cache fills); both row-doubling emits are single-pass
    * generates (explode), not two-branch unions.
    * Local checkpoints trade fault-tolerance for speed — an executor loss
    * mid-query forces a rerun — the right trade inside one query; jobs
    * needing cross-query restartability should write labels to a table
    * between rounds instead.
    *
    * Convergence = the edge multiset reproduces itself through a round
    * (count + xxhash64 signature, confirmed structurally: the final edge
    * set must be a star forest — no `lo` endpoint may appear as a `hi` —
    * or this throws rather than returning plausible-but-wrong clusters).
    *
    * Returns (doc_id, cluster_id) for every document incident to a pair,
    * cluster_id = min doc_id of its component.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame =
    connectedComponentsWithRounds(pairs, maxIter)._1

  /** [[connectedComponents]] plus the number of large-star/small-star
    * rounds executed (including the final self-reproducing confirmation
    * round) — exposed so ScaleSpec can assert the log-round guarantee on
    * a planted long chain.
    */
  def connectedComponentsWithRounds(pairs: DataFrame, maxIter: Int = 25): (DataFrame, Int) = {
    // canonical undirected edge set: hi > lo, deduped. Reads `pairs` once.
    var e = pairs
      .select(greatest(col("doc_a"), col("doc_b")).as("hi"),
        least(col("doc_a"), col("doc_b")).as("lo"))
      .filter(col("hi") =!= col("lo")).distinct()
      .localCheckpoint(eager = true)
    // order-independent set signature (bit_xor cannot overflow under ANSI
    // arithmetic, unlike sum); equal signatures across a round mean the
    // round was an identity rewrite (a fixpoint)
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), bit_xor(xxhash64(col("hi"), col("lo")))).first()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var sig = signature(e)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxIter) {
      // large-star over the symmetric adjacency: node u sends neighbors
      // v > u to m = min(Γ(u) ∪ {u}); emitted (v, m) keeps hi > lo.
      // Both directions come from ONE generate (explode) instead of
      // `union(select(hi,lo), select(lo,hi))` — sibling union branches
      // scan the upstream twice, concurrently (r15).
      // The neighborhood minimum is a hash AGGREGATE + join back, NOT a
      // window (r16, reverting half of r15): a window partition is
      // unsplittable and buffers the whole neighborhood in one task, and
      // in CC the component-minimum node's degree approaches component
      // size after the first rounds — one giant dup cluster at 100 TB
      // would serialize on a single window task. The aggregate has
      // map-side partial min (a hot node's rows combine locally before
      // the exchange carries one row per (task, node)), and the join of
      // the node-keyed mins back onto the adjacency is the
      // AQE-skew-splittable shape (guide §2.5: the mins side is one row
      // per key, so the skewed adjacency partition can be split). `sym`
      // is re-derived per reader from the CHECKPOINTED edge set, so the
      // two reads cost two scans of materialized rows, not two runs of
      // the pair pipeline — no raced persisted intermediate.
      val sym = e.select(explode(array(
          struct(col("hi").as("u"), col("lo").as("v")),
          struct(col("lo").as("u"), col("hi").as("v")))).as("s"))
        .select(col("s.u").as("u"), col("s.v").as("v"))
      val mins = sym.groupBy("u")
        .agg(least(col("u"), min("v")).as("m"))
      val large = sym.where(col("v") > col("u"))
        .join(mins, "u")
        .select(col("v").as("hi"), col("m").as("lo"))
        .filter(col("hi") =!= col("lo")).distinct()
        // materialized so small-star's two readers (mins aggregate +
        // join) scan rows instead of re-running the large-star join
        .localCheckpoint(eager = true)
      // small-star: node hi sends its smaller neighbors (and itself) to
      // m = min(Γ_small(hi)); both emissions keep hi > lo, the (hi, m)
      // self-row branch (one per EDGE here, one per node in the old
      // groupBy form) dedups in the terminal distinct. Same skew-safe
      // aggregate+join shape as large-star.
      val smins = large.groupBy("hi").agg(min("lo").as("m"))
      val next = large.join(smins, "hi")
        .select(explode(array(
          struct(col("lo").as("n"), col("m")),
          struct(col("hi").as("n"), col("m")))).as("s"))
        .where(col("s.n") =!= col("s.m"))
        .select(col("s.n").as("hi"), col("s.m").as("lo"))
        .distinct()
        .localCheckpoint(eager = true) // one lineage barrier per round
      val nsig = signature(next)
      converged = nsig == sig
      sig = nsig
      e = next
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds; " +
          s"two-phase CC needs ~log2(diameter) rounds — raise maxIter")
    // structural confirmation: a star forest has no edge whose root (`lo`)
    // is itself a child (`hi`) elsewhere. Guards both the 2^-64 signature
    // collision and any algorithmic regression — fail loudly over
    // returning plausible-but-wrong clusters.
    val notStar = e.join(e.select(col("hi").as("lo")), Seq("lo"), "left_semi").count()
    if (notStar > 0)
      throw new IllegalStateException(
        s"connectedComponents fixpoint is not a star forest ($notStar chained edges)")
    val labels = e.select(explode(array(
        struct(col("hi").as("doc_id"), col("lo").as("cluster_id")),
        struct(col("lo").as("doc_id"), col("lo").as("cluster_id")))).as("s"))
      .select(col("s.doc_id").as("doc_id"), col("s.cluster_id").as("cluster_id"))
      .distinct()
    (labels, rounds)
  }

  /** Medoid representative per near-dup cluster: the MOST CENTRAL member
    * (max summed pairwise Jaccard affinity, tie → min id) instead of
    * min-id — the curation-quality upgrade when a cluster mixes a clean
    * original with truncated/mangled copies. Clusters come from
    * [[minhashLshPairs]] + [[connectedComponents]]; affinity comes from
    * the shingle-POSTING pair relation ([[ngramJaccardPairs]] at pct=0,
    * `maxDf` skew cap counted PER (shingle, cluster) so the cap tracks
    * per-cluster posting width — a shingle shared by several small
    * clusters is not pruned just because its global member df is high —
    * denominators on the unpruned counts, the text_containment_maxdf
    * discipline), restricted to intra-cluster pairs. Members whose every
    * pair evidence was pruned (or who share no shingle with any cluster
    * sibling) get affinity 0.
    *
    * Scale: only ids and integer counts cross the pair shuffles —
    * shingle-hash ARRAYS never do — and the pair join keys on
    * (h, cluster_id) with each group capped at `maxDf` rows, so fan-out
    * is ≤ maxDf² per (shingle, cluster), independent of cluster width:
    * one boilerplate mega-cluster cannot make the affinity stage
    * quadratic (ScaleSpec plants one and checks both properties).
    *
    * Returns (cluster_id, medoid_doc, affinity_x1000, members).
    */
  def medoidRepresentatives(docs: DataFrame, n: Int = 3, maxDf: Int = 5): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // caller-must-clear-cache: the hash arrays feed both the LSH
    // clustering and the affinity postings; the labels are read by the
    // affinity join and the members aggregate of one lazily-consumed plan.
    // EAGER fills (r15): these relations each have several sibling-stage
    // readers; lazy persist let the racing fills re-tokenize the corpus
    // four times (four near-identical 6-task-second map stages in the
    // profile)
    val withHs = eagerPersist(
      docs.select(col("doc_id"), shingleHashes(col("text"), n).as("hs"))
        .filter(size(col("hs")) > 0))
    val cc = eagerPersist(connectedComponents(minhashLshPairsFromHs(withHs)))
    // affinity evidence is only consumed for intra-cluster pairs, so the
    // posting index covers cluster MEMBERS only and carries the cluster
    // label from the start (at 100 TB that is the dup fraction of the
    // corpus, not the corpus), derived from the SAME cached hash arrays
    // the LSH signatures came from — one tokenize+hash pass total.
    // each posting row carries its doc's UNPRUNED set size (hs is
    // distinct by construction, so size() = n_sh) — the Jaccard
    // denominators ride the pair aggregate for free instead of two
    // count-joins after it
    val msh = eagerPersist(withHs.join(cc, "doc_id")
      .select(col("cluster_id"), col("doc_id"),
        size(col("hs")).cast("long").as("n_sh"), explode(col("hs")).as("h")))
    val pruned = if (maxDf <= 0) msh else {
      // df per (shingle, CLUSTER) — the cap's rationale is per-cluster
      // posting width, so the count must match it (r10 advice: a global
      // member df let a shingle shared by several small clusters exceed
      // the cap and be pruned everywhere even though no single cluster
      // was wide). A mega-cluster's width is still its per-cluster df, so
      // the boilerplate skew bound is unchanged; the pair join below
      // keys on (h, cluster_id), so each join group stays ≤ maxDf rows.
      val heavy = msh.groupBy("h", "cluster_id").agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDf).select("h", "cluster_id")
      msh.join(heavy, Seq("h", "cluster_id"), "left_anti")
    }
    // the self-join keys on (h, cluster): only intra-cluster pairs are
    // ever formed, bounded per shingle by its capped member-df
    val jp = pruned.as("a").join(pruned.as("b"),
        col("a.h") === col("b.h") && col("a.cluster_id") === col("b.cluster_id") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.cluster_id").as("cluster_id"),
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"),
        max(col("a.n_sh")).as("n_sh_a"), max(col("b.n_sh")).as("n_sh_b"))
      .select(col("cluster_id"), col("doc_a"), col("doc_b"),
        expr("common * 1000 div (n_sh_a + n_sh_b - common)").as("jx"))
    // one generate emits both endpoints — a two-branch union would run
    // the (unpersisted) pair aggregate twice
    val aff0 = jp.select(explode(array(
        struct(col("cluster_id"), col("doc_a").as("a"), col("jx")),
        struct(col("cluster_id"), col("doc_b").as("a"), col("jx")))).as("s"))
      .groupBy(col("s.cluster_id").as("cluster_id"), col("s.a").as("a"))
      .agg(sum(col("s.jx")).as("aff0"))
    val scored = cc.select(col("cluster_id"), col("doc_id").as("a"))
      .join(aff0, Seq("cluster_id", "a"), "left")
      .select(col("cluster_id"), col("a"),
        coalesce(col("aff0"), lit(0L)).as("aff"))
    // one window pass yields both the medoid rank and the member count
    val wp = Window.partitionBy("cluster_id")
    val w = wp.orderBy(col("aff").desc, col("a").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .withColumn("members", count(lit(1)).over(wp))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("a").as("medoid_doc"),
        col("aff").cast("long").as("affinity_x1000"), col("members"))
  }

  /** Winnowing fingerprints (Schleimer–Wilkerson–Aiken 2003, the MOSS
    * algorithm): positional k-gram hashes; every window of `w`
    * consecutive hashes selects its MINIMUM; the distinct selected
    * hashes are the document's fingerprints. Guarantees: any shared run
    * of ≥ w + k − 1 tokens produces at least one shared fingerprint
    * (detection floor), while only ~2/(w+1) of the k-grams are kept
    * (storage bound) — the standard position-robust middle ground
    * between exact-hash dedup (brittle) and full shingle indexes
    * (large).
    *
    * The k-gram hash is the md5-prefix 48-bit integer (the theta-sketch
    * trick): unlike the xxhash minhash family, the SELECTION (a min over
    * hash VALUES) replays exactly in DuckDB, so the operator gets a
    * full-value oracle, not a rows-only check.
    *
    * Output: (doc_a, doc_b, shared_fps) candidate pairs sharing ≥ 1
    * fingerprint, `maxDf`-capped on the fingerprint posting lists (the
    * same skew rule as the containment family: a boilerplate fingerprint
    * shared by k docs costs cap·k join rows, never k²). The per-doc
    * window-min is a doc-partitioned frame — never a global window.
    */
  def winnowingPairs(docs: DataFrame, k: Int = 4, w: Int = 4,
                     maxDf: Int = 5): DataFrame = {
    // caller-must-clear-cache: the fingerprint relation is read by the
    // df aggregate and both sides of the pair self-join
    val fps = winnowingFingerprints(docs, k, w)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pruned = if (maxDf <= 0) fps else {
      val heavy = fps.groupBy("fp").agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDf).select("fp")
      fps.join(heavy, Seq("fp"), "left_anti")
    }
    pruned.as("a").join(pruned.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
  }

  /** The distinct (doc_id, fp) winnowing-fingerprint relation behind
    * [[winnowingPairs]] — exposed so the streaming incremental twin can
    * index a corpus once and probe it per micro-batch. Docs shorter than
    * k + w − 1 tokens have no full window and are absent. The per-doc
    * window-min is doc-partitioned, never global.
    */
  def winnowingFingerprints(docs: DataFrame, k: Int = 4, w: Int = 4): DataFrame = {
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= k + w - 1)
    val kh = toks.select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, size(t) - $k), i -> " +
            s"cast(conv(substring(md5(concat_ws(' ', slice(t, i + 1, $k))), 1, 12), 16, 10) as bigint))")))
      .select(col("doc_id"), col("pos"), col("col").as("h"))
    val dw = Window.partitionBy("doc_id")
    val mw = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    kh
      .withColumn("nk", count(lit(1)).over(dw))
      .withColumn("fp", min("h").over(mw))
      .filter(col("pos") <= col("nk") - w) // full windows only
      .select(col("doc_id"), col("fp")).distinct()
  }

  /** Batch doc ids whose winnowing-fingerprint CONTAINMENT in the corpus
    * index reaches `dropPm` per-mille — the fingerprint-granular sibling
    * of [[paragraphMatchedIds]]: winnowing's detection floor means any
    * shared run of ≥ w + k − 1 tokens contributes shared fingerprints,
    * so a doc stitched from known passages drops without a verbatim (or
    * paragraph-aligned) match. One equi-join on 8-byte fingerprints + one
    * per-doc aggregate; docs with no fingerprints (< k + w − 1 tokens)
    * are absent and therefore survive.
    */
  def winnowingMatchedIds(corpusFp: DataFrame, batchFp: DataFrame,
                          dropPm: Int = 600): DataFrame = {
    val known = corpusFp.select(col("fp")).distinct()
      .withColumn("known", lit(1L))
    batchFp.join(known, Seq("fp"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("total"),
        sum(coalesce(col("known"), lit(0L))).as("shared"))
      .filter(col("shared") * 1000 >= lit(dropPm) * col("total"))
      .select(col("doc_id"))
  }

  // SimHash/MinHash signature math lives in graft.functions.SketchExprs as
  // native codegen expressions (the HOF formulation pays per-element lambda
  // dispatch and, worse, re-evaluates captured subtrees — see BENCH.md).

  /** Hamming distance between two packed-64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** (doc_id, fp) 64-bit SimHash fingerprints — the shared input of the
    * banded ([[simhashPairsFromFp]]) and brute-force ([[simhashBrutePairs]])
    * pair generators. 16 bytes/doc; callers that feed both generators should
    * persist it so the corpus is tokenized and hashed once.
    */
  def simhashFingerprints(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col("doc_id"),
        transform(TextAnalysis.tokens(col("text")), w => xxhash64(w)).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("doc_id"), call_function("simhash64", col("hs")).as("fp"))
  }

  /** SimHash near-dup pairs with banding: 4 chunks of 16 bits; any equal
    * chunk → candidate (guarantees recall for hamming ≤ 3) → verify
    * hamming ≤ `maxHamming`.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    // read by both sides of the chunk self-join — persist rather than
    // re-tokenize and re-hash the corpus twice
    val withFp = simhashFingerprints(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    simhashPairsFromFp(withFp, maxHamming)
  }

  /** Banded pair generation over a precomputed fingerprint relation.
    *
    * `maxBucket` is the hot-bucket exclusion every banded family here
    * carries (r12/r13 discipline): a 16-bit chunk value shared by more
    * than `maxBucket` documents (exact-dup fingerprint cliques; at
    * corpus scale, ANY chunk value once n ≫ 4·65536) is quadratic
    * candidate volume; excluding it bounds candidates at ≤ 4·maxBucket·n.
    * The pigeonhole recall guarantee (hamming ≤ 3 cannot miss) holds
    * UNCONDITIONALLY only in exact mode (maxBucket <= 0) — capped, it
    * holds for every pair outside hot buckets, which at fixture scale is
    * every pair (the witness entry checks exactly that), and past ~10⁷
    * docs a 64-bit simhash needs wider banding regardless.
    */
  def simhashPairsFromFp(withFp: DataFrame, maxHamming: Int = 3,
                         maxBucket: Int = 1000): DataFrame = {
    val raw = withFp.select(col("doc_id"), col("fp"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("chunk"),
          shiftright(col("fp"), i * 16).bitwiseAND(0xFFFFL).as("ck"))): _*)).as("cc"))
      .select(col("doc_id"), col("fp"), col("cc.chunk"), col("cc.ck"))
    val chunks = if (maxBucket <= 0) raw else {
      val hot = raw.groupBy("chunk", "ck").agg(count(lit(1)).as("bn"))
        .filter(col("bn") > maxBucket).select("chunk", "ck")
      raw.join(hot, Seq("chunk", "ck"), "left_anti")
    }
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ck") === col("b.ck") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming(col("a.fp"), col("b.fp")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Brute-force (all-pairs) hamming pairs over a fingerprint relation —
    * quadratic in document count, but each comparison is one xor+popcount on
    * 8-byte fingerprints: the correctness twin the banded path's recall
    * guarantee is verified against (16-bit banding cannot miss a pair with
    * hamming ≤ 3 — pigeonhole over 4 chunks), never a production path.
    */
  def simhashBrutePairs(withFp: DataFrame, maxHamming: Int = 3): DataFrame =
    withFp.as("a")
      .join(withFp.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming(col("a.fp"), col("b.fp")).as("hamming"))
      .filter(col("hamming") <= maxHamming)

  /** Brute-force embedding near-dup pairs (cosine ≥ threshold). Quadratic —
    * correctness oracle and small-table path only; [[embeddingLshPairs]] is
    * the scale path.
    */
  def embeddingCosinePairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    // spread the STREAMED side of the nested-loop join across cores
    // before the quadratic scoring (r16): a small corpus arrives as one
    // file split, so the O(N²) cosine pass otherwise runs on one task.
    // The round-robin repartition is corpus-LINEAR — asymptotically free
    // relative to the join it feeds at any scale.
    val cores = embeddings.sparkSession.sparkContext.defaultParallelism
    // native one-pass cosine (codegen'd, allocation-free) per pair
    embeddings.repartition(cores).as("a")
      .join(embeddings.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        call_function("cosine_sim", col("a.embedding"), col("b.embedding")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** LSH-bucketed embedding near-dup: random-hyperplane band buckets
    * (`bands` bands × `rowsPerBand` sign bits each); bucket-join per band,
    * verify cosine. Approximate (recall < 1 by design) but shuffle-bounded:
    * candidates only within buckets, and the bucket explode + self-join
    * carry `(vec_id, band, bucket)` ONLY — never the embedding payload,
    * which at production dims is 1-4 KB/vector and would otherwise be
    * replicated ×bands through the biggest shuffle in the pipeline.
    * Embeddings are joined back by id for the cosine verification, the
    * same join-back-by-id shape [[minhashLshPairs]] uses for its shingle
    * sets.
    *
    * Candidate-volume contract (r12 verdict — the old form's 4-bit buckets
    * made the self-join Θ(n²) on ANY corpus): the bucket domain is
    * 2^rowsPerBand per band, so a random pair collides with probability
    * 2^-rowsPerBand per band — at the 16-row default that is 1.5·10⁻⁵, and
    * the `maxBucket` hot-bucket cap (the [[graft.operators.Imaging
    * .dhashNearDupPairs]] discipline) bounds the residue: with the cap
    * engaged, candidates ≤ bands·maxBucket·n — LINEAR in corpus size no
    * matter how the vectors distribute. LSH theory's price: per-band match
    * probability for a TRUE pair at cosine τ is (1−arccos(τ)/π)^rows, so
    * wide bands only have recall in the high-similarity regime (τ ≳ 0.9 at
    * rows = 16) — near-dup territory. For LOW-τ semantic grouping
    * (τ ≈ 0.45, where (1−arccos(τ)/π) ≈ 0.65 makes candidate volume a
    * CONSTANT fraction of all pairs for any banding with usable recall —
    * the ρ = ln p₁/ln p₂ ≈ 0.625 LSH lower bound), pick `rowsPerBand` from
    * that formula (the catalog's τ = 0.45 entries use 6×16) and treat
    * [[semanticDropIds]] (SemDeDup cells) as the preferred 100 TB path.
    */
  /** `(id, band, bucket)` rows for banded hyperplane-LSH — the ids-only
    * relation every embedding-LSH join shuffles (never the embedding
    * payload). `maxBucket > 0` drops buckets holding more ids than that
    * (per band): a bucket that hot is degenerate content (near-identical
    * vector cliques — exact dedup's job) or a banding too coarse for the
    * corpus, and either way it carries quadratic candidate volume and no
    * per-pair evidence the other bands can't re-supply. maxBucket <= 0
    * disables (exact mode) — the [[graft.operators.Imaging
    * .dhashNearDupPairs]] pattern.
    */
  private[graft] def hyperplaneBuckets(embeddings: DataFrame, idAs: String,
                                       dim: Int, rowsPerBand: Int, bands: Int,
                                       maxBucket: Int): DataFrame = {
    val rawPlan = embeddings
      .select(col("vec_id").as(idAs),
        Vectors.hyperplaneBandBuckets(col("embedding"), dim, bands, rowsPerBand).as("bkts"))
      .select(col(idAs), posexplode(col("bkts")).as(Seq("band", "bucket")))
    // eager-persisted on the prune path (r16): the hyperplane signature
    // pass (bands × rowsPerBand dot products per vector) re-ran once per
    // reader — hot-bucket aggregate, anti-join probe, caller self-join
    // sides; the cache holds (id, band, bucket) rows only. Exact mode
    // stays lazy (single-reader callers: hot-bucket observables, the
    // streaming batch side — an extra fill job per micro-batch).
    val raw = if (maxBucket <= 0) rawPlan else eagerPersist(rawPlan)
    if (maxBucket <= 0) raw else {
      // aggregate + anti join, no broadcast hint (hot-bucket cardinality
      // grows with the corpus)
      val hot = raw.groupBy("band", "bucket").agg(count(lit(1)).as("bn"))
        .filter(col("bn") > maxBucket).select("band", "bucket")
      raw.join(hot, Seq("band", "bucket"), "left_anti")
    }
  }

  def embeddingLshPairs(embeddings: DataFrame, dim: Int, threshold: Double,
                        rowsPerBand: Int = 16, bands: Int = 8,
                        maxBucket: Int = 1000): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val buckets = hyperplaneBuckets(embeddings, "vec_id", dim, rowsPerBand,
      bands, maxBucket)
    val candidates = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    val payload = embeddings.select(col("vec_id"), col("embedding"))
    candidates
      .join(payload.as("ea"), col("id_a") === col("ea.vec_id"))
      .join(payload.as("eb"), col("id_b") === col("eb.vec_id"))
      .filter(call_function("cosine_sim", col("ea.embedding"), col("eb.embedding")) >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** Cross-relation embedding near-match — the vector analog of
    * [[graft.operators.Imaging.dhashMatchedIds]]: incoming `batch` vec_ids
    * that have ANY `corpus` vector at cosine ≥ `threshold`. Candidates come
    * from shared hyperplane-LSH band buckets (same banding as
    * [[embeddingLshPairs]], same signature bank on both relations), so the
    * band join shuffles `(id, band, bucket)` only; float embeddings rejoin
    * BY ID for the bounded exact-cosine verification. Approximate (banding
    * recall < 1 by design), precision absolute (every emitted id is
    * cosine-verified). The per-micro-batch engine under
    * [[graft.streaming.StreamOps.embeddingDedupAgainstCorpus]].
    */
  /** The corpus-side hyperplane-LSH buckets [[embeddingMatchedIds]]
    * EXCLUDES at cap `maxBucket` — the embedding twin of
    * [[minhashHotBuckets]], same caller-facing recall contract: a batch
    * vector whose only corpus matches sit in a > `maxBucket`-member bucket
    * is admitted by default, and a non-empty result here means that hole
    * is live on this corpus.
    */
  def embeddingHotBuckets(corpus: DataFrame, dim: Int, rowsPerBand: Int = 16,
                          bands: Int = 8, maxBucket: Int = 1000): DataFrame =
    hyperplaneBuckets(corpus, "corpus_id", dim, rowsPerBand, bands, maxBucket = 0)
      .groupBy("band", "bucket").agg(count(lit(1)).as("bn"))
      .filter(col("bn") > maxBucket)

  def embeddingMatchedIds(corpus: DataFrame, batch: DataFrame, dim: Int,
                          threshold: Double, rowsPerBand: Int = 16,
                          bands: Int = 8, maxBucket: Int = 1000): DataFrame = {
    graft.functions.GraftFunctions.register(batch.sparkSession)
    // the hot-bucket cap guards the CORPUS index side (the side that grows
    // without bound); a micro-batch is operator-bounded by construction
    val cand = hyperplaneBuckets(batch, "vec_id", dim, rowsPerBand, bands,
        maxBucket = 0)
      .join(hyperplaneBuckets(corpus, "corpus_id", dim, rowsPerBand, bands,
        maxBucket), Seq("band", "bucket"))
      .select(col("vec_id"), col("corpus_id"))
      .distinct()
    cand
      .join(batch.select(col("vec_id"), col("embedding").as("b_emb")), Seq("vec_id"))
      .join(corpus.select(col("vec_id").as("corpus_id"),
        col("embedding").as("c_emb")), Seq("corpus_id"))
      .filter(call_function("cosine_sim", col("b_emb"), col("c_emb")) >= threshold)
      .select(col("vec_id")).distinct()
  }

  /** Semantic dedup (SemDeDup, Abbas et al. 2023): cluster the embedding
    * space with a coarse KMeans quantizer, then compare cosine only WITHIN
    * each cluster — the candidate-bounding trick that makes embedding-level
    * dedup sub-quadratic at corpus scale. SemDeDup's own economics
    * (11k clusters for LAION-440M) say the cluster count must GROW with
    * the corpus, so `nClusters <= 0` (the default) derives it from a cheap
    * count as ⌈√n⌉ clamped to [16, 65536] — the
    * [[Similarity.derivedPivotCount]] discipline, which bounds expected
    * within-cell work at ~n^1.5 total. A pinned `nClusters` stays available
    * for deterministic replay (the catalog entries pin theirs). The
    * within-cluster pair stage shuffles `(vec_id, cluster)` ONLY
    * ([[semanticDroppedIds]]); embeddings rejoin by id for the bounded
    * cosine verification — never ×2 full payloads through the candidate
    * shuffle.
    *
    * Output of [[semanticAssignments]]: (vec_id, embedding, cluster).
    * Caller-must-clear-cache: the derived-count path persists the featured
    * projection (KMeans re-reads it per init round and iteration, and the
    * count would otherwise be an extra full scan of the caller's lineage);
    * it lives until `spark.catalog.clearCache()` (Bench/Verify do per
    * query) or session end.
    */
  def semanticAssignments(embeddings: DataFrame, nClusters: Int = 0,
                          seed: Long = 42L, fitFraction: Double = 0.5,
                          fitMaxRows: Int = 100000): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val raw = embeddings.select(col("vec_id"), col("embedding"),
      array_to_vector(col("embedding")).as("features"))
    val (featured, k) =
      if (nClusters > 0) (raw, nClusters)
      else {
        val f = raw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (f, Similarity.derivedPivotCount(f.count()))
      }
    Similarity.fitCoarseKMeans(featured, k, seed, fitFraction, fitMaxRows)
      .transform(featured)
      .select(col("vec_id"), col("embedding"), col("cluster"))
  }

  /** Hot cells of a SemDeDup assignment at cap `maxCell` — the OBSERVABLE
    * for the recall trade-off the cap buys: `(cluster, cell_n, cap)` rows
    * for every cell whose membership exceeds the cap. KMeans routinely
    * collapses a near-duplicate-heavy or low-variance corpus (exactly what
    * a dedup pass sees) into one mega-cell; without a cap that one cell
    * re-creates the all-pairs join the clustering was supposed to prevent.
    *
    * `maxCell <= 0` derives the cap from the assignment itself:
    * max(1024, 8 × mean cell size) via one bounded SCALAR collect (the
    * aggregate is a single row regardless of cluster count), so the pair
    * stage's threshold is a LITERAL the plan gates can verify. At the
    * derived-⌈√n⌉ cluster count the mean cell is ~√n, so the cap engages
    * only on ≥ 8× skew; the 1024 floor keeps tiny corpora (where quadratic
    * cells are harmless) out of the cap's way. Callers should pass a
    * PERSISTED `assigned` — the derived-cap path runs one counting
    * aggregate over it eagerly.
    */
  def semanticHotCells(assigned: DataFrame, maxCell: Int = 0): DataFrame = {
    val counts = assigned.groupBy("cluster").agg(count(lit(1)).as("cell_n"))
    val cap: Long =
      if (maxCell > 0) maxCell.toLong
      else counts.agg(greatest(lit(1024L),
          ceil(avg("cell_n") * 8).cast("long")).as("cap"))
        .first().getLong(0)
    counts.filter(col("cell_n") > lit(cap)).withColumn("cap", lit(cap))
  }

  /** Ids dropped by the SemDeDup rule: any vector with a lower-id
    * in-cluster neighbor at cosine ≥ `tau` (the same keep-the-lowest-id
    * convention as [[dropNearDuplicates]]). Deterministic given the
    * cluster assignment.
    *
    * Scale shape (the r13 verdict's lead finding was this method's old
    * form — full embedding payloads on both sides of a fixed-16-cell
    * self-join, Θ(n²/16) on any corpus): the candidate self-join now
    * carries `(vec_id, cluster)` only — embeddings rejoin BY ID for the
    * cosine verify, the [[embeddingLshPairs]] payload rule — and cells
    * past the [[semanticHotCells]] cap are EXCLUDED from pairing. Loud
    * contract for the cap: a mega-cell is degenerate content
    * (exact/[[exactNormalized]] dedup's job) or a quantizer too coarse for
    * the corpus, and either way it carries quadratic candidate volume; its
    * members are all KEPT (never silently dropped) and the exclusion is
    * observable via [[semanticHotCells]]. With the cap, candidates ≤
    * cap·n/2 — LINEAR in the corpus no matter how KMeans distributes it
    * (ScaleSpec pins this with a planted mega-cell against an uncapped
    * control).
    */
  def semanticDroppedIds(assigned: DataFrame, tau: Double,
                         maxCell: Int = 0): DataFrame = {
    graft.functions.GraftFunctions.register(assigned.sparkSession)
    semanticCandidatePairs(assigned, maxCell)
      .join(assigned.select(col("vec_id").as("id_a"), col("embedding").as("emb_a")),
        Seq("id_a"))
      .join(assigned.select(col("vec_id").as("id_b"), col("embedding").as("emb_b")),
        Seq("id_b"))
      .filter(call_function("cosine_sim", col("emb_a"), col("emb_b")) >= tau)
      .select(col("id_b")).distinct()
  }

  /** The ids-only within-cell candidate pairs behind [[semanticDroppedIds]]
    * — exposed for the planted-mega-cell scale tests, which pin the cap's
    * candidate bound against an uncapped control (`maxCell` < 0 disables
    * the cap entirely; 0 derives it).
    */
  private[graft] def semanticCandidatePairs(assigned: DataFrame,
                                            maxCell: Int): DataFrame = {
    val base = assigned.select(col("cluster"), col("vec_id"))
    val ids =
      if (maxCell < 0) base
      else base.join(semanticHotCells(assigned, maxCell).select("cluster"),
        Seq("cluster"), "left_anti")
    ids.as("a")
      .join(ids.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
  }

  /** SemDeDup survivors: the corpus minus [[semanticDroppedIds]]. */
  def semanticSurvivors(embeddings: DataFrame, tau: Double,
                        nClusters: Int = 0, seed: Long = 42L,
                        maxCell: Int = 0): DataFrame = {
    val assigned = semanticAssignments(embeddings, nClusters, seed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    embeddings.join(
      semanticDroppedIds(assigned, tau, maxCell).withColumnRenamed("id_b", "vec_id"),
      Seq("vec_id"), "left_anti")
  }
}
