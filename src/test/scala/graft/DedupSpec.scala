package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Graph, Similarity, TextAnalysis}
import graft.sources.Sources

/** LLM-pipeline operators: approximate methods cross-validated against their
  * exact counterparts on the sf0.001 fixtures.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Sources.table(spark, sf0001, "documents").cache()
  private lazy val emb = Sources.table(spark, sf0001, "embeddings").cache()

  test("shingles builds distinct word n-grams") {
    val out = Seq(("a b c d", 1)).toDF("text", "id")
      .select(Dedup.shingles(col("text"), 3).as("s"))
      .as[Seq[String]].collect()(0)
    assert(out.toSet == Set("a|b|c", "b|c|d"))
    val short = Seq(("a b", 1)).toDF("text", "id")
      .select(Dedup.shingles(col("text"), 3).as("s"))
      .as[Seq[String]].collect()(0)
    assert(short.isEmpty)
  }

  test("native shingle_hashes matches the string pipeline's set semantics") {
    graft.functions.GraftFunctions.register(spark)
    // same token sequence → same hash set, regardless of which doc
    val d = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z"), (4L, "a b"), (5L, ""))
      .toDF("doc_id", "text")
    val hs = d.select(col("doc_id"), Dedup.shingleHashes(col("text"), 3).as("hs"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(hs(1L) == hs(2L), "identical texts must hash identically")
    assert(hs(1L).toSet.intersect(hs(3L).toSet).isEmpty, "disjoint texts must not collide")
    assert(hs(4L).isEmpty && hs(5L).isEmpty, "short/empty docs have no shingles")
    // cardinality equals the distinct string n-gram count on real text
    val both = docs.select(
        size(Dedup.shingleHashes(col("text"), 3)).as("native"),
        size(Dedup.shingles(col("text"), 3)).as("strings"))
      .as[(Int, Int)].collect()
    assert(both.forall { case (a, b) => a == b },
      s"set cardinality diverged: ${both.find { case (a, b) => a != b }}")
    // repeated shingles dedupe to first occurrence, like array_distinct
    val rep = Seq((1L, "a b a b a b a b")).toDF("doc_id", "text")
      .select(Dedup.shingleHashes(col("text"), 3).as("hs"))
      .as[Seq[Long]].collect()(0)
    assert(rep.length == 2 && rep.distinct.length == 2, s"got $rep")
  }

  test("exact dedup groups identical texts and keeps min doc_id") {
    val d = Seq((1L, "same"), (2L, "same"), (3L, "other")).toDF("doc_id", "text")
    val out = Dedup.exact(d).orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("doc_id") == 1L && out(0).getAs[Long]("dup_cnt") == 2L)
  }

  test("MinHash-LSH candidates recover every exact-Jaccard>=0.8 pair on fixtures") {
    val exactPairs = Dedup.ngramJaccardPairs(docs, 3, 80, maxDf = 0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lshPairs = Dedup.minhashLshPairs(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exactPairs.nonEmpty, "fixture should contain planted near-dups")
    // precision is absolute (exact-Jaccard verification before emission) and
    // banding recall is total on the fixtures — the sets must be EQUAL,
    // which is what licenses the full-equality DuckDB oracle in the catalog
    assert(lshPairs == exactPairs,
      s"missed: ${exactPairs -- lshPairs}, extra: ${lshPairs -- exactPairs}")
  }

  test("minhash LSH reads the persisted shingle relation instead of recomputing it") {
    // the plan consumes withHs four times (bucket self-join sides + two
    // verify joins); without the persist each read re-ran scan->shingle->
    // hash and the query was ~7x slower (BENCH.md round 2)
    val plan = Dedup.minhashLshPairs(docs).queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"), plan.take(2000))
  }

  test("connected components: chains, triangles, and isolated pairs resolve to min-id clusters") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L),            // chain -> {1,2,3}
      (10L, 11L),                    // isolated pair
      (20L, 21L), (21L, 22L), (20L, 22L), // triangle
      (5L, 7L), (6L, 7L)             // star: 5 and 6 linked only through 7
    ).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L,
      5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("connected components fail loudly instead of returning a partial fixpoint") {
    // chain of diameter 255 with maxIter 2: even two-phase star contraction
    // (~log2(diameter) rounds) cannot finish — must throw, not return a
    // partial clustering
    val chain = (1L to 256L).sliding(2).map(p => (p(0), p(1))).toSeq
      .toDF("doc_a", "doc_b")
    assertThrows[IllegalStateException](
      Dedup.connectedComponents(chain, maxIter = 2).collect())
    // and with enough rounds the same chain converges to one cluster
    val ok = Dedup.connectedComponents(chain, maxIter = 25)
      .as[(Long, Long)].collect().toMap
    assert(ok.values.toSet == Set(1L))
    assert(ok.keySet == (1L to 256L).toSet)
  }

  test("two-phase CC equals union-find on random graphs (property)") {
    // the star-contraction rewrite is algorithmically subtle (large-star /
    // small-star interplay); pin it against a trivially-correct
    // driver-side union-find over random edge sets of varied shape
    val rnd = new scala.util.Random(421)
    for (trial <- 1 to 8) {
      val n = 20 + rnd.nextInt(60)
      val nEdges = 5 + rnd.nextInt(80)
      val edges = Seq.fill(nEdges)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        // canonicalize union-find roots to the component MIN (the CC
        // contract), which the max-links-to-min union above guarantees
        val expected = nodes.map(v => v -> find(v)).toMap
        val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
          .as[(Long, Long)].collect().toMap
        assert(got == expected, s"trial $trial: n=$n edges=$edges")
      }
    }
  }

  test("CC over LSH pairs equals CC over exact pairs (the 100 TB composition)") {
    // dedup_clusters_lsh's license: the scale-path pair generator feeds the
    // same fixpoint to the same clusters, so the exact recursive-CTE oracle
    // applies unchanged
    val exactCc = Dedup.connectedComponents(
        Dedup.ngramJaccardPairs(docs, 3, 80, maxDf = 0))
      .as[(Long, Long)].collect().toMap
    val lshCc = Dedup.connectedComponents(Dedup.minhashLshPairs(docs))
      .as[(Long, Long)].collect().toMap
    assert(lshCc.nonEmpty)
    assert(lshCc == exactCc)
  }

  test("semantic dedup survivors are near-dup-free within clusters and drops are witnessed") {
    val tau = 0.45
    val assigned = Dedup.semanticAssignments(emb).cache()
    val dropped = Dedup.semanticDroppedIds(assigned, tau).cache()
    val kept = assigned.join(
      dropped.withColumnRenamed("id_b", "vec_id"), Seq("vec_id"), "left_anti").cache()
    // partition: every vector is kept xor dropped
    assert(kept.count() + dropped.count() == emb.count())
    // the drop rule re-run on the survivors must find nothing
    assert(Dedup.semanticDroppedIds(kept, tau).count() == 0)
    // every drop has a global cosine>=tau witness (cluster pairs are a
    // subset of the brute-force pair set)
    val unwitnessed = dropped.join(
      Dedup.embeddingCosinePairs(emb, tau).select("id_b").distinct(),
      Seq("id_b"), "left_anti").count()
    assert(unwitnessed == 0)
    // the public one-call surface agrees (same deterministic seed)
    assert(Dedup.semanticSurvivors(emb, tau).count() == kept.count())
  }

  test("simhash banding recalls every brute-force hamming<=3 pair (pigeonhole)") {
    val fp = Dedup.simhashFingerprints(docs).cache()
    val brute = Dedup.simhashBrutePairs(fp, maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val banded = Dedup.simhashPairsFromFp(fp, maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "fixture should contain simhash near-dups")
    // ≤3 differing bits touch at most 3 of the 4 16-bit chunks, so one chunk
    // always matches → banding cannot miss; candidates are hamming-verified
    // before emission → banding cannot add. The sets are EQUAL, which is
    // what licenses dedup_simhash's zero-violations verdict oracle.
    assert(banded == brute,
      s"missed: ${brute -- banded}, extra: ${banded -- brute}")
  }

  test("LSH-based representative filter matches the exact filter on fixtures") {
    val exactSurvivors = Dedup.dropNearDuplicates(docs,
        Dedup.ngramJaccardPairs(docs, 3, 80, maxDf = 0))
      .select("doc_id").as[Long].collect().toSet
    val lshSurvivors = Dedup.dropNearDuplicates(docs, Dedup.minhashLshPairs(docs))
      .select("doc_id").as[Long].collect().toSet
    assert(lshSurvivors == exactSurvivors)
  }

  test("maxDf prune plans without a window sort and is a no-op below the cap") {
    val pruned = Dedup.ngramJaccardPairs(docs, 3, 80, maxDf = 1000)
    // document frequency must come from an aggregate + anti-join, not a
    // window count that shuffles and sorts the exploded shingle table
    assert(!pruned.queryExecution.executedPlan.toString.contains("Window"))
    val exactPairs = Dedup.ngramJaccardPairs(docs, 3, 80, maxDf = 0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // fixture df never exceeds 1000, so pruning must change nothing
    assert(pruned.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet == exactPairs)
  }

  test("shared-span pairs find exactly the docs sharing a full 16-token span") {
    val span = (1 to 16).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (1L, "intro " + span + " outro"),
      (2L, span + " different tail entirely"),
      (3L, "unrelated text with enough tokens " + (1 to 12).map(i => s"x$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Dedup.sharedSpanPairs(d, n = 16, maxDf = 0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L)))
    // the df prune drops spans more common than maxDf: the shared span has
    // df = 2, so maxDf = 1 must remove the only evidence pair
    val pruned = Dedup.sharedSpanPairs(d, n = 16, maxDf = 1)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pruned.isEmpty)
  }

  test("incremental filter drops batch docs near-duplicating the corpus, keeps the rest") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (1L, base),
      (3L, "a completely different corpus document " + (1 to 26).map(i => s"c$i").mkString(" "))
    ).toDF("doc_id", "text")
    val novel = (1 to 30).map(i => s"z$i").mkString(" ")
    val batch = Seq(
      (10L, base + " tail"),   // near-dup of corpus doc 1 -> dropped
      (20L, novel),            // novel -> survives
      (30L, novel + " tail")   // batch-internal near-dup of 20: must SURVIVE
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalFilter(corpus, batch)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(20L, 30L))
  }

  test("incremental filter matches the exact batch-vs-corpus Jaccard anti-join on fixtures") {
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    // exact twin: all cross pairs >= 0.8 via the quadratic pair path
    val crossDups = Dedup.ngramJaccardPairs(docs, 3, 80, maxDf = 0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
      .flatMap { case (a, b) =>
        Seq(a, b).filter(id => id % 10 == 0 && (if (id == a) b else a) % 10 != 0)
      }.toSet
    val expect = batch.select("doc_id").as[Long].collect().toSet -- crossDups
    val got = Dedup.incrementalFilter(corpus, batch)
      .select("doc_id").as[Long].collect().toSet
    assert(got == expect)
  }

  test("incremental filter's hot-bucket recall hole is observable via minhashHotBuckets") {
    // the caller-facing contract of the r13 maxBucket default: a NEAR-dup
    // (not byte-identical) of a corpus cluster hotter than the cap PASSES
    // the filter — and minhashHotBuckets (same cap, same banding) is the
    // observable that says the hole is live. Planted: a 40-member
    // identical-text corpus cluster; the batch carries a near-dup of it.
    val cliqueText = (1 to 30).map(i => s"h$i").mkString(" ")
    val corpus = (1L to 40L).map(i => (i, cliqueText)).toDF("doc_id", "text")
    val batch = Seq((100L, cliqueText + " tail")).toDF("doc_id", "text")
    // cap below the cluster size: the near-dup is ADMITTED (the documented
    // hole)…
    val admitted = Dedup.incrementalFilter(corpus, batch, maxBucket = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(100L), s"capped filter must admit the near-dup, got $admitted")
    // …and the observable is non-empty on exactly this corpus/cap
    val corpusHs = Dedup.shingleRelation(corpus)
    assert(Dedup.minhashHotBuckets(corpusHs, maxBucket = 5).count() > 0,
      "hot-bucket observable must flag the planted cluster")
    // uncapped control: the same near-dup is dropped, and the observable
    // reports clean at a cap the corpus never reaches
    val uncapped = Dedup.incrementalFilter(corpus, batch, maxBucket = 0)
      .select("doc_id").as[Long].collect().toSet
    assert(uncapped.isEmpty, "uncapped filter must drop the near-dup")
    assert(Dedup.minhashHotBuckets(corpusHs, maxBucket = 1000).count() == 0)
  }

  test("incremental filter is idempotent: survivors of one pass survive a second") {
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val once = Dedup.incrementalFilter(corpus, batch)
    val twice = Dedup.incrementalFilter(corpus, once)
    assert(twice.select("doc_id").as[Long].collect().toSet ==
      once.select("doc_id").as[Long].collect().toSet)
  }

  test("repetition signals count raw and distinct bigrams and the dominant gram") {
    val d = Seq(
      (1L, "a b a b a"),   // bigrams: a|b, b|a, a|b, b|a
      (2L, "x y z"),       // bigrams: x|y, y|z
      (3L, "solo")         // no bigrams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(d, n = 2)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((4L, 2L, 2L)))
    assert(out(2L) == ((2L, 2L, 1L)))
    assert(out(3L) == ((0L, 0L, 0L)))
  }

  test("contamination report finds train docs sharing a 13-token span with the eval set") {
    val span = (1 to 13).map(i => s"s$i").mkString(" ")
    val train = Seq(
      (1L, "pre " + span + " post"),
      (2L, (1 to 20).map(i => s"t$i").mkString(" "))
    ).toDF("doc_id", "text")
    val eval = Seq((100L, span + " " + (1 to 6).map(i => s"e$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.contaminationReport(train, eval, n = 13)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet == Set(1L))
    assert(out(1L)._1 >= 1L && out(1L)._2 == 1L)
  }

  test("tf-idf keywords rank rare terms above ubiquitous ones") {
    val d = Seq(
      (1L, "common rare common"),
      (2L, "common stuff common"),
      (3L, "common other other")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfKeywords(d, k = 1)
      .select("doc_id", "tok").as[(Long, String)].collect().toMap
    // 'common' appears in every doc (df=3, score 2e6/3); the doc-local
    // singletons (df=1, score >= 1e6) outrank it
    assert(out(1L) == "rare")
    assert(out(2L) == "stuff")
    assert(out(3L) == "other")
  }

  test("SimHash near-dup pairs overlap heavily with exact near-dups") {
    val exactPairs = Dedup.ngramJaccardPairs(docs, 3, 80, maxDf = 0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val sim = Dedup.simhashPairs(docs, maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // simhash(hamming<=3) and 3-gram jaccard>=0.8 are different notions of
    // near-dup; on the planted fixtures they should agree on most pairs
    val overlap = (exactPairs & sim).size.toDouble / math.max(exactPairs.size, 1)
    assert(overlap >= 0.5, s"overlap=$overlap exact=${exactPairs.size} sim=${sim.size}")
  }

  test("embedding LSH pairs are a subset of brute-force pairs (no false positives)") {
    val brute = Dedup.embeddingCosinePairs(emb, 0.45)
      .as[(Long, Long)].collect().toSet
    // 6×20 banding: the catalog's theory-picked parameters for τ = 0.45
    // (the 16-row default targets the high-similarity regime, where a
    // τ = 0.45 pair would almost never share a 16-bit band)
    val lsh = Dedup.embeddingLshPairs(emb, dim = 64, threshold = 0.45,
        rowsPerBand = 6, bands = 20)
      .as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(brute))
    // and recall is useful (hyperplane LSH is approximate by design)
    if (brute.nonEmpty)
      assert(lsh.size.toDouble / brute.size >= 0.5, s"recall ${lsh.size}/${brute.size}")
  }

  test("LSH ANN top-k hits are true neighbors from the brute-force ranking") {
    val queries = emb.filter(col("vec_id") < 4)
    val brute = Similarity.bruteForceTopK(emb, queries, 20)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(emb, queries, dim = 64, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // every LSH hit should be among the true top-20
    val bad = lsh -- brute
    assert(bad.size <= lsh.size / 5, s"too many off-ranking hits: $bad")
  }

  test("multi-probe LSH recall of the true top-5 is at least single-probe's") {
    val queries = emb.filter(col("vec_id") < 4)
    val top5 = Similarity.bruteForceTopK(emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(multiProbe: Boolean) = {
      val hits = Similarity.lshTopK(emb, queries, dim = 64, k = 5, multiProbe = multiProbe)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (hits & top5).size.toDouble / top5.size
    }
    val single = recall(multiProbe = false)
    val multi = recall(multiProbe = true)
    assert(multi >= single, s"multi=$multi single=$single")
    assert(multi > 0.0)
  }

  test("IVF ANN top-k hits are true neighbors from the brute-force ranking") {
    val queries = emb.filter(col("vec_id") < 4)
    val brute = Similarity.bruteForceTopK(emb, queries, 20)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, queries, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivf.nonEmpty)
    val bad = ivf -- brute
    assert(bad.size <= ivf.size / 5, s"too many off-ranking hits: $bad")
  }

  test("rolling fingerprint is order-sensitive, md5 is content-exact") {
    val d = Seq((1L, "a b c"), (2L, "c b a"), (3L, "a b c")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprints(d).orderBy("doc_id").collect()
    assert(fp(0).getAs[Long]("rolling_fp") == fp(2).getAs[Long]("rolling_fp"))
    assert(fp(0).getAs[Long]("rolling_fp") != fp(1).getAs[Long]("rolling_fp"))
    assert(fp(0).getAs[String]("md5_fp") == fp(2).getAs[String]("md5_fp"))
  }

  test("language ID emits a prediction for every document") {
    val out = TextAnalysis.languageId(docs)
    assert(out.filter(col("predicted_lang").isNull).count() == 0)
    assert(out.count() == docs.count())
  }

  test("edit-distance pairs respect the threshold and blocking contract") {
    val d = Seq(
      (1L, "srcA", "hello world this is a document", 31L),
      (2L, "srcA", "hello world this is a documenx", 31L), // 1 edit from doc 1
      (3L, "srcB", "hello world this is a document", 31L), // other source: blocked out
      (4L, "srcA", "completely different text here!", 31L) // same block, far away
    ).toDF("doc_id", "source", "text", "n_chars")
    val pairs = Dedup.editDistancePairs(d, prefixLen = 100, maxDist = 5, bucketChars = 25)
      .select("doc_a", "doc_b", "dist").as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L, 1L)))
  }

  test("edit-distance pair frame feeds the greedy dedup filter") {
    val pairs = Dedup.editDistancePairs(docs)
    val kept = Dedup.dropNearDuplicates(docs, pairs)
    assert(kept.count() <= docs.count())
    // survivors contain no doc that is the higher-id member of a pair
    val dropped = pairs.select(col("doc_b").as("doc_id")).distinct()
    assert(kept.join(dropped, Seq("doc_id")).count() == 0)
  }

  test("pageRank conserves total mass and ranks clique centers above leaves") {
    // path graph 1-2-3 plus isolated pair 4-5: center 2 outranks leaves
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val pr = Graph.pageRank(pairs, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.size == 5)
    assert(math.abs(pr.values.sum - 1.0) < 1e-6, s"mass not conserved: $pr")
    assert(pr(2L) > pr(1L) && pr(2L) > pr(3L), s"center should outrank leaves: $pr")
    assert(math.abs(pr(4L) - pr(5L)) < 1e-9, s"symmetric pair should tie: $pr")
  }

  test("hits: authorities collect in-links, hubs collect authority, exact integers") {
    // directed edges (lower endorses higher): 1→3, 2→3, 1→4. Hand-run at
    // scale 10⁴, iters=2: a₁(3)=20000,a₁(4)=10000 → ÷2 → 10000/5000;
    // h₁(1)=15000,h₁(2)=10000 (÷1); a₂(3)=25000,a₂(4)=15000 → ÷2 →
    // 12500/7500; h₂(1)=20000,h₂(2)=12500 → ÷2 → 10000/6250. The operator
    // must reproduce these EXACT integers — any drift means the
    // normalize/divide contract (and the oracle) broke.
    val pairs = Seq((1L, 3L), (2L, 3L), (1L, 4L)).toDF("doc_a", "doc_b")
    val out = Graph.hits(pairs, iters = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.size == 4)
    assert(out(1L) == ((10000L, 0L)), s"node 1: $out")
    assert(out(2L) == ((6250L, 0L)), s"node 2: $out")
    assert(out(3L) == ((0L, 12500L)), s"node 3: $out")
    assert(out(4L) == ((0L, 7500L)), s"node 4: $out")
  }

  test("labelPropagation: two cliques joined by a bridge split into two communities") {
    // cliques {1,2,3} and {10,11,12} with bridge 3-10: LPA separates them
    // (each side's majority is internal) where CC would merge all six
    val clique = (s: Seq[Long]) => for { a <- s; b <- s if a < b } yield (a, b)
    val pairs = (clique(Seq(1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L)) :+ (3L, 10L))
      .toDF("doc_a", "doc_b")
    val lp = Graph.labelPropagation(pairs, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lp.size == 6)
    assert(Set(lp(1L), lp(2L), lp(3L)).size == 1, s"left clique split: $lp")
    assert(Set(lp(10L), lp(11L), lp(12L)).size == 1, s"right clique split: $lp")
    assert(lp(1L) != lp(10L), s"bridge merged the cliques: $lp")
    // invariant: labels only travel along edges, so every community sits
    // inside one connected component
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val commToCc = lp.groupBy(_._2).view.mapValues(_.keys.map(cc).toSet)
    assert(commToCc.values.forall(_.size == 1), s"community crosses components: $commToCc")
  }

  test("lloydKMeansQ assignment is the exact integer argmin; planted clusters recover") {
    import graft.operators.Similarity
    // two tight groups far apart in 4-d; seeds 0 and 1 fall one per group
    val rows = Seq(
      (0L, Array(0f, 0f, 0f, 0f)), (2L, Array(0.01f, 0f, 0f, 0f)),
      (4L, Array(0f, 0.01f, 0f, 0f)),
      (1L, Array(1f, 1f, 1f, 1f)), (3L, Array(0.99f, 1f, 1f, 1f)),
      (5L, Array(1f, 0.99f, 1f, 1f))).toDF("vec_id", "embedding")
    val out = Similarity.lloydKMeansQ(rows, k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byId = out.map { case (v, c, _) => v -> c }.toMap
    assert(Set(byId(0L), byId(2L), byId(4L)).size == 1)
    assert(Set(byId(1L), byId(3L), byId(5L)).size == 1)
    assert(byId(0L) != byId(1L))
    // d2 of a member of the zero group vs its centroid: quantized points
    // (0,0,0,0),(100,0,0,0),(0,100,0,0) → floored mean (33,33,0,0);
    // vec 0's exact distance is 33²+33² = 2178
    val d0 = out.find(_._1 == 0L).get._3
    assert(d0 == 2178L, s"got $d0")
  }

  test("triangleCounts finds each triangle once per incident vertex") {
    // K4 on {1,2,3,4}: C(4,3)=4 triangles, each vertex is in exactly 3;
    // pendant edge 4-5 adds no triangle; vertex 5 must not appear
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val pairs = (k4 :+ (4L, 5L)).toDF("doc_a", "doc_b")
    val tc = Graph.triangleCounts(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tc == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $tc")
    // duplicate and reversed input edges must not inflate counts
    val noisy = (k4 ++ k4.map(_.swap) :+ (4L, 5L)).toDF("doc_a", "doc_b")
    val tc2 = Graph.triangleCounts(noisy)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tc2 == tc, s"canonicalization failed: $tc2")
  }

  test("incrementalPairs probes only the new batch; old-old pairs absent, no double emission") {
    val txt = "alpha beta gamma delta epsilon zeta"
    val d = Seq((1L, txt), (2L, txt), (3L, txt), (4L, txt))
      .toDF("doc_id", "text")
    val isNew = (c: org.apache.spark.sql.Column) => c >= 3L
    val pairs = Dedup.incrementalPairs(d, isNew)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // new-old pairs (1,3),(1,4),(2,3),(2,4) + the new-new pair (3,4)
    // exactly once each; the old-old pair (1,2) must NOT appear
    assert(pairs == Set((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)), s"got $pairs")
    // and CC over (old labels ∪ incremental pairs) equals batch CC
    val oldLabels = Dedup.connectedComponents(
      Dedup.ngramJaccardPairs(d.filter(col("doc_id") < 3), maxDf = 0)
        .select(col("doc_a"), col("doc_b")))
    val inc = Dedup.connectedComponents(
      oldLabels.select(col("doc_id").as("doc_a"), col("cluster_id").as("doc_b"))
        .unionAll(Dedup.incrementalPairs(d, isNew)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Dedup.connectedComponents(
      Dedup.ngramJaccardPairs(d, maxDf = 0).select(col("doc_a"), col("doc_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == batch, s"incremental $inc != batch $batch")
  }

  test("kCore: chains peel away, cycles survive with their core degrees") {
    // triangle {1,2,3} + chain 3-4-5-6: the chain is tree-shaped so 2-core
    // peeling removes it layer by layer; the triangle survives, each
    // vertex at core degree 2
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    val (core, rounds) = Graph.kCoreWithRounds(pairs, k = 2)
    val m = core.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"got $m")
    // chain of length 3 hanging off the core: one peel per layer + confirm
    assert(rounds <= 5, s"took $rounds rounds")
    // k above the max degree empties the graph — and still converges
    val (empty, _) = Graph.kCoreWithRounds(pairs, k = 4)
    assert(empty.count() == 0)
    // duplicate and reversed edges must not inflate degrees into the core
    val noisy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L))
      .toDF("doc_a", "doc_b")
    val m2 = Graph.kCore(noisy, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m2 == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"canonicalization failed: $m2")
  }

  test("adamicAdar scores non-adjacent pairs by inverse-log common-neighbor degree") {
    // 4-cycle 1-2-3-4-1: the only non-adjacent pairs are the diagonals
    // (1,3) and (2,4), each sharing two degree-2 neighbors →
    // 2·floor(1e6/ln 2) = 2 885 390; existing edges must not appear
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("doc_a", "doc_b")
    val aa = Graph.adamicAdar(pairs, topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(aa == Map((1L, 3L) -> 2885390L, (2L, 4L) -> 2885390L), s"got $aa")
    // a hub cap below the center degree removes its wedges entirely
    val star = Seq((9L, 1L), (9L, 2L), (9L, 3L)).toDF("doc_a", "doc_b")
    assert(Graph.adamicAdar(star, topN = 10, maxDeg = 2L).count() == 0)
    assert(Graph.adamicAdar(star, topN = 10).count() == 3) // leaves pair up via 9
  }

  test("jaccardLinkPred normalizes common neighbors by the union of neighborhoods") {
    // 4-cycle 1-2-3-4-1: diagonals (1,3)/(2,4) share both their degree-2
    // neighborhoods entirely → jx = 2·1000/(2+2−2) = 1000; edges absent
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("doc_a", "doc_b")
    val jp = Graph.jaccardLinkPred(pairs, topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(jp == Map((1L, 3L) -> 1000L, (2L, 4L) -> 1000L), s"got $jp")
    // star: leaves share only the hub — 1·1000/(1+1−1) = 1000 per leaf
    // pair; a hub cap below the center degree removes its wedges entirely
    val star = Seq((9L, 1L), (9L, 2L), (9L, 3L)).toDF("doc_a", "doc_b")
    val stars = Graph.jaccardLinkPred(star, topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(stars == Map((1L, 2L) -> 1000L, (1L, 3L) -> 1000L, (2L, 3L) -> 1000L),
      s"got $stars")
    assert(Graph.jaccardLinkPred(star, topN = 10, maxDeg = 2L).count() == 0)
  }

  test("winnowing guarantees detection of >= w+k-1 shared tokens; df cap prunes boilerplate") {
    // detection floor (k=4, w=4): a shared run of 7 tokens spans one full
    // fingerprint window, so the two docs MUST share >= 1 fingerprint no
    // matter what surrounds the run
    val shared = (0 until 7).map(i => s"s$i").mkString(" ")
    val d1 = (1L, (0 until 4).map(i => s"x$i").mkString(" ") + " " + shared)
    val d2 = (2L, (0 until 6).map(i => s"y$i").mkString(" ") + " " + shared)
    // 8 identical boilerplate docs: every fingerprint has df = 8
    val boiler = (10L until 18L).map(i => (i, (0 until 8).map(j => s"b$j").mkString(" ")))
    val docsDf = (Seq(d1, d2) ++ boiler).toDF("doc_id", "text")
    val capped = Dedup.winnowingPairs(docsDf, k = 4, w = 4, maxDf = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L)),
      s"expected only the genuine pair to survive the df cap, got $capped")
    // control: uncapped, the boilerplate clique appears — proving the cap
    // (not the fixture) removed it
    val uncapped = Dedup.winnowingPairs(docsDf, k = 4, w = 4, maxDf = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((10L, 11L)) && uncapped.contains((1L, 2L)))
    // docs below k+w-1 tokens have no full window — excluded, not crashed
    val tiny = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(Dedup.winnowingPairs(tiny, k = 4, w = 4, maxDf = 0).count() == 0)
  }

  test("pcaPowerQ recovers a planted dominant direction at fixed point") {
    import graft.operators.Similarity
    // points spread along (0.6, 0.8, 0, 0) with a small orthogonal wiggle:
    // the top principal direction is the spread axis, so the fixed-point
    // weights should land at ~(6000, 8000) with dims 2,3 near zero
    val rows = (-5 to 5).map { t =>
      (t + 5).toLong -> Array(0.06f * t, 0.08f * t, if (t % 2 == 0) 0.001f else -0.001f, 0f)
    }.toDF("vec_id", "embedding")
    val w = Similarity.pcaPowerQ(rows, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.size == 4)
    val (a, b) = (w(0L), w(1L))
    // sign is deterministic (all-ones start has positive overlap with the
    // axis) and the component ratio matches 0.6 : 0.8 within quantization
    assert(a > 0 && b > 0, s"got $w")
    assert(math.abs(a * 4 - b * 3) <= 40, s"ratio off: $w")
    assert(math.max(a, b) >= 9900 && math.max(a, b) <= 10100, s"normalization off: $w")
    assert(math.abs(w(2L)) < 500 && w(3L) == 0L, s"orthogonal dims leaked: $w")
  }

  test("degreeHistogram matches hand-computed degrees") {
    // star 1-{2,3,4}: center degree 3, three leaves degree 1
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("doc_a", "doc_b")
    val h = Graph.degreeHistogram(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h == Map(3L -> 1L, 1L -> 3L), s"got $h")
  }

  test("matryoshkaTopK at full width equals bruteForceTopK; truncation stays ranked") {
    val q = emb.filter(col("vec_id") < 4)
    val full = Similarity.bruteForceTopK(emb, q, k = 5)
      .as[(Long, Long, Int)].collect().toSet
    val same = Similarity.matryoshkaTopK(emb, q, dims = 64, k = 5)
      .as[(Long, Long, Int)].collect().toSet
    assert(same == full, "dims=64 must reproduce the full ranking exactly")
    val half = Similarity.matryoshkaTopK(emb, q, dims = 32, k = 5)
    // every query answered with exactly k ranked rows 1..k
    val byQ = half.as[(Long, Long, Int)].collect().groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L))
    byQ.values.foreach(rs => assert(rs.map(_._3).sorted.toSeq == (1 to 5)))
  }

  test("prefix-filtered containment equals the exact operator (total recall)") {
    val exact = Dedup.containmentPairs(docs, n = 3, pct = 90, maxDf = 0)
      .select("doc_in", "doc_of", "common", "n_sh_in")
      .as[(Long, Long, Long, Long)].collect().toSet
    val pref = Dedup.containmentPairsPrefix(docs, n = 3, pct = 90, maxDf = 0)
      .select("doc_in", "doc_of", "common", "n_sh_in")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should contain containment pairs")
    assert(pref == exact,
      s"prefix path diverged: missing=${exact -- pref}, extra=${pref -- exact}")
    // the production configuration (df pruning on) exercises the other
    // prefix branch: ranked over the PRUNED relation, budget from the
    // unpruned counts — equality must still hold at the same maxDf
    val exactDf = Dedup.containmentPairs(docs, n = 3, pct = 90, maxDf = 5)
      .select("doc_in", "doc_of", "common", "n_sh_in")
      .as[(Long, Long, Long, Long)].collect().toSet
    val prefDf = Dedup.containmentPairsPrefix(docs, n = 3, pct = 90, maxDf = 5)
      .select("doc_in", "doc_of", "common", "n_sh_in")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(prefDf == exactDf,
      s"pruned-path diverged: missing=${exactDf -- prefDf}, extra=${prefDf -- exactDf}")
  }

  test("containmentPairs is directional: quoted small doc found, not the reverse") {
    val small = "alpha beta gamma delta epsilon"
    val big = s"intro words here $small closing words of a much longer document tail"
    val d = Seq((1L, small), (2L, big), (3L, "unrelated text entirely different"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(d, n = 3, pct = 90, maxDf = 0)
      .select("doc_in", "doc_of").as[(Long, Long)].collect().toSet
    // every shingle of doc 1 appears in doc 2; doc 2 is NOT contained in 1
    assert(out.contains((1L, 2L)), s"missing containment: $out")
    assert(!out.contains((2L, 1L)), s"containment must not be symmetric: $out")
    assert(!out.exists(p => p._1 == 3L || p._2 == 3L), s"unrelated doc paired: $out")
    // Jaccard at the same threshold misses it: the union denominator is
    // dominated by the big doc — the reason this operator exists
    val jac = Dedup.ngramJaccardPairs(d, n = 3, pct = 90, maxDf = 0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(!jac.contains((1L, 2L)), s"fixture too similar for the contrast: $jac")
  }
}
