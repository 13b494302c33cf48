package graft

import org.apache.spark.sql.functions._

/** Hand-computed semantics checks for the round-10 statistics/privacy
  * entries, on PLANTED fixtures (temp parquet dirs shaped like the driver
  * testdata) so every expected value is derivable on paper — the catalog's
  * DuckDB oracles prove engine agreement, these prove the MATH.
  */
class StatsEntrySpec extends SparkSpec {
  import spark.implicits._

  /** Write a planted documents.parquet/orders.parquet dir the catalog
    * entry lambdas can read like a driver sf dir.
    */
  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-stats").toString
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    dir
  }

  private def docsDf(rows: Seq[(Long, String, String, String)]) =
    rows.map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("text_code_detect separates planted code from planted prose") {
    val code =
      "def main ( args ) { var x = 0 ; for ( i = 0 ; i < 10 ; i = i + 1 ) { x = x + i ; } return x ; }"
    val prose =
      "the quick brown fox jumps over the lazy dog and then wanders slowly home across the quiet meadow"
    val dir = plantDir("documents" -> docsDf(Seq(
      (1L, code, "en", "s"), (2L, prose, "en", "s"))))
    val out = SparkEntry.queries("text_code_detect")(spark, dir)
      .select("doc_id", "code_score_pm", "is_code")
      .as[(Long, Long, Boolean)].collect().map { case (k, v, c) => k -> ((v, c)) }.toMap
    assert(out(1L)._2, s"code row must classify as code, got ${out(1L)}")
    assert(!out(2L)._2, s"prose row must not classify as code, got ${out(2L)}")
    assert(out(1L)._1 > out(2L)._1 + 100,
      s"expected a wide score margin, got code=${out(1L)._1} prose=${out(2L)._1}")
  }

  test("dq_t_closeness: two disjoint-bucket groups each sit at EMD 0.5 from the pooled distribution") {
    // group g1: 10 docs in century-bucket 0; g2: 10 docs in bucket 1.
    // Global q = (0.5, 0.5); each group's p is a point mass, so
    // EMD = |p0-q0| / (m-1) = 0.5 -> exactly 500000 micro.
    val rows = (0L until 10L).map(i => (i, "x" * 50, "en", "g1")) ++
      (10L until 20L).map(i => (i, "y" * 150, "en", "g2"))
    val dir = plantDir("documents" -> docsDf(rows))
    val out = SparkEntry.queries("dq_t_closeness")(spark, dir)
      .select("source", "cnt", "t_micro").as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("g1") == ((10L, 500000L)), s"g1: ${out("g1")}")
    assert(out("g2") == ((10L, 500000L)), s"g2: ${out("g2")}")
  }

  test("q_chi_square matches the 2x2 hand computation (dense cells, floored micro terms)") {
    // counts: (A,O)=10 (A,F)=20 (B,O)=30 (B,F)=40, n=100
    val orders = (
      Seq.fill(10)(("A", "O")) ++ Seq.fill(20)(("A", "F")) ++
      Seq.fill(30)(("B", "O")) ++ Seq.fill(40)(("B", "F"))
    ).zipWithIndex.map { case ((p, st), i) =>
      (i.toLong, i.toLong, st, 1.0, "1995-01-01", p)
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val dir = plantDir("orders" -> orders)
    val out = SparkEntry.queries("q_chi_square")(spark, dir)
      .select("chi2_micro", "dof", "n").as[(Long, Long, Long)].collect()
    assert(out.length == 1)
    val (chi2Micro, dof, n) = out(0)
    assert(dof == 1L && n == 100L)
    // replay the entry's own floored-term arithmetic on paper-known margins
    val expected = Seq((10.0, 30.0, 40.0), (20.0, 30.0, 60.0),
      (30.0, 70.0, 40.0), (40.0, 70.0, 60.0)).map { case (c, r, k) =>
      val e = r * k / 100.0
      math.floor(1e6 * (c - e) * (c - e) / e).toLong
    }.sum
    assert(chi2Micro == expected, s"got $chi2Micro expected $expected")
    // sanity: chi2 = 100*(10*40-20*30)^2/(30*70*40*60) = 0.7936...
    assert(math.abs(chi2Micro / 1e6 - 0.79365) < 1e-4)
  }

  test("q_spearman_rank: monotone -> 1, anti-monotone -> -1, tie case -> 0.5 exactly") {
    def li(rows: Seq[(String, Double, Double)]) =
      rows.zipWithIndex.map { case ((f, x, y), i) => (i.toLong, f, x, y) }
        .toDF("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice")
    val rows =
      Seq(("M", 1.0, 10.0), ("M", 2.0, 20.0), ("M", 3.0, 30.0)) ++   // rho = 1
      Seq(("D", 1.0, 30.0), ("D", 2.0, 20.0), ("D", 3.0, 10.0)) ++   // rho = -1
      Seq(("T", 1.0, 10.0), ("T", 1.0, 20.0), ("T", 2.0, 20.0))      // ties: rho = 0.5
    val dir = plantDir("lineitem" -> li(rows))
    val out = SparkEntry.queries("q_spearman_rank")(spark, dir)
      .select("flag", "n", "spearman_rho").as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("M") == ((3L, 1.0)), s"monotone: ${out("M")}")
    assert(out("D") == ((3L, -1.0)), s"anti-monotone: ${out("D")}")
    // avg ranks x: (1.5, 1.5, 3), y: (1, 2.5, 2.5) -> Pearson = 0.5 exactly
    assert(out("T")._1 == 3L && math.abs(out("T")._2 - 0.5) < 1e-12,
      s"tie case: ${out("T")}")
  }

  test("q_kaplan_meier: risk sets, events, and floored log-survival match the hand computation") {
    // c1: d0, d0+3 (event t=3); c2: d0 only (censored t=7);
    // c3: d0, d0+3 (event t=3); c4: d0, d0+7 (event t=7).
    val orders = Seq(
      (1L, 1L, "1995-01-01"), (2L, 1L, "1995-01-04"),
      (3L, 2L, "1995-01-01"),
      (4L, 3L, "1995-01-01"), (5L, 3L, "1995-01-04"),
      (6L, 4L, "1995-01-01"), (7L, 4L, "1995-01-08")
    ).map { case (ok, ck, d) => (ok, ck, "O", 1.0, d, "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val dir = plantDir("orders" -> orders)
    val out = SparkEntry.queries("q_kaplan_meier")(spark, dir)
      .select("t_days", "n_risk", "d_events", "log_surv_micro")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // t=3: risk 4, events 2 -> term floor(1e6*ln(.5)) = -693148
    // t=7: risk 2, events 1 -> cumulative -1386296
    assert(out.toSeq == Seq((3L, 4L, 2L, -693148L), (7L, 2L, 1L, -1386296L)),
      s"got ${out.toSeq}")
  }

  test("q_welch_ttest matches the textbook computation on planted cohorts") {
    // A (urgent): 10,12,14 -> mean 12, var 4; B: 20,22,24,26 -> mean 23, var 20/3
    val orders = (Seq(10.0, 12.0, 14.0).map(v => (v, "1-URGENT")) ++
      Seq(20.0, 22.0, 24.0, 26.0).map(v => (v, "3-MEDIUM")))
      .zipWithIndex.map { case ((v, p), i) =>
        (i.toLong, i.toLong, "O", v, "1995-01-01", p)
      }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val dir = plantDir("orders" -> orders)
    val out = SparkEntry.queries("q_welch_ttest")(spark, dir)
      .as[(Long, Long, Double, Double)].collect()
    assert(out.length == 1)
    val (na, nb, t, df) = out(0)
    assert(na == 3L && nb == 4L)
    val se2 = 4.0 / 3 + (20.0 / 3) / 4
    val tExp = BigDecimal((12.0 - 23.0) / math.sqrt(se2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dfExp = BigDecimal(se2 * se2 /
      (math.pow(4.0 / 3, 2) / 2 + math.pow((20.0 / 3) / 4, 2) / 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(t - tExp) < 1e-9, s"t: got $t expected $tExp")
    assert(math.abs(df - dfExp) < 1e-9, s"df: got $df expected $dfExp")
  }

  test("q_autocorrelation: alternating daily series gives lag-1 ACF -0.75 on 4 days") {
    // days d0..d3 with revenue 100,200,100,200 cents; global mean 150.
    // lag-1: P=60000 H=500 T=400 n_pairs=3 -> num -7500; Q=100000 n=4 ->
    // den 10000 -> acf = -0.75. Lags 7/30 have no pairs -> no rows.
    val orders = Seq(
      (1L, "1995-01-01", 1.0), (2L, "1995-01-02", 2.0),
      (3L, "1995-01-03", 1.0), (4L, "1995-01-04", 2.0)
    ).map { case (k, d, v) => (k, k, "O", v, d, "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val dir = plantDir("orders" -> orders)
    val out = SparkEntry.queries("q_autocorrelation")(spark, dir)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 3L, -0.75)), s"got ${out.toSeq}")
  }

  test("er_fs_weights: m/u and log2 weights match the hand-built comparison space") {
    // sampled ids (doc_id % 5 == 0): 0,5 identical (match: same source,
    // same band, same prefix); 10,15 disjoint texts, distinct sources,
    // same length band as each other but not as 0/5. Comparison space:
    // 1 match, 5 non-matches; only (10,15) agrees on len_band among the
    // non-matches, nothing else agrees anywhere.
    val t1 = (1 to 24).map(i => s"alpha$i").mkString(" ")                    // 0 and 5
    val t2 = (1 to 24).map(i => s"bravo$i bis$i").mkString(" ").padTo(400, 'x')  // 10
    val t3 = (1 to 24).map(i => s"ch$i charlie$i").mkString(" ").padTo(400, 'y') // 15
    val dir = plantDir("documents" -> docsDf(Seq(
      (0L, t1, "en", "s1"), (5L, t1, "en", "s1"),
      (10L, t2, "en", "s2"), (15L, t3, "en", "s3"))))
    val out = SparkEntry.queries("er_fs_weights")(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    def expect(cap: Long, fp: Long, nTrue: Long, nFalse: Long) = {
      val m = (cap + 1).toDouble / (nTrue + 2)
      val u = (fp + 1).toDouble / (nFalse + 2)
      ((cap + 1) * 1000000L / (nTrue + 2), (fp + 1) * 1000000L / (nFalse + 2),
        math.floor(1000 * math.log(m / u) / math.log(2)).toLong,
        math.floor(1000 * math.log((1 - m) / (1 - u)) / math.log(2)).toLong)
    }
    assert(out("source") == expect(1, 0, 1, 5), s"source: ${out("source")}")
    assert(out("len_band") == expect(1, 1, 1, 5), s"len_band: ${out("len_band")}")
    assert(out("prefix2") == expect(1, 0, 1, 5), s"prefix2: ${out("prefix2")}")
    // agreement on a discriminating field must carry positive weight,
    // disagreement negative — the FS decision-rule sanity condition
    assert(out("source")._3 > 0 && out("source")._4 < 0)
  }

  test("text_kneser_ney: discount, interpolation, and continuation smoothing match by hand") {
    // train (doc 0): "a b a c" -> bigrams (a,b),(b,a),(a,c);
    // c1(a)=2 n1p(a)=2, c1(b)=1 n1p(b)=1; T=3 types, V=3 distinct w2;
    // ncont: a=1, b=1, c=1. Score doc 1 "a b x":
    //   (a,b): seen. p = (1-.75)/2 + (.75*2/2)*pcont(b), pcont(b)=2/7
    //   (b,x): unseen w2, seen w1. p = 0 + (.75*1/1)*pcont(x), pcont(x)=1/7
    val dir = plantDir("documents" -> docsDf(Seq(
      (0L, "a b a c", "en", "s"), (1L, "a b x", "en", "s"))))
    val out = SparkEntry.queries("text_kneser_ney")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def lp(p: Double) = math.floor(1e6 * math.log(p)).toLong
    val pAB = 0.25 / 2 + (0.75 * 2 / 2) * (2.0 / 7)
    val pBX = (0.75 * 1 / 1) * (1.0 / 7)
    assert(out(1L) == ((2L, 1L, lp(pAB) + lp(pBX))), s"doc1: ${out(1L)}")
    // held-in doc 0 scores all three bigrams as seen
    assert(out(0L)._1 == 3L && out(0L)._2 == 3L)
  }

  test("vector_isotropy: planted +/-e1 corpus gives mean pairwise cosine exactly -1/3") {
    // two copies of e1 and two of -e1: 4 same-direction ordered pairs at
    // cos 1, 8 opposite at cos -1 -> (4-8)/12 = -1/3; unit components are
    // exactly ±1e6 after quantization so the Gram identity is exact.
    val emb = Seq(
      (1L, Array(1f, 0f), 0L), (2L, Array(1f, 0f), 0L),
      (3L, Array(-1f, 0f), 1L), (4L, Array(-1f, 0f), 1L)
    ).toDF("vec_id", "embedding", "label")
    val dir = plantDir("embeddings" -> emb)
    val out = SparkEntry.queries("vector_isotropy")(spark, dir)
      .as[(Long, Double)].collect()
    assert(out.length == 1)
    assert(out(0)._1 == 4L)
    assert(math.abs(out(0)._2 - (-1.0 / 3)) < 1e-9, s"got ${out(0)._2}")
  }

  test("text_jensen_shannon: identical halves -> 0, disjoint halves -> ln 2") {
    val same = plantDir("documents" -> docsDf(Seq(
      (0L, "a a b", "en", "s"), (1L, "a a b", "en", "s"))))
    val out0 = SparkEntry.queries("text_jensen_shannon")(spark, same)
      .as[(Long, Long)].collect()(0)
    assert(out0 == ((2L, 0L)), s"identical halves: $out0")
    val disjoint = plantDir("documents" -> docsDf(Seq(
      (0L, "a", "en", "s"), (1L, "b", "en", "s"))))
    val out1 = SparkEntry.queries("text_jensen_shannon")(spark, disjoint)
      .as[(Long, Long)].collect()(0)
    val lnTwoNano = 2 * math.floor(1e9 * 0.5 * math.log(2.0)).toLong
    assert(out1 == ((2L, lnTwoNano)), s"disjoint halves: $out1")
  }

  test("graph_assortativity: a star graph is perfectly disassortative (-1)") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("doc_a", "doc_b")
    val out = graft.operators.Graph.assortativity(star)
      .as[(Long, Double)].collect()(0)
    assert(out == ((6L, -1.0)), s"star: $out")
    // a cycle is degree-regular -> zero variance -> NULL statistic
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("doc_a", "doc_b")
    val c = graft.operators.Graph.assortativity(cycle)
      .select("assortativity").collect()(0)
    assert(c.isNullAt(0), s"cycle must yield NULL, got $c")
  }

  test("q_mcnemar counts discordant customers and matches the paired statistic") {
    // c1 pre-only, c2 post-only, c3 both, c4 pre-only -> b=2, c=1,
    // stat = 1e6 * (2-1)^2 / 3 = 333333
    val orders = Seq(
      (1L, 1L, "1995-03-01"), (2L, 2L, "1999-03-01"),
      (3L, 3L, "1995-03-01"), (4L, 3L, "1999-03-01"),
      (5L, 4L, "1996-03-01")
    ).map { case (ok, ck, d) => (ok, ck, "O", 1.0, d, "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val dir = plantDir("orders" -> orders)
    val out = SparkEntry.queries("q_mcnemar")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((4L, 2L, 1L, 333333L)), s"got ${out.toSeq}")
  }

  test("er_fs_classify ranks the true-match pair first with the summed FS weights") {
    val t1 = (1 to 24).map(i => s"alpha$i").mkString(" ")
    val t2 = (1 to 24).map(i => s"bravo$i bis$i").mkString(" ").padTo(400, 'x')
    val t3 = (1 to 24).map(i => s"ch$i charlie$i").mkString(" ").padTo(400, 'y')
    val dir = plantDir("documents" -> docsDf(Seq(
      (0L, t1, "en", "s1"), (5L, t1, "en", "s1"),
      (10L, t2, "en", "s2"), (15L, t3, "en", "s3"))))
    val out = SparkEntry.queries("er_fs_classify")(spark, dir)
      .as[(Long, Long, Long, Boolean)].collect()
    def w(cap: Long, fp: Long) = {
      val m = (cap + 1).toDouble / 3; val u = (fp + 1).toDouble / 7
      (math.floor(1000 * math.log(m / u) / math.log(2)).toLong,
        math.floor(1000 * math.log((1 - m) / (1 - u)) / math.log(2)).toLong)
    }
    val (wa1, wd1) = w(1, 0); val (wa2, wd2) = w(1, 1); val (wa3, wd3) = w(1, 0)
    // (0,5) agrees on every field; (10,15) agrees only on len_band;
    // the other four pairs disagree everywhere
    assert(out.head == ((0L, 5L, wa1 + wa2 + wa3, true)), s"top: ${out.head}")
    val byPair = out.map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(byPair((10L, 15L)) == ((wd1 + wa2 + wd3, wd1 + wa2 + wd3 > 0)))
    assert(byPair((0L, 10L)) == ((wd1 + wd2 + wd3, false)))
    assert(out.count(_._4) == 1, "exactly one pair classifies as a match")
  }

  test("text_burstiness: one bursty token scores 4.0, a uniform token scores 0") {
    val dir = plantDir("documents" -> docsDf(Seq(
      (0L, "a a a a a b", "en", "s"),
      (1L, "b", "en", "s"), (2L, "b", "en", "s"),
      (3L, "b", "en", "s"), (4L, "b", "en", "s"))))
    val out = SparkEntry.queries("text_burstiness")(spark, dir)
      .as[(String, Long, Long, Double)].collect()
    // a: cw=5 sq=25 df=1, N=5 -> (125-25)/25 = 4.0; b: cw=5 sq=5 df=5 -> 0
    assert(out.toSeq == Seq(("a", 5L, 1L, 4.0), ("b", 5L, 5L, 0.0)),
      s"got ${out.toSeq}")
  }

  test("q_diff_in_diff: four hand-built cells give the textbook DiD estimate") {
    // treated pre 10, post 30 (Δ=20); control pre 10, post 15 (Δ=5) -> DiD 15
    val customers = Seq(
      (1L, "t", 0L, 0.0, "AUTOMOBILE"), (2L, "c", 0L, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val orders = Seq(
      (1L, 1L, "1995-01-01", 10.0), (2L, 1L, "1999-01-01", 30.0),
      (3L, 2L, "1995-01-01", 10.0), (4L, 2L, "1999-01-01", 15.0)
    ).map { case (ok, ck, d, v) => (ok, ck, "O", v, d, "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val dir = plantDir("orders" -> orders, "customer" -> customers)
    val out = SparkEntry.queries("q_diff_in_diff")(spark, dir)
      .select("mean_t_pre", "mean_t_post", "mean_c_pre", "mean_c_post", "did_estimate")
      .as[(Double, Double, Double, Double, Double)].collect()(0)
    assert(out == ((10.0, 30.0, 10.0, 15.0, 15.0)), s"got $out")
  }

  test("q_power_analysis reproduces the two-proportion formula; equal rates give NULL") {
    // arm0: 4 customers, 2 converters (p1=.5); arm1: 4 customers, 1 (p2=.25)
    val orders = (
      Seq((2L, 2), (4L, 2), (6L, 1), (8L, 1)) ++   // even custkeys, repeat iff cnt=2
      Seq((1L, 2), (3L, 1), (5L, 1), (7L, 1))
    ).flatMap { case (ck, cnt) => (1 to cnt).map(i => (ck * 100 + i, ck)) }
      .map { case (ok, ck) => (ok.toLong, ck.toLong, "O", 1.0, "1995-01-01", "x") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val dir = plantDir("orders" -> orders)
    val out = SparkEntry.queries("q_power_analysis")(spark, dir)
      .as[(Long, Long, Option[Long])].collect()(0)
    assert(out._1 == 500000L && out._2 == 250000L)
    val (p1, p2, pb) = (0.5, 0.25, 0.375)
    val num = 1.959963984540054 * math.sqrt(2 * pb * (1 - pb)) +
      0.8416212335729143 * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))
    val exp = math.ceil(num * num / ((p1 - p2) * (p1 - p2))).toLong
    assert(out._3.contains(exp), s"got ${out._3} expected $exp")
  }

  test("degenerate n=1 strata: neyman pins weight 0, cohens_d emits NULL, never NaN") {
    // r11 ADVICE: sqrt((sxx - sx^2/n)/(n-1)) is NaN for an n=1 stratum;
    // floor(NaN) casts to 0 in Spark but errors/diverges in DuckDB. The
    // guards pin the behavior explicitly on both engines — this plants
    // the degenerate case the TPC-H fixture never produces.
    val orders = Seq(
      ("1-URGENT", 100.0), ("1-URGENT", 300.0), ("1-URGENT", 260.0),
      ("5-LOW", 42.0) // singleton stratum: SD undefined
    ).toDF("o_orderpriority", "o_totalprice")
    val dir = plantDir("orders" -> orders)
    val alloc = SparkEntry.queries("q_neyman_allocation")(spark, dir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(alloc("5-LOW") == ((1L, 0L)),
      s"singleton stratum must get weight 0 -> allocation 0, got ${alloc("5-LOW")}")
    assert(alloc("1-URGENT")._2 == 10000L,
      s"the whole budget must flow to the estimable stratum, got $alloc")
    // cohens_d against a singleton control arm: variance is NULL (not
    // NaN), so the statistic is NULL on both engines
    val d = SparkEntry.queries("q_cohens_d")(spark, dir).collect()(0)
    assert(d.isNullAt(d.fieldIndex("cohens_d")),
      s"cohens_d over a singleton arm must be NULL, got $d")
    val w = SparkEntry.queries("q_welch_ttest")(spark, dir).collect()(0)
    assert(w.isNullAt(w.fieldIndex("t_stat")),
      s"welch t over a singleton arm must be NULL, got $w")
  }

  test("text_compressibility: hand-computed bigram counts pin the proxy exactly") {
    // "aaaa": bigrams at i=1..3 are aa,aa,aa -> 1 distinct / 3 -> 333 pm
    // "abcd": ab,bc,cd -> 3 distinct / 3 -> 1000 pm
    // "abab": ab,ba,ab -> 2 distinct / 3 -> 666 pm
    // "":     no bigrams -> distinct 0, pm pins to 1000 by convention
    // "x":    length 1 -> same convention row as the empty doc
    val dir = plantDir("documents" -> docsDf(Seq(
      (1L, "aaaa", "en", "s"), (2L, "abcd", "en", "s"),
      (3L, "abab", "en", "s"), (4L, "", "en", "s"), (5L, "x", "en", "s"))))
    val out = SparkEntry.queries("text_compressibility")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((4L, 1L, 333L)), s"got ${out(1L)}")
    assert(out(2L) == ((4L, 3L, 1000L)), s"got ${out(2L)}")
    assert(out(3L) == ((4L, 2L, 666L)), s"got ${out(3L)}")
    assert(out(4L) == ((0L, 0L, 1000L)), s"got ${out(4L)}")
    assert(out(5L) == ((1L, 0L, 1000L)), s"got ${out(5L)}")
  }

  test("compressionRatio operator: repetitive text compresses far below varied text") {
    // the exact-DEFLATE form lives as a library operator (not a catalog
    // entry — zlib output is not SQL-replayable; r11 verdict item 6);
    // this pin is its correctness contract
    val rep = "the same line again " * 50
    val varied = (1 to 200).map(i => s"w${i * 7919 % 1000}x$i").mkString(" ")
    val dir = plantDir("documents" -> docsDf(Seq(
      (1L, rep, "en", "s"), (2L, varied, "en", "s"), (3L, "", "en", "s"))))
    def run() = graft.operators.TextAnalysis
      .compressionRatio(spark.read.parquet(s"$dir/documents.parquet"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val out = run()
    val (repLen, repDef, repPm) = out(1L)
    val (varLen, varDef, varPm) = out(2L)
    assert(repLen == rep.length && varLen == varied.length)
    assert(repPm < 100, s"repetitive text must compress under 10%, got $repPm pm")
    assert(varPm > repPm * 3, s"varied ($varPm) must sit far above repetitive ($repPm)")
    assert(repDef > 0 && varDef > 0 && out(3L)._2 >= 0)
    // determinism: a second evaluation returns identical lengths
    val again = run().map { case (k, v) => k -> v._2 }
    assert(again(1L) == repDef && again(2L) == varDef)
    // the catalog-facing proxy twin agrees on the ORDERING: repetitive
    // text mints far fewer distinct bigrams per bigram than varied text
    val proxy = SparkEntry.queries("text_compressibility")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    assert(proxy(1L) < 100, s"repetitive proxy must sit under 10%, got ${proxy(1L)}")
    assert(proxy(2L) > proxy(1L) * 3,
      s"varied proxy (${proxy(2L)}) must sit far above repetitive (${proxy(1L)})")
    assert(proxy(3L) == 1000L, "the empty doc pins to 1000 pm by convention")
  }

  test("graph_clustering_coeff: triangle vertices close, the pendant is excluded") {
    // triangle 1-2-3 plus pendant edge 1-4: c(1)=1/3, c(2)=c(3)=1, 4 has deg 1
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)).toDF("doc_a", "doc_b")
    val out = graft.operators.Graph.clusteringCoefficients(pairs)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 3L, 1L, 333333L), (2L, 2L, 1L, 1000000L),
      (3L, 2L, 1L, 1000000L)), s"got ${out.toSeq}")
  }

  test("er_fs_em: the unsupervised EM fixpoint replays exactly and separates m from u") {
    // planted comparison space (no labels used): patterns
    // (1,1,1):1 pair, (0,1,0):1, (0,0,0):4
    val t1 = (1 to 24).map(i => s"alpha$i").mkString(" ")
    val t2 = (1 to 24).map(i => s"bravo$i bis$i").mkString(" ").padTo(400, 'x')
    val t3 = (1 to 24).map(i => s"ch$i charlie$i").mkString(" ").padTo(400, 'y')
    val dir = plantDir("documents" -> docsDf(Seq(
      (0L, t1, "en", "s1"), (5L, t1, "en", "s1"),
      (10L, t2, "en", "s2"), (15L, t3, "en", "s3"))))
    val out = SparkEntry.queries("er_fs_em")(spark, dir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // replay the identical quantized EM in plain Scala
    val pats = Seq((Array(1L, 1L, 1L), 1L), (Array(0L, 1L, 0L), 1L), (Array(0L, 0L, 0L), 4L))
    var pi = 0.1
    var m = Array(0.9, 0.9, 0.9); var u = Array(0.1, 0.1, 0.1)
    for (_ <- 1 to 3) {
      val wq = pats.map { case (g, _) =>
        def lk(p: Array[Double], i: Int) = if (g(i) == 1) p(i) else 1 - p(i)
        val a = pi * lk(m, 0) * lk(m, 1) * lk(m, 2)
        val b = (1 - pi) * lk(u, 0) * lk(u, 1) * lk(u, 2)
        math.floor(1e12 * (a / (a + b))).toLong
      }
      val ngw = pats.zip(wq).map { case ((_, n), w) => n * w }
      val ngn = pats.zip(wq).map { case ((_, n), w) => n * (1000000000000L - w) }
      val sW = ngw.sum; val sN = ngn.sum; val sNg = pats.map(_._2).sum
      pi = sW.toDouble / (sNg.toDouble * 1e12)
      m = Array.tabulate(3)(i =>
        pats.zip(ngw).collect { case ((g, _), x) if g(i) == 1 => x }.sum.toDouble / sW.toDouble)
      u = Array.tabulate(3)(i =>
        pats.zip(ngn).collect { case ((g, _), x) if g(i) == 1 => x }.sum.toDouble / sN.toDouble)
    }
    def ppm(x: Double) = math.floor(1e6 * x).toLong
    val piPpm = ppm(pi)
    assert(out("source") == ((ppm(m(0)), ppm(u(0)), piPpm)), s"source: ${out("source")}")
    assert(out("len_band") == ((ppm(m(1)), ppm(u(1)), piPpm)), s"len_band: ${out("len_band")}")
    assert(out("prefix2") == ((ppm(m(2)), ppm(u(2)), piPpm)), s"prefix2: ${out("prefix2")}")
    // without any labels, EM must still conclude agreement is match evidence
    assert(out("source")._1 > out("source")._2, "m(source) must exceed u(source)")
  }

  test("q_shapley_attribution: exact phi*6 on a hand corpus, efficiency property holds") {
    // u1 {click} conv; u2 {view,signup} conv; u3 {click,view} no;
    // u4 {} conv. v(emptyset)=1, v(C)=3 -> sum(phi*6) must be 12.
    def ev(id: Long, uid: Long, t: String) = (id, "2024-01-01T00:00:00", uid, t, 1.0, "{}")
    val events = Seq(
      ev(1, 1, "click"), ev(2, 1, "purchase"),
      ev(3, 2, "view"), ev(4, 2, "signup"), ev(5, 2, "purchase"),
      ev(6, 3, "click"), ev(7, 3, "view"),
      ev(8, 4, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
    val dir = plantDir("events" -> events)
    val out = SparkEntry.queries("q_shapley_attribution")(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(out.values.sum == 12L, s"efficiency: ${out}")
    // replay: masks {1:conv, 6:conv, 3:no, 0:conv}; v(S) over subsets
    val cm = Map(1L -> 1L, 6L -> 1L, 3L -> 0L, 0L -> 1L)
    def v(sS: Long) = cm.collect { case (m, c) if (m & sS) == m => c }.sum
    def phi6(bit: Long) = (0L until 8L).filter(sS => (sS & bit) == 0).map { sS =>
      val w6 = java.lang.Long.bitCount(sS) match { case 0 => 2L; case 1 => 1L; case _ => 2L }
      w6 * (v(sS | bit) - v(sS))
    }.sum
    assert(out("click") == phi6(1L), s"click: ${out("click")} vs ${phi6(1L)}")
    assert(out("view") == phi6(2L), s"view: ${out("view")}")
    assert(out("signup") == phi6(4L), s"signup: ${out("signup")}")
  }

  test("CountMin.innerProduct is exact without collisions and never undercounts") {
    import graft.functions.{CountMin, CountMinAgg}
    val width = 1 << 16; val depth = 4
    val agg = new CountMinAgg(width, depth)
    val a = Seq(1L, 1L, 1L, 2L).foldLeft(agg.zero)(agg.reduce)
    val b = Seq(1L, 2L, 2L, 3L).foldLeft(agg.zero)(agg.reduce)
    // exact join size: 3*1 + 1*2 = 5; at width 65536 with 4 keys the
    // probability of a colliding row in ALL 4 depths is ~0
    assert(CountMin.innerProduct(a, b, width, depth) == 5L)
    val narrow = new CountMinAgg(8, 4)
    val na = Seq(1L, 1L, 1L, 2L).foldLeft(narrow.zero)(narrow.reduce)
    val nb = Seq(1L, 2L, 2L, 3L).foldLeft(narrow.zero)(narrow.reduce)
    assert(CountMin.innerProduct(na, nb, 8, 4) >= 5L, "CM inner product never undercounts")
  }

  test("q_cm_join_size: planted overlap gives exact 5 and the sketch bounds hold") {
    def ev(id: Long, uid: Long) = (id, "2024-01-01T00:00:00", uid, "click", 1.0, "{}")
    val events = Seq(ev(1, 1), ev(2, 1), ev(3, 1), ev(4, 2))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
    val orders = Seq((10L, 1L), (11L, 2L), (12L, 2L), (13L, 3L))
      .map { case (ok, ck) => (ok, ck, "O", 1.0, "1995-01-01", "x") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val dir = plantDir("events" -> events, "orders" -> orders)
    val out = SparkEntry.queries("q_cm_join_size")(spark, dir)
      .as[(Long, Boolean, Boolean)].collect()
    assert(out.toSeq == Seq((5L, true, true)), s"got ${out.toSeq}")
  }

  test("q_mutual_information replays the floored-term MI on the planted 2x2") {
    val orders = (
      Seq.fill(10)(("A", "O")) ++ Seq.fill(20)(("A", "F")) ++
      Seq.fill(30)(("B", "O")) ++ Seq.fill(40)(("B", "F"))
    ).zipWithIndex.map { case ((p, st), i) =>
      (i.toLong, i.toLong, st, 1.0, "1995-01-01", p)
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val dir = plantDir("orders" -> orders)
    val out = SparkEntry.queries("q_mutual_information")(spark, dir)
      .as[(Long, Long, Long)].collect()(0)
    val cells = Seq((10.0, 30.0, 40.0), (20.0, 30.0, 60.0),
      (30.0, 70.0, 40.0), (40.0, 70.0, 60.0))
    val exp = cells.map { case (c, r, k) =>
      math.floor(1e9 * (c / 100.0) * math.log(c * 100.0 / (r * k))).toLong
    }.sum
    assert(out == ((100L, 4L, exp)), s"got $out expected (100, 4, $exp)")
    assert(out._3 > 0, "dependent margins must carry positive MI")
  }

  test("q_lorenz_curve: ten distinct spends land one per decile with exact shares") {
    val orders = (1 to 10).map(i =>
      (i.toLong, i.toLong, "O", i.toDouble, "1995-01-01", "x"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val dir = plantDir("orders" -> orders)
    val out = SparkEntry.queries("q_lorenz_curve")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val tot = 5500L
    val exp = (1 to 10).map { d =>
      val cents = d * 100L
      val cum = (1 to d).map(_ * 100L).sum
      (d.toLong, 1L, cents * 1000 / tot, cum * 1000 / tot)
    }
    assert(out.toSeq == exp, s"got ${out.toSeq}")
    assert(out.last._4 == 1000L, "cumulative share must close at 1000 pm")
  }

  test("q_sprt crosses the upper boundary on a high-rate stream, lower on a low-rate one") {
    // 'hot' runs at p=1 (value 5 > 2.5): each day adds 50*ln(1.25) ~ +11.157
    // micro-millions; upper bound ln(19) ~ 2.944 -> crosses day 1.
    // 'cold' runs at p=0: each day adds 50*ln(5/6) ~ -9.116 -> crosses day 1.
    def ev(id: Long, day: Int, t: String, v: Double) =
      (id, f"2024-01-$day%02dT00:00:00", 1L, t, v, "{}")
    val events = ((1 to 100).map(i => ev(i.toLong, 1 + (i - 1) / 50, "hot", 5.0)) ++
      (1 to 100).map(i => ev(200L + i, 1 + (i - 1) / 50, "cold", 1.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
    val dir = plantDir("events" -> events)
    val out = SparkEntry.queries("q_sprt")(spark, dir)
      .as[(String, String, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("hot") == (("accept_h1", "2024-01-01")), s"hot: ${out("hot")}")
    assert(out("cold") == (("accept_h0", "2024-01-01")), s"cold: ${out("cold")}")
  }

  test("q_anova_f: two planted groups give the textbook F = 8") {
    // A: {100, 200}, B: {300, 400} -> means 150/350, grand 250,
    // SSB = 2*100^2 + 2*100^2 = 40000, SSW = 4*50^2 = 10000,
    // F = (40000/1) / (10000/2) = 8
    val orders = Seq(
      (1L, "1-URGENT", 100.0), (2L, "1-URGENT", 200.0),
      (3L, "5-LOW", 300.0), (4L, "5-LOW", 400.0)
    ).map { case (ok, p, v) => (ok, ok, "O", v, "1995-01-01", p) }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val dir = plantDir("orders" -> orders)
    val out = SparkEntry.queries("q_anova_f")(spark, dir)
      .as[(Long, Long, Double)].collect()(0)
    assert(out == ((4L, 2L, 8.0)), s"got $out")
  }

  test("q_cohens_kappa: one doc per 2x2 cell gives kappa exactly 0") {
    // po = 0.5 and pe = 0.5 (marginals are 50/50), so kappa = 0
    val dir = plantDir("documents" -> docsDf(Seq(
      (1L, Seq.fill(50)("abcd").mkString(" "), "en", "s"), // 249 chars, 50 words: both
      (2L, "z" * 250, "en", "s"),                          // 250 chars, 1 word: a only
      (3L, "abc def", "en", "s"),                          // 7 chars, 2 words: b only
      (4L, "x", "en", "s"))))                              // neither
    val out = SparkEntry.queries("q_cohens_kappa")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Double)].collect()(0)
    assert(out == ((4L, 1L, 1L, 1L, 1L, 0.0)), s"got $out")
  }

  test("q_kruskal_wallis: separated nations give the closed-form H, no ties") {
    // nation 0 holds ranks {1,2,3}, nation 1 {4,5,6}:
    // H = 12/(6*7) * (36/3 + 225/3) - 3*7
    val customers = Seq((1L, 0L), (2L, 1L)).map { case (ck, nk) =>
      (ck, s"c$ck", nk, 0.0, "BUILDING")
    }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val orders = Seq(
      (1L, 1L, "1995-01-15", 100.0), (2L, 1L, "1995-02-15", 200.0),
      (3L, 1L, "1995-03-15", 300.0),
      (4L, 2L, "1995-01-15", 400.0), (5L, 2L, "1995-02-15", 500.0),
      (6L, 2L, "1995-03-15", 600.0)
    ).map { case (ok, ck, d, v) => (ok, ck, "O", v, d, "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val dir = plantDir("orders" -> orders, "customer" -> customers)
    val out = SparkEntry.queries("q_kruskal_wallis")(spark, dir)
      .as[(Long, Long, Double, Double)].collect()(0)
    val h = 12.0 / (6L * 7L) * (36.0 / 3 + 225.0 / 3) - 7L * 3.0
    val hr = BigDecimal(h).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == ((6L, 2L, hr, hr)), s"got $out expected H=$hr")
  }

  test("q_mann_kendall: a strictly increasing series gives S = n(n-1)/2") {
    val customers = Seq((1L, "c", 0L, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val orders = (1 to 5).map { m =>
      (m.toLong, 1L, "O", m * 100.0, f"1995-$m%02d-15", "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val dir = plantDir("orders" -> orders, "customer" -> customers)
    val out = SparkEntry.queries("q_mann_kendall")(spark, dir)
      .as[(Long, Long, Long, Double)].collect()(0)
    assert((out._1, out._2, out._3) == ((0L, 5L, 10L)), s"got $out")
    val z = 9.0 / math.sqrt(5.0 * 4 * 15 / 18.0)
    assert(math.abs(out._4 - z) < 1e-6, s"z ${out._4} expected ~$z")
  }

  test("Graph.katz: three unrolled rounds on a path graph, by hand") {
    // path 1-2-3, alpha = 1/8, beta = 10000:
    // x1 = (11250, 12500, 11250); x2 = (11562, 12812, 11562);
    // x3 = (11601, 12890, 11601) with div truncation at every round
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = graft.operators.Graph.katz(pairs, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 11601L, 2L -> 12890L, 3L -> 11601L), s"got $out")
  }

  test("q_bradley_terry: the two floored MM rounds replay by hand") {
    // u1: A2 B1, u2: A2 C1, u3: B2 C1 -> A beats B, A beats C, B beats C
    // (wins A=2 B=1 C=0, one game per pair). Round 1 collapses to
    // pi = (2e6, 1e6, 0); round 2: denom_A = 333333+500000,
    // praw_A = floor(2e12/833333) = 2400000, tot = 3150000,
    // pi_A = floor(2400000*3e6/3150000) = 2285714, pi_B = 714285.
    def ev(id: Long, uid: Long, t: String) = (id, "2024-01-01T00:00:00", uid, t, 1.0, "{}")
    val events = (
      Seq(ev(1, 1, "A"), ev(2, 1, "A"), ev(3, 1, "B")) ++
      Seq(ev(4, 2, "A"), ev(5, 2, "A"), ev(6, 2, "C")) ++
      Seq(ev(7, 3, "B"), ev(8, 3, "B"), ev(9, 3, "C"))
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
    val dir = plantDir("events" -> events)
    val out = SparkEntry.queries("q_bradley_terry")(spark, dir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("A") == ((2L, 2L, 2285714L)), s"A: ${out("A")}")
    assert(out("B") == ((1L, 2L, 714285L)), s"B: ${out("B")}")
    assert(out("C") == ((0L, 2L, 0L)), s"C: ${out("C")}")
  }

  test("vector_davies_bouldin: planted two-label corpus gives ratio exactly 1") {
    // label 0: q = [0,255] and [255,0] (scatter^2 = 32512.5);
    // label 1: q = [0,255] (scatter 0); centroid gap d2 = 32512.5
    // -> both DB ratios are sqrt(32512.5)/sqrt(32512.5) = 1.0
    val emb = Seq(
      (1L, Array(0.0f, 1.0f), 0), (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val dir = plantDir("embeddings" -> emb)
    val out = SparkEntry.queries("vector_davies_bouldin")(spark, dir)
      .as[(Int, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val sc = BigDecimal(math.sqrt(32512.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0) == ((2L, sc, 1.0)), s"label 0: ${out(0)}")
    assert(out(1) == ((1L, 0.0, 1.0)), s"label 1: ${out(1)}")
  }

  test("text_heaps_fit: two-bucket corpus fits beta = ln2/ln2.5") {
    // doc 0 ("a b") -> bucket 1; docs 1,2 ("a c", "d") -> bucket 2:
    // curve (2 tokens, 2 vocab) then (5 tokens, 4 vocab)
    val dir = plantDir("documents" -> docsDf(Seq(
      (0L, "a b", "en", "s"), (1L, "a c", "en", "s"), (2L, "d", "en", "s"))))
    val out = SparkEntry.queries("text_heaps_fit")(spark, dir)
      .as[(Int, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3, r._4)).toSeq ==
      Seq((1, 2L, 2L, 2L), (2, 5L, 4L, 2L)), s"curve: ${out.toSeq}")
    val beta = math.log(2.0) / math.log(2.5)
    assert(math.abs(out(0)._5 - beta) < 1e-5, s"beta ${out(0)._5} expected ~$beta")
  }

  test("q_stratified_ate: planted strata give the exact cent gap; missing arm gives NULL") {
    val customers = Seq((1L, 0L), (2L, 0L), (3L, 1L)).map { case (ck, nk) =>
      (ck, s"c$ck", nk, 0.0, "BUILDING")
    }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val orders = Seq(
      (1L, 1L, "1-URGENT", 3.0), (2L, 2L, "5-LOW", 1.0),  // nk0: gap 200 cents
      (3L, 3L, "1-URGENT", 9.0)                            // nk1: no control arm
    ).map { case (ok, ck, p, v) => (ok, ck, "O", v, "1995-01-01", p) }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val dir = plantDir("orders" -> orders, "customer" -> customers)
    val out = SparkEntry.queries("q_stratified_ate")(spark, dir)
      .as[(Long, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(0L) == ((2L, 1L, 1L, Some(200L))), s"nk0: ${out(0L)}")
    assert(out(1L) == ((1L, 1L, 0L, None)), s"nk1: ${out(1L)}")
  }

  test("q_winsorized_mean: clamping only the top value moves the mean to 5.40") {
    // values 1..10, lo = disc(0.1) = 1, hi = disc(0.9) = 9: only 10 clamps
    val orders = (1 to 10).map { i =>
      (i.toLong, i.toLong, "O", i.toDouble, "1995-01-01", "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val dir = plantDir("orders" -> orders)
    val out = SparkEntry.queries("q_winsorized_mean")(spark, dir)
      .as[(String, Long, Double, Long)].collect()(0)
    assert(out == (("1-URGENT", 10L, 54.0, 540L)), s"got $out")
  }

  test("q_median_polish: the anomalous cell is the only nonzero residual") {
    // cents table [[100,200],[300,600]]: row sweeps then column sweeps
    // leave exactly (1, LOW) = 200 — the cell that breaks additivity
    val customers = Seq((1L, 0L), (2L, 1L)).map { case (ck, nk) =>
      (ck, s"c$ck", nk, 0.0, "BUILDING")
    }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val orders = Seq(
      (1L, 1L, "1-URGENT", 1.0), (2L, 1L, "5-LOW", 2.0),
      (3L, 2L, "1-URGENT", 3.0), (4L, 2L, "5-LOW", 6.0)
    ).map { case (ok, ck, p, v) => (ok, ck, "O", v, "1995-01-01", p) }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val dir = plantDir("orders" -> orders, "customer" -> customers)
    val out = SparkEntry.queries("q_median_polish")(spark, dir)
      .as[(Long, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out == Map(
      (0L, "1-URGENT") -> 0L, (0L, "5-LOW") -> 0L,
      (1L, "1-URGENT") -> 0L, (1L, "5-LOW") -> 200L), s"got $out")
  }

  test("q_ipf_raking replays the floored scaling fixpoint in plain Scala") {
    // 2x2 with a missing cell: nk0 = {URGENT:1, LOW:1}, nk1 = {URGENT:2}
    val customers = Seq((1L, 0L), (2L, 1L)).map { case (ck, nk) =>
      (ck, s"c$ck", nk, 0.0, "BUILDING")
    }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val orders = Seq(
      (1L, 1L, "1-URGENT"), (2L, 1L, "5-LOW"),
      (3L, 2L, "1-URGENT"), (4L, 2L, "1-URGENT")
    ).map { case (ok, ck, p) => (ok, ck, "O", 1.0, "1995-01-01", p) }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val dir = plantDir("orders" -> orders, "customer" -> customers)
    val out = SparkEntry.queries("q_ipf_raking")(spark, dir)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._4, r._5))).toMap
    // replay with the entry's exact double chains
    var w = Map((0L, "U") -> 1000000L, (0L, "L") -> 1000000L, (1L, "U") -> 2000000L)
    val (nn, kr, kc) = (4L, 2L, 2L)
    for (_ <- 1 to 2) {
      val rt = w.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      w = w.map { case (k, v) =>
        k -> math.floor(v * (nn.toDouble * 1e6 / kr) / rt(k._1)).toLong }
      val ct = w.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
      w = w.map { case (k, v) =>
        k -> math.floor(v * (nn.toDouble * 1e6 / kc) / ct(k._2)).toLong }
    }
    def exp(k: (Long, String), n: Long) =
      (w(k), math.floor(w(k).toDouble * 1e6 / (n * 1000000L)).toLong)
    assert(out((0L, "1-URGENT")) == exp((0L, "U"), 1L), s"got $out replay $w")
    assert(out((0L, "5-LOW")) == exp((0L, "L"), 1L), s"got $out replay $w")
    assert(out((1L, "1-URGENT")) == exp((1L, "U"), 2L), s"got $out replay $w")
  }

  test("q_sax_symbols: a step series reads 'ac'") {
    val customers = Seq((1L, "c", 0L, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val orders = (1 to 6).map { m =>
      val v = if (m <= 3) 1.0 else 4.0
      (m.toLong, 1L, "O", v, f"1995-$m%02d-15", "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val dir = plantDir("orders" -> orders, "customer" -> customers)
    val out = SparkEntry.queries("q_sax_symbols")(spark, dir)
      .as[(Long, Long, String)].collect()(0)
    assert(out == ((0L, 2L, "ac")), s"got $out")
  }

  test("dq_dp_histogram: noise replays from the md5-seeded inverse CDF and clamps at zero") {
    val out = SparkEntry.queries("dq_dp_histogram")(spark, sf0001)
      .select("lang", "n_noisy").as[(String, Long)].collect().toMap
    val truth = spark.read.parquet(s"$sf0001/documents.parquet")
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(out.keySet == truth.keySet)
    out.foreach { case (lang, noisy) =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dp1_$lang".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(12)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 281474976710656.0
      val lap = if (u < 0.5) math.log(2.0 * u) else -math.log(2.0 * (1.0 - u))
      val expected = math.max(truth(lang) + math.floor(lap).toLong, 0L)
      assert(noisy == expected, s"$lang: got $noisy expected $expected")
      assert(noisy >= 0L)
    }
  }
}
