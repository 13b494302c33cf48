package graft

import org.apache.spark.sql.functions._

/** Hand-computed semantics checks for the round-11 statistics/survival/
  * vector/text entries, on PLANTED fixtures (temp parquet dirs shaped like
  * the driver testdata) so every expected value is derivable on paper —
  * the catalog's DuckDB oracles prove engine agreement, these prove the
  * MATH (the StatsEntrySpec discipline).
  */
class Round11EntrySpec extends SparkSpec {
  import spark.implicits._

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-r11").toString
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    dir
  }

  private def docsDf(rows: Seq[(Long, String, String, String)]) =
    rows.map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  private def ordersDf(rows: Seq[(Long, Long, Double, String, String)]) =
    rows.map { case (ok, ck, price, date, pri) => (ok, ck, "O", price, date, pri) }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")

  private def customerDf(rows: Seq[(Long, Long, String)]) =
    rows.map { case (ck, nk, seg) => (ck, s"c$ck", nk, 0.0, seg) }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

  private def embDf(rows: Seq[(Long, Array[Float], Int)]) =
    rows.toDF("vec_id", "embedding", "label")

  test("q_cohens_d: the Welch fixture gives d = -2.828427, Hedges g = -1.616244") {
    // A {100,200}, B {300,400}: means 150/350, pooled var 5000,
    // d = -200/sqrt(5000); g = d*(1 - 3/(4*4-9)) = d*4/7
    val dir = plantDir("orders" -> ordersDf(Seq(
      (1L, 1L, 100.0, "1995-01-01", "1-URGENT"),
      (2L, 2L, 200.0, "1995-01-01", "1-URGENT"),
      (3L, 3L, 300.0, "1995-01-01", "5-LOW"),
      (4L, 4L, 400.0, "1995-01-01", "5-LOW"))))
    val out = SparkEntry.queries("q_cohens_d")(spark, dir)
      .as[(Long, Long, Double, Double)].collect()(0)
    assert(out == ((2L, 2L, -2.828427, -1.616244)), s"got $out")
  }

  test("q_levene_bf: medians 10/20, hand-floored terms give F = 0.264901") {
    // A {0,10,11}: med 10, z {10,0,1}, zbar 11/3, num floor(3*(11/3-5.5)^2)=10,
    //   den floor(101-121/3)=60; B {0,20,22}: med 20, z {20,0,2}, num 10,
    //   den floor(404-484/3)=242; F = (20/1)/(302/4) = 0.2649006...
    val dir = plantDir("orders" -> ordersDf(Seq(
      (1L, 1L, 0.0, "1995-01-01", "1-URGENT"),
      (2L, 2L, 10.0, "1995-01-01", "1-URGENT"),
      (3L, 3L, 11.0, "1995-01-01", "1-URGENT"),
      (4L, 4L, 0.0, "1995-01-01", "5-LOW"),
      (5L, 5L, 20.0, "1995-01-01", "5-LOW"),
      (6L, 6L, 22.0, "1995-01-01", "5-LOW"))))
    val out = SparkEntry.queries("q_levene_bf")(spark, dir)
      .as[(Long, Long, Double)].collect()(0)
    assert(out == ((6L, 2L, 0.264901)), s"got $out")
  }

  test("q_tukey_hsd: two groups with MSW 5000 give q = 4.0") {
    // |150-350| / sqrt(5000/2 * (1/2+1/2)) = 200/50 = 4
    val dir = plantDir("orders" -> ordersDf(Seq(
      (1L, 1L, 100.0, "1995-01-01", "1-URGENT"),
      (2L, 2L, 200.0, "1995-01-01", "1-URGENT"),
      (3L, 3L, 300.0, "1995-01-01", "5-LOW"),
      (4L, 4L, 400.0, "1995-01-01", "5-LOW"))))
    val out = SparkEntry.queries("q_tukey_hsd")(spark, dir)
      .as[(String, String, Double)].collect()
    assert(out.toSeq == Seq(("1-URGENT", "5-LOW", 4.0)), s"got ${out.toSeq}")
  }

  private def monthGridOrders(): org.apache.spark.sql.DataFrame = {
    // 2 month-blocks x 5 priorities, value 10*digit: within-block ranks
    // equal the priority digit in every block
    val pris = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val rows = for {
      (m, mi) <- Seq("1995-01-15", "1995-02-15").zipWithIndex
      (p, j) <- pris.zipWithIndex
    } yield ((mi * 5 + j + 1).toLong, (mi * 5 + j + 1).toLong,
      (j + 1) * 10.0, m, p)
    ordersDf(rows)
  }

  test("q_friedman: a perfectly ordered 2x5 grid gives chi2 = 8.000") {
    // R2_j = 4j, sr2 = 880, chi2 = 3*880/(2*5*6) - 3*2*6 = 8
    val dir = plantDir("orders" -> monthGridOrders())
    val out = SparkEntry.queries("q_friedman")(spark, dir)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("1-URGENT") == (("1-URGENT", 4L, 2L, 8000L)), s"got ${out("1-URGENT")}")
    assert(out("5-LOW") == (("5-LOW", 20L, 2L, 8000L)), s"got ${out("5-LOW")}")
  }

  test("q_page_trend: the same grid gives L2 = 220, z = 2.828427") {
    // L = sum j*R_j = 110; mu = 2*5*36/4 = 90; sigma = sqrt(50)
    val dir = plantDir("orders" -> monthGridOrders())
    val out = SparkEntry.queries("q_page_trend")(spark, dir)
      .as[(Long, Long, Double)].collect()(0)
    assert(out == ((2L, 220L, 2.828427)), s"got $out")
  }

  test("q_neyman_allocation: weights 1:2 largest-remainder to 3333/6667") {
    // sd_A = sqrt(20000), w_A = 282842; sd_B = sqrt(80000), w_B = 565685;
    // bases 3333/6666, the single leftover unit goes to B's larger remainder
    val dir = plantDir("orders" -> ordersDf(Seq(
      (1L, 1L, 0.0, "1995-01-01", "1-URGENT"),
      (2L, 2L, 200.0, "1995-01-01", "1-URGENT"),
      (3L, 3L, 0.0, "1995-01-01", "5-LOW"),
      (4L, 4L, 400.0, "1995-01-01", "5-LOW"))))
    val out = SparkEntry.queries("q_neyman_allocation")(spark, dir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("1-URGENT") == (("1-URGENT", 2L, 3333L)), s"got ${out("1-URGENT")}")
    assert(out("5-LOW") == (("5-LOW", 2L, 6667L)), s"got ${out("5-LOW")}")
  }

  test("q_runs_test: an alternating 4-day series gives R = 4, z = sqrt(3/2)") {
    val dir = plantDir("orders" -> ordersDf(Seq(
      (1L, 1L, 1.0, "1995-01-01", "1-URGENT"),
      (2L, 2L, 3.0, "1995-01-02", "1-URGENT"),
      (3L, 3L, 1.0, "1995-01-03", "1-URGENT"),
      (4L, 4L, 3.0, "1995-01-04", "1-URGENT"))))
    val out = SparkEntry.queries("q_runs_test")(spark, dir)
      .as[(Long, Long, Long, Double)].collect()(0)
    assert(out == ((2L, 2L, 4L, 1.224745)), s"got $out")
  }

  private def survivalFixture(): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    // 4 customers first-order on day 0; 1 and 3 repeat on day 1 (events),
    // 2 and 4 censored at the corpus max date (also day 1)
    val orders = ordersDf(Seq(
      (1L, 1L, 10.0, "1995-01-01", "1-URGENT"),
      (2L, 2L, 10.0, "1995-01-01", "1-URGENT"),
      (3L, 3L, 10.0, "1995-01-01", "1-URGENT"),
      (4L, 4L, 10.0, "1995-01-01", "1-URGENT"),
      (5L, 1L, 10.0, "1995-01-02", "1-URGENT"),
      (6L, 3L, 10.0, "1995-01-02", "1-URGENT")))
    val customer = customerDf(Seq(
      (1L, 0L, "BUILDING"), (2L, 0L, "BUILDING"),
      (3L, 1L, "AUTOMOBILE"), (4L, 1L, "AUTOMOBILE")))
    (orders, customer)
  }

  test("q_nelson_aalen: 2 events among 4 at risk gives one 500000-micro step") {
    val (orders, customer) = survivalFixture()
    val dir = plantDir("orders" -> orders, "customer" -> customer)
    val out = SparkEntry.queries("q_nelson_aalen")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 4L, 2L, 500000L)), s"got ${out.toSeq}")
  }

  test("q_log_rank: symmetric cohorts give O-E = 0, Var = 1/3, chi2 = 0") {
    // at t=1: n1=n2=2, d1=d2=1 -> e1 = 1, v = 2*(1/2)*(1/2)*2/3 = 1/3
    val (orders, customer) = survivalFixture()
    val dir = plantDir("orders" -> orders, "customer" -> customer)
    val out = SparkEntry.queries("q_log_rank")(spark, dir)
      .as[(Long, Long, Long, Option[Double])].collect()(0)
    assert(out == ((1L, 0L, 333333L, Some(0.0))), s"got $out")
  }

  test("q_cochran_q: only the URGENT column succeeds -> Q = 8.000") {
    // x=1 iff cell mean > global mean 28 (the two 100-cells):
    // C = (2,0,0,0,0), R_i = 1 each; Q = 4*80/(5*8) = 8
    val pris = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val rows = for {
      ck <- Seq(1L, 2L)
      (p, j) <- pris.zipWithIndex
    } yield ((ck * 10 + j).toLong, ck,
      if (j == 0) 100.0 else 10.0, "1995-01-01", p)
    val dir = plantDir("orders" -> ordersDf(rows),
      "customer" -> customerDf(Seq((1L, 0L, "BUILDING"), (2L, 1L, "AUTOMOBILE"))))
    val out = SparkEntry.queries("q_cochran_q")(spark, dir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("1-URGENT") == (("1-URGENT", 2L, 8000L)), s"got ${out("1-URGENT")}")
    assert(out("5-LOW") == (("5-LOW", 0L, 8000L)), s"got ${out("5-LOW")}")
  }

  test("text_mattr: a half-repetitive, half-distinct 100-token doc scores 750pm") {
    val w1 = (1 to 25).flatMap(i => Seq(s"a$i", s"a$i")) // 50 tokens, 25 types
    val w2 = (1 to 50).map(i => s"b$i")                  // 50 tokens, 50 types
    val dir = plantDir("documents" -> docsDf(Seq(
      (1L, (w1 ++ w2).mkString(" "), "en", "s"))))
    val out = SparkEntry.queries("text_mattr")(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 2L, 750L)), s"got ${out.toSeq}")
  }

  test("text_rake_keywords: 'quick fox' outranks 'dog' with deg/freq milli scores") {
    // phrases: [quick fox] x2, [dog] x1; wscores quick=fox=2000, dog=1000;
    // phrase scores 4000 and 1000
    val dir = plantDir("documents" -> docsDf(Seq(
      (1L, "the quick fox and quick fox of dog", "en", "s"))))
    val out = SparkEntry.queries("text_rake_keywords")(spark, dir)
      .as[(String, Long, Long)].collect()
    assert(out.toSeq == Seq(("quick fox", 2L, 4000L), ("dog", 1L, 1000L)),
      s"got ${out.toSeq}")
  }

  test("text_hapax_ratio: 2 hapaxes among 4 tokens gives 500pm") {
    val dir = plantDir("documents" -> docsDf(Seq(
      (1L, "x x y z", "en", "s"))))
    val out = SparkEntry.queries("text_hapax_ratio")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 4L, 2L, 500L)), s"got ${out.toSeq}")
  }

  test("vector_mmd_linear: orthogonal unit one-hots give MMD2 = 2e12 pico") {
    val dir = plantDir("embeddings" -> embDf(Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.0f, 1.0f), 1))))
    val out = SparkEntry.queries("vector_mmd_linear")(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 1L, 2000000000000L)), s"got ${out.toSeq}")
  }

  test("vector_cka_linear: a perfectly mirrored X/Y slice gives CKA = 1e6 ppm") {
    // v1 lights dim0 and dim8 together, v2 is zero: Cxy = Cxx = Cyy
    val v1 = Array.tabulate(16)(i => if (i == 0 || i == 8) 1.0f else 0.0f)
    val v2 = Array.fill(16)(0.0f)
    val dir = plantDir("embeddings" -> embDf(Seq((1L, v1, 0), (2L, v2, 1))))
    val out = SparkEntry.queries("vector_cka_linear")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()(0)
    assert(out == ((625000000000000L, 625000000000000L, 625000000000000L, 1000000L)),
      s"got $out")
  }

  test("vector_bhattacharyya: identical one-point populations are at distance 0") {
    val dir = plantDir("embeddings" -> embDf(Seq(
      (1L, Array(0.5f), 0), (2L, Array(0.5f), 1))))
    val out = SparkEntry.queries("vector_bhattacharyya")(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 1L, 0L)), s"got ${out.toSeq}")
  }

  test("vector_silhouette_simplified: two separated 1-d pairs score 733333 micro") {
    // label 0 at q {0, 2500} (centroid 1250), label 1 at {5000, 7500}
    // (centroid 6250): s = {0.8, 2/3} per label -> floored mean 733333
    val dir = plantDir("embeddings" -> embDf(Seq(
      (1L, Array(0.0f), 0), (2L, Array(0.25f), 0),
      (3L, Array(0.5f), 1), (4L, Array(0.75f), 1))))
    val out = SparkEntry.queries("vector_silhouette_simplified")(spark, dir)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(0L) == ((0L, 2L, 733333L)), s"got ${out(0L)}")
    assert(out(1L) == ((1L, 2L, 733333L)), s"got ${out(1L)}")
  }

  test("q_two_way_anova: a balanced 2x2 with a pure A effect gives F_A=16, F_B=1, F_AB=0") {
    // cells (U,B)={10,30} (U,A)={20,40} (L,B)={50,70} (L,A)={60,80}:
    // CF=16200, T_cells=19600, T_A=19400, T_B=16400, T_tot=20400
    // -> SS_A=3200 SS_B=200 SS_AB=0 SS_W=800, df_W=4
    val rows = Seq(
      (1L, 10.0, "1-URGENT", 1L), (2L, 30.0, "1-URGENT", 1L),
      (3L, 20.0, "1-URGENT", 2L), (4L, 40.0, "1-URGENT", 2L),
      (5L, 50.0, "5-LOW", 1L), (6L, 70.0, "5-LOW", 1L),
      (7L, 60.0, "5-LOW", 2L), (8L, 80.0, "5-LOW", 2L)
    ).map { case (ok, v, p, ck) => (ok, ck, v, "1995-01-01", p) }
    val dir = plantDir("orders" -> ordersDf(rows),
      "customer" -> customerDf(Seq((1L, 0L, "BUILDING"), (2L, 1L, "AUTOMOBILE"))))
    val out = SparkEntry.queries("q_two_way_anova")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Double, Double, Double)].collect()(0)
    assert(out == ((8L, 3200L, 200L, 0L, 800L, 16.0, 1.0, 0.0)), s"got $out")
  }

  test("q_grubbs: the single high day carries G = 1.5") {
    // daily cents {100,100,100,200}: mean 125, sd 50, G = 75/50
    val dir = plantDir("orders" -> ordersDf(Seq(
      (1L, 1L, 1.0, "1995-01-01", "1-URGENT"),
      (2L, 2L, 1.0, "1995-01-02", "1-URGENT"),
      (3L, 3L, 1.0, "1995-01-03", "1-URGENT"),
      (4L, 4L, 2.0, "1995-01-04", "1-URGENT"))))
    val out = SparkEntry.queries("q_grubbs")(spark, dir)
      .as[(java.sql.Date, Long, Double)].collect()(0)
    assert(out._1.toString == "1995-01-04" && out._2 == 200L && out._3 == 1.5,
      s"got $out")
  }

  test("q_durbin_watson: an alternating residual pattern gives DW = 3.4") {
    // y = {1e5, 2e5, 1e5, 2e5} cents on consecutive days: OLS b=20000/1000?
    // residuals {-2e4, 6e4, -6e4, 2e4}; num=27200, den=8000 at 1e6 grain
    val dir = plantDir("orders" -> ordersDf(Seq(
      (1L, 1L, 1000.0, "1995-01-01", "1-URGENT"),
      (2L, 2L, 2000.0, "1995-01-02", "1-URGENT"),
      (3L, 3L, 1000.0, "1995-01-03", "1-URGENT"),
      (4L, 4L, 2000.0, "1995-01-04", "1-URGENT"))))
    val out = SparkEntry.queries("q_durbin_watson")(spark, dir)
      .as[(Long, Long, Double)].collect()(0)
    assert(out == ((4L, 3L, 3.4)), s"got $out")
  }

  test("q_pot_gpd: two exceedances above the interpolated P90 replay the PWM fit") {
    // 17 days at 10 cents + {1000, 2000, 3000}: u = 1000 + 0.1*1000 =
    // 1100.0000000000001 (0.1 is inexact in binary — and BOTH engines
    // carry the same ulp, which is the whole point of the pin), so
    // z = {899.99..., 1899.99...}, zm = {899999, 1899999}, b0_milli =
    // 1399999, b1_milli = floor(949999.5) = 949999, xi = 4.799998,
    // sigma = floor(-5319.99...) = -5320
    val rows = (1 to 17).map(i =>
      (i.toLong, i.toLong, 0.10, f"1995-01-$i%02d", "1-URGENT")) ++ Seq(
      (18L, 18L, 10.0, "1995-01-18", "1-URGENT"),
      (19L, 19L, 20.0, "1995-01-19", "1-URGENT"),
      (20L, 20L, 30.0, "1995-01-20", "1-URGENT"))
    val dir = plantDir("orders" -> ordersDf(rows))
    val out = SparkEntry.queries("q_pot_gpd")(spark, dir)
      .as[(Long, Long, Long, Long, Option[Double], Option[Long])].collect()(0)
    assert(out == ((2L, 1100L, 1399999L, 949999L, Some(4.799998), Some(-5320L))),
      s"got $out")
  }

  test("q_huber_mean: one far outlier is downweighted to ~20 milli over two IRLS rounds") {
    // cents {0,100,200,300,10000}: med 200, MAD 100, c = 199.4097;
    // round 1 weights {997,1000,1000,1000,20} -> m1 = 800000/4017;
    // round 2 weights {1000,1000,1000,1000,20} -> m2 = 800000/4020 = 199.005
    val dir = plantDir("orders" -> ordersDf(Seq(
      (1L, 1L, 0.0, "1995-01-01", "1-URGENT"),
      (2L, 2L, 1.0, "1995-01-01", "1-URGENT"),
      (3L, 3L, 2.0, "1995-01-01", "1-URGENT"),
      (4L, 4L, 3.0, "1995-01-01", "1-URGENT"),
      (5L, 5L, 100.0, "1995-01-01", "1-URGENT"))))
    val out = SparkEntry.queries("q_huber_mean")(spark, dir)
      .as[(String, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(("1-URGENT", 5L, 200L, 199L)), s"got ${out.toSeq}")
  }

  test("q_hurst_exponent: a pure alternating series has R/S = 1 at both scales, H = 0") {
    // 64 consecutive days alternating 100/200 cents: every block's
    // cumulative deviations swing {-50, 0} and sd = 50 -> R/S = 1
    val rows = (0 until 64).map { i =>
      val d = java.time.LocalDate.parse("1995-01-01").plusDays(i)
      ((i + 1).toLong, (i + 1).toLong, if (i % 2 == 0) 1.0 else 2.0, d.toString, "1-URGENT")
    }
    val dir = plantDir("orders" -> ordersDf(rows))
    val out = SparkEntry.queries("q_hurst_exponent")(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect()(0)
    assert(out == ((4L, 1L, 1000000L, 1000000L, 0.0)), s"got $out")
  }

  test("text_textrank_keywords: a symmetric 2-word cycle holds both scores at 1.0") {
    val dir = plantDir("documents" -> docsDf(Seq(
      (1L, "alpha beta alpha beta", "en", "s"))))
    val out = SparkEntry.queries("text_textrank_keywords")(spark, dir)
      .as[(String, Double)].collect()
    assert(out.toSeq == Seq(("alpha", 1.0), ("beta", 1.0)), s"got ${out.toSeq}")
  }

  test("q_eta_squared: the F=8 fixture explains 80% of variance, omega2 = 7/11") {
    // SSB 40000, SSW 10000: eta2 = 0.8;
    // omega2 = (40000 - 1*5000)/(50000 + 5000) = 0.636364
    val dir = plantDir("orders" -> ordersDf(Seq(
      (1L, 1L, 100.0, "1995-01-01", "1-URGENT"),
      (2L, 2L, 200.0, "1995-01-01", "1-URGENT"),
      (3L, 3L, 300.0, "1995-01-01", "5-LOW"),
      (4L, 4L, 400.0, "1995-01-01", "5-LOW"))))
    val out = SparkEntry.queries("q_eta_squared")(spark, dir)
      .as[(Long, Long, Double, Double)].collect()(0)
    assert(out == ((4L, 2L, 0.8, 0.636364)), s"got $out")
  }

  test("q_wilson_ci: an all-successes nation has hi exactly 1 and lo = 1/(1+z2/n)") {
    // p=1: half-width = (z2/2n)/(1+z2/n), so hi = 1.0 algebraically and
    // lo = 1/(1 + 3.8416/4) = 0.510100 at round-6
    val dir = plantDir("orders" -> ordersDf(Seq(
      (1L, 1L, 1.0, "1995-01-01", "1-URGENT"),
      (2L, 1L, 1.0, "1995-01-02", "1-URGENT"),
      (3L, 1L, 1.0, "1995-01-03", "1-URGENT"),
      (4L, 1L, 1.0, "1995-01-04", "1-URGENT"))),
      "customer" -> customerDf(Seq((1L, 0L, "BUILDING"))))
    val out = SparkEntry.queries("q_wilson_ci")(spark, dir)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(out.toSeq == Seq((0L, 4L, 4L, 0.5101, 1.0)), s"got ${out.toSeq}")
  }

  test("vector_triplet_margin: a clean triplet has margin 1e6 and no violation") {
    val dir = plantDir("embeddings" -> embDf(Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (8L, Array(1.0f, 0.0f), 0),
      (9L, Array(0.0f, 1.0f), 1))))
    val out = SparkEntry.queries("vector_triplet_margin")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 8L, 9L, 1000000L, 0L)), s"got ${out.toSeq}")
  }
}
