package graft

import org.apache.spark.sql.functions.{col, expr}

import graft.plans.BoundedLevenshteinRewrite

/** The thresholded-levenshtein optimizer rewrite: fires on every
  * comparison direction, is value-exact (nulls included), and leaves
  * non-rewritable shapes alone.
  */
class RewriteRuleSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    if (!spark.experimental.extraOptimizations.contains(BoundedLevenshteinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BoundedLevenshteinRewrite
  }

  // file-backed, NOT a LocalRelation: the optimizer folds literal local
  // relations through the filter at plan time, which would leave nothing
  // for the rewrite to run on (and nothing for the test to observe)
  private lazy val rows = {
    val path = java.nio.file.Files.createTempDirectory("graft-rewrite").toString
    Seq(
      ("kitten", "sitting"),   // dist 3
      ("flaw", "lawn"),        // dist 2
      ("abc", "abc"),          // dist 0
      ("abc", null),           // null propagates
      (null, "xyz"),
      ("a", "abcdefgh"))       // dist 7, length-gap prune
      .toDF("a", "b").write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  private def optimizedContains(df: org.apache.spark.sql.DataFrame, s: String) =
    df.queryExecution.optimizedPlan.toString.toLowerCase.contains(s)

  test("levenshtein <= k rewrites to the bounded kernel, results exact") {
    val df = rows.filter(expr("levenshtein(a, b) <= 2"))
    assert(optimizedContains(df, "bounded_levenshtein"), "rewrite did not fire")
    assert(!df.queryExecution.optimizedPlan.toString.toLowerCase
      .replace("bounded_levenshtein", "").contains("levenshtein("),
      "builtin survived the rewrite")
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("flaw", "lawn"), ("abc", "abc")))
  }

  test("every comparison direction rewrites and matches the builtin") {
    val preds = Seq(
      "levenshtein(a, b) <= 3", "3 >= levenshtein(a, b)",
      "levenshtein(a, b) < 3", "3 > levenshtein(a, b)",
      "levenshtein(a, b) > 2", "2 < levenshtein(a, b)")
    for (p <- preds) {
      val rewritten = rows.filter(expr(p))
      assert(optimizedContains(rewritten, "bounded_levenshtein"), s"no rewrite: $p")
      // reference: classic full-DP levenshtein evaluated driver-side
      def lev(x: String, y: String): Int = {
        val d = Array.tabulate(x.length + 1, y.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to x.length; j <- 1 to y.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
        d(x.length)(y.length)
      }
      val expected = rows.collect().toSeq
        .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
        .map(r => (r.getString(0), r.getString(1), lev(r.getString(0), r.getString(1))))
        .collect {
          case (a, b, d) if p.contains("<=") && d <= 3 => (a, b)
          case (a, b, d) if p.contains(">=") && d <= 3 => (a, b)
          case (a, b, d) if p == "levenshtein(a, b) < 3" && d < 3 => (a, b)
          case (a, b, d) if p == "3 > levenshtein(a, b)" && d < 3 => (a, b)
          case (a, b, d) if p == "levenshtein(a, b) > 2" && d > 2 => (a, b)
          case (a, b, d) if p == "2 < levenshtein(a, b)" && d > 2 => (a, b)
        }.toSet
      assert(rewritten.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
        expected, s"wrong rows for: $p")
    }
  }

  test("projection context keeps null semantics exactly") {
    val out = rows.select(col("a"), col("b"),
        expr("levenshtein(a, b) <= 2").as("near"))
    assert(optimizedContains(out, "bounded_levenshtein"))
    val got = out.collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getBoolean(2))).toSet
    assert(got == Set(
      ("kitten", "sitting", false), ("flaw", "lawn", true), ("abc", "abc", true),
      ("abc", null, null), (null, "xyz", null), ("a", "abcdefgh", false)))
  }

  test("3-arg levenshtein and dynamic thresholds are left alone") {
    val threeArg = rows.filter(expr("levenshtein(a, b, 5) >= 0"))
    assert(!optimizedContains(threeArg, "bounded_levenshtein"))
    val dyn = rows.withColumn("k", expr("length(a)"))
      .filter(expr("levenshtein(a, b) <= k"))
    assert(!optimizedContains(dyn, "bounded_levenshtein"))
  }
}
