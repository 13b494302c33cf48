package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopKPerGroupStrategy
import graft.sources.Sources

/** The custom top-k-per-group physical operator: plan rewrite fires on the
  * row_number idiom, results are identical to the stock Window plan, and
  * the full-partition sort disappears.
  */
class TopKPlanSpec extends SparkSpec {

  private def topkDf = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Sources.table(spark, sf0001, "orders")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
  }

  private def withStrategy[T](f: => T): T = {
    spark.experimental.extraStrategies = Seq(TopKPerGroupStrategy())
    try f finally spark.experimental.extraStrategies = Nil
  }

  test("strategy rewrites row_number<=k into TopKPerGroupExec with no sort") {
    val stock = topkDf.queryExecution.executedPlan.toString
    assert(stock.contains("Window") && stock.contains("Sort"))
    withStrategy {
      val plan = topkDf.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerGroup "), plan)
      assert(!plan.contains("Sort "), s"sort should be eliminated:\n$plan")
    }
  }

  test("results are identical to the stock window plan") {
    val expected = topkDf.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val got = withStrategy {
      topkDf.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    }
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("rewrite also fires through a cast rank and a long literal (catalog shape)") {
    withStrategy {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      val df = Sources.table(spark, sf0001, "orders")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3L)
        .select("o_custkey", "o_orderkey", "rnk")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerGroup "), plan)
      assert(!plan.contains("Sort "), plan)
      // and the values still match the stock plan
      val stock = topkDf.select("o_custkey", "o_orderkey").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(df.select("o_custkey", "o_orderkey").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet == stock)
    }
  }

  test("ANN top-k windows plan through TopKPerGroupExec with no sort") {
    // bruteForceTopK/lshTopK/ivfTopK all end in the row_number()<=k idiom —
    // the production session enables the strategy, so the per-query window
    // sort must disappear from the ANN plans too
    val emb = Sources.table(spark, sf0001, "embeddings")
    val queries = emb.filter(col("vec_id") < 4)
    withStrategy {
      val brute = graft.operators.Similarity.bruteForceTopK(emb, queries, k = 5)
      val brutePlan = brute.queryExecution.executedPlan.toString
      assert(brutePlan.contains("TopKPerGroup "), brutePlan)
      assert(!brutePlan.contains("Sort "), s"sort should be eliminated:\n$brutePlan")
      assert(!brutePlan.contains("Window"), brutePlan)
      val lsh = graft.operators.Similarity.lshTopK(emb, queries, dim = 64, k = 5)
      val lshPlan = lsh.queryExecution.executedPlan.toString
      assert(lshPlan.contains("TopKPerGroup "), lshPlan)
      assert(!lshPlan.contains("Window"), lshPlan)
      // quantizedTopK has TWO row_number windows (candidate cut + final
      // re-rank) — both must rewrite to bounded heaps
      val qz = graft.operators.Similarity.quantizedTopK(emb, queries, k = 5)
      val qzPlan = qz.queryExecution.executedPlan.toString
      assert(qzPlan.contains("TopKPerGroup "), qzPlan)
      assert(!qzPlan.contains("Window"), qzPlan)
      assert(brute.count() > 0)
    }
  }

  test("tf-idf keyword top-k plans through TopKPerGroupExec, not a per-doc sort") {
    val docs = Sources.table(spark, sf0001, "documents")
    withStrategy {
      val kw = graft.operators.TextAnalysis.tfidfKeywords(docs, k = 3)
      val plan = kw.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerGroup "), plan)
      assert(!plan.contains("Window"), plan)
      assert(kw.count() > 0)
    }
  }

  test("stratified sample's per-language rank plans through TopKPerGroupExec") {
    withStrategy {
      val df = graft.queries.LlmQueries.defs("q_stratified_sample")._1(spark, sf0001)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerGroup "), plan)
      assert(!plan.contains("Window"), plan)
      assert(df.count() > 0)
    }
  }

  test("strategy leaves other window shapes alone (rank over range frame, no filter)") {
    withStrategy {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice"))
      val df = Sources.table(spark, sf0001, "orders")
        .withColumn("r", rank().over(w)) // rank() != row_number()
        .filter(col("r") <= 2)
      assert(!df.queryExecution.executedPlan.toString.contains("TopKPerGroup "))
      assert(df.count() > 0)
    }
  }
}
