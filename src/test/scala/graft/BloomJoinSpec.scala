package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomJoin
import graft.sources.Sources

/** Bloom-filter join pruning: the no-false-negative contract, the bounded
  * filter size, and the broadcast-only plan shape.
  */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private val m = 1024
  private val k = 3

  test("bloom prune never drops a true match and bits stay bounded") {
    val build = (1L to 50L).map(i => i * 7).toDF("key")
    val probe = (1L to 1000L).toDF("key")
    val bits = BloomJoin.bits(build, "key", m, k).cache()
    assert(bits.count() <= math.min(m.toLong, 50L * k))
    val passed = BloomJoin.prune(probe, "key", bits, m, k)
      .as[Long].collect().toSet
    val truth = probe.join(build, Seq("key"), "left_semi").as[Long].collect().toSet
    assert(truth.subsetOf(passed), "bloom filter dropped a true match")
    // the sizing must actually prune: with 1024 bits and <=150 set, the
    // false-positive rate is far below 50%
    assert(passed.size < 500, s"no pruning happened: ${passed.size} of 1000 passed")
  }

  test("prune plan is broadcast joins only — probe side never shuffles") {
    val build = (1L to 50L).toDF("key")
    val probe = (1L to 1000L).toDF("key")
    val bits = BloomJoin.bits(build, "key", m, k)
    val plan = BloomJoin.prune(probe, "key", bits, m, k)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    assert(!plan.contains("SortMergeJoin"), "probe side must not shuffle-join")
  }

  test("position is deterministic and within [0, m)") {
    val keys = Seq(0L, 1L, 12345L, 2147483646L).toDF("key")
    for (j <- 0 until k) {
      val ps = keys.select(BloomJoin.position(col("key"), j, m)).as[Long].collect()
      assert(ps.forall(p => p >= 0 && p < m), s"h$j out of range: ${ps.toSeq}")
      val again = keys.select(BloomJoin.position(col("key"), j, m)).as[Long].collect()
      assert(ps.toSeq == again.toSeq)
    }
  }

  test("bucketed co-located join: sort-merge join with no exchange on either side") {
    val orders = Sources.table(spark, sf0001, "orders")
    val customer = Sources.table(spark, sf0001, "customer")
    spark.sql("DROP TABLE IF EXISTS spec_orders_b")
    spark.sql("DROP TABLE IF EXISTS spec_customer_b")
    orders.write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("spec_orders_b")
    customer.write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("spec_customer_b")
    val joined = spark.table("spec_orders_b").hint("merge")
      .join(spark.table("spec_customer_b").hint("merge"),
        col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(800))
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n${plan.take(800)}")
    // and the answer is the same as the plain join
    assert(joined.count() ==
      orders.join(customer, col("o_custkey") === col("c_custkey")).count())
  }
}
