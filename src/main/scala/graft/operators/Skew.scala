package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities.
  *
  * AQE's skew-join splitting (on in `GraftSession`) covers joins; for
  * aggregations over power-law keys (the norm in web corpora: one domain =
  * 10% of documents), two-phase salted aggregation bounds any single
  * task's group size: phase 1 aggregates (key, salt), phase 2 merges the
  * salt partials. Correct for any algebraic aggregate.
  */
object Skew {

  final case class SaltedAgg(col: String, agg: String, as: String)

  /** Two-phase aggregation with `saltBuckets`-way salting. Supported aggs:
    * sum, count, min, max (the algebraic set that re-merges with itself;
    * count re-merges via sum).
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], aggs: Seq[SaltedAgg],
                      saltBuckets: Int = 64): DataFrame = {
    require(aggs.forall(a => Set("sum", "count", "min", "max")(a.agg)),
      "salted aggregation supports sum/count/min/max")
    def phase1(a: SaltedAgg): Column = (a.agg match {
      case "count" => count(lit(1))
      case "sum" => sum(col(a.col))
      case "min" => min(col(a.col))
      case "max" => max(col(a.col))
    }).as(a.as)
    def phase2(a: SaltedAgg): Column = (a.agg match {
      case "count" | "sum" => sum(col(a.as))
      case "min" => min(col(a.as))
      case "max" => max(col(a.as))
    }).as(a.as)

    df
      // deterministic salt: spread rows of the same key over `saltBuckets`
      // reducers without random() (replayable under task retry)
      .withColumn("_salt", pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(saltBuckets)))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(phase1(aggs.head), aggs.tail.map(phase1): _*)
      .groupBy(keys.map(col): _*)
      .agg(phase2(aggs.head), aggs.tail.map(phase2): _*)
  }

  /** Salted equi-join for when AQE's skew splitting can't apply (e.g. the
    * skewed side feeds from an aggregation, or the join must stay
    * shuffle-hash): the skewed left side gets a deterministic salt in
    * [0, saltBuckets); the right side is replicated `saltBuckets` times via
    * explode, so every (key, salt) pair finds its match. Right-side volume
    * grows ×saltBuckets — use for dimension-ish right sides that are too
    * big to broadcast but far smaller than the fact side. Inner joins only
    * (outer would need null-salt care).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltBuckets: Int = 16): DataFrame = {
    val salted = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col).toIndexedSeq: _*)), lit(saltBuckets)))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
