package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Baseline: brute-force cosine top-k (exact; O(Q·N) — fine when the query
  * set is small and broadcastable). Scale path: hyperplane-LSH bucketing
  * restricts candidates to matching buckets before scoring — the classic
  * IVF-ish trade of recall for a shuffle-bounded plan.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector, by cosine (desc), with
    * deterministic tiebreak on neighbor id. The query side is broadcast —
    * at 100 TB the corpus streams through one narrow scoring stage, and
    * only (query, k) rows survive into the per-query top-k window.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val scored = corpus.as("c")
      .join(broadcast(queries.as("q")), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        call_function("cosine_sim", col("q.embedding"), col("c.embedding")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** LSH-bucketed top-k: queries and corpus are signed with the same
    * hyperplane bank; candidates = corpus rows sharing any band bucket with
    * the query; then exact cosine top-k within candidates. Approximate:
    * recall depends on bits/bands; the plan is a bucket-equi-join instead of
    * a cross product.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, dim: Int, k: Int,
              bits: Int = 32, bands: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val rows = bits / bands
    val mask = (1L << rows) - 1
    def banded(df: DataFrame, idAs: String) = {
      val sig = df.select(col("vec_id"), col("embedding"),
        Vectors.hyperplaneSignature(col("embedding"), dim, bits).as("sig"))
      sig.select(col("vec_id").as(idAs), col("embedding"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("sig"), b * rows).bitwiseAND(mask).as("bucket"))): _*)).as("bb"))
        .select(col(idAs), col("embedding"), col("bb.band"), col("bb.bucket"))
    }
    val cand = banded(corpus, "neighbor_id").as("c")
      .join(broadcast(banded(queries, "query_id").as("q")),
        col("q.band") === col("c.band") && col("q.bucket") === col("c.bucket") &&
          col("q.query_id") =!= col("c.neighbor_id"))
      .select(col("q.query_id"), col("c.neighbor_id"),
        call_function("cosine_sim", col("q.embedding"), col("c.embedding")).as("cos"))
      .distinct()
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }
}
