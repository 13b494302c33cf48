package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Sources

/** Ad-hoc stage timing for the MinHash-LSH pipeline (dev tool, not part of
  * the driver contract).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.getOrCreate(quietAcceptedWarnings = true)
    val docs = Sources.table(spark, dir, "documents")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    graft.functions.GraftFunctions.register(spark)

    time("docs count")(docs.count())
    val withHs = docs.select(col("doc_id"), Dedup.shingleHashes(col("text"), 3).as("hs"))
      .filter(size(col("hs")) > 0)
    time("shingleHashes")(withHs.count())
    val withSig = withHs.select(col("doc_id"), col("hs"),
      call_function("minhash_sig", col("hs"), lit(64)).as("sig"))
    time("minhash_sig")(withSig.select(col("doc_id"), col("sig")).count())
    val buckets = withSig.select(
      col("doc_id"),
      explode(array((0 until 16).map { b =>
        val cols = (1 to 4).map(k => element_at(col("sig"), b * 4 + k))
        struct(lit(b).as("band"), xxhash64(cols :+ lit(b): _*).as("bucket"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
    time("buckets")(buckets.count())
    val candidates = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    time("candidates")(candidates.count())
    time("full minhashLshPairs")(Dedup.minhashLshPairs(docs).count())
    time("full again")(Dedup.minhashLshPairs(docs).count())

    val langid = graft.operators.TextAnalysis.languageId(docs)
    time("languageId 1")(langid.count())
    time("languageId 2")(langid.count())
    time("languageId noop") {
      langid.write.format("noop").mode("overwrite").save(); 0L
    }
    langid.explain("formatted")
    spark.stop()
  }
}
