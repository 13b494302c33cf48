package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Sources

/** Ad-hoc stage timing for the IVF ANN pipeline (dev tool, not part of the
  * driver contract): where does ann_ivf_topk's wall-clock go — the KMeans
  * fit, the probe/score plan, or the catalog entry's embedded verification?
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.getOrCreate(quietAcceptedWarnings = true)
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val emb = Sources.table(spark, dir, "embeddings")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    time("emb count")(emb.count())
    val queries = emb.filter(col("vec_id") < 8)
    time("fit only") {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val featured = emb.select(array_to_vector(col("embedding")).as("features"))
        .sample(withReplacement = false, 0.5, 42L).limit(100000)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val m = new KMeans().setK(16).setSeed(42L).setMaxIter(10)
        .setFeaturesCol("features").setPredictionCol("cluster").fit(featured)
      featured.unpersist()
      m.clusterCenters.length.toLong
    }
    time("ivfTopK full")(Similarity.ivfTopK(emb, queries, k = 5).count())
    time("ivfTopK again")(Similarity.ivfTopK(emb, queries, k = 5).count())
    time("bruteForceTopK k=20")(Similarity.bruteForceTopK(emb, queries, 20).count())
    time("catalog ann_ivf_topk")(
      graft.queries.LlmQueries.defs("ann_ivf_topk")._1(spark, dir).count())
    spark.stop()
  }
}
