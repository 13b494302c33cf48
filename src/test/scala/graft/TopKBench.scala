package graft
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopKPerGroupStrategy
import graft.sources.Sources
object TopKBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[8]", 8)
    spark.sparkContext.setLogLevel("WARN")
    def df = {
      val w = Window.partitionBy("l_orderkey").orderBy(col("l_extendedprice").desc, col("l_linenumber").asc)
      Sources.table(spark, "/root/testdata/sf0.1", "lineitem")
        .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 2)
    }
    def time(label: String): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[topk] $label: $s%.2f s"); s
    }
    time("warmup"); val stock = time("stock window")
    spark.experimental.extraStrategies = Seq(TopKPerGroupStrategy())
    time("warmup2"); val custom = time("topk operator")
    println(f"[topk] speedup: ${stock / custom}%.2fx")
    spark.stop()
  }
}
