package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the d10/d13 trainer path (Test scope only). */
object ProfileD10 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.operators.{KMeans, SimilaritySearch}
    val e = time("load+quantize") {
      val df = Tables.embeddings(spark, sfDir)
        .withColumn("q", expr(SimilaritySearch.quantizeSql("embedding")))
        .select(col("vec_id"), col("q"))
      df.count(); df
    }
    val cand = e.filter(col("vec_id") >= 20)
    val cb = time("fitQuantizedSampled(16,40,2)") {
      val c = KMeans.fitQuantizedSampled(cand, 16, 40, 2); c.count(); c
    }
    println(s"[prof] k = ${cb.count()}")
    val codebook = cb.select(col("cent_id").as("vec_id"), col("cq").as("q"))
    time("ivfTopK") {
      SimilaritySearch.ivfTopK(
        queries = e.filter(col("vec_id") >= 10 && col("vec_id") < 20),
        candidates = cand, centroids = codebook, nprobe = 2, k = 3).count()
    }
    time("ivfTopK again") {
      SimilaritySearch.ivfTopK(
        queries = e.filter(col("vec_id") >= 10 && col("vec_id") < 20),
        candidates = cand, centroids = codebook, nprobe = 2, k = 3).count()
    }
    time("fitQuantizedSampled again") {
      KMeans.fitQuantizedSampled(cand, 16, 40, 2).count()
    }
    spark.stop()
  }
}
