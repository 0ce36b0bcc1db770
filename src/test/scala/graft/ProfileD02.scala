package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev-only stage profiler for the exact-Jaccard pipeline.
  * Run: sbt "Test/runMain graft.ProfileD02 /root/testdata/sf0.1"
  */
object ProfileD02 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir).cache()
    docs.count()

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sh = docs.withColumn("bkt", expr("n_chars div 50"))
      .select(col("doc_id"), col("bkt"), explode(expr(Dedup.shingleCodesArraySql)).as("code"))
    time("shingle rows")(sh.count())
    val dfCounts = sh.groupBy("code").agg(count(lit(1)).as("df"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df").asc, col("code").asc)
    val ranked = sh.join(broadcast(dfCounts), "code")
      .withColumn("rnk", row_number().over(wDoc))
      .withColumn("sz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
    val prefix = ranked.filter(col("rnk") <= col("sz") - ceil(lit(0.8) * col("sz")) + 1)
      .select(col("doc_id"), col("bkt"), col("code"), col("sz"), col("rnk")).cache()
    time("prefix rows")(prefix.count())
    val cands = prefix.as("x").join(prefix.as("y"),
        col("x.bkt") === col("y.bkt") && col("x.code") === col("y.code") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
    time("candidate join rows")(cands.count())
    val dist = cands.distinct().cache()
    time("distinct candidates")(dist.count())
    graft.plans.GraftFunctions.register(spark)
    val arrays = docs.select(col("doc_id"), sort_array(expr(Dedup.shingleCodesArraySql)).as("sh"))
    val verified = dist
      .join(arrays.select(col("doc_id").as("a"), col("sh").as("sha")), "a")
      .join(arrays.select(col("doc_id").as("b"), col("sh").as("shb")), "b")
      .withColumn("inter", expr("graft_isect_sorted_i64(sha, shb)"))
    time("verify (join+walk)")(verified.filter(col("inter") >= 0).count())
    time("full d02")(Dedup.jaccardPairs(docs, 0.8).count())
    spark.stop()
  }
}
