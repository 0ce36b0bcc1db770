package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r14: q18's estimate-beside-exact rewrite benched 16.4 s in roll 1 —
  * 28x the old opaque-sketch form. This decomposes the aggregate mix:
  * which combination of countDistinct / HLL++ / exact percentile /
  * approx_percentile falls off the hash-agg fast path.
  * Run: sbt "Test/runMain graft.ProfileQ18"
  */
object ProfileQ18 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables.lineitem(spark, "/root/testdata/sf0.1")
      .select("l_returnflag", "l_partkey", "l_quantity").localCheckpoint()

    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f; f
      println(f"Q18PROBE $label: ${(System.nanoTime() - t0) / 2e9}%.2fs")
    }
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val g = li.groupBy("l_returnflag")
    time("countDistinct alone")(run(g.agg(countDistinct(col("l_partkey")))))
    time("hll++ alone rsd.02")(run(g.agg(approx_count_distinct(col("l_partkey"), 0.02))))
    time("hll++ alone default rsd.05")(run(g.agg(approx_count_distinct(col("l_partkey")))))
    time("exact percentile alone")(run(g.agg(expr("percentile(l_quantity, 0.5)"))))
    time("approx_percentile 10000")(run(g.agg(expr("approx_percentile(l_quantity, 0.5, 10000)"))))
    time("approx_percentile 1000")(run(g.agg(expr("approx_percentile(l_quantity, 0.5, 1000)"))))
    time("countDistinct + hll++")(run(g.agg(
      countDistinct(col("l_partkey")), approx_count_distinct(col("l_partkey"), 0.02))))
    time("percentile + approx_percentile")(run(g.agg(
      expr("percentile(l_quantity, 0.5)"),
      expr("approx_percentile(l_quantity, 0.5, 10000)"))))
    time("all four in one agg")(run(g.agg(
      countDistinct(col("l_partkey")),
      approx_count_distinct(col("l_partkey"), 0.02),
      expr("percentile(l_quantity, 0.5)"),
      expr("approx_percentile(l_quantity, 0.5, 10000)"))))
    spark.stop()
  }
}
