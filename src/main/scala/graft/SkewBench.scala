package graft

import org.apache.spark.sql.SparkSession

/** Skew disease-vs-cure measurement (round-5 verdict item 3): the same
  * deliberately hot-keyed sort-merge join (90% of lineitem on one key —
  * `RelationalQueries.skewJoinAgg`) timed three ways:
  *
  *  - `disease`: unsalted, AQE skew-split OFF — one task sorts/joins 90%
  *    of the fact; the wall time is that task.
  *  - `aqe_cure`: unsalted, AQE skew-split ON with thresholds lowered to
  *    engage at toy scale: shuffle metrics are COMPRESSED bytes and the
  *    8x-replicated rows compress ~100x, so the hot partition reads as
  *    ~480 KB — below the 256 MB default threshold, and the 64 MB default
  *    advisory target would mean "split into one part". 64 KB for both
  *    makes the splitter behave here the way production sizes hit the
  *    defaults. Also needs a multi-mapper fact (mappers=32): AQE splits a
  *    skewed partition by regrouping MAP outputs, and sf0.1's lineitem is
  *    one parquet row group = one mapper = nothing to regroup.
  *  - `salted_cure`: explicit ×16 salting (q37) — plan-level, no runtime
  *    machinery needed, and the only option for skewed AGGREGATIONS where
  *    no AQE join-split exists.
  *
  * Bench protocol mirrors graft.Bench isolation mode: warmup, GC fence,
  * 2 timed reps, min reported. One JSON line; numbers recorded in
  * SURVEY.md §6b. Results of all modes are oracle-identical (q37/q38
  * share one DuckDB oracle).
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.lineitem(spark, sfDir).count() // session/scan warmup

    // x8 row amplification: the hot task must dominate the ~0.3 s
    // scheduling floor for the penalty to be readable at sf0.1
    val amp = sys.env.getOrElse("SPARK_GRAFT_SKEW_AMP", "8").toInt

    def time(salted: Boolean, skewSplit: Boolean, hot: Boolean = true): Double = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewSplit.toString)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // engage the splitter at toy partition sizes (defaults: 256 MB / 5x)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        if (skewSplit) "64KB" else "256MB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        if (skewSplit) "64KB" else "64MB")
      def once(): Double = {
        val t0 = System.nanoTime()
        queries.RelationalQueries
          .skewJoinAgg(spark, sfDir, salted, hot, amp, mappers = 32)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once(); System.gc()
      math.min(once(), once())
    }

    val control = time(salted = false, skewSplit = false, hot = false)
    val disease = time(salted = false, skewSplit = false)
    val aqeCure = time(salted = false, skewSplit = true)
    val saltedCure = time(salted = true, skewSplit = false)
    println(s"""{"metric":"skew_join","unit":"sec","sf":"$sfDir","amp":$amp,""" +
      s""""control_uniform_s":$control,"disease_unsalted_s":$disease,""" +
      s""""aqe_skew_split_s":$aqeCure,"salted_s":$saltedCure}""")
    spark.stop()
  }
}
