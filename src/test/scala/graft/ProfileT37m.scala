package graft

import org.apache.spark.sql.SparkSession

/** Validates the SHIPPED r13 pre-warm (after the intermediate
  * experiments showed a slice can never match: the 64-doc form left 49
  * first-ever compiles in the full-scale cold run, and a 4096-doc
  * slice with the real df-cap forced still left all 20 of pass 0's
  * full-scale classes uncompiled — a slice's pass-0 plan differs from
  * the real one by construction): pre-warm with the FULL corpus at
  * maxPasses = SpanPasses - 1. Passes 0..2 compile against the exact
  * real input (identical literals, identical AQE choices, including
  * the capN count job), and the final pass's empty-keys projection
  * variant compiles as the prewarm's own last pass. Measured here:
  * ZERO residual compiles in the subsequent full cold run.
  */
object ProfileT37m {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tq = graft.queries.TextQueries

    import org.apache.spark.metrics.source.CodegenMetrics
    val jit = java.lang.management.ManagementFactory.getCompilationMXBean
    def compiles(): Long = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    def timed[A](label: String)(f: => A): A = {
      val c0 = compiles(); val j0 = jit.getTotalCompilationTime
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: wall=${(System.nanoTime() - t0) / 1e9}%.2fs " +
        s"compiles=${compiles() - c0} " +
        f"jitDelta=${(jit.getTotalCompilationTime - j0) / 1000.0}%.1fs")
      r
    }
    val probe = new tq.StepProbe {
      def apply[A](label: String)(f: => A): A = {
        val c0 = compiles(); val t0 = System.nanoTime(); val r = f
        println(f"[prof]   step $label: ${(System.nanoTime() - t0) / 1e9}%.2fs " +
          s"compiles=${compiles() - c0}")
        r
      }
    }
    def free(): Unit = spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))

    timed("session warmup") { Tables.documents(spark, sf).count() }
    timed("prewarm FULL corpus maxPasses=SpanPasses-1 (shipped r13)") {
      tq.spanRemoval(Tables.documents(spark, sf),
          maxPasses = tq.SpanPasses - 1)
        .write.format("noop").mode("overwrite").save()
    }
    free()
    timed("FULL cold (probed)") {
      tq.spanRemoval(Tables.documents(spark, sf), probe = probe)
        .write.format("noop").mode("overwrite").save()
    }
    free()
    timed("FULL warm") {
      tq.spanRemoval(Tables.documents(spark, sf))
        .write.format("noop").mode("overwrite").save()
    }
    free()
    spark.stop()
  }
}
