package graft

import org.apache.spark.sql.SparkSession

/** r13 follow-up to ProfileT37j (which confirmed hypothesis (a): 49 of
  * ~139 generated classes are first-compiled in the full-scale cold
  * run, AFTER the 64-doc pre-warm). This probe attributes the residual
  * compiles per STEP of the shipped loop, for both the pre-warm and
  * the full-scale cold run — the candidate owners are (1) later-pass
  * plan shapes the tiny corpus never reaches (pass-0 early exit skips
  * the delta-composition variants of cur/fpsCur), (2) the capN df-cap
  * literal (20 for a 64-doc slice vs 50 at sf0.1) inlined into the
  * generated filter code, (3) AQE join-strategy variants.
  */
object ProfileT37k {
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
    def compiles(): Long = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    val probe = new tq.StepProbe {
      def apply[A](label: String)(f: => A): A = {
        val c0 = compiles(); val t0 = System.nanoTime(); val r = f
        println(f"[prof]   step $label: ${(System.nanoTime() - t0) / 1e9}%.2fs " +
          s"compiles=${compiles() - c0}")
        r
      }
    }
    def timed[A](label: String)(f: => A): A = {
      val c0 = compiles(); val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: wall=${(System.nanoTime() - t0) / 1e9}%.2fs " +
        s"compiles=${compiles() - c0}")
      r
    }
    def free(): Unit = spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))

    timed("session warmup") { Tables.documents(spark, sf).count() }
    timed("prewarm 64-doc (shipped, probed)") {
      tq.spanRemoval(Tables.documents(spark, sf).limit(64), probe = probe)
        .write.format("noop").mode("overwrite").save()
    }
    free()
    timed("FULL cold (probed)") {
      tq.spanRemoval(Tables.documents(spark, sf), probe = probe)
        .write.format("noop").mode("overwrite").save()
    }
    free()
    timed("FULL warm (probed)") {
      tq.spanRemoval(Tables.documents(spark, sf), probe = probe)
        .write.format("noop").mode("overwrite").save()
    }
    free()
    spark.stop()
  }
}
