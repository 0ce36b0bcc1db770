package graft

import org.apache.spark.sql.SparkSession

/** Dev probe for r13 verdict item 1, hypothesis (a): does the r12
  * 64-doc pre-warm compile the WRONG plan variants? At sf0.1 AQE and
  * the adaptive broadcast gate can pick physical operators (sort-merge
  * vs broadcast-hash) whose generated classes a 64-doc warmup never
  * produces, so the "pre-warmed" full-scale cold pass still pays
  * first-ever janino compilation + JIT for the big-input shapes.
  *
  * Measurement: Spark's CodegenMetrics compile histogram (count =
  * number of first-ever generated-class compiles; cache hits don't
  * count) + the JVM CompilationMXBean (accumulated JIT ms), snapshotted
  * around (1) the shipped pre-warm, (2) the full-scale cold run,
  * (3) a warm rerun. If (2) shows a large compile count/time after the
  * pre-warm, hypothesis (a) is confirmed and the fix is a pre-warm
  * whose physical plans match full scale.
  */
object ProfileT37j {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096") // as Bench (r12)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tq = graft.queries.TextQueries

    import org.apache.spark.metrics.source.CodegenMetrics
    val jit = java.lang.management.ManagementFactory.getCompilationMXBean
    def snap(): (Long, Double, Long) = {
      val h = CodegenMetrics.METRIC_COMPILATION_TIME
      (h.getCount, h.getSnapshot.getMean, jit.getTotalCompilationTime)
    }
    var prev = snap()
    def report(label: String, wallS: Double): Unit = {
      val now = snap()
      val compiles = now._1 - prev._1
      // histogram mean is reservoir-based; compiles * mean approximates
      // the janino time spent in this window
      val janinoS = compiles * now._2 / 1000.0
      val jitS = (now._3 - prev._3) / 1000.0
      println(f"[prof] $label: wall=$wallS%.2fs codegenCompiles=$compiles " +
        f"janino~$janinoS%.1fs jitDelta=$jitS%.1fs")
      prev = now
    }
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      report(label, (System.nanoTime() - t0) / 1e9); r
    }
    def free(): Unit = spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))

    timed("session warmup (documents count)") {
      Tables.documents(spark, sf).count()
    }
    timed("prewarm 64-doc spanRemoval (shipped r12 form)") {
      tq.spanRemoval(Tables.documents(spark, sf).limit(64))
        .write.format("noop").mode("overwrite").save()
    }
    free()
    timed("FULL-SCALE cold spanRemoval") {
      tq.spanRemoval(Tables.documents(spark, sf))
        .write.format("noop").mode("overwrite").save()
    }
    free()
    timed("FULL-SCALE warm spanRemoval") {
      tq.spanRemoval(Tables.documents(spark, sf))
        .write.format("noop").mode("overwrite").save()
    }
    free()
    spark.stop()
  }
}
