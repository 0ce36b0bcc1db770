package graft

import org.apache.spark.sql.SparkSession

/** Dev probe for the r12 pre-warm lever: does a TINY spanRemoval pass
  * during session warmup absorb t37's first-execution codegen/JIT
  * premium (ProfileT37g measures it at ~2.2x uniformly across steps)?
  * Round 1 here runs AFTER a limit(64) spanRemoval — compare its step
  * times against ProfileT37g's cold round on the same box.
  */
object ProfileT37i {
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
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val probe = new tq.StepProbe {
      def apply[A](label: String)(f: => A): A = t(label)(f)
    }
    Tables.documents(spark, sf).count() // session warmup as Bench does
    t("prewarm tiny spanRemoval") {
      tq.spanRemoval(Tables.documents(spark, sf).limit(64))
        .write.format("noop").mode("overwrite").save()
    }
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    for (round <- 1 to 2) {
      println(s"[prof] === round $round (post-prewarm) ===")
      val t0 = System.nanoTime()
      val res = tq.spanRemoval(Tables.documents(spark, sf), probe = probe)
      t("final readout") {
        println(s"[prof] changed rows: ${res.count()}")
      }
      println(f"[prof] TOTAL: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
