package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: per-pass, per-barrier timing of the SHIPPED spanRemoval
  * loop under the driver's bench config (local[32], 32 shuffle
  * partitions). Since r11 this drives `TextQueries.spanRemoval` itself
  * through its `StepProbe` hook — the timings are the shipped code path
  * by construction, not a mirrored copy that could drift (the r10
  * ADVICE concern).
  */
object ProfileT37g {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
    for (round <- 1 to 2) {
      println(s"[prof] === round $round ===")
      val t0 = System.nanoTime()
      val res = tq.spanRemoval(Tables.documents(spark, sf), probe = probe)
      t("final readout") {
        println(s"[prof] changed rows: ${res.count()}")
      }
      println(f"[prof] TOTAL: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // Bench's block hygiene, mirrored: round 2 must run warm but NOT
      // inherit round 1's dead checkpoint blocks — the exact eviction/GC
      // distortion the r11 postmortem removed from the bench protocol
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
