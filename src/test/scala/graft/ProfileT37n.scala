package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (r19, the t37 weak-flip exit): per-step JOB/STAGE/TASK
  * counts of the shipped spanRemoval loop, via the same StepProbe hook
  * ProfileT37g uses for walls. The r18 verdict names the ~17 jobs/pass
  * x 4 passes profile as the registry's longest scheduler-stall
  * exposure window; this localizes which probed step owns which jobs so
  * the fusion work targets the real contributors. Listener events post
  * async, so each step settles (two identical combined counts 50 ms
  * apart) before snapshotting — same discipline as Bench.SchedStats.
  */
object ProfileT37n {
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
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tq = graft.queries.TextQueries
    val stats = new Bench.SchedStats
    spark.sparkContext.addSparkListener(stats)
    def snap(): (Long, Long, Long) =
      (stats.jobs.get(), stats.stages.get(), stats.tasks.get())
    def step[A](name: String)(f: => A): A = {
      stats.settle(); val (j0, s0, t0) = snap()
      val n0 = System.nanoTime(); val r = f
      val wall = (System.nanoTime() - n0) / 1e9
      stats.settle(); val (j1, s1, t1) = snap()
      println(f"[prof] $name%-34s ${wall}%6.2f s  jobs=${j1 - j0}%3d " +
        f"stages=${s1 - s0}%3d tasks=${t1 - t0}%4d")
      r
    }
    val probe = new tq.StepProbe {
      def apply[A](label: String)(f: => A): A = step(label)(f)
    }
    Tables.documents(spark, sf).count() // session warmup as Bench does
    for (round <- 1 to 2) {
      println(s"[prof] === round $round ===")
      stats.settle(); val (jr0, sr0, tr0) = snap()
      val t0 = System.nanoTime()
      val res = tq.spanRemoval(Tables.documents(spark, sf), probe = probe)
      step("final readout") {
        println(s"[prof] changed rows: ${res.count()}")
      }
      stats.settle(); val (jr1, sr1, tr1) = snap()
      println(f"[prof] TOTAL: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"jobs=${jr1 - jr0} stages=${sr1 - sr0} tasks=${tr1 - tr0}")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
