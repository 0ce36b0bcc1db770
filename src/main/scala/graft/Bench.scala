package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: JVM/codegen/session init + file listing, so per-query times
    // measure the queries rather than first-action setup costs.
    try {
      Tables.lineitem(spark, sfDir).count()
      Tables.events(spark, sfDir).count()
      Tables.documents(spark, sfDir).count()
      Tables.embeddings(spark, sfDir).count()
    } catch { case e: Throwable => System.err.println(s"BENCH WARMUP: $e") }
    // optional args: bench only the named queries (iteration aid)
    val unknown = args.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty)
      System.err.println(s"BENCH UNKNOWN QUERIES: ${unknown.mkString(", ")}")
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => args.contains(n) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: materializes every output row and expression (count()
      // would let Catalyst prune unreferenced projections and understate
      // expression-heavy queries).
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        // sentinel: a crashed query must not read as a fast query
        case e: Throwable =>
          System.err.println(s"BENCH ERROR $name: ${e.getClass.getName}: ${e.getMessage}")
          name -> -1.0
      }
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
