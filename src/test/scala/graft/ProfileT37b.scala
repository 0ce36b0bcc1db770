package graft

import org.apache.spark.sql.functions._

/** Dev probe: stage timing inside one spanRemoval run at a given SF. */
object ProfileT37b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = t("load+checkpoint docs") {
      Tables.documents(spark, sf).select("doc_id", "text").localCheckpoint()
    }
    val ndocs = docs.agg(count(lit(1)).as("n_docs")).localCheckpoint()
    val fps = t("winnowFpsPos full corpus") {
      graft.queries.TextQueries.winnowFpsPos(docs).localCheckpoint()
    }
    println(s"[prof] fps rows: ${fps.count()}")
    val (rare, capped) = t("capRarePos") {
      graft.queries.TextQueries.capRarePos(fps, ndocs)
    }
    println(s"[prof] rare rows: ${rare.count()}, capped fps: ${capped.count()}")
    // whole pipeline for comparison
    t("spanRemoval all passes") {
      graft.queries.TextQueries.spanRemoval(docs).write
        .format("noop").mode("overwrite").save()
    }
    t("spanRemoval 1 pass only") {
      graft.queries.TextQueries.spanRemoval(docs, maxPasses = 1).write
        .format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
