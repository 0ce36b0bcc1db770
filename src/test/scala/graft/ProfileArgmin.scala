package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only r20 profiler: min_by-struct argmin vs projection argmin,
  * alternating in one JVM. Run:
  * sbt "Test/runMain graft.ProfileArgmin /root/testdata/sf0.1"
  */
object ProfileArgmin {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.register(spark)
    def freeBlocks(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))

    val e = Tables.embeddings(spark, sfDir)
      .withColumn("q", expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"))
      .select(col("vec_id"), col("q"))
    println(s"[pa] n embeddings = ${e.count()}")
    val cand = e.filter(col("vec_id") >= 20)

    // old assignQuantized (min_by struct)
    def assignOld(vectors: DataFrame, codebook: DataFrame): DataFrame = {
      val scored = vectors.crossJoin(broadcast(codebook))
        .withColumn("dist", expr("graft_sqdist_i64(q, cq)"))
      scored.groupBy("vec_id")
        .agg(min_by(struct(col("cent_id"), col("q"), col("dist")),
          struct(col("dist"), col("cent_id"))).as("best"))
        .select(col("vec_id"), col("best.q").as("q"),
          col("best.cent_id").as("cent_id"), col("best.dist").as("dist"))
    }
    def lloydOld(vectors: DataFrame, codebook: DataFrame): DataFrame =
      assignOld(vectors, codebook)
        .select(col("cent_id"), posexplode(col("q")).as(Seq("dim", "x")))
        .groupBy("cent_id", "dim")
        .agg(expr("CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT)").as("m"))
        .groupBy("cent_id")
        .agg(collect_list(struct(col("dim"), col("m"))).as("dm"))
        .select(col("cent_id"), expr("transform(array_sort(dm), s -> s.m)").as("cq"))
    def fitOld(vectors: DataFrame): DataFrame = {
      val sample = vectors.filter(expr(graft.operators.KMeans.sampleSql(40)))
      val n = sample.agg(count(lit(1))).head().getLong(0)
      val kk = math.max(2L, n / 16)
      val wId = org.apache.spark.sql.expressions.Window.orderBy(col("vec_id").asc)
      var codebook = sample.orderBy("vec_id").limit(kk.toInt)
        .withColumn("cent_id", row_number().over(wId).cast("long") - 1)
        .select(col("cent_id"), col("q").as("cq"))
        .localCheckpoint()
      (0 until 2).foreach { _ =>
        codebook = lloydOld(sample, codebook).localCheckpoint()
      }
      codebook
    }

    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    def rep(label: String)(body: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      body.write.format("noop").mode("overwrite").save()
      val el = (System.nanoTime() - t0) / 1e9
      freeBlocks()
      times(label) = el :: times.getOrElse(label, Nil)
    }
    (0 until 4).foreach { r =>
      rep("OLD fit+assign")(assignOld(cand, fitOld(cand)))
      rep("NEW fit+assign")(graft.operators.KMeans.assignQuantized(cand,
        graft.operators.KMeans.fitQuantizedSampled(cand, 16, 40, 2)))
    }
    times.toSeq.sortBy(_._1).foreach { case (l, ts) =>
      println(f"[pa] $l%-16s min ${ts.min}%6.2f  all ${ts.reverse.map(t => f"$t%.2f").mkString(" ")}")
    }
    // equality
    val a = assignOld(cand, fitOld(cand))
      .select("vec_id", "cent_id", "dist").collect().map(_.toString).sorted
    freeBlocks()
    val b = graft.operators.KMeans.assignQuantized(cand,
      graft.operators.KMeans.fitQuantizedSampled(cand, 16, 40, 2))
      .select("vec_id", "cent_id", "dist").collect().map(_.toString).sorted
    freeBlocks()
    println(s"[pa] OLD == NEW: ${a.sameElements(b)} (${a.length} rows)")
    spark.stop()
  }
}
