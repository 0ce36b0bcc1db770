package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev-only stage profiler for the r20 optimization round: decomposes the
  * top bench queries (dedup family, PQ/IVF trainers, t42) into their
  * pipeline stages so the optimization targets measured stage costs, not
  * guesses. Run: sbt "Test/runMain graft.ProfileR20 /root/testdata/sf0.1 [section]"
  */
object ProfileR20 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val section = args.drop(1).headOption.getOrElse("all")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.register(spark)

    def freeBlocks(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[r20] $label%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // session warmup
    Tables.documents(spark, sfDir).count()
    Tables.embeddings(spark, sfDir).count()

    val K = 16; val Bands = 2

    if (section == "all" || section == "dedup") {
      val docs = Tables.documents(spark, sfDir)
      // warm the codegen for the signature path
      noop(Dedup.minHashLshPairs(docs, K, Bands))
      freeBlocks()
      val sigs = time("bandSignatures scan")(
        { noop(Dedup.bandSignatures(docs, K, Bands)); () })
      val pairs = Dedup.minHashLshPairs(docs, K, Bands)
      time("minHashLshPairs (sig+join+dist)")(noop(pairs))
      freeBlocks()
      val pairsCk = pairs.localCheckpoint()
      val n = pairsCk.count()
      println(s"[r20] n pairs = $n")
      time("components on ckpt pairs")(noop(Dedup.components(pairsCk)))
      freeBlocks()
      time("d11 full")(noop(SparkEntry.queries("d11_dedup_clusters")(spark, sfDir)))
      freeBlocks()
      time("d15 full")(noop(SparkEntry.queries("d15_keep_best")(spark, sfDir)))
      freeBlocks()
      time("d24 full")(noop(SparkEntry.queries("d24_dedup_funnel")(spark, sfDir)))
      freeBlocks()
      time("d32 full")(noop(SparkEntry.queries("d32_ensemble_dedup")(spark, sfDir)))
      freeBlocks()
    }

    if (section == "all" || section == "pq") {
      import graft.operators.KMeans
      val e = Tables.embeddings(spark, sfDir)
        .withColumn("q", expr(
          "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"))
        .select(col("vec_id"), col("q"))
      val NQueries = 10
      val cand = e.filter(col("vec_id") >= 20)
      println(s"[r20] n embeddings = ${e.count()}")
      // warm
      noop(cand)
      time("quantize scan (corpus)")(noop(cand))
      val cb = time("fitQuantizedSampled (2 iters)")(
        KMeans.fitQuantizedSampled(cand, 16, 40, 2))
      println(s"[r20] k = ${cb.count()}")
      time("assignQuantized full corpus")(noop(KMeans.assignQuantized(cand, cb)))
      freeBlocks()
      time("d10 full")(noop(SparkEntry.queries("d10_embed_ivf_trained")(spark, sfDir)))
      freeBlocks()
      time("d13 full")(noop(SparkEntry.queries("d13_semantic_dedup")(spark, sfDir)))
      freeBlocks()
      time("d20 full")(noop(SparkEntry.queries("d20_pq_ann")(spark, sfDir)))
      freeBlocks()
      time("d29 full")(noop(SparkEntry.queries("d29_ivf_health")(spark, sfDir)))
      freeBlocks()
      time("d36 full")(noop(SparkEntry.queries("d36_ivfpq_ann")(spark, sfDir)))
      freeBlocks()
    }

    if (section == "all" || section == "t42") {
      time("t42 full")(noop(SparkEntry.queries("t42_pipeline_card")(spark, sfDir)))
      freeBlocks()
      time("t42 full rep2")(noop(SparkEntry.queries("t42_pipeline_card")(spark, sfDir)))
      freeBlocks()
    }
    spark.stop()
  }
}
