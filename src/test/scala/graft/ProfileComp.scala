package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev-only r20 profiler: connected-components round-shape variants,
  * alternating in ONE JVM so box drift between sbt invocations cannot
  * confound the comparison.
  * Run: sbt "Test/runMain graft.ProfileComp /root/testdata/sf0.1"
  */
object ProfileComp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sfDir)
    docs.count()
    val pairsPath = "/tmp/graft_prof_pairs"
    Dedup.minHashLshPairs(docs, 16, 2).write.mode("overwrite").parquet(pairsPath)
    def pairs = spark.read.parquet(pairsPath)
    println(s"[pc] pairs = ${pairs.count()}")
    def freeBlocks(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))

    // V0: the pre-r20 shipped shape (eager ckpts, join+left-join+self-join,
    // isEmpty probe) — verbatim copy for the in-JVM baseline
    def v0(pairs: DataFrame): DataFrame = {
      val edges = pairs.select(col("a"), col("b"))
        .union(pairs.select(col("b").as("a"), col("a").as("b")))
        .localCheckpoint(true)
      var labels = edges.select(col("a").as("id")).distinct()
        .withColumn("label", col("id")).localCheckpoint(true)
      var converged = false
      var i = 0
      while (!converged && i < 25) {
        val nmin = edges.join(labels.withColumnRenamed("id", "__nb"), col("b") === col("__nb"))
          .groupBy(col("a").as("id"))
          .agg(min(col("label")).as("__nlabel"))
        val stepped = labels.join(nmin, Seq("id"), "left")
          .select(col("id"), col("label").as("__old"),
            least(col("label"), coalesce(col("__nlabel"), col("label"))).as("__l1"))
        val next = stepped
          .join(stepped.select(col("id").as("__l1"), col("__l1").as("__ll")), Seq("__l1"), "left")
          .select(col("id"), col("__old"),
            least(col("__l1"), coalesce(col("__ll"), col("__l1"))).as("label"))
          .localCheckpoint(true)
        converged = next.filter(col("label") < col("__old")).isEmpty
        labels = next.select(col("id"), col("label"))
        i += 1
      }
      labels
    }

    def d11shape(comp: DataFrame => DataFrame): DataFrame = {
      val p = Dedup.minHashLshPairs(Tables.documents(spark, sfDir), 16, 2)
      comp(p)
        .groupBy("label")
        .agg(count(lit(1)).as("cluster_size"), max(col("id")).as("max_id"))
        .select(col("label").as("rep_id"), col("cluster_size"), col("max_id"))
        .orderBy("rep_id")
    }

    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    def rep(label: String)(body: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      body.write.format("noop").mode("overwrite").save()
      val el = (System.nanoTime() - t0) / 1e9
      freeBlocks()
      times(label) = el :: times.getOrElse(label, Nil)
    }
    def withConf[T](k: String, v: String)(body: => T): T = {
      val old = spark.conf.getOption(k)
      spark.conf.set(k, v)
      try body finally old match {
        case Some(o) => spark.conf.set(k, o); case None => spark.conf.unset(k)
      }
    }
    def v0noaqe(pairs: DataFrame): DataFrame =
      withConf("spark.sql.adaptive.enabled", "false")(v0(pairs))
    def v0noaqeP(pairs: DataFrame): DataFrame =
      withConf("spark.sql.adaptive.enabled", "false")(
        withConf("spark.sql.shuffle.partitions", "4")(v0(pairs)))
    def v0aqeP(pairs: DataFrame): DataFrame =
      withConf("spark.sql.shuffle.partitions", "4")(v0(pairs))
    // V7: edges/labels materialized under caller conf; loop under
    // adaptive (aqe-off-if-small, parts from measured edge count)
    def v7(pairs: DataFrame, bytesPerPart: Long): DataFrame = {
      val edges = pairs.select(col("a"), col("b"))
        .union(pairs.select(col("b").as("a"), col("a").as("b")))
        .localCheckpoint(eager = false)
      val nEdges = edges.queryExecution.toRdd.count()
      val sessParts = spark.sessionState.conf.numShufflePartitions
      val parts = math.max(1L, math.min(sessParts.toLong,
        nEdges * 32 / bytesPerPart)).toInt
      def loop(): DataFrame = {
        var labels = edges.select(col("a").as("id")).distinct()
          .withColumn("label", col("id")).localCheckpoint(true)
        var converged = false
        var i = 0
        while (!converged && i < 25) {
          val nmin = edges.join(labels.withColumnRenamed("id", "__nb"), col("b") === col("__nb"))
            .groupBy(col("a").as("id"))
            .agg(min(col("label")).as("__nlabel"))
          val stepped = labels.join(nmin, Seq("id"), "left")
            .select(col("id"), col("label").as("__old"),
              least(col("label"), coalesce(col("__nlabel"), col("label"))).as("__l1"))
          val next = stepped
            .join(stepped.select(col("id").as("__l1"), col("__l1").as("__ll")), Seq("__l1"), "left")
            .select(col("id"), col("__old"),
              least(col("__l1"), coalesce(col("__ll"), col("__l1"))).as("label"))
            .localCheckpoint(true)
          converged = next.filter(col("label") < col("__old")).isEmpty
          labels = next.select(col("id"), col("label"))
          i += 1
        }
        labels
      }
      if (parts < sessParts)
        withConf("spark.sql.adaptive.enabled", "false")(
          withConf("spark.sql.shuffle.partitions", parts.toString)(loop()))
      else loop()
    }
    (0 until 3).foreach { r =>
      rep("V0 d11")(d11shape(v0))
      rep("V5 noaqe p4")(d11shape(v0noaqeP))
      rep("V7 64M")(d11shape(p => v7(p, 64L << 20)))
      rep("V7 8M")(d11shape(p => v7(p, 8L << 20)))
      rep("V7 2M")(d11shape(p => v7(p, 2L << 20)))
    }
    times.toSeq.sortBy(_._1).foreach { case (l, ts) =>
      println(f"[pc] $l%-10s min ${ts.min}%6.2f  all ${ts.reverse.map(t => f"$t%.2f").mkString(" ")}")
    }
    // labels equality on the full d11 output
    val a = d11shape(v0).collect().map(_.toString).sorted
    freeBlocks()
    val b = d11shape(p => v7(p, 8L << 20)).collect().map(_.toString).sorted
    freeBlocks()
    println(s"[pc] d11 V0 == V2: ${a.sameElements(b)} (${a.length} rows)")
    spark.stop()
  }
}
