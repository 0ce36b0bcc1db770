package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: per-pass, per-barrier timing of the r10 fused spanRemoval
  * loop under the driver's bench config (local[32], 32 shuffle
  * partitions). Mirrors the shipped loop structure (keep in sync with
  * TextQueries.spanRemoval).
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
    Tables.documents(spark, sf).count() // session warmup as Bench does
    val WinC = 1048576L
    for (round <- 1 to 2) {
      println(s"[prof] === round $round ===")
      val t0 = System.nanoTime()
      val docs0 = Tables.documents(spark, sf)
      val docs = t("docs ckpt") {
        docs0.select(col("doc_id"), col("text")).localCheckpoint()
      }
      val capN = t("capN count") { math.max(20L, docs.count() / 100L) }
      val sliceSql = tq.SliceSql // the shipped expression, not a copy
      val fpsBase = t("fpsBase winnow+ckpt") {
        tq.winnowFpsPosS(docs).localCheckpoint()
      }
      var delta: DataFrame = null
      def cur: DataFrame =
        if (delta == null) docs
        else docs.join(delta.select("doc_id"), Seq("doc_id"), "left_anti")
          .unionByName(delta.select("doc_id", "text"))
      def fpsCur: DataFrame =
        if (delta == null) fpsBase
        else fpsBase.join(delta.select("doc_id"), Seq("doc_id"), "left_anti")
          .unionByName(delta
            .select(col("doc_id"), col("text"), explode(col("keys")).as("key"))
            .select(col("doc_id"), col("text"),
              expr(s"key div $WinC").as("fp"),
              expr(s"($WinC - 1) - (key % $WinC)").as("gpos"))
            .select(col("doc_id"), col("fp"), col("gpos"),
              expr(sliceSql).as("s")))
      var pass = 0
      var converged = false
      var outPrev: DataFrame = null
      var cappedPrev: DataFrame = null
      while (pass < tq.SpanPasses && !converged) {
        val occ: DataFrame =
          if (pass == 0) {
            val stats = t("pass 0 stats ckpt") {
              fpsBase.groupBy("fp", "doc_id")
                .agg(count(lit(1)).as("np"))
                .groupBy("fp").agg(count(lit(1)).as("dfc"),
                  min("doc_id").as("mn"), max("doc_id").as("mx"))
                .localCheckpoint()
            }
            cappedPrev = stats.filter(col("dfc") > capN).select("fp")
            val shareRare = stats
              .filter(col("dfc") <= capN && col("mn") < col("mx"))
              .select("fp")
            fpsBase.join(shareRare, Seq("fp"), "left_semi")
          } else {
            // shipped loop applies the broadcast hint adaptively on the
            // changed-doc count; at profile SFs it always broadcasts
            val fsetC = broadcast(outPrev
              .select(explode(col("keys")).as("key"))
              .select(expr(s"key div $WinC").as("fp"))
              .unionByName(cappedPrev))
            val cappedNow = t(s"pass $pass cappedNow ckpt") {
              fpsCur
                .join(fsetC, Seq("fp"), "left_semi")
                .select("doc_id", "fp").distinct()
                .groupBy("fp").agg(count(lit(1)).as("dfc"))
                .filter(col("dfc") > capN)
                .select("fp").localCheckpoint()
            }
            cappedPrev = cappedNow
            fpsCur.join(fsetC, Seq("fp"), "left_semi")
              .join(broadcast(cappedNow), Seq("fp"), "left_anti")
          }
        val keysCol =
          if (pass < tq.SpanPasses - 1) expr("graft_winnow13p(text_clean)")
          else expr("CAST(array() AS ARRAY<BIGINT>)")
        val out = t(s"pass $pass cutFromSliced out ckpt") {
          tq.spanCutFromSliced(cur, occ)
            .select(col("doc_id"), col("text_clean").as("text"),
              keysCol.as("keys"))
            .localCheckpoint()
        }
        val empty = t(s"pass $pass isEmpty") { out.isEmpty }
        if (empty) converged = true
        else {
          delta = t(s"pass $pass delta ckpt") {
            (if (delta == null) out
             else delta.join(out.select("doc_id"), Seq("doc_id"), "left_anti")
               .unionByName(out)).localCheckpoint()
          }
          outPrev = out
        }
        pass += 1
      }
      t("final readout") {
        val changedAll =
          if (delta == null) docs.limit(0) else delta.select("doc_id", "text")
        val n = docs.as("o").join(changedAll.as("n"), "doc_id")
          .filter(length(col("n.text")) < length(col("o.text")))
          .count()
        println(s"[prof] changed rows: $n")
      }
      println(f"[prof] TOTAL: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
