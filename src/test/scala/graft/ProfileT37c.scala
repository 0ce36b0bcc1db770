package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe: per-pass, per-stage timing of the spanRemoval loop. */
object ProfileT37c {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tq = graft.queries.TextQueries
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (round <- 1 to 2) {
      println(s"[prof] === round $round ===")
      val docs = t("docs checkpoint") {
        Tables.documents(spark, sf).select("doc_id", "text").localCheckpoint()
      }
      val ndocs = docs.agg(count(lit(1)).as("n_docs")).localCheckpoint()
      var delta: DataFrame = null
      def cur: DataFrame =
        if (delta == null) docs
        else docs.join(delta.select("doc_id"), Seq("doc_id"), "left_anti")
          .unionByName(delta)
      var fps = t("winnow full") { tq.winnowFpsPos(docs).localCheckpoint() }
      var changedPrev: DataFrame = null
      var cappedPrev: DataFrame = null
      for (pass <- 1 to tq.SpanPasses) {
        val (rare, capped) = t(s"pass $pass capRarePos") {
          tq.capRarePos(fps, ndocs)
        }
        val filter =
          if (pass == 1) None else Some((changedPrev, cappedPrev))
        val out = t(s"pass $pass spanPass+checkpoint") {
          tq.spanPass(cur, rare, filter).localCheckpoint()
        }
        cappedPrev = capped
        val n = out.count()
        println(s"[prof] pass $pass changed=$n")
        if (n > 0) {
          val changed = out.select("doc_id")
          val newTexts =
            out.select(col("doc_id"), col("text_clean").as("text"))
          t(s"pass $pass delta+fps maintenance") {
            delta = (if (delta == null) newTexts
              else delta.join(changed, Seq("doc_id"), "left_anti")
                .unionByName(newTexts)).localCheckpoint()
            fps = fps.join(changed, Seq("doc_id"), "left_anti")
              .unionByName(tq.winnowFpsPos(newTexts))
              .localCheckpoint()
            changedPrev = changed.localCheckpoint()
          }
        }
      }
      t("final join") {
        val changedAll = if (delta == null) docs.limit(0) else delta
        docs.as("o").join(changedAll.as("n"), "doc_id")
          .filter(length(col("n.text")) < length(col("o.text")))
          .select(col("doc_id"),
            (length(col("o.text")) - length(col("n.text")))
              .cast("long").as("removed_chars"),
            col("n.text").as("text_clean"))
          .orderBy("doc_id")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
