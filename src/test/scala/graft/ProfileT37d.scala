package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe: filtered-evidence loop vs unfiltered loop — per-pass
  * changed counts and full-output equality at a given SF.
  */
object ProfileT37d {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tq = graft.queries.TextQueries
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").localCheckpoint()
    val ndocs = docs.agg(count(lit(1)).as("n_docs")).localCheckpoint()

    def run(filtered: Boolean): DataFrame = {
      var delta: DataFrame = null
      def cur: DataFrame =
        if (delta == null) docs
        else docs.join(delta.select("doc_id"), Seq("doc_id"), "left_anti")
          .unionByName(delta)
      var fps = tq.winnowFpsPos(docs).localCheckpoint()
      var changedPrev: DataFrame = null
      var cappedPrev: DataFrame = null
      for (pass <- 1 to tq.SpanPasses) {
        val (rare, capped) = tq.capRarePos(fps, ndocs)
        val filter =
          if (pass == 1 || !filtered) None else Some((changedPrev, cappedPrev))
        val out = tq.spanPass(cur, rare, filter).localCheckpoint()
        cappedPrev = capped
        val n = out.count()
        println(s"[prof] filtered=$filtered pass $pass changed=$n")
        if (n > 0) {
          val changed = out.select("doc_id")
          val newTexts =
            out.select(col("doc_id"), col("text_clean").as("text"))
          delta = (if (delta == null) newTexts
            else delta.join(changed, Seq("doc_id"), "left_anti")
              .unionByName(newTexts)).localCheckpoint()
          fps = fps.join(changed, Seq("doc_id"), "left_anti")
            .unionByName(tq.winnowFpsPos(newTexts))
            .localCheckpoint()
          changedPrev = changed.localCheckpoint()
        }
      }
      val changedAll = if (delta == null) docs.limit(0) else delta
      docs.as("o").join(changedAll.as("n"), "doc_id")
        .filter(length(col("n.text")) < length(col("o.text")))
        .select(col("doc_id"),
          (length(col("o.text")) - length(col("n.text")))
            .cast("long").as("removed_chars"),
          col("n.text").as("text_clean"))
        .localCheckpoint()
    }
    val a = run(filtered = true)
    val b = run(filtered = false)
    val onlyA = a.exceptAll(b).count()
    val onlyB = b.exceptAll(a).count()
    println(s"[prof] rows filtered=${a.count()} unfiltered=${b.count()} " +
      s"onlyFiltered=$onlyA onlyUnfiltered=$onlyB")
    spark.stop()
  }
}
