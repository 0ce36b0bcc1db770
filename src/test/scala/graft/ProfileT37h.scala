package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe (r10): the SHIPPED fused spanRemoval (stats-fused pass 0,
  * broadcast-C delta passes, occ-doc-restricted text joins) vs the
  * legacy UNFILTERED capRarePos+spanPass loop — full-output byte
  * equality at a given SF. The legacy loop is the semantics reference
  * (it matches the planted-span brute-force oracle); equality here is
  * the skip/fusion proof's executable form.
  */
object ProfileT37h {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val tq = graft.queries.TextQueries
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").localCheckpoint()
    val ndocs = docs.agg(count(lit(1)).as("n_docs")).localCheckpoint()

    def runLegacyUnfiltered(): DataFrame = {
      var delta: DataFrame = null
      def cur: DataFrame =
        if (delta == null) docs
        else docs.join(delta.select("doc_id"), Seq("doc_id"), "left_anti")
          .unionByName(delta)
      var fps = tq.winnowFpsPos(docs).localCheckpoint()
      for (_ <- 1 to tq.SpanPasses) {
        val (rare, _) = tq.capRarePos(fps, ndocs)
        val out = tq.spanPass(cur, rare, None).localCheckpoint()
        if (out.count() > 0) {
          val changed = out.select("doc_id")
          val newTexts =
            out.select(col("doc_id"), col("text_clean").as("text"))
          delta = (if (delta == null) newTexts
            else delta.join(changed, Seq("doc_id"), "left_anti")
              .unionByName(newTexts)).localCheckpoint()
          fps = fps.join(changed, Seq("doc_id"), "left_anti")
            .unionByName(tq.winnowFpsPos(newTexts))
            .localCheckpoint()
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

    val a = tq.spanRemoval(docs).localCheckpoint()
    val b = runLegacyUnfiltered()
    val onlyA = a.exceptAll(b).count()
    val onlyB = b.exceptAll(a).count()
    println(s"[prof] rows shipped=${a.count()} legacy=${b.count()} " +
      s"onlyShipped=$onlyA onlyLegacy=$onlyB")
    assert(onlyA == 0 && onlyB == 0, "fused loop diverged from legacy")
    spark.stop()
  }
}
