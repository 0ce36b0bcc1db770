package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe: per-pass, per-barrier timing of the current spanRemoval
  * loop (fused delta+fps variant) — where do the ~15 s at sf0.1 go?
  */
object ProfileT37f {
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
      val docs0 = Tables.documents(spark, sf)
      val docs = t("docs ckpt") {
        docs0.select(col("doc_id"), col("text")).localCheckpoint()
      }
      val ndocs = docs.agg(count(lit(1)).as("n_docs")).localCheckpoint()
      val fpsBase = t("fpsBase winnow+ckpt") {
        tq.winnowFpsPos(docs).localCheckpoint()
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
            .select(col("doc_id"), explode(col("keys")).as("key"))
            .select(col("doc_id"), expr("key div 1048576").as("fp"),
              expr("1048575 - (key % 1048576)").as("gpos")))
      var changedPrev: DataFrame = null
      var cappedPrev: DataFrame = null
      var pass = 0
      var converged = false
      while (pass < tq.SpanPasses && !converged) {
        val (rare, capped) = t(s"pass $pass capRarePos") {
          tq.capRarePos(fpsCur, ndocs)
        }
        val filter = if (pass == 0) None else Some((changedPrev, cappedPrev))
        val keysCol =
          if (pass < tq.SpanPasses - 1) expr("graft_winnow13p(text_clean)")
          else expr("CAST(array() AS ARRAY<BIGINT>)")
        val newDelta = tq.spanPass(cur, rare, filter)
          .select(col("doc_id"), col("text_clean").as("text"),
            keysCol.as("keys"), lit(pass).as("p"))
        delta = t(s"pass $pass spanPass+delta ckpt") {
          (if (delta == null) newDelta
           else delta.unionByName(newDelta)
             .groupBy("doc_id")
             .agg(max_by(struct(col("text"), col("keys"), col("p")),
               col("p")).as("s"))
             .select(col("doc_id"), col("s.text").as("text"),
               col("s.keys").as("keys"), col("s.p").as("p")))
            .localCheckpoint()
        }
        cappedPrev = capped
        val changed = delta.filter(col("p") === pass).select("doc_id")
        val empty = t(s"pass $pass isEmpty probe") { changed.isEmpty }
        if (empty) converged = true
        else changedPrev = changed
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
    }
    spark.stop()
  }
}
