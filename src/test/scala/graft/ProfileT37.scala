package graft

import org.apache.spark.sql.functions._

/** Dev probe: how many span-removal passes until fixed point per SF. */
object ProfileT37 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    for (sf <- Seq("sf0.001", "sf0.01")) {
      var docs = Tables.documents(spark, s"/root/testdata/$sf")
        .select("doc_id", "text").localCheckpoint()
      var pass = 0
      var changed = 1L
      while (changed > 0 && pass < 12) {
        val out = graft.queries.TextQueries.spanRemoval(docs)
          .localCheckpoint()
        changed = out.count()
        val removed = if (changed == 0) 0L
          else out.agg(sum("removed_chars")).head().getLong(0)
        pass += 1
        println(s"[t37] $sf pass $pass: changed=$changed removed_chars=$removed")
        if (changed > 0) {
          docs = docs.join(out.select(col("doc_id"), col("text_clean")),
              Seq("doc_id"), "left")
            .select(col("doc_id"),
              coalesce(col("text_clean"), col("text")).as("text"))
            .localCheckpoint()
        }
      }
    }
    spark.stop()
  }
}
