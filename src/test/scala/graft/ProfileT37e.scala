package graft

import org.apache.spark.sql.functions._

/** Dev probe: stage breakdown inside pass 1 of spanRemoval. */
object ProfileT37e {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tq = graft.queries.TextQueries
    val WinW = 8
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").localCheckpoint()
    val ndocs = docs.agg(count(lit(1)).as("n_docs")).localCheckpoint()
    val fps = tq.winnowFpsPos(docs).localCheckpoint()
    val (rare, _) = tq.capRarePos(fps, ndocs)
    for (round <- 1 to 2) {
      println(s"[prof] === round $round ===")
      val ev = rare
        .select(col("fp"), col("doc_id").as("a"), col("gpos").as("ga"))
        .join(rare.select(col("fp").as("fp2"), col("doc_id").as("b"),
            col("gpos").as("gb")),
          col("fp") === col("fp2") && col("a") < col("b"))
        .select("a", "b", "ga", "gb")
      t("ev count") { println(s"[prof] ev rows: ${ev.count()}") }
      val fpStats = rare.groupBy("fp")
        .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
      val s27 = t("s27 build+checkpoint") {
        rare.join(broadcast(fpStats), "fp")
          .filter(col("mn") < col("mx")).select("doc_id", "gpos")
          .groupBy("doc_id").agg(collect_set(col("gpos")).as("gps"))
          .join(docs, "doc_id")
          .select(col("doc_id"), explode(expr(
            s"transform(gps, gp -> named_struct('gpos', gp, " +
              s"'st', greatest(gp - $WinW, 0L), " +
              s"'s', substring(text, CAST(greatest(gp - $WinW, 0L) + 1 AS INT), " +
              s"CAST(gp + 19 - greatest(gp - $WinW, 0L) AS INT))))")).as("sl"))
          .select(col("doc_id"), col("sl.gpos").as("gpos"),
            col("sl.st").as("st"), col("sl.s").as("s"))
          .localCheckpoint()
      }
      println(s"[prof] s27 rows: ${s27.count()}")
      val marked = ev
        .join(broadcast(s27.select(col("doc_id").as("b"), col("gpos").as("gb"),
          col("st").as("stb"), col("s").as("sb"))), Seq("b", "gb"))
        .join(broadcast(s27.select(col("doc_id").as("a"), col("gpos").as("ga"),
          col("st").as("sta"), col("s").as("sa"))), Seq("a", "ga"))
        .select(col("b"), col("gb"), (col("gb") - col("stb")).as("rb"),
          col("sb"), (col("ga") - col("sta")).as("ra"), col("sa"),
          explode(expr(s"sequence(1, $WinW)")).as("k"))
        .filter(expr("k <= rb AND k <= ra " +
          "AND rb - k + 20 <= length(sb) AND ra - k + 20 <= length(sa) " +
          "AND substring(sb, CAST(rb - k + 1 AS INT), 20) = " +
          "substring(sa, CAST(ra - k + 1 AS INT), 20)"))
        .select(col("b"), (col("gb") - col("k")).as("p"))
        .distinct()
      t("probe+distinct") { println(s"[prof] marked rows: ${marked.count()}") }
      val ps = marked.groupBy("b")
        .agg(sort_array(collect_set(col("p"))).as("ps"))
      t("cut") {
        docs.join(ps, col("doc_id") === col("b"))
          .withColumn("sg", expr(
            "filter(transform(sequence(0, size(ps)), i -> named_struct(" +
              "'gs', CASE WHEN i = 0 THEN 0 ELSE element_at(ps, i) + 20 END, " +
              "'ge', CASE WHEN i = size(ps) THEN length(text) - 1 " +
              "ELSE element_at(ps, i + 1) - 1 END)), x -> x.gs <= x.ge)"))
          .withColumn("text_clean", expr(
            "array_join(transform(sg, " +
              "x -> substring(text, x.gs + 1, x.ge - x.gs + 1)), '')"))
          .select(col("doc_id"), col("text_clean"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
