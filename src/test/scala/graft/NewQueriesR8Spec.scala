package graft

import org.apache.spark.sql.functions._

/** Round-8 additions: j39 Gutenberg–Richter, t39 domain divergence,
  * d36 IVF-PQ. Each is independently replayed (plain Scala over the
  * same inputs, or a brute-force bound) on top of the DuckDB hash gate.
  */
class NewQueriesR8Spec extends SparkSpec {

  test("j39: Mc and b-value equal an independent Scala replay") {
    val got = SparkEntry.queries("j39_gutenberg_richter")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))))
      .toMap
    // independent replay from the raw event index
    val mags = graft.operators.Indexers.EventIndex
      .attach(Tables.events(spark, sfDir))
      .select(col("agency"),
        expr("CAST(round(magnitude * 100) AS BIGINT)").as("mag_c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val want = mags.groupBy(_._1).map { case (agency, rows) =>
      val magc = rows.map(_._2)
      val bins = magc.groupBy(_ / 10).view.mapValues(_.size)
      val mcBin = bins.toSeq.maxBy { case (bin, nb) => (nb, -bin) }._1
      val above = magc.filter(_ >= mcBin * 10)
      val sumC = above.sum
      val bE4 = math.round(
        434294.4819032518 * above.size / (sumC - above.size.toLong * (mcBin * 10 - 5)))
      agency -> ((magc.size.toLong, mcBin * 10, above.size.toLong, sumC, bE4))
    }
    assert(got == want)
    // b-values land in the physically sensible band for a synthetic
    // catalog (the classic real-world value is ~1.0 = 10000 e4)
    assert(got.values.forall { case (_, _, _, _, b) => b > 0 })
  }

  test("t39: pairwise JS divergence equals an independent Scala replay; " +
    "identical distributions give zero") {
    val got = SparkEntry.queries("t39_domain_divergence")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val toks = Tables.documents(spark, sfDir)
      .select(col("source"), explode(expr("split(trim(text), ' ')")).as("tok"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val counts: Map[String, Map[String, Long]] = toks.groupBy(_._1)
      .view.mapValues(_.groupBy(_._2).view.mapValues(_.size.toLong).toMap).toMap
    val totals = counts.view.mapValues(_.values.sum).toMap
    val vocab = counts.values.flatMap(_.keys).toSet
    val sources = counts.keys.toSeq.sorted
    val want = (for {
      a <- sources; b <- sources if a < b
    } yield {
      val (na, nb) = (totals(a), totals(b))
      val js = vocab.toSeq.map { t =>
        val ca = counts(a).getOrElse(t, 0L)
        val cb = counts(b).getOrElse(t, 0L)
        val pa = ca.toDouble / na
        val pb = cb.toDouble / nb
        val s = pa + pb
        val ta = if (ca == 0) 0.0 else pa * math.log(2.0 * pa / s)
        val tb = if (cb == 0) 0.0 else pb * math.log(2.0 * pb / s)
        math.round((ta + tb) * 500000000.0)
      }.sum
      (a, b) -> ((na, nb, js))
    }).toMap
    assert(got == want)
    // a source against itself (forced through the same formula) is zero
    // and every pair lands in [0, ln 2]
    val ln2e9 = math.round(math.log(2.0) * 1e9)
    assert(got.values.forall { case (_, _, js) => js >= 0 && js <= ln2e9 + 200 })
  }

  test("d36: IVF-PQ matches the exact top-k WITHIN its probed lists " +
    "(PQ+refine is near-lossless; global loss is the documented nprobe " +
    "pruning)") {
    import graft.operators.SimilaritySearch
    graft.plans.GraftFunctions.register(spark)
    val ann = SparkEntry.queries("d36_ivfpq_ann")(spark, sfDir)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(ann.keys.size == 10 && ann.values.forall(_.size == 3))
    // ceiling: exact top-3 restricted to each query's 2 probed lists
    // (the same trained codebook + assignment d36 uses)
    val e = Tables.embeddings(spark, sfDir)
      .withColumn("q", expr(SimilaritySearch.quantizeSql("embedding")))
    val cand = e.filter(col("vec_id") >= 20)
    val codebook = graft.operators.KMeans
      .fitQuantizedSampled(cand, 16, 40, 2)
    val asg = graft.operators.KMeans.assignQuantized(cand, codebook)
      .select(col("vec_id"), col("cent_id"), col("q"))
    val qs = e.filter(col("vec_id") >= 10 && col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("q").as("qq"))
    val dist = "aggregate(zip_with(qq, cq, (x, c) -> (x - c) * (x - c)), " +
      "0L, (acc, v) -> acc + v)"
    val qp = qs.crossJoin(broadcast(codebook))
      .withColumn("dist", expr(dist))
      .withColumn("pr", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("dist").asc, col("cent_id").asc)))
      .filter(col("pr") <= 2)
      .select("query_id", "qq", "cent_id")
    val ceiling = asg.join(broadcast(qp), Seq("cent_id"))
      .withColumn("dot", expr(SimilaritySearch.dotSql("qq", "q")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("dot").desc, col("vec_id").asc)))
      .filter(col("rn") <= 3)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = ceiling.keys.toSeq
      .map(q => (ann.getOrElse(q, Set.empty) & ceiling(q)).size).sum
    val total = ceiling.values.map(_.size).sum
    // the PqPreM=20 exact-refine shortlist recovers nearly all within-
    // list neighbours; allow a small PQ shortlist miss margin
    assert(hits * 10 >= total * 9,
      s"within-list recall ${hits.toDouble / total} below 0.9")
  }
}
