package graft

import org.apache.spark.sql.functions._

import graft.operators.{KMeans, SimilaritySearch}

class KMeansSpec extends SparkSpec {

  private lazy val vecs = Tables.embeddings(spark, sfDir)
    .withColumn("q", expr(SimilaritySearch.quantizeSql("embedding")))
    .select(col("vec_id"), col("q"))
    .limit(200).cache()

  test("Lloyd iterations never increase the clustering cost") {
    val c0 = KMeans.fit(spark, vecs, k = 4, iters = 0)
    val c1 = KMeans.fit(spark, vecs, k = 4, iters = 1)
    val c3 = KMeans.fit(spark, vecs, k = 4, iters = 3)
    val costs = Seq(c0, c1, c3).map(KMeans.cost(vecs, _))
    assert(costs(1) <= costs(0) + 1e-6, s"iter1 worse: $costs")
    assert(costs(2) <= costs(1) + 1e-6, s"iter3 worse: $costs")
  }

  test("training is deterministic across runs") {
    def snapshot() = KMeans.fit(spark, vecs, k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    assert(snapshot() == snapshot())
  }

  test("trained codebook plugs into ivfTopK end to end") {
    val codebook = KMeans.fit(spark, vecs, k = 4, iters = 2)
      .select(col("cent_id").as("vec_id"),
        expr("transform(cq, x -> CAST(round(x) AS BIGINT))").as("q"))
    val out = SimilaritySearch.ivfTopK(
      queries = vecs.filter(col("vec_id") < 5),
      candidates = vecs.filter(col("vec_id") >= 5),
      centroids = codebook, nprobe = 2, k = 3)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(3) <= 3)) // rn within k
  }

  test("integer-exact trainer is deterministic and stays BIGINT throughout") {
    def snapshot() = KMeans.fitQuantized(vecs, k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1).toSeq
    val a = snapshot()
    assert(a == snapshot())
    assert(a.nonEmpty && a.forall(_._2.nonEmpty)) // integer codebook rows
    // integer Lloyd also never increases its own exact cost
    def costQ(cb: Seq[(Long, Seq[Long])]): Long = {
      import spark.implicits._
      val cbDf = cb.toDF("cent_id", "cq")
      KMeans.assignQuantized(vecs, cbDf).agg(sum("dist")).head.getLong(0)
    }
    val c1 = KMeans.fitQuantized(vecs, k = 4, iters = 1)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    assert(costQ(a) <= costQ(c1))
  }

  test("sampled trainer: k scales with corpus, pair volume stays cluster-bounded") {
    val target = 16
    val all = Tables.embeddings(spark, sfDir)
      .withColumn("q", expr(SimilaritySearch.quantizeSql("embedding")))
      .select(col("vec_id"), col("q")).cache()
    val n = all.count()
    val cb = KMeans.fitQuantizedSampled(all, target, samplePct = 40, iters = 2)
      .cache()
    val k = cb.count()
    // k is data-driven: max(2, |sample|/target), so it grows with n
    val nSample = all.filter(expr(KMeans.sampleSql(40))).count()
    assert(k == math.max(2L, nSample / target), s"k=$k sample=$nSample")
    // the d13 within-cluster pair volume: sum_i s_i*(s_i-1)/2 over the
    // FULL-corpus assignment must be O(n * target), not O(n^2 / k) at a
    // fixed k. Allow a skew factor over the balanced ideal n*target/2 —
    // Lloyd does not guarantee balance, but must beat all-pairs by far.
    val sizes = KMeans.assignQuantized(all, cb)
      .groupBy("cent_id").count().collect().map(_.getLong(1))
    val pairs = sizes.map(s => s * (s - 1) / 2).sum
    val allPairs = n * (n - 1) / 2
    assert(pairs <= 8L * n * target, s"pair volume $pairs vs bound ${8L * n * target}")
    assert(pairs * 4 < allPairs, s"pair volume $pairs not << all-pairs $allPairs")
    // determinism of the sampled trainer (same contract as fitQuantized)
    def snap() = KMeans.fitQuantizedSampled(all, target, 40, 2)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1).toSeq
    assert(snap() == snap())
  }

  test("persisted codebook lifecycle: serving is store-read, training-free, inline-equal") {
    // round-5 verdict item 4: train once → persist centroids → serve
    // d29-style health and d10-style topK FROM THE STORE. The serving
    // plans must scan the codebook parquet and contain no training jobs
    // (the hash-sample filter is training's distinctive marker), and the
    // results must equal the inline-trained forms — the
    // interchangeability that lets production split train from serve.
    import graft.operators.IvfIndex
    val all = Tables.embeddings(spark, sfDir)
      .withColumn("q", expr(SimilaritySearch.quantizeSql("embedding")))
      .select(col("vec_id"), col("q"))
    val codebook = KMeans.fitQuantizedSampled(all, 16, 40, 2)
    val path = s"/tmp/graft_stores/codebook_spec_${System.nanoTime()}"
    IvfIndex.save(codebook, path)
    val loaded = IvfIndex.load(spark, path)

    val served = IvfIndex.health(all, loaded)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains(path), s"serving must scan the store:\n$plan")
    assert(!plan.contains("% 100"),
      s"no training sample filter may appear in a serving plan:\n$plan")
    val inline = IvfIndex.health(all, codebook)
    assert(served.collect().toSeq == inline.collect().toSeq)

    val qs = all.filter(col("vec_id") >= 10 && col("vec_id") < 20)
    val cand = all.filter(col("vec_id") >= 20)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rn").collect().toSeq
    val servedTop = IvfIndex.topK(qs, cand, loaded, nprobe = 2, k = 3)
    assert(!servedTop.queryExecution.executedPlan.toString.contains("% 100"))
    assert(rows(servedTop) == rows(IvfIndex.topK(qs, cand, codebook, 2, 3)))
  }

  test("delta append: stored postings + assigned delta serve equal to full assignment, training-free") {
    // d34's identity: assignment is per-vector deterministic, so
    // append-then-serve == assign-everything-then-serve, and the serving
    // plan runs no training job (no hash-sample filter) and reads the
    // postings STORE rather than re-assigning history.
    import graft.operators.IvfIndex
    val all = Tables.embeddings(spark, sfDir)
      .withColumn("q", expr(SimilaritySearch.quantizeSql("embedding")))
      .select(col("vec_id"), col("q"))
    val hist = all.filter(col("vec_id") >= 20 && expr("vec_id % 10 <> 9"))
    val delta = all.filter(col("vec_id") >= 20 && expr("vec_id % 10 = 9"))
    val qs = all.filter(col("vec_id") >= 10 && col("vec_id") < 20)
    val codebook = KMeans.fitQuantizedSampled(hist, 16, 40, 2)
    val cbPath = s"/tmp/graft_stores/ivfapp_cb_spec_${System.nanoTime()}"
    val postPath = s"/tmp/graft_stores/ivfapp_post_spec_${System.nanoTime()}"
    IvfIndex.save(codebook, cbPath)
    KMeans.assignQuantized(hist, codebook)
      .select(col("cent_id"), col("vec_id").as("cand_id"), col("q"))
      .write.mode("overwrite").parquet(postPath)

    val cb = IvfIndex.load(spark, cbPath)
    val posts = spark.read.parquet(postPath).unionByName(
      KMeans.assignQuantized(delta, cb)
        .select(col("cent_id"), col("vec_id").as("cand_id"), col("q")))
    val served = SimilaritySearch.ivfTopKAssigned(qs, posts,
      cb.select(col("cent_id").as("vec_id"), col("cq").as("q")),
      nprobe = 2, k = 3)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains(postPath), s"serving must read the postings store:\n$plan")
    assert(!plan.contains("% 100"),
      s"no training sample filter may appear in a serving plan:\n$plan")

    val full = SimilaritySearch.ivfTopK(qs, hist.unionByName(delta),
      codebook.select(col("cent_id").as("vec_id"), col("cq").as("q")),
      nprobe = 2, k = 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rn").collect().toSeq
    assert(rows(served) == rows(full))
  }

  test("every vector is assigned to exactly one of k centroids") {
    val codebook = KMeans.fit(spark, vecs, k = 4, iters = 2)
    val assigned = KMeans.assign(vecs, codebook)
    assert(assigned.count() == vecs.count())
    val cents = assigned.select("cent_id").distinct().count()
    assert(cents <= 4 && cents > 1)
  }
}
