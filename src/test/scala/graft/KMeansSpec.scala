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

  test("every vector is assigned to exactly one of k centroids") {
    val codebook = KMeans.fit(spark, vecs, k = 4, iters = 2)
    val assigned = KMeans.assign(vecs, codebook)
    assert(assigned.count() == vecs.count())
    val cents = assigned.select("cent_id").distinct().count()
    assert(cents <= 4 && cents > 1)
  }
}
