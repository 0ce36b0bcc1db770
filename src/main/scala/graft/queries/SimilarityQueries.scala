package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.SimilaritySearch
import graft.operators.SimilaritySearch.{planeWeight, quantizeSql}

/** Embedding similarity search (SURVEY.md §2.F): brute-force exact top-k
  * and the LSH-bucketed ANN path, both over integer-quantized vectors so
  * the DuckDB oracle replays the ranking exactly.
  */
object SimilarityQueries {

  type Q = (SparkSession, String) => DataFrame

  private val K = 3
  private val Planes = 4
  private val Dims = 64
  private val NQueries = 10

  private def quantized(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).withColumn("q", expr(quantizeSql("embedding")))
      .select(col("vec_id"), col("q"))

  val queries: Map[String, Q] = Map(
    "d05_embed_cosine_topk" -> { (s, d) =>
      val e = quantized(s, d)
      SimilaritySearch.bruteForceTopK(
        e.filter(col("vec_id") < NQueries),
        e.filter(col("vec_id") >= NQueries), K)
        .orderBy("query_id", "rn")
    },

    "d06_embed_lsh_ann" -> { (s, d) =>
      val e = quantized(s, d)
      SimilaritySearch.lshTopK(
        e.filter(col("vec_id") < NQueries),
        e.filter(col("vec_id") >= NQueries), K, Planes, Dims)
        .orderBy("query_id", "rn")
    },

    // IVF inverted-list ANN: coarse centroids (vec_id<8), queries probe
    // their nprobe=2 nearest lists. The full IVF shape minus codebook
    // training (a k-means codebook plugs into the same operator).
    "d09_embed_ivf_ann" -> { (s, d) =>
      val e = quantized(s, d)
      SimilaritySearch.ivfTopK(
        queries = e.filter(col("vec_id") >= 10 && col("vec_id") < 20),
        candidates = e.filter(col("vec_id") >= 20),
        centroids = e.filter(col("vec_id") < 8),
        nprobe = 2, k = K)
        .orderBy("query_id", "rn")
    },

    // Production f32 fast path via the custom codegen expression
    // (graft.plans.DotProductF32). Float sums can't hash-match a foreign
    // engine, so this is intentionally rows-only checked; d05 is the
    // integer-exact oracle twin.
    "d07_embed_cosine_f32" -> { (s, d) =>
      graft.plans.GraftFunctions.register(s)
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      val scored = e.filter(col("vec_id") >= NQueries)
        .crossJoin(broadcast(q))
        .withColumn("dot", expr("graft_dot_f32(qe, embedding)"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("dot").desc, col("vec_id").asc)
      scored.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= K)
        .select(col("query_id"), col("vec_id").as("cand_id"),
          round(col("dot"), 4).as("dot4"), col("rn"))
        .orderBy("query_id", "rn")
    },

    // Embedding-cosine near-dup scan: top-20 most-similar pairs by
    // cos^2 = dot^2/(|a|^2*|b|^2), all in exact integer/rational math
    // (sqrt-free; the production threshold form `cos >= t` is the same
    // predicate as t^2*na*nb <= dot^2). This corpus is near-orthogonal
    // (max cos ~0.51), so ranking — not thresholding — keeps the oracle
    // evidence non-trivial.
    "d08_embed_neardup" -> { (s, d) =>
      graft.plans.GraftFunctions.register(s)
      val e = quantized(s, d)
        .withColumn("nq", expr(SimilaritySearch.dotSql("q", "q")))
      e.as("x").join(e.as("y"), col("x.vec_id") < col("y.vec_id"))
        .withColumn("dot", expr(SimilaritySearch.dotSql("x.q", "y.q")))
        .filter(col("dot") > 0)
        .withColumn("cos2_4",
          round((col("dot") * col("dot")).cast("double") / (col("x.nq") * col("y.nq")), 4))
        .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"), col("dot"), col("cos2_4"))
        .orderBy(col("cos2_4").desc, col("a").asc, col("b").asc)
        .limit(20)
    })

  // --- generated oracle SQL ----------------------------------------------

  private val quantDuck =
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"

  private def dotDuck(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, ${Dims + 1}), " +
      s"i -> $a[CAST(i AS INT)] * $b[CAST(i AS INT)])) AS BIGINT)"

  private def bucketDuck(c: String): String =
    (0 until Planes).map { p =>
      val ws = (0 until Dims).map(planeWeight(p, _)).mkString(", ")
      val proj = s"list_sum(list_transform(range(1, ${Dims + 1}), " +
        s"i -> ([$ws][CAST(i AS INT)]) * $c[CAST(i AS INT)]))"
      s"(CASE WHEN $proj >= 0 THEN CAST(${1L << p} AS BIGINT) ELSE 0 END)"
    }.mkString(" + ")

  val oracle: Map[String, String] = Map(
    "d05_embed_cosine_topk" ->
      s"""WITH e AS (SELECT vec_id, $quantDuck AS q FROM embeddings),
         |qs AS (SELECT vec_id AS query_id, q AS qq FROM e WHERE vec_id < $NQueries),
         |cs AS (SELECT vec_id, q FROM e WHERE vec_id >= $NQueries),
         |scored AS (SELECT query_id, cs.vec_id AS cand_id,
         |    ${dotDuck("qq", "q")} AS dot
         |  FROM cs CROSS JOIN qs),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY dot DESC, cand_id ASC) AS rn FROM scored)
         |SELECT query_id, cand_id, dot, rn FROM ranked WHERE rn <= $K
         |ORDER BY query_id, rn""".stripMargin,

    "d06_embed_lsh_ann" ->
      s"""WITH e AS (SELECT vec_id, $quantDuck AS q FROM embeddings),
         |qs AS (SELECT vec_id AS query_id, q AS qq, ${bucketDuck("q")} AS bkt
         |  FROM e WHERE vec_id < $NQueries),
         |cs AS (SELECT vec_id, q, ${bucketDuck("q")} AS bkt
         |  FROM e WHERE vec_id >= $NQueries),
         |scored AS (SELECT query_id, cs.vec_id AS cand_id,
         |    ${dotDuck("qq", "q")} AS dot
         |  FROM cs JOIN qs ON cs.bkt = qs.bkt),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY dot DESC, cand_id ASC) AS rn FROM scored)
         |SELECT query_id, cand_id, dot, rn FROM ranked WHERE rn <= $K
         |ORDER BY query_id, rn""".stripMargin,

    "d09_embed_ivf_ann" ->
      s"""WITH e AS (SELECT vec_id, $quantDuck AS q FROM embeddings),
         |n AS (SELECT vec_id, q, ${dotDuck("q", "q")} AS nq FROM e),
         |cents AS (SELECT vec_id AS cent_id, q AS cq, nq AS cn FROM n WHERE vec_id < 8),
         |cand AS (SELECT vec_id, q, nq FROM n WHERE vec_id >= 20),
         |qs AS (SELECT vec_id, q, nq FROM n WHERE vec_id >= 10 AND vec_id < 20),
         |ca AS (SELECT cand_id, q, cent_id FROM (
         |    SELECT c.vec_id AS cand_id, c.q, ct.cent_id,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY c.nq + ct.cn - 2 * ${dotDuck("c.q", "ct.cq")} ASC,
         |                 ct.cent_id ASC) AS pr
         |    FROM cand c CROSS JOIN cents ct)
         |  WHERE pr = 1),
         |qp AS (SELECT query_id, qq, cent_id FROM (
         |    SELECT s.vec_id AS query_id, s.q AS qq, ct.cent_id,
         |      row_number() OVER (PARTITION BY s.vec_id
         |        ORDER BY s.nq + ct.cn - 2 * ${dotDuck("s.q", "ct.cq")} ASC,
         |                 ct.cent_id ASC) AS pr
         |    FROM qs s CROSS JOIN cents ct)
         |  WHERE pr <= 2),
         |scored AS (SELECT qp.query_id, ca.cand_id, ${dotDuck("qp.qq", "ca.q")} AS dot
         |  FROM ca JOIN qp USING (cent_id)),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY dot DESC, cand_id ASC) AS rn FROM scored)
         |SELECT query_id, cand_id, dot, rn FROM ranked WHERE rn <= $K
         |ORDER BY query_id, rn""".stripMargin,

    "d08_embed_neardup" ->
      s"""WITH e AS (SELECT vec_id, $quantDuck AS q FROM embeddings),
         |n AS (SELECT vec_id, q, ${dotDuck("q", "q")} AS nq FROM e),
         |p AS (SELECT x.vec_id AS a, y.vec_id AS b,
         |    ${dotDuck("x.q", "y.q")} AS dot, x.nq AS na, y.nq AS nb
         |  FROM n x JOIN n y ON x.vec_id < y.vec_id)
         |SELECT a, b, dot,
         |  round(CAST(dot * dot AS DOUBLE) / (na * nb), 4) AS cos2_4
         |FROM p WHERE dot > 0
         |ORDER BY cos2_4 DESC, a ASC, b ASC LIMIT 20""".stripMargin)
}
