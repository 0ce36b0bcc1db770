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
         |ORDER BY query_id, rn""".stripMargin)
}
