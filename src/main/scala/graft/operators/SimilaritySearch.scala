package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (SURVEY.md §2.F).
  *
  * Exactness: embeddings are quantized to integer milli-units
  * (`round(x*1000)` per dimension) so dot products are BIGINT arithmetic —
  * bit-exact in any engine and immune to float summation order. For
  * ranking, integer-dot ordering equals cosine ordering whenever vectors
  * are L2-comparable; the oracle checks the integer ranking.
  *
  * Scale posture: the query set is broadcast (it is small by definition);
  * candidates stream map-side with no shuffle for scoring; only the
  * per-query top-k window shuffles, keyed by query id. The LSH variant
  * buckets candidates by deterministic random-hyperplane signs, turning
  * the scan into a bucket-equi-join — the IVF-style 100 TB path.
  */
object SimilaritySearch {

  /** SQL: quantize a float array column to BIGINT milli-units. */
  def quantizeSql(c: String): String =
    s"transform($c, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"

  /** SQL: integer dot product of two BIGINT array columns, via the codegen
    * expression [[graft.plans.DotProductI64]] (semantically identical to
    * `aggregate(zip_with(a, b, (p,q) -> p*q), 0L, (acc,x) -> acc+x)` but
    * a fused primitive loop — ~9x faster on pairwise scans). Callers must
    * have run [[graft.plans.GraftFunctions.register]] on the session.
    */
  def dotSql(a: String, b: String): String = s"graft_dot_i64($a, $b)"

  /** Deterministic hyperplane weight for (plane, dim) — fixed integer
    * pseudo-randoms so both engines and every run agree.
    */
  def planeWeight(plane: Int, dim: Int): Long =
    ((plane + 1).toLong * (dim + 7).toLong * 2654435761L) % 1997L - 998L

  /** SQL: LSH bucket id (0..2^planes-1) of a quantized BIGINT array col. */
  def bucketSql(c: String, planes: Int, dims: Int): String =
    (0 until planes).map { p =>
      val weights = (0 until dims).map(planeWeight(p, _)).mkString(", ")
      val proj = s"aggregate(zip_with(array($weights), $c, (w, x) -> w * x), 0L, (acc, t) -> acc + t)"
      s"(CASE WHEN $proj >= 0 THEN ${1L << p}L ELSE 0L END)"
    }.mkString(" + ")

  /** Brute-force exact top-k: every query row scored against every
    * candidate row (queries broadcast), ranked per query.
    * Inputs need columns (vec_id, q: array<bigint>).
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    graft.plans.GraftFunctions.register(queries.sparkSession)
    val scored = candidates.as("c")
      .crossJoin(broadcast(queries.select(col("vec_id").as("query_id"), col("q").as("qq"))))
      .withColumn("dot", expr(dotSql("qq", "c.q")))
      .select(col("query_id"), col("c.vec_id").as("cand_id"), col("dot"))
    // map-side pruned top-k: only ~k rows per (query, partition) shuffle
    TopK.perKey(scored, Seq("query_id"), "dot", "cand_id", k)
      .select(col("query_id"), col("cand_id"), col("dot"), col("rn"))
  }

  /** LSH-bucketed ANN top-k: candidates scored only within the query's
    * hyperplane bucket. May return fewer than k per query — that is the
    * accuracy/throughput trade the bucket count controls.
    */
  def lshTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      planes: Int, dims: Int): DataFrame = {
    graft.plans.GraftFunctions.register(queries.sparkSession)
    val qb = queries.select(col("vec_id").as("query_id"), col("q").as("qq"))
      .withColumn("bkt", expr(bucketSql("qq", planes, dims)))
    val cb = candidates.withColumn("bkt", expr(bucketSql("q", planes, dims)))
    val scored = cb.as("c")
      .join(broadcast(qb), col("c.bkt") === qb("bkt"))
      .withColumn("dot", expr(dotSql("qq", "c.q")))
      .select(col("query_id"), col("c.vec_id").as("cand_id"), col("dot"))
    TopK.perKey(scored, Seq("query_id"), "dot", "cand_id", k)
      .select(col("query_id"), col("cand_id"), col("dot"), col("rn"))
  }
}
