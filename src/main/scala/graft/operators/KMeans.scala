package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means codebook trainer for the IVF coarse
  * quantizer (SURVEY.md §2.F).
  *
  * Design for scale: each iteration is one broadcast of the K×dims
  * codebook (tiny by definition), one map-side argmin assignment pass over
  * the corpus, and one groupBy(centroid, dim) mean — no driver-side data
  * movement beyond the codebook itself. Determinism: fixed initialization
  * (first K vectors by id) and no RNG, so retrains and retries converge
  * identically; ties in assignment break on centroid id.
  *
  * Input: (vec_id: long, q: array<bigint>) quantized vectors (same
  * representation the search operators use). Output codebook:
  * (cent_id: long, cq: array<double>).
  */
object KMeans {

  def fit(spark: SparkSession, vectors: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 0, "k and iters must be positive")
    val wId = Window.orderBy(col("vec_id").asc)
    var codebook = vectors.orderBy("vec_id").limit(k)
      .withColumn("cent_id", row_number().over(wId).cast("long") - 1)
      .select(col("cent_id"), expr("transform(q, x -> CAST(x AS DOUBLE))").as("cq"))

    (0 until iters).foreach { _ =>
      val assigned = assign(vectors, codebook)
      // element-wise mean per centroid: explode dims, average, re-assemble
      // in dim order (struct sort keeps determinism; collect_list alone
      // would not be ordered)
      codebook = assigned
        .select(col("cent_id"), posexplode(col("q")).as(Seq("dim", "x")))
        .groupBy("cent_id", "dim")
        .agg(avg(col("x")).as("m"))
        .groupBy("cent_id")
        .agg(collect_list(struct(col("dim"), col("m"))).as("dm"))
        .select(col("cent_id"),
          expr("transform(array_sort(dm), s -> s.m)").as("cq"))
    }
    codebook
  }

  /** Integer-exact Lloyd trainer: centroids stay BIGINT (element-wise
    * `floor(sum/count)` means), distances are exact integer ||x−c||², and
    * ties break on centroid id — every arithmetic step is replayable
    * verbatim in another SQL engine, so a query built on this codebook can
    * be oracle-checked END TO END including its training (see
    * d10_embed_ivf_trained, whose DuckDB oracle re-runs this loop as
    * generated CTEs). Same scale shape as [[fit]]: per iteration one
    * codebook broadcast, one map-side argmin pass, one groupBy mean.
    * Output codebook: (cent_id: long, cq: array<bigint>).
    */
  def fitQuantized(vectors: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 0, "k and iters must be positive")
    val wId = Window.orderBy(col("vec_id").asc)
    var codebook = vectors.orderBy("vec_id").limit(k)
      .withColumn("cent_id", row_number().over(wId).cast("long") - 1)
      .select(col("cent_id"), col("q").as("cq"))
    (0 until iters).foreach { _ =>
      codebook = assignQuantized(vectors, codebook)
        .select(col("cent_id"), posexplode(col("q")).as(Seq("dim", "x")))
        .groupBy("cent_id", "dim")
        // floor over DOUBLE division, not integer `div`: Spark's div
        // truncates toward zero while floor is engine-portable for the
        // negative means quantized embeddings produce
        .agg(expr("CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT)").as("m"))
        .groupBy("cent_id")
        .agg(collect_list(struct(col("dim"), col("m"))).as("dm"))
        .select(col("cent_id"), expr("transform(array_sort(dm), s -> s.m)").as("cq"))
    }
    codebook
  }

  /** Integer nearest-centroid assignment for [[fitQuantized]] codebooks:
    * exact BIGINT ||x − c||², centroid id as tie-break.
    */
  def assignQuantized(vectors: DataFrame, codebook: DataFrame): DataFrame = {
    val scored = vectors.crossJoin(broadcast(codebook))
      .withColumn("dist", expr(
        "aggregate(zip_with(q, cq, (x, c) -> (x - c) * (x - c)), 0L, (acc, v) -> acc + v)"))
    val w = Window.partitionBy("vec_id").orderBy(col("dist").asc, col("cent_id").asc)
    scored.withColumn("pr", row_number().over(w))
      .filter(col("pr") === 1)
      .select(col("vec_id"), col("q"), col("cent_id"), col("dist"))
  }

  /** Nearest-centroid assignment: broadcast codebook, map-side argmin of
    * ||x - c||² (double math here — training only; search stays integer).
    */
  def assign(vectors: DataFrame, codebook: DataFrame): DataFrame = {
    val scored = vectors.crossJoin(broadcast(codebook))
      .withColumn("dist", expr(
        "aggregate(zip_with(q, cq, (x, c) -> (CAST(x AS DOUBLE) - c) * (CAST(x AS DOUBLE) - c)), " +
          "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"))
    val w = Window.partitionBy("vec_id").orderBy(col("dist").asc, col("cent_id").asc)
    scored.withColumn("pr", row_number().over(w))
      .filter(col("pr") === 1)
      .select(col("vec_id"), col("q"), col("cent_id"), col("dist"))
  }

  /** Total within-cluster cost (Lloyd's objective; non-increasing). */
  def cost(vectors: DataFrame, codebook: DataFrame): Double =
    assign(vectors, codebook).agg(sum(col("dist"))).head().getDouble(0)
}
