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
      .localCheckpoint()
    (0 until iters).foreach { _ =>
      codebook = lloydStep(vectors, codebook).localCheckpoint()
    }
    codebook
  }

  /** One exact-integer Lloyd iteration: assign, then re-center with
    * element-wise `floor(sum/count)` means. floor over DOUBLE division,
    * not integer `div`: Spark's div truncates toward zero while floor is
    * engine-portable for the negative means quantized embeddings produce.
    */
  /* Iterative-plan hygiene (applies to every trainer loop here): without a
   * lineage cut, iteration i's plan embeds iteration i-1's whole plan, and
   * every downstream consumer of the codebook (candidate assignment, query
   * probing, both join sides in d13) re-executes the full training DAG.
   * The codebook is k×dims — localCheckpoint materializes it executor-side
   * per iteration (the d11 connected-components pattern), so training runs
   * once and consumers read a tiny materialized table. */
  private def lloydStep(vectors: DataFrame, codebook: DataFrame): DataFrame =
    assignQuantized(vectors, codebook)
      .select(col("cent_id"), posexplode(col("q")).as(Seq("dim", "x")))
      .groupBy("cent_id", "dim")
      .agg(expr("CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT)").as("m"))
      .groupBy("cent_id")
      .agg(collect_list(struct(col("dim"), col("m"))).as("dm"))
      .select(col("cent_id"), expr("transform(array_sort(dm), s -> s.m)").as("cq"))

  /** Deterministic hash-sample predicate (the t05 hash-mod pattern —
    * engine-portable, oracle-replayable): keeps ~`pct`% of vectors.
    */
  def sampleSql(pct: Int): String = s"(vec_id * 2654435761) % 100 < $pct"

  /** Web-scale trainer shape: train the codebook on a deterministic
    * hash-SAMPLE of the corpus, with k CHOSEN FROM THE DATA as
    * `max(2, |sample| / targetClusterSize)` — so cluster population stays
    * O(targetClusterSize) as the corpus grows instead of n/k growing
    * unboundedly at fixed k (the SemDeDup recipe: k ∝ n). The full corpus
    * is only ever *assigned* (one broadcast + map-side argmin pass via
    * [[assignQuantized]]), never scanned per training iteration — at
    * 100 TB the per-iteration cost is the sample, not the corpus.
    *
    * Every step remains exact BIGINT arithmetic on deterministic inputs,
    * so a DuckDB oracle replays sampling, k selection, init, and all
    * Lloyd iterations verbatim (see d10/d13 in
    * [[graft.queries.SimilarityQueries]]).
    */
  def fitQuantizedSampled(vectors: DataFrame, targetClusterSize: Int,
      samplePct: Int, iters: Int): DataFrame = {
    require(targetClusterSize > 0 && samplePct > 0 && iters >= 0,
      "targetClusterSize, samplePct must be positive")
    // the sample stays a lazy filter over the input: each Lloyd iteration
    // re-reads it through the (pushed-down) scan, which beats
    // materializing at this size; at 100 TB persist it explicitly before
    // calling this if the input scan is expensive
    val sample = vectors.filter(expr(sampleSql(samplePct)))
    // k from a 1-row count aggregate (an O(1) driver scalar — the same
    // class as cost's spec helper, not data movement), then init rows via
    // orderBy+limit = TakeOrderedAndProject (per-partition heaps). The r6
    // verdict fix: the old single global window sorted the ENTIRE sample
    // (~1% of the corpus — ~1 TB at 100 TB) through one task per codebook
    // build. The rank window below sits on the already-limit(kk) input,
    // exactly the fitQuantized shape. Values are unchanged — first kk
    // rows by vec_id, cent_id = rank-1 — so every trained query stays
    // oracle-hash-identical.
    val n = sample.agg(count(lit(1))).head().getLong(0)
    val kk = math.max(2L, n / targetClusterSize)
    require(kk <= Int.MaxValue, s"k=$kk exceeds supported codebook size")
    // the init and every Lloyd iteration are sample-sized — run them at a
    // partition count derived from the measured sample (LoopConf r20:
    // AQE's per-stage re-planning and the session's static partition
    // count are the dominant cost of these tiny iterative plans at
    // bench scale; big samples keep the caller's conf)
    LoopConf.withSized(sample.sparkSession, n) {
      val wId = Window.orderBy(col("vec_id").asc)
      var codebook = sample.orderBy("vec_id").limit(kk.toInt)
        .withColumn("cent_id", row_number().over(wId).cast("long") - 1)
        .select(col("cent_id"), col("q").as("cq"))
        .localCheckpoint()
      (0 until iters).foreach { _ =>
        codebook = lloydStep(sample, codebook).localCheckpoint()
      }
      codebook
    }
  }

  /* Argmin shape: the broadcast crossJoin emits each vector's k scored
   * rows CONSECUTIVELY IN ONE PARTITION, so a groupBy(vec_id) min_by
   * collapses n×k → n rows map-side before any exchange — the shuffle
   * moves n assignment rows, not n×k scored rows (a window
   * row_number/filter would shuffle all n×k). The min_by ordering key
   * struct(dist, cent_id) is unique per group, so ties on distance still
   * break deterministically on centroid id. */

  /** Integer nearest-centroid assignment for [[fitQuantized]] codebooks:
    * exact BIGINT ||x − c||², centroid id as tie-break.
    */
  def assignQuantized(vectors: DataFrame, codebook: DataFrame): DataFrame = {
    // r20 argmin-in-projection (guide §4 + the plan audit): the old
    // crossJoin → n×k scored rows → min_by(struct, struct(dist, cent_id))
    // shape planned a SortAggregate — min_by's struct buffer is not
    // hash-aggregable, so every assignment pass SORTED its n×k expanded
    // rows. graft_argmin_sqdist evaluates the whole argmin inside one
    // codegen scan projection over the codebook collapsed to a single
    // broadcast row: no row explosion, no sort, no aggregation, no
    // exchange. The codebook arrays are sorted ascending by cent_id, so
    // the expression's lowest-index tie-break equals the old
    // struct(dist, cent_id) ordering exactly; cent_id is restored by
    // indexing the aligned id array (never assumed dense — a Lloyd
    // iteration can empty a centroid).
    graft.plans.GraftFunctions.register(vectors.sparkSession)
    vectors.crossJoin(broadcast(collapsed(codebook)))
      .withColumn("__p", expr("graft_argmin_sqdist(q, cbs)"))
      .select(col("vec_id"), col("q"),
        expr(s"element_at(cbids, CAST(__p % ${1L << 21} AS INT) + 1)").as("cent_id"),
        expr(s"__p div ${1L << 21}").as("dist"))
  }

  /** The collapsed-codebook aggregate shared by [[assignQuantized]],
    * [[assignIdx]] and [[centroidIdx]]: one row of cent_id-ascending
    * aligned (id, vector) arrays. All three MUST use this same ordering —
    * the argmin's lowest-index tie-break and the cidx mapping are only
    * equivalent to the struct(dist, cent_id) ordering because the arrays
    * sort ascending by cent_id.
    */
  private def collapsed(codebook: DataFrame): DataFrame = codebook.agg(
    expr("transform(array_sort(collect_list(struct(cent_id, cq))), s -> s.cent_id)")
      .as("cbids"),
    expr("transform(array_sort(collect_list(struct(cent_id, cq))), s -> s.cq)")
      .as("cbs"))

  /** Nearest-centroid INDEX assignment (r21) for join-shaped consumers:
    * (vec_id, q, cidx) where cidx is the centroid's position in the
    * ascending-cent_id codebook order (same argmin, same tie-break as
    * [[assignQuantized]]). Exists because joining the assignment on
    * cent_id propagates any probe-side constraint on cent_id (e.g. the
    * d09/d37 fixed-centroid slice `vec_id < 8`) through the equi-join
    * and Catalyst pushes the inferred filter BELOW the assignment
    * projection — re-evaluating the argmin up to 2x more per corpus row
    * inside the join condition (the d02 inferred-predicate trap, seen
    * live in the r21 d09/d37 plan dumps). cidx carries no constraints,
    * so the argmin stays a single projection eval; the probe side maps
    * cent_id → cidx via [[centroidIdx]] (bijective, so join pairs are
    * identical).
    */
  def assignIdx(vectors: DataFrame, codebook: DataFrame): DataFrame = {
    graft.plans.GraftFunctions.register(vectors.sparkSession)
    // coalesce(argmin, -1) makes cidx NON-NULLABLE, so the equi-join
    // downstream infers no IsNotNull(cidx) — which Catalyst would push
    // below this projection as a second argmin eval per corpus row
    // (seen live in the second r21 d09 dump: `Join condition:
    // isnotnull(cast((argminsqdist(..)) as int))`). -1 is outside
    // centroidIdx's 0..k-1 range, so a null argmin (null vector / empty
    // codebook — shapes the pipeline never produces) still never joins,
    // exactly like the null key it replaces.
    // the coalesce sits OUTSIDE the remainder: Remainder is nullable by
    // type (null divisor semantics), so an inner coalesce still leaves
    // cidx nullable and the IsNotNull re-appears
    vectors.crossJoin(broadcast(collapsed(codebook).select(col("cbs"))))
      .select(col("vec_id"), col("q"),
        expr(s"CAST(coalesce(graft_argmin_sqdist(q, cbs) % ${1L << 21}, -1L) AS INT)")
          .as("cidx"))
  }

  /** The (cent_id, cidx) mapping matching [[assignIdx]]'s index order —
    * k rows, broadcast it on the probe side.
    */
  def centroidIdx(codebook: DataFrame): DataFrame =
    collapsed(codebook)
      .select(posexplode(col("cbids")).as(Seq("cidx", "cent_id")))

  /** Nearest-centroid assignment: broadcast codebook, map-side argmin of
    * ||x - c||² (double math here — training only; search stays integer).
    */
  def assign(vectors: DataFrame, codebook: DataFrame): DataFrame = {
    val scored = vectors.crossJoin(broadcast(codebook))
      .withColumn("dist", expr(
        "aggregate(zip_with(q, cq, (x, c) -> (CAST(x AS DOUBLE) - c) * (CAST(x AS DOUBLE) - c)), " +
          "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"))
    scored.groupBy("vec_id")
      .agg(min_by(struct(col("cent_id"), col("q"), col("dist")),
        struct(col("dist"), col("cent_id"))).as("best"))
      .select(col("vec_id"), col("best.q").as("q"),
        col("best.cent_id").as("cent_id"), col("best.dist").as("dist"))
  }

  /** Total within-cluster cost (Lloyd's objective; non-increasing). */
  def cost(vectors: DataFrame, codebook: DataFrame): Double =
    assign(vectors, codebook).agg(sum(col("dist"))).head().getDouble(0)
}
