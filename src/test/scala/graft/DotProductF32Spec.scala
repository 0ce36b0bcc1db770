package graft

import org.apache.spark.sql.functions._

import graft.plans.GraftFunctions

class DotProductF32Spec extends SparkSpec {

  test("codegen dot product equals the declarative aggregate/zip_with form") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir).limit(50).cache()
    val pairs = e.select(col("vec_id").as("a"), col("embedding").as("ea"))
      .crossJoin(e.select(col("vec_id").as("b"), col("embedding").as("eb")))
    val diff = pairs
      .withColumn("fast", expr("graft_dot_f32(ea, eb)"))
      .withColumn("slow", expr(
        "aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
          "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(diff == 0L, "fused loop must accumulate identically to the fold")
  }

  test("null inputs yield null") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Some(Array(1.0f, 2.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val out = df.select(expr("graft_dot_f32(a, b)")).collect()
    assert(out.head.isNullAt(0))
  }

  test("type mismatch is rejected at analysis") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Array(1.0), Array(1.0f))).toDF("a", "b")
    intercept[Exception] { df.select(expr("graft_dot_f32(a, b)")).collect() }
  }
}
