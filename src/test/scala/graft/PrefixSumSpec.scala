package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.PrefixSum

class PrefixSumSpec extends SparkSpec {

  test("runningSum equals the global per-key running window sum") {
    import spark.implicits._
    // bijective id scatter ((i*37) % 500, gcd(37,500)=1) so ids arrive
    // out of order and shard boundaries fall mid-key; 3-value key is
    // exactly the O(1)-cardinality shape PrefixSum exists for
    val df = (0 until 500)
      .map(i => ((i.toLong * 37) % 500, s"k${i % 3}", (i % 13).toLong + 1))
      .toDF("id", "key", "v")
    val got = PrefixSum.runningSum(df, Seq("key"), "id", "v", "cum")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val w = Window.partitionBy("key").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cum", sum(col("v")).over(w))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("runningSum windows never run a bare-key running sum over the rows") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = (0 until 100).map(i => (i.toLong, s"k${i % 2}", 1L))
      .toDF("id", "key", "v")
    val plan = PrefixSum.runningSum(df, Seq("key"), "id", "v", "cum")
      .queryExecution.optimizedPlan
    // every row-level window must carry the shard in its partition spec
    // (parallelism |keys| x shards). The only 1-expr window allowed is
    // the offsets EXCLUSIVE prefix (frame upper bound -1) over the
    // <= |keys| x shards per-shard aggregate — the row-level running sum
    // uses a currentRow upper bound, so the frame discriminates the two.
    import org.apache.spark.sql.catalyst.expressions.{
      SpecifiedWindowFrame, WindowExpression, WindowSpecDefinition}
    val bare = plan.collect {
      case w: LWindow if w.partitionSpec.size == 1 &&
        w.windowExpressions.exists(_.collectFirst {
          case WindowExpression(_, WindowSpecDefinition(_, _,
            SpecifiedWindowFrame(_, _, upper))) if upper.sql != "-1" => ()
        }.nonEmpty) => w
    }
    assert(bare.isEmpty, s"bare-key running window over input rows:\n$bare")
  }

  test("runningSum handles an empty input") {
    import spark.implicits._
    val df = Seq.empty[(Long, String, Long)].toDF("id", "key", "v")
    assert(PrefixSum.runningSum(df, Seq("key"), "id", "v", "cum").count() == 0L)
  }

  test("runningSum property sweep: shard counts and id shapes") {
    import spark.implicits._
    // deterministic adversarial shapes: sparse ids (shard-span rounding),
    // all rows in one key, one row per key, single-row input, zero
    // values, shards = 1 (degenerates to the global window) and shards
    // far above the row count (most shards empty)
    val shapes: Seq[(String, Seq[(Long, String, Long)])] = Seq(
      "sparse-ids" -> (0 until 200)
        .map(i => (i.toLong * i * 7 % 100000, s"k${i % 5}", (i % 7).toLong))
        .groupBy(_._1).map(_._2.head).toSeq, // unique ids
      "one-key" -> (0 until 100).map(i => (i.toLong, "k", 1L)),
      "key-per-row" -> (0 until 50).map(i => (i.toLong, s"k$i", i.toLong)),
      "single-row" -> Seq((42L, "k", 9L)),
      "zero-values" -> (0 until 30).map(i => (i.toLong, s"k${i % 2}", 0L)))
    for ((label, rows) <- shapes; shards <- Seq(1, 3, 64, 1000)) {
      val df = rows.toDF("id", "key", "v")
      val got = PrefixSum.runningSum(df, Seq("key"), "id", "v", "cum", shards)
        .select("id", "cum").as[(Long, Long)].collect().toMap
      val w = Window.partitionBy("key").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = df.withColumn("cum", sum(col("v")).over(w))
        .select("id", "cum").as[(Long, Long)].collect().toMap
      assert(got == want, s"$label shards=$shards")
    }
  }
}
