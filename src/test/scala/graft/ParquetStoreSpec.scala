package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ParquetStore

class ParquetStoreSpec extends SparkSpec {

  test("day-partitioned store prunes partitions for time predicates") {
    val dir = Files.createTempDirectory("graft_store_").toString
    val events = Tables.events(spark, sfDir)
    ParquetStore.writeDayPartitioned(events, "ts", dir)

    // layout: one directory per day
    val days = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("p_day="))
    assert(days.length > 1, s"expected day directories, got ${days.toSeq}")

    val pruned = ParquetStore.read(spark, dir).filter(col("p_day") === "2024-01-05")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("p_day"),
      s"expected partition pruning in plan:\n$plan")
    val expected = events.filter(to_date(col("ts")) === "2024-01-05").count()
    assert(pruned.count() == expected)
  }
}
