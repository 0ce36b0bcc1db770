package graft

import org.apache.spark.sql.types._

/** Smoke spec: every driver-generated testdata table loads through
  * graft.Tables and carries the column names/types the query packs assume.
  * When the driver regenerates testdata with a different physical layout
  * (as happened r7→r8 with events.ts: TIMESTAMP(NANOS) → timestamp[us]),
  * this fails as ONE readable assertion instead of dozens of downstream
  * analysis errors. Pinned to the schemas Spark resolves from the current
  * generation (int32 keys on region/nation, timestamp_ntz dates).
  */
class TablesSchemaSpec extends SparkSpec {

  private def cols(df: org.apache.spark.sql.DataFrame): Map[String, DataType] =
    df.schema.fields.map(f => f.name -> f.dataType).toMap

  test("all nine testdata tables load with expected column types") {
    val checks: Seq[(String, org.apache.spark.sql.DataFrame, Map[String, DataType])] = Seq(
      ("region", Tables.region(spark, sfDir),
        Map("r_regionkey" -> IntegerType, "r_name" -> StringType)),
      ("nation", Tables.nation(spark, sfDir),
        Map("n_nationkey" -> IntegerType, "n_name" -> StringType, "n_regionkey" -> IntegerType)),
      ("customer", Tables.customer(spark, sfDir),
        Map("c_custkey" -> LongType, "c_name" -> StringType, "c_nationkey" -> IntegerType,
          "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType)),
      ("supplier", Tables.supplier(spark, sfDir),
        Map("s_suppkey" -> LongType, "s_name" -> StringType, "s_nationkey" -> IntegerType,
          "s_acctbal" -> DoubleType)),
      ("part", Tables.part(spark, sfDir),
        Map("p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
          "p_type" -> StringType, "p_size" -> IntegerType, "p_retailprice" -> DoubleType)),
      ("orders", Tables.orders(spark, sfDir),
        Map("o_orderkey" -> LongType, "o_custkey" -> LongType, "o_orderstatus" -> StringType,
          "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampNTZType,
          "o_orderpriority" -> StringType)),
      ("lineitem", Tables.lineitem(spark, sfDir),
        Map("l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
          "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
          "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType, "l_tax" -> DoubleType,
          "l_returnflag" -> StringType, "l_linestatus" -> StringType,
          "l_shipdate" -> TimestampNTZType)),
      ("events", Tables.events(spark, sfDir),
        Map("event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
          "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)),
      ("documents", Tables.documents(spark, sfDir),
        Map("doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
          "source" -> StringType, "n_chars" -> LongType)),
      ("embeddings", Tables.embeddings(spark, sfDir),
        Map("vec_id" -> LongType, "embedding" -> ArrayType(FloatType, containsNull = true),
          "label" -> IntegerType))
    )
    val problems = checks.flatMap { case (name, df, expected) =>
      val actual = cols(df)
      expected.flatMap { case (c, t) =>
        actual.get(c) match {
          case None     => Some(s"$name.$c: MISSING (has: ${actual.keys.toSeq.sorted.mkString(",")})")
          case Some(at) if at != t => Some(s"$name.$c: expected $t, got $at")
          case _        => None
        }
      }
    }
    assert(problems.isEmpty, problems.mkString("\n"))
  }

  test("events loader normalizes ts to TimestampType and rows are readable") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.limit(1).count() == 1L)
  }
}
