package graft

import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** Schema-drift canary (round-8 verdict item 5).
  *
  * The driver regenerated the testdata once already (round 7:
  * events.ts flipped TIMESTAMP(NANOS) → timestamp[us]) and the
  * resulting failure mode was 19 opaque red keys. This spec pins the
  * engine's expectation of every table's loaded schema so the NEXT
  * drift fails here first, with a message naming the table and column.
  *
  * Expectations are on the schema AS LOADED by the engine's session
  * (nanosAsLong=true, UTC) — i.e. what every operator actually sees —
  * not raw parquet logical types, because the engine's contract is
  * with the loaded frame. `events.ts` is checked twice: the raw read
  * must be one of the two known physical shapes, and `Tables.events`
  * must normalize both to TimestampType.
  */
class SchemaCanarySpec extends GraftSuite {

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  private def assertSchema(
      table: String, actual: StructType, exp: Seq[(String, DataType)]): Unit = {
    val actualMap = actual.fields.map(f => f.name -> f.dataType).toMap
    exp.foreach { case (col, dt) =>
      assert(actualMap.contains(col),
        s"SCHEMA DRIFT: $table is missing column '$col' " +
          s"(loaded columns: ${actual.fieldNames.mkString(", ")})")
      assert(actualMap(col) == dt,
        s"SCHEMA DRIFT: $table.$col loaded as ${actualMap(col)} " +
          s"but the engine expects $dt — testdata regenerated with a " +
          s"new physical type? Update Tables/this canary together.")
    }
    val extra = actualMap.keySet -- exp.map(_._1)
    assert(extra.isEmpty,
      s"SCHEMA DRIFT: $table has unexpected new columns: ${extra.mkString(", ")}")
  }

  test("all non-events tables load with the pinned schemas") {
    expected.foreach { case (table, exp) =>
      assertSchema(table, spark.read.parquet(s"$sf/$table.parquet").schema, exp)
    }
  }

  test("events.ts raw shape is one of the two known generations") {
    val raw = spark.read.parquet(s"$sf/events.parquet").schema
    val others = Seq("event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)
    assertSchema("events(sans ts)",
      StructType(raw.filterNot(_.name == "ts")), others)
    val tsType = raw("ts").dataType
    assert(
      tsType == LongType || tsType == TimestampNTZType || tsType == TimestampType,
      s"SCHEMA DRIFT: events.ts loaded as $tsType — neither the legacy " +
        "ns-as-long shape nor a native timestamp. Tables.events needs a " +
        "new branch.")
  }

  test("Tables.events normalizes ts to TimestampType on current data") {
    assert(Tables.events(spark, sf).schema("ts").dataType == TimestampType)
  }

  test("Tables.events legacy branch converts ns-as-long to µs timestamps") {
    // Spark can't WRITE parquet TIMESTAMP(NANOS); a plain int64 'ts'
    // column is byte-identical to what nanosAsLong=true surfaces from
    // the legacy files, so it exercises the same LongType branch.
    val dir = java.nio.file.Files.createTempDirectory("canary-ns").toString
    val nsVal = 1700000000123456000L // µs-aligned ns, as the generator emits
    spark.range(1).select(
      lit(1L).as("event_id"), lit(nsVal).as("ts"), lit(7L).as("user_id"),
      lit("click").as("event_type"), lit(0.5).as("value"), lit("{}").as("props")
    ).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType == TimestampType)
    val micros = got.select(unix_micros(col("ts"))).head.getLong(0)
    assert(micros == nsVal / 1000L,
      s"legacy ns branch floor-to-µs mismatch: $micros vs ${nsVal / 1000L}")
  }
}
