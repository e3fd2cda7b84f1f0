package graft.engine

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Broadcast schema registry: per-row schema dispatch over a mixed corpus. */
class SchemaRegistrySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val registry = SchemaRegistry.compile(Map(
    "short-text" -> """{"properties":{"payload":{"type":"string","maxLength":5}},"required":["payload"]}""",
    "number" -> """{"properties":{"payload":{"pattern":"^[0-9]+$"}},"required":["payload"]}"""))

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("schema_name", StringType, nullable = false),
    StructField("payload", StringType, nullable = true)))

  private val rows = Seq(
    Row(0L, "short-text", "hi"),       // valid
    Row(1L, "short-text", "toolongx"), // maxLength fail
    Row(2L, "number", "12345678"),     // valid (no maxLength in this schema)
    Row(3L, "number", "12a"),          // pattern fail
    Row(4L, "short-text", null))       // required fail (null = absent)

  test("rows dispatch to their named schema via the broadcast registry") {
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val out = SchemaRegistry.validateWith(spark, df, registry, "schema_name")
      .select("id", "valid").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out === Map(0L -> true, 1L -> false, 2L -> true, 3L -> false, 4L -> false))
  }

  test("unknown schema name fails loudly") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(9L, "nope", "x")), 1), schema)
    val e = intercept[org.apache.spark.SparkException] {
      SchemaRegistry.validateWith(spark, df, registry, "schema_name").collect()
    }
    assert(e.getMessage.contains("no schema 'nope'") ||
      Option(e.getCause).exists(_.getMessage.contains("no schema 'nope'")))
  }
}
