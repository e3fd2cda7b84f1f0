package graft.engine

import graft.schema.SchemaDoc
import graft.validate.{Options, Validator}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Precompiled schema registry, broadcast to executors (north rule): many
  * schemas compiled ONCE on the driver, addressed by URI/name, selected per
  * row. Used when a corpus mixes document kinds (each row names its schema)
  * — the single-schema path compiles straight into the plan instead.
  *
  * All contained [[SchemaDoc]]s are immutable ⇒ the registry broadcasts as
  * one torrent block and every executor validates against local memory.
  */
final class SchemaRegistry private (val schemas: Map[String, SchemaDoc])
    extends Serializable {
  def apply(name: String): SchemaDoc =
    schemas.getOrElse(name,
      throw new NoSuchElementException(s"no schema '$name' in registry (${schemas.keys.mkString(", ")})"))
  def names: Set[String] = schemas.keySet
}

object SchemaRegistry {

  def compile(sources: Map[String, String]): SchemaRegistry =
    new SchemaRegistry(sources.map { case (k, v) => k -> SchemaDoc.schema(v) })

  /** Validate each row against the schema its `schemaCol` names. The
    * registry is broadcast once; rows dispatch locally. Adds
    * `valid` + `errors` like [[ValidationJob.withVerdicts]]. */
  def validateWith(
      spark: SparkSession, df: DataFrame,
      registry: SchemaRegistry, schemaCol: String): DataFrame = {
    val bc: Broadcast[SchemaRegistry] = spark.sparkContext.broadcast(registry)
    val schema = df.schema
    val schemaIdx = schema.fieldIndex(schemaCol)
    val payloadIdx = schema.fields.zipWithIndex
      .filter { case (f, _) => f.name != schemaCol }.map(_._2)
    val payloadSchema = StructType(payloadIdx.map(schema.fields(_)))
    val outSchema = schema
      .add(StructField("valid", BooleanType, nullable = false))
      .add(StructField("errors", ColumnCompiler.errorType, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      val reg = bc.value
      rows.map { row =>
        val doc = reg(row.getString(schemaIdx))
        val inst = RowValidator.toJVal(
          Row.fromSeq(payloadIdx.toIndexedSeq.map(row.get)), payloadSchema)
        val res = Validator.validate(doc, inst, Options())
        val errRows = RowValidator.leafErrors(res.errors)
          .map(v => Row(v.path, v.keyword, v.message))
        Row.fromSeq(row.toSeq :+ res.valid :+ errRows)
      }
    }(enc)
  }
}
