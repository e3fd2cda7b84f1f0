package graft.engine

import graft.schema.SchemaDoc
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bulk document validation: per-doc verdicts, exploded violation rows, and
  * per-partition pass/fail summaries (north rule).
  *
  * The schema is compiled ONCE on the driver into Catalyst expressions
  * ([[ColumnCompiler]]); the validation stage is a narrow projection over the
  * scan — zero shuffle, whole-stage codegen, so at 10^12 docs it scales
  * linearly with input splits. Falls back to the broadcast row-level core
  * ([[RowValidator]]) only when the schema is not column-expressible.
  */
object ValidationJob {

  /** `docs` must carry the interleaved shape (doc_id, spans) — extra columns
    * pass through. Adds `valid` + `errors`.
    *
    * Two-projection shape: `valid` comes from the lambda-free boolean plan
    * (whole-stage codegen'd — any CodegenFallback expression in a projection
    * disables codegen for the WHOLE operator), and the error-construction
    * expression — which needs per-element lambdas for paths/messages — runs
    * in a second thin projection gated on the precomputed boolean, so valid
    * rows pay one boolean column read instead of an interpreted tree walk.
    * The boolean plan ≡ (errors is empty) invariant is fuzz-checked
    * (RandomDocsSpec/RandomSchemaSpec differentials). */
  def withVerdicts(spark: SparkSession, docs: DataFrame, schemaJson: String): DataFrame = {
    val doc = SchemaDoc.schema(schemaJson)
    val payloadFields = docs.schema.fields.filter(f => f.name == "doc_id" || f.name == "spans")
    val payloadType = StructType(payloadFields)
    val payload = struct(payloadFields.map(f => col(f.name)).toSeq: _*)
    try {
      val boolPlan = ColumnCompiler.valid(doc, payload, payloadType)
      val errs = ColumnCompiler.errors(doc, payload, payloadType)
      val passthrough = docs.columns.filterNot(c => c == "errors" || c == "valid")
      // (passthrough…, valid, errors) — same column ORDER as the RowValidator
      // fallback, so positional consumers (and parquet written from a mix of
      // both paths) see one schema regardless of column-expressibility
      docs.withColumn("valid", boolPlan)
        .withColumn("errors",
          when(col("valid"), array().cast(ColumnCompiler.errorType)).otherwise(errs))
        .select((passthrough.map(col).toSeq :+ col("valid") :+ col("errors")): _*)
    } catch {
      case _: ColumnCompiler.Unsupported =>
        // validate the same payload fields the Column path would — NOT the
        // whole row — so the two paths agree on object-shape keywords
        RowValidator.validateRows(spark, docs, schemaJson,
          Some(payloadFields.map(_.name).toSeq))
    }
  }

  /** Verdict-only fast mode: adds just `valid` via the allocation-free
    * boolean plan (no error construction at all). For monitoring-style runs
    * that only need pass/fail rates this is ~2.4× the full path (9.0M vs
    * 3.7M docs/sec at local[32] on the 10M-doc bench table). */
  def withVerdictsOnly(spark: SparkSession, docs: DataFrame, schemaJson: String): DataFrame = {
    val doc = SchemaDoc.schema(schemaJson)
    val payloadFields = docs.schema.fields.filter(f => f.name == "doc_id" || f.name == "spans")
    val payload = struct(payloadFields.map(f => col(f.name)).toSeq: _*)
    try docs.withColumn("valid", ColumnCompiler.valid(doc, payload, StructType(payloadFields)))
    catch {
      case _: ColumnCompiler.Unsupported =>
        RowValidator.validateRows(spark, docs, schemaJson,
          Some(payloadFields.map(_.name).toSeq)).drop("errors")
    }
  }

  /** One row per violation: (doc_num, doc_id, path, keyword, message). */
  def violations(verdicts: DataFrame): DataFrame =
    verdicts
      .where(size(col("errors")) > 0)
      .select(col("doc_num"), col("doc_id"), explode(col("errors")).as("v"))
      .select(
        col("doc_num"), col("doc_id"),
        col("v.path").as("path"),
        col("v.keyword").as("keyword"),
        col("v.message").as("message"))

  /** Per-partition pass/fail verdicts. `partitionExpr` must be deterministic
    * (e.g. a hash/modulo of the key) so results are reproducible across runs
    * and cluster sizes — `spark_partition_id()` is not. */
  def partitionVerdicts(verdicts: DataFrame, partitionExpr: Column, nPartitions: Int): DataFrame =
    verdicts
      .groupBy((partitionExpr % nPartitions).cast(IntegerType).as("partition"))
      .agg(
        count(lit(1)).as("docs"),
        sum(when(col("valid"), 1L).otherwise(0L)).as("pass_count"),
        sum(when(col("valid"), 0L).otherwise(1L)).as("fail_count"),
        sum(size(col("errors")).cast(LongType)).as("violation_count"))

  /** Per-row span-sequence invariant vs a reference frame (BASELINE.json
    * input_hint): order-sensitive equality of (kind, text, media_ref) by
    * position. Compares two doc frames and returns rows that differ. */
  def spanMismatches(a: DataFrame, b: DataFrame): DataFrame = {
    def key(df: DataFrame, tag: String) =
      df.select(col("doc_num"),
        to_json(col("spans")).as(s"spans_$tag"))
    key(a, "a").join(key(b, "b"), Seq("doc_num"), "full_outer")
      .where(not(col("spans_a") <=> col("spans_b")))
  }
}
