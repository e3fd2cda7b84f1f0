package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The interleaved text+media document table mandated by the north rule:
  * `doc_id: string, spans: array<struct<kind,text,media_ref,offset>>`.
  *
  * The driver-provided `documents.parquet` has no `spans` column, so the
  * table is synthesized *deterministically* from it with pure arithmetic on
  * `doc_id` — every expression here has an exact SQL mirror (see
  * [[DocTable.sqlSpansCte]]) so DuckDB can serve as an independent oracle.
  *
  * Injected violations (all rates chosen so sf0.01's 5k docs hit each):
  *   - `doc_id % 103 == 0` → doc_id "DOC-n" (pattern violation)
  *   - `doc_id % 97 == 0`  → zero spans (minItems violation)
  *   - `(doc_id*31+i) % 89 == 0` (and not a media slot) → kind "imag" (enum)
  *   - `doc_id % 101 == 0` at i=0 → offset -1 (minimum violation)
  *   - media_ref drawn from m-0..m-210 while the catalog holds m-0..m-199
  *     → refs m-200..m-210 dangle (referential violations)
  *   - `doc_id % 1000 == 7` → doc_id collides with doc_id-1 (dedup hits)
  */
object DocTable {

  val spanType: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("text", StringType),
    StructField("media_ref", StringType),
    StructField("offset", IntegerType)))

  /** The draft-7 schema the engine validates every document against
    * (FIXTURES.md §3). */
  val docSchemaJson: String =
    """{
      |  "type": "object",
      |  "required": ["doc_id", "spans"],
      |  "properties": {
      |    "doc_id": {"type": "string", "pattern": "^doc-[0-9]+$"},
      |    "spans": {
      |      "type": "array", "minItems": 1,
      |      "items": {
      |        "type": "object",
      |        "required": ["kind", "offset"],
      |        "properties": {
      |          "kind": {"enum": ["text", "media"]},
      |          "text": {"type": ["string", "null"]},
      |          "media_ref": {"type": ["string", "null"]},
      |          "offset": {"type": "integer", "minimum": 0}
      |        },
      |        "allOf": [
      |          {"if": {"properties": {"kind": {"const": "media"}}},
      |           "then": {"properties": {"media_ref": {"type": "string"}}}}
      |        ]
      |      }
      |    }
      |  }
      |}""".stripMargin

  /** Synthesize the interleaved table. Output columns:
    * `doc_num:long, doc_id:string, spans:array<struct<...>>`. */
  def docs(spark: SparkSession, sfDir: String, replicate: Int = 1,
      partitions: Int = 0): DataFrame = {
    val raw0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast(LongType).as("src_id"), col("text"))
    // spread the base BEFORE the explode so synthesis parallelizes — a single
    // small parquet file would otherwise put the whole replicated table in
    // one task
    val raw = if (partitions > 0) raw0.repartition(partitions) else raw0
    val replicated =
      if (replicate <= 1) raw.withColumn("doc_id", col("src_id"))
      else raw
        .withColumn("rep", explode(sequence(lit(0), lit(replicate - 1))))
        .withColumn("doc_id", col("src_id") * replicate + col("rep"))
        .drop("rep")
    fromBase(replicated)
  }

  /** Core synthesis given (doc_id:long, text:string). Internally renames to
    * `_id` so the output alias `doc_id` (a string) can never capture the
    * references inside the span lambda (Spark resolves lambda bodies against
    * lateral aliases, and ANSI mode then fails the string→long cast). */
  def fromBase(base0: DataFrame): DataFrame = {
    val base = base0.select(col("doc_id").as("_id"), col("text").as("_text"))
    val id = col("_id")
    // dedup injection: doc_id % 1000 == 7 collides with its predecessor
    val effId = when(id % 1000 === 7, id - 1).otherwise(id)
    val nSpans = when(id % 97 === 0, lit(0)).otherwise((id % 4) + 1)
    def kind(i: Column) =
      when((id + i) % 5 === 0, lit("media"))
        .when((id * 31 + i) % 89 === 0, lit("imag"))
        .otherwise(lit("text"))
    def spanStruct(i: Column) = {
      val k = kind(i)
      struct(
        k.as("kind"),
        when(k === "text", col("_text").substr(((i * lit(7)) % 20 + 1).cast(IntegerType), lit(24)))
          .otherwise(lit(null).cast(StringType)).as("text"),
        when(k === "media", concat(lit("m-"), ((id * 7 + i) % 211).cast(StringType)))
          .otherwise(lit(null).cast(StringType)).as("media_ref"),
        when(id % 101 === 0 && i === 0, lit(-1))
          .otherwise(i.cast(IntegerType) * 16).cast(IntegerType).as("offset"))
    }
    base.select(
      id.as("doc_num"),
      concat(when(id % 103 === 0, lit("DOC-")).otherwise(lit("doc-")),
        effId.cast(StringType)).as("doc_id"),
      when(nSpans > 0,
        transform(sequence(lit(0L), nSpans - 1), i => spanStruct(i)))
        .otherwise(array().cast(ArrayType(spanType, containsNull = false)))
        .as("spans"))
  }

  /** Media catalog: m-0 .. m-199 (refs 200..210 dangle). */
  def mediaCatalog(spark: SparkSession): DataFrame = {
    spark.range(0, 200).select(
      concat(lit("m-"), col("id").cast(StringType)).as("media_ref"),
      (col("id") * 1024 + 64).as("bytes"))
  }

  /** DuckDB mirror of [[fromBase]] + span explosion, as a WITH-clause body.
    * `gdocs` = one row per doc; `gspans` = one row per span. */
  val sqlDocsCte: String =
    """gdocs AS (
      |  SELECT CAST(doc_id AS BIGINT) AS doc_num,
      |         CASE WHEN doc_id % 103 = 0 THEN 'DOC-' ELSE 'doc-' END ||
      |           CAST(CASE WHEN doc_id % 1000 = 7 THEN doc_id - 1 ELSE doc_id END AS VARCHAR) AS doc_id_str,
      |         CASE WHEN doc_id % 97 = 0 THEN 0 ELSE (doc_id % 4) + 1 END AS n_spans,
      |         text
      |  FROM documents
      |)""".stripMargin

  val sqlSpansCte: String =
    """gspans AS (
      |  SELECT d.doc_num, d.doc_id_str, d.n_spans, CAST(t.i AS BIGINT) AS idx,
      |    CASE WHEN (d.doc_num + t.i) % 5 = 0 THEN 'media'
      |         WHEN (d.doc_num * 31 + t.i) % 89 = 0 THEN 'imag'
      |         ELSE 'text' END AS kind,
      |    CASE WHEN NOT ((d.doc_num + t.i) % 5 = 0) AND NOT ((d.doc_num * 31 + t.i) % 89 = 0)
      |         THEN substr(d.text, CAST((t.i * 7) % 20 + 1 AS INTEGER), 24) END AS text,
      |    CASE WHEN (d.doc_num + t.i) % 5 = 0
      |         THEN 'm-' || CAST((d.doc_num * 7 + t.i) % 211 AS VARCHAR) END AS media_ref,
      |    CASE WHEN d.doc_num % 101 = 0 AND t.i = 0 THEN -1
      |         ELSE CAST(t.i * 16 AS INTEGER) END AS "offset"
      |  FROM gdocs d, UNNEST(range(0, CAST(d.n_spans AS BIGINT))) AS t(i)
      |)""".stripMargin

  val sqlWith: String = s"WITH $sqlDocsCte, $sqlSpansCte"
}
