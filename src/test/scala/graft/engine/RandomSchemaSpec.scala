package graft.engine

import graft.json._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Schema-level fuzzing: random draft-7 schemas over the doc shape × random
  * documents; the Catalyst column plan (boolean AND error paths) must agree
  * with the row-level core on every (schema, doc) pair. Schemas that the
  * compiler rejects as Unsupported fall back — also exercised. */
class RandomSchemaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // --- random schema over {doc_id: string, spans: array<struct<...>>} -------

  private def jstr(s: String) = JStr(s)
  private def jnum(n: Int) = JNum(BigDecimal(n))

  private val stringPred: Gen[JObj] = Gen.oneOf(
    Gen.choose(0, 10).map(n => JObj.of("minLength" -> jnum(n))),
    Gen.choose(0, 20).map(n => JObj.of("maxLength" -> jnum(n))),
    Gen.oneOf("^doc-", "[0-9]+$", "^[a-z-]+[0-9]*$", "x").map(p => JObj.of("pattern" -> jstr(p))),
    Gen.oneOf("hostname", "ipv4", "date-time", "uri", "regex", "email")
      .map(f => JObj.of("format" -> jstr(f))),
    Gen.const(JObj.of("type" -> jstr("string"))),
    Gen.const(JObj.of("enum" -> JArr(Vector(jstr("doc-1"), jstr("doc-2"))))))

  private val intPred: Gen[JObj] = Gen.oneOf(
    Gen.choose(-10, 100).map(n => JObj.of("minimum" -> jnum(n))),
    Gen.choose(-10, 100).map(n => JObj.of("maximum" -> jnum(n))),
    Gen.choose(1, 7).map(n => JObj.of("multipleOf" -> jnum(n))),
    Gen.choose(0, 64).map(n => JObj.of("const" -> jnum(n))),
    // type-incompatible entry (string in a numeric enum) must be statically
    // false in the column paths, not an ANSI cast error
    Gen.const(JObj.of("enum" -> JArr(Vector(jnum(0), jnum(16), jstr("zero"))))),
    Gen.const(JObj.of("type" -> JArr(Vector(jstr("integer"), jstr("null"))))))

  private val spanItemSchema: Gen[JObj] = for {
    kindPred <- Gen.oneOf(
      JObj.of("enum" -> JArr(Vector(jstr("text"), jstr("media")))),
      // mixed-type entries: the numeric can never match a string column
      JObj.of("enum" -> JArr(Vector(jstr("text"), jnum(7)))),
      JObj.of("const" -> jstr("text")),
      JObj.of("type" -> jstr("string")))
    offPred <- intPred
    useReq <- Gen.oneOf(true, false)
  } yield {
    val base = Vector(
      "type" -> (jstr("object"): JVal),
      "properties" -> (JObj.of("kind" -> kindPred, "offset" -> offPred): JVal))
    JObj(if (useReq) base :+ ("required" -> (JArr(Vector(jstr("kind"))): JVal)) else base)
  }

  private val spansPred: Gen[JObj] = for {
    items <- spanItemSchema
    minI <- Gen.choose(0, 3)
    maxI <- Gen.choose(2, 6)
    extras <- Gen.someOf(
      Vector[(String, JVal)]("minItems" -> jnum(minI)),
      Vector[(String, JVal)]("maxItems" -> jnum(maxI)),
      Vector[(String, JVal)]("uniqueItems" -> JBool(true)),
      Vector[(String, JVal)]("contains" -> JObj.of("properties" ->
        JObj.of("kind" -> JObj.of("const" -> jstr("media"))))))
  } yield JObj(Vector(
    "type" -> (jstr("array"): JVal),
    "items" -> (items: JVal)) ++ extras.flatten)

  private val docSchemaGen: Gen[JObj] = for {
    idPred <- stringPred
    spans <- spansPred
    combinator <- Gen.frequency(
      5 -> Gen.const(Vector.empty[(String, JVal)]),
      1 -> stringPred.map(p => Vector[(String, JVal)]("not" ->
        JObj.of("properties" -> JObj.of("doc_id" -> JObj(p.fields :+ ("type" -> (jstr("string"): JVal))))))),
      2 -> Gen.listOfN(2, stringPred).map(ps => Vector[(String, JVal)]("anyOf" ->
        JArr(ps.map(p => JObj.of("properties" -> JObj.of("doc_id" -> p))).toVector))),
      2 -> Gen.listOfN(2, Gen.choose(0, 5)).map(ns => Vector[(String, JVal)]("oneOf" ->
        JArr(ns.map(n => JObj.of("properties" -> JObj.of("spans" ->
          JObj.of("minItems" -> jnum(n))))).toVector).asInstanceOf[JVal])))
  } yield JObj(Vector(
    "type" -> (jstr("object"): JVal),
    "required" -> (JArr(Vector(jstr("doc_id"))): JVal),
    "properties" -> (JObj.of("doc_id" -> idPred, "spans" -> spans): JVal)) ++ combinator)

  // --- random docs -----------------------------------------------------------

  private val spanGen: Gen[Row] = for {
    k <- Gen.frequency(5 -> Gen.const("text"), 3 -> Gen.const("media"),
      1 -> Gen.const("imag"), 1 -> Gen.const(null))
    o <- Gen.frequency(6 -> Gen.choose(-5, 120).map(Integer.valueOf),
      1 -> Gen.const(null: Integer))
  } yield Row(k, "t", null, o)

  private val docGen: Gen[Row] = for {
    id <- Gen.frequency(4 -> Gen.choose(1, 3).map(i => s"doc-$i"),
      2 -> Gen.const("doc-x"), 1 -> Gen.const(null),
      // format-shaped strings so format predicates see both outcomes
      1 -> Gen.oneOf("1.2.3.4", "2020-01-01T00:00:00Z", "spark.apache.org",
        "http://x/y", "[a-z)+"))
    n <- Gen.choose(0, 6)
    spans <- Gen.listOfN(n, spanGen)
    nullSpans <- Gen.frequency(8 -> Gen.const(false), 1 -> Gen.const(true))
  } yield Row(id, if (nullSpans) null else spans)

  private val dfSchema = StructType(Seq(
    StructField("doc_id", StringType, nullable = true),
    StructField("spans", ArrayType(StructType(Seq(
      StructField("kind", StringType, nullable = true),
      StructField("text", StringType, nullable = true),
      StructField("media_ref", StringType, nullable = true),
      StructField("offset", IntegerType, nullable = true))),
      containsNull = false), nullable = true)))

  // deep-fuzz knobs for one-off stress runs (defaults = CI-fast)
  private val nSchemas = sys.env.getOrElse("GRAFT_FUZZ_SCHEMAS", "20").toInt
  private val nDocs = sys.env.getOrElse("GRAFT_FUZZ_DOCS", "60").toInt

  test(s"random schemas × random docs: column plan ≡ row core ($nSchemas schemas × $nDocs docs)") {
    var seed = rng.Seed(2026L)
    var fellBack = 0
    (0 until nSchemas).foreach { i =>
      val schema = docSchemaGen.pureApply(Gen.Parameters.default, seed); seed = seed.next
      val docs = Gen.listOfN(nDocs, docGen).pureApply(Gen.Parameters.default, seed); seed = seed.next
      val schemaJson = Json.render(schema)
      val df = spark.createDataFrame(spark.sparkContext.parallelize(docs, 2), dfSchema)
        .withColumn("doc_num", monotonically_increasing_id())

      val colPath =
        try {
          val payloadType = StructType(dfSchema.fields)
          val payload = struct(col("doc_id"), col("spans"))
          val doc = graft.schema.SchemaDoc.schema(schemaJson)
          Some(df.select(col("doc_num"),
            ColumnCompiler.valid(doc, payload, payloadType).as("fast"),
            (size(ColumnCompiler.errors(doc, payload, payloadType)) === 0).as("viaErrors")))
        } catch { case _: ColumnCompiler.Unsupported => fellBack += 1; None }

      colPath.foreach { cp =>
        val rp = RowValidator.validateRows(spark, df.select("doc_num", "doc_id", "spans"), schemaJson)
          .select(col("doc_num"), col("valid").as("rowValid"))
        val joined = cp.join(rp, "doc_num").collect()
        joined.foreach { r =>
          assert(r.getBoolean(1) === r.getBoolean(2),
            s"fast≠errors schema#$i: $schemaJson doc_num=${r.getLong(0)}")
          assert(r.getBoolean(1) === r.getBoolean(3),
            s"col≠row schema#$i: $schemaJson doc_num=${r.getLong(0)}")
        }
      }
    }
    info(s"schemas compiled: ${nSchemas - fellBack}, row-core fallbacks: $fellBack")
  }
}
