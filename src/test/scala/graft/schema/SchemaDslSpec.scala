package graft.schema

import graft.json._
import graft.validate.Validator
import org.scalatest.funsuite.AnyFunSuite

/** DSL → schema (clj->jsch analogue) and expand-document ports. */
class SchemaDslSpec extends AnyFunSuite {
  import SchemaDsl._

  test("primitives map like clj->jsch (clj_transform.cljc:36-41)") {
    assert(toJson(Str) === Json.parse("""{"type":"string"}"""))
    assert(toJson(IntT) === Json.parse("""{"type":"integer"}"""))
    assert(toJson(NullT) === Json.parse("""{"type":"null"}"""))
  }

  test("array-of and combinators (clj_transform.cljc:7-10, 26-30)") {
    assert(toJson(arrayOf(Str)) ===
      Json.parse("""{"type":"array","items":{"type":"string"}}"""))
    assert(toJson(oneOf(Str, IntT)) ===
      Json.parse("""{"oneOf":[{"type":"string"},{"type":"integer"}]}"""))
    assert(toJson(not(BoolT)) === Json.parse("""{"not":{"type":"boolean"}}"""))
  }

  test("literals keep the reference's 'constant' quirk (clj_transform.cljc:13-23)") {
    assert(toJson(const(true)) === Json.parse("""{"type":"boolean","constant":true}"""))
    assert(toJson(const(42L)) === Json.parse("""{"type":"integer","constant":42}"""))
  }

  test("regex → pattern; map → properties (clj_transform.cljc:43-58)") {
    assert(toJson(pattern("^a+$".r)) === Json.parse("""{"pattern":"^a+$"}"""))
    val s = toSchema(obj("name" -> Str, "id" -> pattern("^doc-[0-9]+$".r)))
    assert(Validator.validate(s, Json.parse("""{"name":"x","id":"doc-1"}""")).valid)
    assert(!Validator.validate(s, Json.parse("""{"name":"x","id":"nope"}""")).valid)
  }

  test("expand-document inlines refs (resolve.cljc:134-144)") {
    val doc = SchemaDoc.schema(
      """{"definitions":{"a":{"type":"integer"}},
        |"properties":{"x":{"$ref":"#/definitions/a"}}}""".stripMargin)
    val expanded = ExpandDocument.expand(doc)
    assert(JsonPointer.eval(expanded, "/properties/x") === Json.parse("""{"type":"integer"}"""))
  }

  test("expand-document detects ref cycles") {
    val doc = SchemaDoc.schema("""{"properties":{"x":{"$ref":"#"}}}""")
    intercept[IllegalStateException] { ExpandDocument.expand(doc) }
  }
}
