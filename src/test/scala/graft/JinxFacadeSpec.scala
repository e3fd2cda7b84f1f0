package graft

import graft.json._
import org.scalatest.funsuite.AnyFunSuite

/** The three reference entry points through the facade (alpha.clj:9-23). */
class JinxFacadeSpec extends AnyFunSuite {

  test("schema + validate round trip with transformation and annotations") {
    val s = Jinx.schema(
      """{"type":"object","required":["name"],
        |  "properties":{"name":{"type":"string","default":"anon","title":"Name"}}}""".stripMargin)
    val r = Jinx.validate(s, Jinx.parse("{}"))
    assert(r.valid)
    assert(r.instance === Json.parse("""{"name":"anon"}""")) // required-recovery
    val bad = Jinx.validate(s, Jinx.parse("""{"name": 42}"""))
    assert(!bad.valid)
  }

  test("conformance check rejects malformed schemas like the reference") {
    intercept[Exception] { Jinx.schema("""{"type": 12}""") }
  }

  test("DSL mirrors clj->jsch incl. the 'constant' quirk") {
    import graft.schema.SchemaDsl._
    val j = Jinx.dslToSchemaJson(obj("kind" -> const("media"), "n" -> IntT))
    assert(Json.render(j).contains("\"constant\""))
    val doc = Jinx.dslToSchema(obj("n" -> IntT))
    assert(Jinx.validate(doc, Jinx.parse("""{"n": 3}""")).valid)
    assert(!Jinx.validate(doc, Jinx.parse("""{"n": "x"}""")).valid)
  }

  test("journal option surfaces per-keyword outcomes") {
    val r = Jinx.validate(Jinx.schema("""{"type":"string"}"""), JStr("x"),
      graft.validate.Options(journal = true))
    assert(r.journal.map(_.keyword) === Vector("type"))
  }
}
