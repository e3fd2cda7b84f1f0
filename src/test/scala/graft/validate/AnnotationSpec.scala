package graft.validate

import graft.json._
import graft.schema.SchemaDoc
import org.scalatest.funsuite.AnyFunSuite

/** Annotation accumulation and merging, ported from the reference's
  * `annotation_test.cljc` plus the `merge-annotations` semantics
  * (`validate.cljc:51-76`, `489-521`), and the `:journal?` option
  * (`validate.cljc:824-832`). */
class AnnotationSpec extends AnyFunSuite {

  private def v(schema: String, instance: String, opts: Options = Options()): VResult =
    Validator.validate(SchemaDoc.schema(schema), Json.parse(instance), opts)

  test("simple annotation collection + instance type (annotation_test.cljc:14-24)") {
    val r = v("""{"type":"string","default":"Bob"}""", "\"Malcolm\"")
    assert(r.valid)
    assert(r.instance === JStr("Malcolm"))
    assert(r.annotations === Map("default" -> JStr("Bob")))
    assert(r.instanceType === Some("string"))
  }

  test("properties nest child annotations under :properties; required-recovery annotates (annotation_test.cljc:25-55)") {
    val r = v(
      """{"type":"object","title":"person","description":"A person, user or employee",
        |  "properties":{
        |    "firstname":{"type":"string","default":"Bob"},
        |    "surname":{"type":"string","title":"Surname","description":"Family name",
        |               "examples":["Smith","Johnson","Jones","Williams"]}},
        |  "required":["firstname","surname"]}""".stripMargin,
      """{"surname":"Sparks"}""")
    assert(r.valid)
    assert(r.instance === Json.parse("""{"surname":"Sparks","firstname":"Bob"}"""))
    assert(r.instanceType === Some("object"))
    assert(r.annotations("title") === JStr("person"))
    assert(r.annotations("description") === JStr("A person, user or employee"))
    val props = r.annotations(":properties").asInstanceOf[JObj]
    // surname: title+description collected; examples go to :metadata (inert)
    assert(props.get("surname") === Some(JObj(Vector(
      "title" -> JStr("Surname"), "description" -> JStr("Family name")))))
    // firstname was injected by required-recovery, then validated
    assert(props.get("firstname") === Some(JObj(Vector("default" -> JStr("Bob")))))
  }

  test("allOf merges valid branches' annotations into value lists; default dedups") {
    val r = v(
      """{"allOf":[
        |  {"type":"string","title":"Surname","default":"foo"},
        |  {"type":"string","title":"Family name","default":"foo"}]}""".stripMargin,
      "\"Sparks\"")
    assert(r.valid)
    assert(r.annotations("title") === JArr(Vector(JStr("Surname"), JStr("Family name"))))
    assert(r.annotations("default") === JArr(Vector(JStr("foo")))) // SHOULD dedup
  }

  test("anyOf merges only the VALID branches' annotations") {
    val r = v(
      """{"anyOf":[
        |  {"type":"string","title":"Surname"},
        |  {"type":"number","title":"Not me"}]}""".stripMargin,
      "\"Sparks\"")
    assert(r.valid)
    assert(r.annotations("title") === JArr(Vector(JStr("Surname"))))
  }

  test("allOf merge includes the already-accumulated annotations (listified)") {
    val r = v(
      """{"title":"outer","allOf":[{"type":"string","title":"inner"}]}""",
      "\"x\"")
    assert(r.valid)
    assert(r.annotations("title") === JArr(Vector(JStr("outer"), JStr("inner"))))
  }

  test("oneOf: the single winner's full result replaces annotations and type") {
    val r = v(
      """{"oneOf":[
        |  {"type":"string","title":"the string one","default":"s"},
        |  {"type":"number","title":"the number one"}]}""".stripMargin,
      "\"hello\"")
    assert(r.valid)
    assert(r.annotations === Map(
      "title" -> JStr("the string one"), "default" -> JStr("s")))
    assert(r.instanceType === Some("string"))
  }

  test("if/then: the taken branch's annotations propagate") {
    val r = v(
      """{"if":{"type":"string"},"then":{"title":"taken","type":"string"},
        |  "else":{"title":"not taken"}}""".stripMargin,
      "\"x\"")
    assert(r.valid)
    assert(r.annotations === Map("title" -> JStr("taken")))
  }

  test("journal option records non-nil keyword outcomes, in order") {
    val r = v("""{"type":"string","minLength":10,"title":"t"}""", "\"short\"",
      Options(journal = true))
    assert(!r.valid)
    assert(r.journal.map(_.keyword) === Vector("title", "type", "minLength"))
    val minLen = r.journal.find(_.keyword == "minLength").get
    assert(minLen.errors.nonEmpty)
    assert(r.journal.find(_.keyword == "type").get.errors.isEmpty)
    assert(r.journal.find(_.keyword == "type").get.instanceType === Some("string"))
    // type-gated keywords that don't apply return nil in the reference and
    // leave NO journal entry (validate.cljc:805-818): maxLength on a number
    val gated = v("""{"maxLength":5,"minimum":1}""", "42", Options(journal = true))
    assert(gated.valid)
    assert(gated.journal.map(_.keyword) === Vector()) // minimum passing is nil too
    // journal off by default
    assert(v("""{"type":"string"}""", "\"x\"").journal.isEmpty)
  }
}
