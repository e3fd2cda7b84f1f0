package graft.validate

import graft.json._
import graft.schema.SchemaDoc
import org.scalatest.funsuite.AnyFunSuite

/** Reference-parity quirks of the content keywords
  * (`validate.cljc:697-739`). */
class ContentQuirksSpec extends AnyFunSuite {

  private def v(schema: String, instance: JVal): VResult =
    Validator.validate(SchemaDoc.schema(schema), instance, Options())

  test("unknown contentEncoding reports 'Not base64' (decode-content case throw, caught)") {
    val r = v("""{"contentEncoding":"base32"}""", JStr("JBSWY3DP"))
    assert(!r.valid)
    assert(r.errors.exists(_.message == "Not base64"))
  }

  test("contentEncoding success discards the decoded value (instance untouched)") {
    val r = v("""{"contentEncoding":"base64"}""", JStr("aGVsbG8="))
    assert(r.valid)
    assert(r.instance === JStr("aGVsbG8=")) // NOT "hello" — reference quirk
  }

  test("contentMediaType with unknown encoding reports 'Unable to decode content'") {
    val r = v(
      """{"contentEncoding":"base32","contentMediaType":"application/json"}""",
      JStr("{}"))
    assert(!r.valid)
    assert(r.errors.exists(_.message == "Unable to decode content"))
  }

  test("unknown contentMediaType throws out of validation, like the reference's case") {
    intercept[IllegalArgumentException] {
      v("""{"contentMediaType":"text/csv"}""", JStr("a,b"))
    }
  }

  test("non-string contentMediaType keyword value throws too (un-defaulted case parity)") {
    intercept[IllegalArgumentException] {
      v("""{"contentMediaType":5}""", JStr("a,b"))
    }
    // …but only when the instance is a string (non-strings skip the keyword)
    assert(v("""{"contentMediaType":5}""", JNum(BigDecimal(3))).valid)
  }

  test("application/json transform still replaces the instance") {
    val r = v("""{"contentMediaType":"application/json"}""", JStr("""{"a":1}"""))
    assert(r.valid)
    assert(r.instance === Json.parse("""{"a":1}"""))
  }
}
