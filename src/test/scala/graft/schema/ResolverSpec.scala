package graft.schema

import graft.json._
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's resolver tests (`resolve_test.cljc:26-117`):
  * built-in, exact-map (file / literal boolean / literal object / function),
  * regex-to-constant, regex-to-function, and document expansion over an
  * OpenAPI petstore document. */
class ResolverSpec extends AnyFunSuite {

  private val fixtures = "src/test/resources/fixtures"

  private val mapResolver = Resolver.MapResolver(
    exact = Map(
      "http://example.com/test" -> Resolver.FromFile(s"$fixtures/test.json"),
      "http://example.com/literal-boolean-schema" -> Resolver.Literal(JBool(false)),
      "http://example.com/literal-object-schema" ->
        Resolver.Literal(JObj.of("type" -> JStr("string"))),
      "http://example.com/literal-function-schema" ->
        Resolver.FromFn(uri => Some(JObj.of("type" -> JStr("string"), "uri" -> JStr(uri))))),
    patterns = Seq(
      "http://example.com/static/(.*)".r ->
        ((_: String) => Resolver.Literal(JObj.of("type" -> JStr("object")))),
      "http://example.com/schemas/(.*)".r ->
        ((m: String) => Resolver.Literal(JObj.of("type" -> JStr("object"), "path" -> JStr(m))))))

  test("built-in resolver serves the draft-07 meta-schema (resolve_test.cljc:27-29)") {
    assert(Resolver.BuiltIn.resolve("http://json-schema.org/draft-07/schema").isDefined)
    assert(Resolver.BuiltIn.resolve("http://elsewhere.example/schema").isEmpty)
  }

  test("exact map: file / boolean / object / function values (resolve_test.cljc:55-89)") {
    assert(mapResolver.resolve("http://example.com/test") ===
      Some(Json.parse("""{"foo":"bar"}""")))
    assert(mapResolver.resolve("http://example.com/literal-boolean-schema") ===
      Some(JBool(false)))
    assert(mapResolver.resolve("http://example.com/literal-object-schema") ===
      Some(JObj.of("type" -> JStr("string"))))
    assert(mapResolver.resolve("http://example.com/literal-function-schema") ===
      Some(JObj.of("type" -> JStr("string"),
        "uri" -> JStr("http://example.com/literal-function-schema"))))
  }

  test("regex map: constant and group-function values (resolve_test.cljc:91-106)") {
    assert(mapResolver.resolve("http://example.com/static/schema.json") ===
      Some(JObj.of("type" -> JStr("object"))))
    assert(mapResolver.resolve("http://example.com/schemas/schema1.json") ===
      Some(JObj.of("type" -> JStr("object"), "path" -> JStr("schema1.json"))))
    assert(mapResolver.resolve("http://other.example/x").isEmpty)
  }

  test("petstore document expansion (resolve_test.cljc:109-117)") {
    val raw = Json.parse(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$fixtures/petstore.json")), "UTF-8"))
    val expanded = ExpandDocument.expand(SchemaDoc.compile(raw))
    assert(JsonPointer.eval(expanded,
      "/paths/~1pets/get/responses/200/content/application~1json/schema/items/properties/name/type")
      === JStr("string"))
  }
}
