package graft.validate

import graft.json._
import graft.schema._
import org.scalatest.funsuite.AnyFunSuite
import java.io.File

/** Port of the reference's official-suite harness
  * (`/root/reference/test/juxt/jinx/official_test.cljc:84-137`): every JSON
  * file under the draft-7 fixtures dir yields one test per case; pass
  * criterion is solely `valid`; remote refs under `http://localhost:1234/`
  * resolve to the vendored `remotes/` fixture files; the same two groups the
  * reference excludes are excluded (`official_test.cljc:112-117`).
  */
class OfficialSuiteSpec extends AnyFunSuite {

  private val testsDir = new File("src/test/resources/draft7")
  private val remotesDir = new File("src/test/resources/remotes")

  private val excludedGroups = Set(
    "format: uri-template",
    "validation of an internationalized e-mail addresses")

  private val opts = Options(resolvers = Seq(
    Resolver.BuiltIn,
    Resolver.MapResolver(patterns = Seq(
      "http://localhost:1234/(.*)".r ->
        ((rel: String) => Resolver.FromFile(new File(remotesDir, rel).getPath))))))

  private def listFiles(f: File): Seq[File] =
    if (f.isDirectory) f.listFiles().toSeq.sortBy(_.getName).flatMap(listFiles)
    else if (f.getName.endsWith(".json")) Seq(f)
    else Nil

  require(testsDir.isDirectory, s"missing fixtures dir $testsDir")

  for {
    file <- listFiles(testsDir)
    groupJson = Json.parse(new String(
      java.nio.file.Files.readAllBytes(file.toPath), "UTF-8"))
    group <- groupJson.asInstanceOf[JArr].items
    g = group.asInstanceOf[JObj]
    groupDesc = g.get("description").collect { case JStr(s) => s }.getOrElse("?")
    if !excludedGroups.contains(groupDesc)
    schemaJson = g.get("schema").get
    tests = g.get("tests").collect { case JArr(t) => t }.getOrElse(Vector.empty)
    (t, i) <- tests.zipWithIndex
    to = t.asInstanceOf[JObj]
    caseDesc = to.get("description").collect { case JStr(s) => s }.getOrElse(s"case $i")
    data = to.get("data").get
    expected = to.get("valid").collect { case JBool(b) => b }.get
  } test(s"${file.getName}: $groupDesc — $caseDesc") {
    val compiled = SchemaDoc.schema(schemaJson)
    val result = Validator.validate(compiled, data, opts)
    assert(result.valid === expected,
      s"\nschema: ${Json.render(schemaJson)}\ndata: ${Json.render(data)}" +
        s"\nerrors: ${result.errors.mkString("; ")}")
  }
}
