package graft.schema

import graft.json.{JVal, Json}
import java.io.File
import scala.util.matching.Regex

/** `$ref` URI resolvers, mirroring the reference's resolver chain
  * (`/root/reference/src/juxt/jinx/alpha/resolve.cljc:36-88`): a built-in
  * resolver serving the vendored draft-07 meta-schema, an exact/regex map
  * resolver whose values may be literal schemas, files, or functions, and a
  * plain function resolver.
  */
trait Resolver extends Serializable {
  /** Resolve a document reference (no fragment) to a parsed JSON document. */
  def resolve(docref: String): Option[JVal]
}

object Resolver {

  /** Serves `http://json-schema.org/draft-07/schema` from the vendored
    * resource (`resolve.cljc:42-47`). */
  object BuiltIn extends Resolver {
    private val uris = Set(
      "http://json-schema.org/draft-07/schema",
      "http://json-schema.org/draft-07/schema#")
    @transient private lazy val metaSchema: JVal = {
      val in = getClass.getResourceAsStream("/graft/schemas/draft-07-schema.json")
      require(in != null, "draft-07 meta-schema resource missing")
      try Json.parse(in) finally in.close()
    }
    def resolve(docref: String): Option[JVal] =
      if (uris.contains(docref)) Some(metaSchema) else None
  }

  /** A resolvable value: literal schema, file on disk, or function —
    * the reference's `DefaultResolverDereferencer` protocol
    * (`resolve.cljc:53-68`). */
  sealed trait Deref extends Serializable { def deref(uri: String): Option[JVal] }
  final case class Literal(v: JVal) extends Deref { def deref(u: String) = Some(v) }
  final case class FromFile(path: String) extends Deref {
    def deref(u: String): Option[JVal] = {
      val f = new File(path)
      if (f.isFile) Some(Json.parse(new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")))
      else None
    }
  }
  final case class FromFn(f: String => Option[JVal]) extends Deref {
    def deref(u: String): Option[JVal] = f(u)
  }

  /** Exact-URI map + regex map, first match wins (`resolve.cljc:70-85`).
    * Regex entries match the whole URI (`re-matches`); `$1`-style group
    * substitution is applied to file-path values so
    * `http://localhost:1234/(.*)` → `fixtures/remotes/$1` works. */
  final case class MapResolver(
      exact: Map[String, Deref] = Map.empty,
      patterns: Seq[(Regex, String => Deref)] = Nil) extends Resolver {
    def resolve(docref: String): Option[JVal] =
      exact.get(docref).flatMap(_.deref(docref)).orElse {
        patterns.collectFirst {
          case (re, mk) if re.pattern.matcher(docref).matches() =>
            val m = re.pattern.matcher(docref)
            m.matches()
            val sub = if (m.groupCount() >= 1) m.group(1) else docref
            mk(sub).deref(docref)
        }.flatten
      }
  }

  final case class FnResolver(f: String => Option[JVal]) extends Resolver {
    def resolve(docref: String): Option[JVal] = f(docref)
  }

  def default: Seq[Resolver] = Seq(BuiltIn)
}
