package graft.schema

import graft.json._
import java.util.IdentityHashMap

/** A compiled schema document: the raw JSON value plus per-node base-URI
  * annotations and the `$id` → subschema index.
  *
  * Mirrors the reference's compile step
  * (`/root/reference/src/juxt/jinx/alpha/schema.cljc:21-50, 322-334`), which
  * stores base URIs as Clojure metadata and indexes embedded `$id`s. We use
  * an identity map over the immutable AST instead of metadata.
  *
  * Thread-safety: fully immutable after construction; safe to broadcast.
  */
final class SchemaDoc private (
    val root: JVal,
    baseUris: IdentityHashMap[JVal, String],
    val uriIndex: Map[String, JVal]) extends Serializable {

  /** Base URI in effect at `node` (from the nearest enclosing `$id`). */
  def baseUriOf(node: JVal): Option[String] = Option(baseUris.get(node))
}

object SchemaDoc {

  /** Compile without conformance checking (used for resolver-fetched docs —
    * the reference attaches no metadata to those; indexing them anyway is a
    * spec-correct superset). */
  def compile(root: JVal): SchemaDoc = {
    val baseUris = new IdentityHashMap[JVal, String]()
    var index = Map.empty[String, JVal]

    def walk(node: JVal, base: Option[String]): Unit = node match {
      case o: JObj =>
        val newBase = o.get("$id") match {
          case Some(JStr(id)) =>
            val joined = UriUtil.join(base, id)
            index = index.updated(UriUtil.stripFragment(joined), o)
            Some(joined)
          case _ => base
        }
        newBase.foreach(b => baseUris.put(o, b))
        o.fields.foreach { case (_, v) => walk(v, newBase) }
      case JArr(items) => items.foreach(walk(_, base))
      case _           => ()
    }

    walk(root, None)
    new SchemaDoc(root, baseUris, index)
  }

  /** Full compile: conformance-validate first (like `jinx/schema`,
    * `alpha.clj:12-13` → `schema.cljc:322-334`), then annotate + index. */
  def schema(root: JVal, strict: Boolean = true): SchemaDoc = {
    SchemaConformance.validate(root, strict)
    compile(root)
  }

  def schema(json: String): SchemaDoc = schema(Json.parse(json))
}
