package graft.schema

import graft.json._
import scala.util.matching.Regex

/** Scala shorthand DSL → JSON Schema, the analogue of the reference's
  * `clj->jsch` (`/root/reference/src/juxt/jinx/alpha/clj_transform.cljc:5-59`,
  * third public entry point `alpha.clj:20-23`).
  *
  * The reference maps Clojure shapes; here an ADT plays that role:
  * {{{
  *   import graft.schema.SchemaDsl._
  *   toSchema(obj(
  *     "name" -> Str,
  *     "age" -> IntT,
  *     "tags" -> arrayOf(Str),
  *     "kind" -> oneOf(const("text"), const("media")),
  *     "id" -> pattern("^doc-[0-9]+$".r)))
  * }}}
  *
  * Mirrors the reference's quirk of emitting `"constant"` (not draft-7
  * `const`) for literal values (`clj_transform.cljc:13-23`) — documented
  * verbatim for parity; `constant` is an unknown keyword and thus inert.
  */
object SchemaDsl {

  sealed trait S
  case object Str extends S
  case object IntT extends S
  case object NumT extends S
  case object BoolT extends S
  case object ObjT extends S
  case object NullT extends S
  final case class Lit(v: JVal) extends S
  final case class ArrayOf(elem: S) extends S
  final case class TupleOf(elems: Seq[S]) extends S
  final case class AllOf(subs: Seq[S]) extends S
  final case class AnyOf(subs: Seq[S]) extends S
  final case class OneOf(subs: Seq[S]) extends S
  final case class Not(sub: S) extends S
  final case class Pat(re: Regex) extends S
  final case class Obj(props: Seq[(String, S)], extra: Seq[(String, JVal)] = Nil) extends S

  def const(s: String): S = Lit(JStr(s))
  def const(i: Long): S = Lit(JNum(BigDecimal(i)))
  def const(d: Double): S = Lit(JNum(BigDecimal(d)))
  def const(b: Boolean): S = Lit(JBool(b))
  def arrayOf(elem: S): S = ArrayOf(elem)
  def tuple(elems: S*): S = TupleOf(elems)
  def allOf(subs: S*): S = AllOf(subs)
  def anyOf(subs: S*): S = AnyOf(subs)
  def oneOf(subs: S*): S = OneOf(subs)
  def not(sub: S): S = Not(sub)
  def pattern(re: Regex): S = Pat(re)
  def obj(props: (String, S)*): S = Obj(props)

  def toJson(s: S): JVal = s match {
    case Str   => JObj.of("type" -> JStr("string"))
    case IntT  => JObj.of("type" -> JStr("integer"))
    case NumT  => JObj.of("type" -> JStr("number"))
    case BoolT => JObj.of("type" -> JStr("boolean"))
    case ObjT  => JObj.of("type" -> JStr("object"))
    case NullT => JObj.of("type" -> JStr("null"))
    case Lit(v) =>
      val t = v match {
        case _: JStr            => "string"
        case n: JNum if n.isWhole => "integer"
        case _: JNum            => "number"
        case _: JBool           => "boolean"
        case _                  => "null"
      }
      // reference emits "constant" — preserved for parity (inert keyword)
      JObj.of("type" -> JStr(t), "constant" -> v)
    case ArrayOf(e)  => JObj.of("type" -> JStr("array"), "items" -> toJson(e))
    case TupleOf(es) => JObj.of("type" -> JStr("array"), "items" -> JArr(es.map(toJson).toVector))
    case AllOf(ss)   => JObj.of("allOf" -> JArr(ss.map(toJson).toVector))
    case AnyOf(ss)   => JObj.of("anyOf" -> JArr(ss.map(toJson).toVector))
    case OneOf(ss)   => JObj.of("oneOf" -> JArr(ss.map(toJson).toVector))
    case Not(x)      => JObj.of("not" -> toJson(x))
    case Pat(re)     => JObj.of("pattern" -> JStr(re.pattern.pattern()))
    case Obj(props, extra) =>
      JObj(Vector("properties" ->
        JObj(props.map { case (k, v) => k -> toJson(v) }.toVector)) ++ extra)
  }

  /** DSL → compiled, conformance-checked schema (like `(schema (clj->jsch x))`). */
  def toSchema(s: S): SchemaDoc = SchemaDoc.schema(toJson(s))
}

/** `expand-document` analogue (`resolve.cljc:134-144`): replace every
  * `{"$ref": …}` node by its resolved expansion — for consumers that cannot
  * follow refs. Non-recursive schemas only (cycle-guarded). */
object ExpandDocument {
  def expand(doc: SchemaDoc, resolvers: Seq[Resolver] = Resolver.default,
      depth: Int = 0): JVal = expandNode(doc.root, doc, resolvers, depth)

  private def expandNode(node: JVal, doc: SchemaDoc, resolvers: Seq[Resolver], depth: Int): JVal = {
    if (depth > 64) throw new IllegalStateException("expand-document: $ref nesting too deep (cycle?)")
    node match {
      case o: JObj if o.has("$ref") =>
        val base = doc.baseUriOf(o)
        val ref = UriUtil.urlDecode(o.get("$ref").collect { case JStr(s) => s }.get)
        val uri = UriUtil.join(base, ref)
        val (docref, fragment) = UriUtil.splitFragment(uri)
        val frag = fragment.getOrElse("")
        val (target, targetDoc) =
          if (docref.isEmpty) (JsonPointer.eval(doc.root, frag), doc)
          else doc.uriIndex.get(docref) match {
            case Some(embedded) => (JsonPointer.eval(embedded, frag), doc)
            case None =>
              val fetched = resolvers.view.flatMap(_.resolve(docref)).headOption
                .getOrElse(throw new IllegalStateException(s"Failed to resolve uri: $docref"))
              val compiled = SchemaDoc.compile(fetched)
              (JsonPointer.eval(compiled.root, frag), compiled)
          }
        expandNode(target, targetDoc, resolvers, depth + 1)
      case o: JObj => JObj(o.fields.map { case (k, v) => k -> expandNode(v, doc, resolvers, depth) })
      case JArr(items) => JArr(items.map(expandNode(_, doc, resolvers, depth)))
      case other => other
    }
  }
}
