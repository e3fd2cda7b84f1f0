package graft.json

/** RFC 6901 JSON Pointer evaluation over [[JVal]].
  *
  * Semantics mirror the reference
  * (`/root/reference/src/juxt/jinx/alpha/jsonpointer.cljc:7-49`): `~0`/`~1`
  * decoding, map key lookup, numeric array index; failure to locate throws.
  */
object JsonPointer {

  private val TokenRe = "/((?:[^/~]|~0|~1)*)".r
  private val IntRe = "[0-9]+".r

  final class PointerException(msg: String) extends RuntimeException(msg)

  def decode(token: String): String =
    token.replace("~1", "/").replace("~0", "~")

  def tokens(pointer: String): List[String] =
    TokenRe.findAllMatchIn(pointer).map(m => decode(m.group(1))).toList

  def eval(doc: JVal, pointer: String): JVal = {
    var cur = doc
    tokens(if (pointer == null) "" else pointer).foreach { tok =>
      cur = cur match {
        case o: JObj =>
          o.get(tok).getOrElse(
            throw new PointerException(s"Failed to locate '$tok' in $pointer"))
        case JArr(items) =>
          if (IntRe.matches(tok)) {
            val i = tok.toInt
            if (i < items.length) items(i)
            else throw new PointerException(s"Failed to locate index $tok in $pointer")
          } else throw new PointerException(s"Failed to locate, must be a number: $tok")
        case other =>
          throw new PointerException(
            s"Failed to locate '$tok' in non-container ${other.typeName}")
      }
    }
    cur
  }
}
