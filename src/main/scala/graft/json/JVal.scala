package graft.json

/** Minimal JSON AST used by the row-level validator core.
  *
  * Mirrors the reference's instance model (plain Clojure data,
  * `/root/reference/src/juxt/jinx/alpha/validate.cljc:86-93`) but with
  * JSON-value number equality: `1 == 1.0` (draft-7 semantics for
  * `enum`/`const`/`uniqueItems`; the reference's Clojure `=` diverges there —
  * see SURVEY.md §7 "Hard parts" — the official suite semantics win).
  *
  * Numbers are kept as BigDecimal so `multipleOf` can use exact decimal
  * remainder like the reference (`validate.cljc:237-242`).
  */
sealed trait JVal {
  def typeName: String = this match {
    case JNull      => "null"
    case _: JBool   => "boolean"
    case _: JNum    => "number"
    case _: JStr    => "string"
    case _: JArr    => "array"
    case _: JObj    => "object"
  }
}

case object JNull extends JVal

final case class JBool(v: Boolean) extends JVal

/** `wholeNumber` implements the reference's `integer?`: whole-valued floats
  * count as integers (`validate.cljc:165-172`, draft-7 rule).
  */
final case class JNum(v: BigDecimal) extends JVal {
  def isWhole: Boolean = v.isWhole
  // JSON-value equality: 1 == 1.0. scala.math.BigDecimal#equals is
  // compareTo-based, so the default case-class equals already does this;
  // we pin hashCode to the stripped value so JNum(1) and JNum(1.0) collide.
  override def hashCode: Int = v.underlying.stripTrailingZeros.hashCode
}

object JNum {
  def apply(l: Long): JNum = JNum(BigDecimal(l))
  def apply(d: Double): JNum = JNum(BigDecimal(d))
}

final case class JStr(v: String) extends JVal {
  /** Unicode code-point length — the reference counts code points, not
    * UTF-16 units (`validate.cljc:25-39, 264-278`). */
  def codePointLength: Int = v.codePointCount(0, v.length)
}

final case class JArr(items: Vector[JVal]) extends JVal

object JArr { def of(items: JVal*): JArr = JArr(items.toVector) }

/** Object preserving insertion order (like the reference's parsed maps with
  * cheshire); lookup by key via the lazily-built index. */
final case class JObj(fields: Vector[(String, JVal)]) extends JVal {
  @transient lazy val map: Map[String, JVal] = fields.toMap
  def get(k: String): Option[JVal] = map.get(k)
  def has(k: String): Boolean = map.contains(k)
  def keys: Vector[String] = fields.map(_._1)
  def updated(k: String, v: JVal): JObj =
    if (has(k)) JObj(fields.map { case (fk, fv) => if (fk == k) (fk, v) else (fk, fv) })
    else JObj(fields :+ (k -> v))
  // Key-set equality irrespective of order (JSON object semantics).
  override def equals(o: Any): Boolean = o match {
    case other: JObj => map == other.map
    case _           => false
  }
  override def hashCode: Int = map.hashCode
}

object JObj {
  val empty: JObj = JObj(Vector.empty)
  def of(fields: (String, JVal)*): JObj = JObj(fields.toVector)
}
