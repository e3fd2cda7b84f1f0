package graft.json

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken, JsonGenerator}
import java.io.{StringWriter, InputStream}

/** JSON parse/render for the validator core. The reference parses with
  * cheshire (`/root/reference/src/juxt/jinx/alpha/resolve.cljc:28-34`); we
  * use Jackson streaming (ships with Spark) and keep numbers exact via
  * BigDecimal.
  */
object Json {

  private val factory: JsonFactory = {
    val f = new JsonFactory()
    f.enable(JsonParser.Feature.USE_FAST_DOUBLE_PARSER)
    f
  }

  def parse(s: String): JVal = {
    val p = factory.createParser(s)
    try { p.nextToken(); readValue(p) } finally p.close()
  }

  def parse(in: InputStream): JVal = {
    val p = factory.createParser(in)
    try { p.nextToken(); readValue(p) } finally p.close()
  }

  private def readValue(p: JsonParser): JVal = p.currentToken() match {
    case JsonToken.VALUE_NULL         => JNull
    case JsonToken.VALUE_TRUE         => JBool(true)
    case JsonToken.VALUE_FALSE        => JBool(false)
    case JsonToken.VALUE_STRING       => JStr(p.getText)
    case JsonToken.VALUE_NUMBER_INT | JsonToken.VALUE_NUMBER_FLOAT =>
      JNum(BigDecimal(p.getDecimalValue))
    case JsonToken.START_ARRAY =>
      val buf = Vector.newBuilder[JVal]
      while (p.nextToken() != JsonToken.END_ARRAY) buf += readValue(p)
      JArr(buf.result())
    case JsonToken.START_OBJECT =>
      val buf = Vector.newBuilder[(String, JVal)]
      while (p.nextToken() != JsonToken.END_OBJECT) {
        val name = p.currentName()
        p.nextToken()
        buf += (name -> readValue(p))
      }
      JObj(buf.result())
    case t => throw new IllegalArgumentException(s"unexpected JSON token $t")
  }

  def render(v: JVal): String = {
    val sw = new StringWriter()
    val g = factory.createGenerator(sw)
    writeValue(g, v)
    g.close()
    sw.toString
  }

  private def writeValue(g: JsonGenerator, v: JVal): Unit = v match {
    case JNull       => g.writeNull()
    case JBool(b)    => g.writeBoolean(b)
    case JStr(s)     => g.writeString(s)
    case JNum(n)     => g.writeNumber(n.underlying)
    case JArr(items) =>
      g.writeStartArray(); items.foreach(writeValue(g, _)); g.writeEndArray()
    case JObj(fields) =>
      g.writeStartObject()
      fields.foreach { case (k, fv) => g.writeFieldName(k); writeValue(g, fv) }
      g.writeEndObject()
  }

  /** Canonical rendering: object keys sorted, numbers normalized
    * (trailing zeros stripped) — used for deep-equality hashing of nested
    * values in the engine path (enum/uniqueItems on structs). */
  def canonical(v: JVal): String = render(canon(v))

  private def canon(v: JVal): JVal = v match {
    case JNum(n)      => JNum(BigDecimal(n.underlying.stripTrailingZeros))
    case JArr(items)  => JArr(items.map(canon))
    case JObj(fields) => JObj(fields.map { case (k, fv) => (k, canon(fv)) }.sortBy(_._1))
    case other        => other
  }
}
