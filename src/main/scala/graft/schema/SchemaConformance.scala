package graft.schema

import graft.json._
import scala.util.Try

/** Schema well-formedness checking — a port of the *semantics* of the
  * reference's `validate-keyword` multimethod
  * (`/root/reference/src/juxt/jinx/alpha/schema.cljc:54-320`): MUST rules
  * always throw [[SchemaConformance.SchemaException]]; SHOULD rules throw
  * only under `strict` (default true, like the reference's `:strict?`).
  */
object SchemaConformance {

  final class SchemaException(msg: String, cause: Throwable = null)
      extends RuntimeException(msg, cause)

  private def fail(msg: String, cause: Throwable = null): Nothing =
    throw new SchemaException(msg, cause)

  private val legalTypes =
    Set("null", "boolean", "object", "array", "number", "string", "integer")

  private def isSchema(v: JVal): Boolean = v match {
    case _: JObj | _: JBool => true
    case _                  => false
  }

  private def isNonNegInt(v: JVal): Boolean = v match {
    case n: JNum => n.isWhole && n.v >= 0
    case _       => false
  }

  private def allDistinct(items: Seq[JVal]): Boolean =
    items.distinct.size == items.size

  private def subSchema(kw: String, v: JVal, strict: Boolean, msg: String): Unit = {
    if (!isSchema(v)) fail(msg)
    try validate(v, strict)
    catch { case e: SchemaException => fail(msg, e) }
  }

  /** Validate one schema document. Boolean and null schemas are trivially
    * conformant (`schema.cljc:313-316`). */
  def validate(schema: JVal, strict: Boolean = true): Unit = schema match {
    case _: JBool | JNull => ()
    case o: JObj          => o.fields.foreach { case (k, v) => keyword(k, v, strict) }
    case _                => () // non-map non-boolean values pass through unchecked, like the reference
  }

  private def keyword(kw: String, v: JVal, strict: Boolean): Unit = kw match {
    case "type" =>
      v match {
        case JStr(s) =>
          if (!legalTypes(s))
            fail("String values of 'type' MUST be one of the six primitive types or 'integer'")
        case JArr(items) =>
          if (!items.forall(_.isInstanceOf[JStr]))
            fail("The value of 'type', if it is an array, elements of the array MUST be strings")
          if (!allDistinct(items))
            fail("The value of 'type', if it is an array, elements of the array MUST be unique")
          if (!items.forall { case JStr(s) => legalTypes(s); case _ => false })
            fail("String values of 'type' MUST be one of the six primitive types or 'integer'")
        case _ => fail("The value of 'type' MUST be either a string or an array")
      }

    case "enum" =>
      v match {
        case JArr(items) =>
          if (strict) {
            if (items.isEmpty)
              fail("The value of an enum SHOULD have at least one element")
            if (!allDistinct(items))
              fail("Elements in the enum value array SHOULD be unique")
          }
        case _ => fail("The value of an enum MUST be an array")
      }

    case "multipleOf" =>
      v match {
        case n: JNum if n.v > 0 => ()
        case _ => fail("The value of multipleOf MUST be a number, strictly greater than 0")
      }

    case k @ ("maximum" | "exclusiveMaximum" | "minimum" | "exclusiveMinimum") =>
      if (!v.isInstanceOf[JNum]) fail(s"The value of $k MUST be a number")

    case k @ ("maxLength" | "minLength") =>
      if (!isNonNegInt(v)) fail(s"The value of $k MUST be a non-negative integer")

    case k @ ("maxItems" | "minItems" | "maxProperties" | "minProperties") =>
      if (!isNonNegInt(v)) fail(s"The value of '$k' MUST be a non-negative integer")

    case "pattern" =>
      if (!v.isInstanceOf[JStr]) fail("The value of pattern MUST be a string")

    case "items" =>
      v match {
        case s if isSchema(s) =>
          subSchema(kw, s, strict, "The value of 'items' MUST be a valid JSON Schema")
        case JArr(items) =>
          items.foreach { el =>
            try validate(el, strict)
            catch {
              case e: SchemaException =>
                fail("The value of 'items' MUST be an array of valid JSON Schemas, but at least one element isn't valid", e)
            }
          }
        case _ =>
          fail("The value of 'items' MUST be either a valid JSON Schema or an array of valid JSON Schemas")
      }

    case "additionalItems" =>
      subSchema(kw, v, strict, "The value of 'additionalItems' MUST be a valid JSON Schema")

    case "uniqueItems" =>
      if (!v.isInstanceOf[JBool]) fail("The value of 'uniqueItems' MUST be a boolean")

    case "contains" =>
      subSchema(kw, v, strict, "The value of 'contains' MUST be a valid JSON Schema")

    case "required" =>
      v match {
        case JArr(items) =>
          if (items.nonEmpty) {
            if (!items.forall(_.isInstanceOf[JStr]))
              fail("The value of 'required' MUST be an array. Elements of this array, if any, MUST be strings")
            if (!allDistinct(items))
              fail("The value of 'required' MUST be an array. Elements of this array, if any, MUST be unique")
          }
        case _ => fail("The value of 'required' MUST be an array")
      }

    case "properties" =>
      v match {
        case o: JObj =>
          o.fields.foreach { case (pk, pv) =>
            try validate(pv, strict)
            catch {
              case e: SchemaException =>
                fail(s"Each value of 'properties' MUST be a valid JSON Schema (at '$pk')", e)
            }
          }
        case _ => fail("The value of 'properties' MUST be an object")
      }

    case "patternProperties" =>
      v match {
        case o: JObj =>
          o.fields.foreach { case (pk, pv) =>
            if (Try(java.util.regex.Pattern.compile(pk)).isFailure)
              fail("Each property name of a 'patternProperties' object SHOULD be a valid regular expression")
            try validate(pv, strict)
            catch {
              case e: SchemaException =>
                fail(s"Each value of a 'patternProperties' object MUST be a valid JSON Schema (at '$pk')", e)
            }
          }
        case _ => fail("The value of 'patternProperties' MUST be an object")
      }

    case "additionalProperties" =>
      subSchema(kw, v, strict, "The value of 'additionalProperties' MUST be a valid JSON Schema")

    case "dependencies" =>
      v match {
        case o: JObj =>
          o.fields.foreach { case (_, dv) =>
            dv match {
              case JArr(items) =>
                if (items.nonEmpty) {
                  if (!items.forall(_.isInstanceOf[JStr]))
                    fail("Each element in a dependencies array MUST be a string")
                  if (!allDistinct(items))
                    fail("Each element in a dependencies array MUST be unique")
                }
              case s if isSchema(s) =>
                try validate(s, strict)
                catch {
                  case e: SchemaException =>
                    fail("Dependency values MUST be an array or a valid JSON Schema", e)
                }
              case _ => fail("Dependency values MUST be an array or a JSON Schema")
            }
          }
        case _ => fail("The value of 'dependencies' MUST be an object")
      }

    case "propertyNames" =>
      subSchema(kw, v, strict, "The value of 'propertyNames' MUST be a valid JSON Schema")

    case k @ ("if" | "then" | "else" | "not") =>
      subSchema(kw, v, strict, s"The value of '$k' MUST be a valid JSON Schema")

    case k @ ("allOf" | "anyOf" | "oneOf") =>
      v match {
        case JArr(items) if items.nonEmpty =>
          items.foreach { sub =>
            try validate(sub, strict)
            catch {
              case e: SchemaException =>
                fail(s"Each item of an '$k' array MUST be a valid schema", e)
            }
          }
        case _ => fail(s"The value of '$k' MUST be a non-empty array")
      }

    case "format" =>
      if (!v.isInstanceOf[JStr]) fail("The value of a 'format' attribute MUST be a string")

    case _ => () // unknown keywords pass (default method, schema.cljc:56)
  }
}
