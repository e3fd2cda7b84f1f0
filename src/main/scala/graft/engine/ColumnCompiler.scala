package graft.engine

import graft.json._
import graft.schema._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiles a draft-7 schema into Catalyst `Column` expressions over a
  * statically-typed Dataset — the engine's bulk validation path.
  *
  * Output of [[errors]] is `array<struct<path,keyword,message>>` holding the
  * *leaf* violations (the reference nests causes under applicator errors,
  * `validate.cljc:824-832`; the engine's exploded violation rows are the
  * flattened leaves — same validity semantics: valid ⟺ zero leaves).
  *
  * Everything is built from `org.apache.spark.sql.functions` (no UDFs), so
  * whole-stage codegen applies and the plan scales: validation is a narrow
  * map over the scan, no shuffle.
  *
  * Mapping decisions for columnar data (documented divergence from the
  * dynamic-JSON world): a NULL struct field means *absent* (Parquet cannot
  * distinguish present-null from absent), so `required` fails on null fields
  * and `properties` subschemas are gated on non-null.
  *
  * Schemas using keywords that cannot be expressed as a finite Column tree
  * (dynamic objects, recursive $ref, content decoding, patternProperties …)
  * throw [[ColumnCompiler.Unsupported]]; callers fall back to the row-level
  * core via [[RowValidatorFallback]].
  */
object ColumnCompiler {

  final case class Unsupported(reason: String) extends RuntimeException(reason)

  val errorType: DataType = ArrayType(StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("keyword", StringType, nullable = false),
    StructField("message", StringType, nullable = false))), containsNull = false)

  private def noErrors: Column = array().cast(errorType)

  private def errRow(path: Column, kw: String, msg: String): Column =
    array(struct(
      path.as("path"), lit(kw).as("keyword"), lit(msg).as("message"))).cast(errorType)

  private def whenOr(cond: Column, ifTrue: Column, ifFalse: Column): Column =
    when(coalesce(cond, lit(false)), ifTrue).otherwise(ifFalse)

  /** error rows iff `cond` is false/null */
  private def check(cond: Column, path: Column, kw: String, msg: String): Column =
    whenOr(cond, noErrors, errRow(path, kw, msg))

  private def concatErrs(parts: Seq[Column]): Column =
    if (parts.isEmpty) noErrors else parts.reduce(concat(_, _))

  /** Compile `schema` (a compiled [[SchemaDoc]]) to an error-array Column
    * over input column `col` of Spark type `dt`. */
  def errors(doc: SchemaDoc, col: Column, dt: DataType): Column =
    compile(doc.root, col, dt, lit(""), doc, Set.empty)

  def valid(doc: SchemaDoc, col: Column, dt: DataType): Column =
    size(errors(doc, col, dt)) === 0

  // ---------------------------------------------------------------------------

  private def jsonTypeOf(dt: DataType): String = dt match {
    case StringType                                      => "string"
    case ByteType | ShortType | IntegerType | LongType   => "integer"
    case FloatType | DoubleType | _: DecimalType         => "number"
    case BooleanType                                     => "boolean"
    case _: ArrayType                                    => "array"
    case _: StructType | _: MapType                      => "object"
    case NullType                                        => "null"
    case other => throw Unsupported(s"no JSON mapping for Spark type $other")
  }

  private def literal(v: JVal): Column = v match {
    case JStr(s)  => lit(s)
    case JNum(n)  => if (n.isWhole && n.abs < BigDecimal(Long.MaxValue)) lit(n.toLong) else lit(n.toDouble)
    case JBool(b) => lit(b)
    case JNull    => lit(null)
    case other    => throw Unsupported(s"non-scalar literal ${other.typeName} in column path")
  }

  private def compile(
      schema: JVal, col: Column, dt: DataType, path: Column,
      doc: SchemaDoc, refsSeen: Set[String]): Column = schema match {
    case JBool(true) | JNull => noErrors
    case JBool(false)        => errRow(path, "false", "Schema is false")
    case o: JObj if o.has("$ref") =>
      // Static $ref inlining at compile time (driver side). The broadcast
      // registry exists for the row-level fallback; here the plan itself is
      // the compiled schema.
      val refStr = o.get("$ref") match {
        case Some(JStr(s)) => s
        case _             => throw Unsupported("non-string $ref")
      }
      val key = refStr
      if (refsSeen.contains(key))
        throw Unsupported(s"recursive $$ref $refStr cannot compile to a finite Column tree")
      val target = resolveStatic(o, doc)
      compile(target, col, dt, path, doc, refsSeen + key)
    case o: JObj => compileObj(o, col, dt, path, doc, refsSeen)
    case other => throw Unsupported(s"invalid schema of type ${other.typeName}")
  }

  private def resolveStatic(refObj: JObj, doc: SchemaDoc): JVal = {
    val base = doc.baseUriOf(refObj)
    val ref = UriUtil.urlDecode(refObj.get("$ref").collect { case JStr(s) => s }.get)
    val uri = UriUtil.join(base, ref)
    val (docref, fragment) = UriUtil.splitFragment(uri)
    val frag = fragment.getOrElse("")
    if (docref.isEmpty) JsonPointer.eval(doc.root, frag)
    else doc.uriIndex.get(docref) match {
      case Some(embedded) => JsonPointer.eval(embedded, frag)
      case None => throw Unsupported(s"external $$ref $docref in column path")
    }
  }

  private val inertKeywords = Set(
    "$schema", "$id", "$comment", "definitions", "title", "description",
    "default", "readOnly", "writeOnly", "examples",
    // handled by their governing keyword:
    "additionalItems", "then", "else",
    // contentEncoding only errors on undecodable base64; treat as inert for
    // columnar data (no base64 columns in the typed mapping)
    "contentEncoding", "contentMediaType")

  private def compileObj(
      schema: JObj, col: Column, dt: DataType, path: Column,
      doc: SchemaDoc, seen: Set[String]): Column = {

    def sub(s: JVal, c: Column, d: DataType, p: Column): Column =
      compile(s, c, d, p, doc, seen)

    val jsonType = jsonTypeOf(dt)

    val parts = schema.fields.map { case (kw, v) =>
      kw match {
        case k if inertKeywords.contains(k) => noErrors

        case "type" =>
          val allowed: Seq[String] = v match {
            case JStr(t)     => Seq(t)
            case JArr(items) => items.collect { case JStr(s) => s }
            case _           => Seq.empty
          }
          val nullOk = allowed.contains("null")
          val nonNullOk: Column = jsonType match {
            case t if allowed.contains(t) => lit(true)
            case "integer" if allowed.contains("number") => lit(true)
            case "number" if allowed.contains("integer") =>
              col.cast(DoubleType) === col.cast(LongType).cast(DoubleType)
            case _ => lit(false)
          }
          check(
            when(col.isNull, lit(nullOk)).otherwise(nonNullOk),
            path, "type", s"Instance is not of type ${allowed.mkString(" or ")}")

        case "enum" =>
          val items = v match { case JArr(i) => i; case _ => Vector.empty }
          val nullOk = items.contains(JNull)
          val scalars = items.filter(x => x != JNull)
          val simpleCond =
            when(col.isNull, lit(nullOk))
              .otherwise(if (scalars.isEmpty) lit(false)
                         else scalars.map(s => col === literal(s)).reduce(_ || _))
          check(simpleCond, path, "enum", "Value must be in enum")

        case "const" =>
          val cond = v match {
            case JNull => col.isNull
            case s     => col === literal(s)
          }
          check(cond, path, "const", "Value must be equal to const")

        case "multipleOf" =>
          val m = v match { case n: JNum => n; case _ => throw Unsupported("bad multipleOf") }
          // Exact-decimal remainder like the reference's BigDecimal path;
          // decimal(38,12) covers the engine's numeric columns.
          val cond = col.isNull ||
            (pmod(col.cast(DecimalType(38, 12)), lit(m.v.underlying).cast(DecimalType(38, 12))) === lit(0))
          if (jsonType == "number" || jsonType == "integer")
            check(cond, path, "multipleOf", "Failed multipleOf check")
          else noErrors

        case "maximum" | "minimum" | "exclusiveMaximum" | "exclusiveMinimum" =>
          if (jsonType != "number" && jsonType != "integer") noErrors
          else {
            val bound = literal(v)
            val cond = kw match {
              case "maximum"          => col <= bound
              case "minimum"          => col >= bound
              case "exclusiveMaximum" => col < bound
              case "exclusiveMinimum" => col > bound
            }
            check(col.isNull || cond, path, kw, s"Failed $kw check")
          }

        case "maxLength" | "minLength" =>
          if (jsonType != "string") noErrors
          else {
            val n = v match { case x: JNum => x.v.toInt; case _ => throw Unsupported("bad length bound") }
            // Spark `length` on strings counts characters (code points for
            // UTF8String), matching the reference's codePointCount.
            val cond = if (kw == "maxLength") length(col) <= n else length(col) >= n
            check(col.isNull || cond, path, kw,
              if (kw == "maxLength") "String is too long" else "String is too short")
          }

        case "pattern" =>
          if (jsonType != "string") noErrors
          else {
            val p = v match { case JStr(s) => s; case _ => throw Unsupported("bad pattern") }
            // RLIKE = Java-regex find(), same unanchored semantics as the
            // reference's re-seq (validate.cljc:280-283).
            check(col.isNull || col.rlike(p), path, "pattern",
              s"String does not match pattern $p")
          }

        case "format" =>
          if (jsonType != "string") noErrors
          else {
            val fmt = v match { case JStr(s) => s; case _ => "" }
            FormatColumns.regexFor(fmt) match {
              case Some(re) =>
                check(col.isNull || col.rlike(re), path, "format", s"Doesn't match $fmt format")
              case None if FormatColumns.passThrough(fmt) => noErrors
              case None => throw Unsupported(s"format $fmt needs the row-level core")
            }
          }

        case "items" =>
          dt match {
            case ArrayType(elem, _) =>
              v match {
                case sub0: JObj =>
                  val childErrs = transform(col, (x, i) =>
                    sub(sub0, x, elem, concat(path, lit("/"), i.cast(StringType))))
                  whenOr(col.isNotNull, flatten(childErrs).cast(errorType), noErrors)
                case JBool(b) =>
                  if (b) noErrors
                  else check(col.isNull || size(col) === 0, path, "items",
                    "Items must be empty to satisfy a false schema")
                case JArr(tuple) =>
                  val pad = schema.get("additionalItems").getOrElse(JNull)
                  val childErrs = transform(col, (x, i) => {
                    val branches = tuple.zipWithIndex.map { case (ts, ti) =>
                      (i === ti, sub(ts, x, elem, concat(path, lit("/"), i.cast(StringType))))
                    }
                    val padded = sub(pad, x, elem, concat(path, lit("/"), i.cast(StringType)))
                    branches.foldRight(padded) { case ((c, e), acc) => when(c, e).otherwise(acc) }
                  })
                  whenOr(col.isNotNull, flatten(childErrs).cast(errorType), noErrors)
                case _ => noErrors
              }
            case _ => noErrors // items ignores non-arrays
          }

        case "maxItems" | "minItems" =>
          dt match {
            case _: ArrayType =>
              val n = v match { case x: JNum => x.v.toInt; case _ => throw Unsupported("bad items bound") }
              val cond = if (kw == "maxItems") size(col) <= n else size(col) >= n
              check(col.isNull || cond, path, kw,
                if (kw == "maxItems") "maxItems exceeded" else "minItems not reached")
            case _ => noErrors
          }

        case "uniqueItems" =>
          (dt, v) match {
            case (_: ArrayType, JBool(true)) =>
              check(col.isNull || size(array_distinct(col)) === size(col),
                path, "uniqueItems", "Instance elements are not all unique")
            case _ => noErrors
          }

        case "contains" =>
          dt match {
            case ArrayType(elem, _) =>
              val any = exists(col, x => size(sub(v, x, elem, lit(""))) === 0)
              check(col.isNull || any, path, "contains",
                "Instance is not valid against schema")
            case _ => noErrors
          }

        case "required" =>
          dt match {
            case st: StructType =>
              val reqs = v match { case JArr(r) => r.collect { case JStr(s) => s }; case _ => Vector.empty }
              val props = schema.get("properties") match {
                case Some(p: JObj) => p; case _ => JObj.empty
              }
              val perKey = reqs.map { k =>
                // Required-recovery semantics (validate.cljc:353-389): a
                // missing key whose subschema has a *valid* default is not a
                // violation. Valid-default check runs at compile time via the
                // row-level core.
                val recoverable = props.get(k).exists {
                  case prop: JObj => prop.get("default").exists { d =>
                    graft.validate.Validator.validate(SchemaDoc.compile(prop), d).valid
                  }
                  case _ => false
                }
                if (recoverable) noErrors
                else if (!st.fieldNames.contains(k))
                  errRow(concat(path, lit(s"/$k")), "required", "Required property not in object")
                else check(col.isNull || col.getField(k).isNotNull,
                  concat(path, lit(s"/$k")), "required", "Required property not in object")
              }
              whenOr(col.isNotNull, concatErrs(perKey), noErrors)
            case _: MapType => throw Unsupported("required over MapType needs the row core")
            case _ => noErrors
          }

        case "properties" =>
          (dt, v) match {
            case (st: StructType, props: JObj) =>
              val perField = props.fields.flatMap { case (k, subSchema) =>
                st.fields.find(_.name == k).map { f =>
                  val child = col.getField(k)
                  // gated on presence (null = absent under the columnar mapping)
                  whenOr(child.isNotNull,
                    sub(subSchema, child, f.dataType, concat(path, lit(s"/$k"))),
                    noErrors)
                }
              }
              whenOr(col.isNotNull, concatErrs(perField), noErrors)
            case (_: MapType, _) => throw Unsupported("properties over MapType needs the row core")
            case _ => noErrors
          }

        case "additionalProperties" =>
          dt match {
            case st: StructType =>
              // A struct's fields are a closed set: additional properties
              // cannot exist. additionalProperties: false is statically
              // satisfied for fields named in `properties`; fields NOT named
              // there are violations when present (non-null).
              val named = schema.get("properties") match {
                case Some(p: JObj) => p.map.keySet; case _ => Set.empty[String]
              }
              v match {
                case JBool(false) =>
                  val extra = st.fieldNames.filterNot(named.contains).toSeq
                  val perField = extra.map { k =>
                    check(col.isNull || col.getField(k).isNull,
                      concat(path, lit(s"/$k")), "additionalProperties",
                      "An additional property failed the schema check")
                  }
                  whenOr(col.isNotNull, concatErrs(perField), noErrors)
                case subSchema =>
                  val extra = st.fields.filterNot(f => named.contains(f.name)).toSeq
                  val perField = extra.map { f =>
                    val child = col.getField(f.name)
                    whenOr(child.isNotNull,
                      sub(subSchema, child, f.dataType, concat(path, lit(s"/${f.name}"))),
                      noErrors)
                  }
                  whenOr(col.isNotNull, concatErrs(perField), noErrors)
              }
            case _: MapType => throw Unsupported("additionalProperties over MapType needs the row core")
            case _ => noErrors
          }

        case "dependencies" =>
          (dt, v) match {
            case (st: StructType, deps: JObj) =>
              val perDep = deps.fields.map { case (k, dv) =>
                if (!st.fieldNames.contains(k)) noErrors
                else {
                  val present = col.getField(k).isNotNull
                  val depErrs = dv match {
                    case JArr(names) =>
                      val missing = names.collect { case JStr(n) => n }.map { n =>
                        if (!st.fieldNames.contains(n))
                          errRow(concat(path, lit(s"/$n")), "dependencies", "Not every dependency in instance")
                        else check(col.getField(n).isNotNull,
                          concat(path, lit(s"/$n")), "dependencies", "Not every dependency in instance")
                      }
                      concatErrs(missing)
                    case s => sub(s, col, dt, path)
                  }
                  whenOr(present, depErrs, noErrors)
                }
              }
              whenOr(col.isNotNull, concatErrs(perDep), noErrors)
            case _ => noErrors
          }

        case "propertyNames" =>
          dt match {
            case st: StructType =>
              // Static field names: evaluate each name against the subschema
              // at compile time with the row-level core.
              val bad = st.fieldNames.filterNot { name =>
                graft.validate.Validator.validate(SchemaDoc.compile(v), JStr(name)).valid
              }.toSeq
              val perField = bad.map { k =>
                check(col.isNull || col.getField(k).isNull,
                  concat(path, lit(s"/$k")), "propertyNames", "propertyNames")
              }
              whenOr(col.isNotNull, concatErrs(perField), noErrors)
            case _ => noErrors
          }

        case "maxProperties" | "minProperties" =>
          dt match {
            case st: StructType =>
              val n = v match { case x: JNum => x.v.toInt; case _ => throw Unsupported("bad bound") }
              val cnt = st.fieldNames.map(k =>
                when(col.getField(k).isNotNull, 1).otherwise(0)).reduce(_ + _)
              val cond = if (kw == "maxProperties") cnt <= n else cnt >= n
              check(col.isNull || cond, path, kw,
                if (kw == "maxProperties") "Max properties exceeded" else "Min properties not reached")
            case _ => noErrors
          }

        case "allOf" =>
          v match {
            case JArr(subs) => concatErrs(subs.map(s => sub(s, col, dt, path)))
            case _          => noErrors
          }

        case "anyOf" =>
          v match {
            case JArr(subs) =>
              val errsEach = subs.map(s => sub(s, col, dt, path))
              val anyValid = errsEach.map(e => size(e) === 0).reduce(_ || _)
              whenOr(anyValid, noErrors,
                errRow(path, "anyOf", "No schema validates for anyOf validation"))
            case _ => noErrors
          }

        case "oneOf" =>
          v match {
            case JArr(subs) =>
              val validCount = subs.map(s =>
                when(size(sub(s, col, dt, path)) === 0, 1).otherwise(0)).reduce(_ + _)
              whenOr(validCount === 1, noErrors,
                errRow(path, "oneOf", "oneOf validation failed"))
            case _ => noErrors
          }

        case "not" =>
          whenOr(size(sub(v, col, dt, path)) === 0,
            errRow(path, "not", "Schema should not be valid"), noErrors)

        case "if" =>
          val ifValid = size(sub(v, col, dt, path)) === 0
          val thenErrs = schema.get("then").map(s => sub(s, col, dt, path)).getOrElse(noErrors)
          val elseErrs = schema.get("else").map(s => sub(s, col, dt, path)).getOrElse(noErrors)
          whenOr(ifValid, thenErrs, elseErrs)

        case "patternProperties" =>
          dt match {
            case st: StructType =>
              (v match { case p: JObj => Some(p); case _ => None }).map { pats =>
                // Static field names: pattern matching happens at compile time.
                val perField = st.fields.toSeq.flatMap { f =>
                  pats.fields.filter { case (p, _) =>
                    java.util.regex.Pattern.compile(p).matcher(f.name).find()
                  }.map { case (_, subSchema) =>
                    val child = col.getField(f.name)
                    whenOr(child.isNotNull,
                      sub(subSchema, child, f.dataType, concat(path, lit(s"/${f.name}"))),
                      noErrors)
                  }
                }
                whenOr(col.isNotNull, concatErrs(perField), noErrors)
              }.getOrElse(noErrors)
            case _: MapType => throw Unsupported("patternProperties over MapType needs the row core")
            case _ => noErrors
          }

        case other =>
          // Unknown keywords are ignored, like the reference (validate.cljc:118-124).
          noErrors
      }
    }
    concatErrs(parts)
  }
}

/** Format → anchored-regex mapping reused by the column path. */
object FormatColumns {
  import graft.validate.Formats
  private def anchor(p: String): String = s"^(?:$p)$$"
  private val regexFormats: Map[String, String] = Map(
    "email" -> Formats.emailPattern,
    "hostname" -> Formats.hostnamePattern, // length caps checked separately below
    "ipv4" -> Formats.ipv4Pattern,
    "ipv6" -> Formats.ipv6Pattern,
    "uri" -> Formats.uriPattern,
    "json-pointer" -> Formats.jsonPointerPattern,
    "relative-json-pointer" -> Formats.relativeJsonPointerPattern
  ).map { case (k, v) => k -> anchor(v) }

  def regexFor(fmt: String): Option[String] = regexFormats.get(fmt)

  /** Unknown formats succeed (reference default, validate.cljc:550-552). */
  def passThrough(fmt: String): Boolean = !Set(
    "date-time", "date", "time", "idn-email", "idn-hostname",
    "uri-reference", "iri", "iri-reference", "uri-template", "regex").contains(fmt) &&
    !regexFormats.contains(fmt)
}
