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
    // path is nullable: dynamic paths concat map keys, which Spark types as
    // nullable strings
    StructField("path", StringType, nullable = true),
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
    * over input column `col` of Spark type `dt`.
    *
    * Hot-path shape: a row first runs the allocation-free boolean plan
    * ([[valid]]); only rows that FAIL it evaluate the error-construction
    * branch. On mostly-valid data (the normal case) validation therefore
    * costs comparisons only — no array/struct/string allocation — which is
    * what lets the narrow validation stage scale with cores at 10^12 rows.
    */
  def errors(doc: SchemaDoc, col: Column, dt: DataType): Column =
    when(valid(doc, col, dt), noErrors)
      .otherwise(compile(doc.root, col, dt, lit(""), doc, Set.empty))

  /** Allocation-free boolean validity plan (must stay consistent with
    * [[errors]]-emptiness; EngineSpec asserts the two paths agree row-wise). */
  def valid(doc: SchemaDoc, col: Column, dt: DataType): Column =
    compileValid(doc.root, col, dt, doc, Set.empty)

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

  /** multipleOf with the reference's exact-decimal semantics: floating
    * columns go through the native [[graft.engine.expressions.ExactMultipleOf]]
    * expression (BigDecimal remainder, codegen'd); integral/decimal columns
    * use exact decimal pmod. */
  private def multipleOfCond(col: Column, dt: DataType, m: JNum): Column = dt match {
    case FloatType | DoubleType =>
      graft.engine.expressions.GraftFunctions.exactMultipleOf(col, lit(m.v.toDouble))
    case _ =>
      pmod(col.try_cast(DecimalType(38, 12)),
        lit(m.v.underlying).cast(DecimalType(38, 12))) === lit(0)
  }

  private def literal(v: JVal): Column = v match {
    case JStr(s)  => lit(s)
    case JNum(n)  => if (n.isWhole && n.abs < BigDecimal(Long.MaxValue)) lit(n.toLong) else lit(n.toDouble)
    case JBool(b) => lit(b)
    case JNull    => lit(null)
    case other    => throw Unsupported(s"non-scalar literal ${other.typeName} in column path")
  }

  /** Whether `col === literal(v)` is well-typed for a column of the given
    * JSON type. Mixed numeric widths coerce fine; string-vs-number or
    * boolean-vs-number would throw under ANSI mode, and per JSON semantics
    * cross-type values are simply unequal. Non-scalars fall through to
    * [[literal]]'s Unsupported (row-core fallback). */
  private def literalComparable(v: JVal, jsonType: String): Boolean = v match {
    case _: JStr  => jsonType == "string"
    case _: JNum  => jsonType == "integer" || jsonType == "number"
    case _: JBool => jsonType == "boolean"
    case _        => true
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

  /** True when `schema` is trivially satisfied for a NON-NULL value of
    * Spark type `dt` (the gating contexts — properties children, item
    * fields — guarantee non-null). Skipping such subschemas keeps their
    * columns out of the plan entirely, which lets nested-schema pruning
    * drop them from the parquet scan: at 10^12 rows the win is not the
    * skipped comparison but the bytes never read. */
  private def gatedStaticTrue(schema: JVal, dt: DataType): Boolean = schema match {
    case JBool(true) | JNull => true
    case o: JObj if o.has("$ref") => false
    case o: JObj =>
      o.fields.forall { case (kw, v) =>
        kw match {
          case k if inertKeywords.contains(k) => true
          case "type" =>
            val allowed = v match {
              case JStr(t)     => Seq(t)
              case JArr(items) => items.collect { case JStr(x) => x }
              case _           => Seq.empty
            }
            try {
              val t = jsonTypeOf(dt)
              allowed.contains(t) || (t == "integer" && allowed.contains("number"))
            } catch { case _: Unsupported => false }
          case _ => false
        }
      }
    case _ => false
  }

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
              (col.cast(DoubleType) % 1.0) === 0.0 // whole-valued check without ANSI long-overflow
            case _ => lit(false)
          }
          check(
            when(col.isNull, lit(nullOk)).otherwise(nonNullOk),
            path, "type", s"Instance is not of type ${allowed.mkString(" or ")}")

        case "enum" =>
          val items = v match { case JArr(i) => i; case _ => Vector.empty }
          val nullOk = items.contains(JNull)
          val scalars = items.filter(x => x != JNull)
          // Type-incompatible entries are statically false (the row core just
          // reports no match) — comparing e.g. a numeric literal against a
          // string column would raise an ANSI cast error at runtime.
          val simpleCond =
            when(col.isNull, lit(nullOk))
              .otherwise(scalars.map(s =>
                  if (literalComparable(s, jsonType)) col === literal(s) else lit(false))
                .reduceOption(_ || _).getOrElse(lit(false)))
          check(simpleCond, path, "enum", "Value must be in enum")

        case "const" =>
          val cond = v match {
            case JNull => col.isNull
            case s if !literalComparable(s, jsonType) => lit(false) // see enum
            case s => col === literal(s)
          }
          check(cond, path, "const", "Value must be equal to const")

        case "multipleOf" =>
          val m = v match { case n: JNum => n; case _ => throw Unsupported("bad multipleOf") }
          // Exact-decimal remainder like the reference's BigDecimal path;
          // decimal(38,12) covers the engine's numeric columns.
          if (jsonType == "number" || jsonType == "integer")
            check(col.isNull || multipleOfCond(col, dt, m), path,
              "multipleOf", "Failed multipleOf check")
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
            check(col.isNull || FormatColumns.condition(fmt, col), path,
              "format", s"Doesn't match $fmt format")
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
            case MapType(StringType, _, _) =>
              val reqs = v match { case JArr(r) => r.collect { case JStr(s) => s }; case _ => Vector.empty }
              val perKey = reqs.map { k =>
                check(col.isNull || try_element_at(col, lit(k)).isNotNull,
                  concat(path, lit(s"/$k")), "required", "Required property not in object")
              }
              whenOr(col.isNotNull, concatErrs(perKey), noErrors)
            case _ => noErrors
          }

        case "properties" =>
          (dt, v) match {
            case (st: StructType, props: JObj) =>
              val perField = props.fields.flatMap { case (k, subSchema) =>
                st.fields.find(_.name == k).collect {
                  // statically-true children never enter the plan, so the
                  // scan can prune their columns
                  case f if !gatedStaticTrue(subSchema, f.dataType) =>
                    val child = col.getField(k)
                    // gated on presence (null = absent under the columnar mapping)
                    whenOr(child.isNotNull,
                      sub(subSchema, child, f.dataType, concat(path, lit(s"/$k"))),
                      noErrors)
                }
              }
              whenOr(col.isNotNull, concatErrs(perField), noErrors)
            case (MapType(StringType, vt, _), props: JObj) =>
              val perKey = props.fields.map { case (k, subSchema) =>
                val child = try_element_at(col, lit(k))
                whenOr(child.isNotNull,
                  sub(subSchema, child, vt, concat(path, lit(s"/$k"))),
                  noErrors)
              }
              whenOr(col.isNotNull, concatErrs(perKey), noErrors)
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
            case MapType(StringType, vt, _) =>
              // entries whose key is neither in `properties` nor matched by
              // any `patternProperties` regex must satisfy the subschema
              val named = schema.get("properties") match {
                case Some(p: JObj) => p.keys; case _ => Vector.empty[String]
              }
              val pats = schema.get("patternProperties") match {
                case Some(p: JObj) => p.keys; case _ => Vector.empty[String]
              }
              def isAdditional(k: Column): Column = {
                val namedHit = if (named.isEmpty) lit(false)
                  else named.map(n => k === lit(n)).reduce(_ || _)
                val patHit = if (pats.isEmpty) lit(false)
                  else pats.map(p => k.rlike(p)).reduce(_ || _)
                !namedHit && !patHit
              }
              val entryErrs = transform(map_entries(col), e => {
                val k = e.getField("key"); val value = e.getField("value")
                whenOr(isAdditional(k) && value.isNotNull,
                  sub(v, value, vt, concat(path, lit("/"), k)),
                  noErrors)
              })
              whenOr(col.isNotNull, flatten(entryErrs).cast(errorType), noErrors)
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
            case MapType(StringType, _, _) =>
              val keyErrs = transform(map_keys(col), k =>
                whenOr(size(sub(v, k, StringType, lit(""))) === 0,
                  noErrors,
                  errRow(concat(path, lit("/"), k), "propertyNames", "propertyNames")))
              whenOr(col.isNotNull, flatten(keyErrs).cast(errorType), noErrors)
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
            case MapType(StringType, _, _) =>
              val n = v match { case x: JNum => x.v.toInt; case _ => throw Unsupported("bad bound") }
              val cnt = size(map_keys(col))
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
            case MapType(StringType, vt, _) =>
              (v match { case p: JObj => Some(p); case _ => None }).map { pats =>
                val entryErrs = transform(map_entries(col), e => {
                  val k = e.getField("key"); val value = e.getField("value")
                  val perPattern = pats.fields.map { case (p, subSchema) =>
                    whenOr(k.rlike(p) && value.isNotNull,
                      sub(subSchema, value, vt, concat(path, lit("/"), k)),
                      noErrors)
                  }
                  concatErrs(perPattern)
                })
                whenOr(col.isNotNull, flatten(entryErrs).cast(errorType), noErrors)
              }.getOrElse(noErrors)
            case _ => noErrors
          }

        case other =>
          // Unknown keywords are ignored, like the reference (validate.cljc:118-124).
          noErrors
      }
    }
    concatErrs(parts)
  }

  // --- allocation-free boolean plan (mirror of `compile`) -------------------

  private def ok(cond: Column): Column = coalesce(cond, lit(false))

  private def compileValid(
      schema: JVal, col: Column, dt: DataType,
      doc: SchemaDoc, seen: Set[String]): Column = schema match {
    case JBool(true) | JNull => lit(true)
    case JBool(false)        => lit(false)
    case o: JObj if o.has("$ref") =>
      val refStr = o.get("$ref") match {
        case Some(JStr(s)) => s
        case _             => throw Unsupported("non-string $ref")
      }
      if (seen.contains(refStr))
        throw Unsupported(s"recursive $$ref $refStr cannot compile to a finite Column tree")
      compileValid(resolveStatic(o, doc), col, dt, doc, seen + refStr)
    case o: JObj =>
      val parts = o.fields.map { case (kw, v) => keywordValid(kw, v, o, col, dt, doc, seen) }
      parts.reduceOption(_ && _).getOrElse(lit(true))
    case _ => lit(false)
  }

  private def keywordValid(
      kw: String, v: JVal, schema: JObj, col: Column, dt: DataType,
      doc: SchemaDoc, seen: Set[String]): Column = {

    def sub(s: JVal, c: Column, d: DataType): Column = compileValid(s, c, d, doc, seen)
    val jsonType = jsonTypeOf(dt)

    kw match {
      case k if inertKeywords.contains(k) => lit(true)

      case "type" =>
        val allowed: Seq[String] = v match {
          case JStr(t)     => Seq(t)
          case JArr(items) => items.collect { case JStr(s) => s }
          case _           => return lit(true)
        }
        val nullOk = allowed.contains("null")
        val nonNullOk: Column = jsonType match {
          case t if allowed.contains(t) => lit(true)
          case "integer" if allowed.contains("number") => lit(true)
          case "number" if allowed.contains("integer") =>
            (col.cast(DoubleType) % 1.0) === 0.0 // whole-valued check without ANSI long-overflow
          case _ => lit(false)
        }
        ok(when(col.isNull, lit(nullOk)).otherwise(nonNullOk))

      case "enum" =>
        val items = v match { case JArr(i) => i; case _ => return lit(true) }
        val nullOk = items.contains(JNull)
        val scalars = items.filter(_ != JNull)
        // type-incompatible entries: statically false, see the error plan
        ok(when(col.isNull, lit(nullOk))
          .otherwise(scalars.map(s =>
              if (literalComparable(s, jsonType)) col === literal(s) else lit(false))
            .reduceOption(_ || _).getOrElse(lit(false))))

      case "const" =>
        ok(v match {
          case JNull => col.isNull
          case s if !literalComparable(s, jsonType) => lit(false)
          case s => col === literal(s)
        })

      case "multipleOf" =>
        if (jsonType != "number" && jsonType != "integer") lit(true)
        else {
          val m = v match { case n: JNum => n; case _ => return lit(true) }
          ok(col.isNull || multipleOfCond(col, dt, m))
        }

      case "maximum" | "minimum" | "exclusiveMaximum" | "exclusiveMinimum" =>
        if (jsonType != "number" && jsonType != "integer") lit(true)
        else {
          val bound = literal(v)
          val cond = kw match {
            case "maximum"          => col <= bound
            case "minimum"          => col >= bound
            case "exclusiveMaximum" => col < bound
            case "exclusiveMinimum" => col > bound
          }
          ok(col.isNull || cond)
        }

      case "maxLength" | "minLength" =>
        if (jsonType != "string") lit(true)
        else {
          val n = v match { case x: JNum => x.v.toInt; case _ => return lit(true) }
          ok(col.isNull ||
            (if (kw == "maxLength") length(col) <= n else length(col) >= n))
        }

      case "pattern" =>
        if (jsonType != "string") lit(true)
        else v match {
          case JStr(p) => ok(col.isNull || col.rlike(p))
          case _       => lit(true)
        }

      case "format" =>
        if (jsonType != "string") lit(true)
        else {
          val fmt = v match { case JStr(s) => s; case _ => "" }
          ok(col.isNull || FormatColumns.condition(fmt, col))
        }

      case "items" =>
        dt match {
          case ArrayType(elem, containsNull) =>
            v match {
              case sub0: JObj =>
                // Vectorized fast path: when every element-schema keyword
                // reduces to field-array operations (array_except / array_min
                // / array_max over extracted field columns), skip the
                // interpreted per-element lambda entirely. Higher-order
                // functions are CodegenFallback in Spark — on a billion-row
                // scan their per-element boxing dominates; the extracted-
                // array form stays inside whole-stage codegen.
                vectorItemsValid(sub0, col, elem, containsNull) match {
                  case Some(cond) => ok(col.isNull || cond)
                  case None => ok(col.isNull || forall(col, x => sub(sub0, x, elem)))
                }
              case JBool(b) =>
                if (b) lit(true) else ok(col.isNull || size(col) === 0)
              case JArr(tuple) =>
                val pad = schema.get("additionalItems").getOrElse(JNull)
                val perElem = transform(col, (x, i) => {
                  val branches = tuple.zipWithIndex.map { case (ts, ti) =>
                    (i === ti, sub(ts, x, elem))
                  }
                  branches.foldRight(sub(pad, x, elem)) {
                    case ((c, e), acc) => when(c, e).otherwise(acc)
                  }
                })
                ok(col.isNull || forall(perElem, b => b))
              case _ => lit(true)
            }
          case _ => lit(true)
        }

      case "additionalItems" => lit(true)

      case "maxItems" | "minItems" =>
        dt match {
          case _: ArrayType =>
            val n = v match { case x: JNum => x.v.toInt; case _ => return lit(true) }
            ok(col.isNull || (if (kw == "maxItems") size(col) <= n else size(col) >= n))
          case _ => lit(true)
        }

      case "uniqueItems" =>
        (dt, v) match {
          case (_: ArrayType, JBool(true)) =>
            ok(col.isNull || size(array_distinct(col)) === size(col))
          case _ => lit(true)
        }

      case "contains" =>
        dt match {
          case ArrayType(elem, _) =>
            ok(col.isNull || exists(col, x => sub(v, x, elem)))
          case _ => lit(true)
        }

      case "required" =>
        dt match {
          case st: StructType =>
            val reqs = v match { case JArr(r) => r.collect { case JStr(s) => s }; case _ => Vector.empty }
            val props = schema.get("properties") match {
              case Some(p: JObj) => p; case _ => JObj.empty
            }
            val perKey = reqs.map { k =>
              val recoverable = props.get(k).exists {
                case prop: JObj => prop.get("default").exists { d =>
                  graft.validate.Validator.validate(SchemaDoc.compile(prop), d).valid
                }
                case _ => false
              }
              if (recoverable) lit(true)
              else if (!st.fieldNames.contains(k)) lit(false)
              else ok(col.isNull || col.getField(k).isNotNull)
            }
            ok(col.isNull || perKey.reduceOption(_ && _).getOrElse(lit(true)))
          case MapType(StringType, _, _) =>
            val reqs = v match { case JArr(r) => r.collect { case JStr(s) => s }; case _ => Vector.empty }
            val perKey = reqs.map(k => ok(col.isNull || try_element_at(col, lit(k)).isNotNull))
            ok(col.isNull || perKey.reduceOption(_ && _).getOrElse(lit(true)))
          case _ => lit(true)
        }

      case "properties" =>
        (dt, v) match {
          case (st: StructType, props: JObj) =>
            val perField = props.fields.flatMap { case (k, subSchema) =>
              st.fields.find(_.name == k).collect {
                case f if !gatedStaticTrue(subSchema, f.dataType) =>
                  val child = col.getField(k)
                  ok(child.isNull || sub(subSchema, child, f.dataType))
              }
            }
            ok(col.isNull || perField.reduceOption(_ && _).getOrElse(lit(true)))
          case (MapType(StringType, vt, _), props: JObj) =>
            val perKey = props.fields.map { case (k, subSchema) =>
              val child = try_element_at(col, lit(k))
              ok(child.isNull || sub(subSchema, child, vt))
            }
            ok(col.isNull || perKey.reduceOption(_ && _).getOrElse(lit(true)))
          case _ => lit(true)
        }

      case "additionalProperties" =>
        dt match {
          case st: StructType =>
            val named = schema.get("properties") match {
              case Some(p: JObj) => p.map.keySet; case _ => Set.empty[String]
            }
            val extras = st.fields.filterNot(f => named.contains(f.name)).toSeq
            val perField = v match {
              case JBool(false) =>
                extras.map(f => ok(col.isNull || col.getField(f.name).isNull))
              case subSchema =>
                extras.map { f =>
                  val child = col.getField(f.name)
                  ok(child.isNull || sub(subSchema, child, f.dataType))
                }
            }
            ok(col.isNull || perField.reduceOption(_ && _).getOrElse(lit(true)))
          case MapType(StringType, vt, _) =>
            val named = schema.get("properties") match {
              case Some(p: JObj) => p.keys; case _ => Vector.empty[String]
            }
            val pats = schema.get("patternProperties") match {
              case Some(p: JObj) => p.keys; case _ => Vector.empty[String]
            }
            val allOk = forall(map_entries(col), e => {
              val k = e.getField("key"); val value = e.getField("value")
              val namedHit = if (named.isEmpty) lit(false)
                else named.map(n => k === lit(n)).reduce(_ || _)
              val patHit = if (pats.isEmpty) lit(false)
                else pats.map(p => k.rlike(p)).reduce(_ || _)
              namedHit || patHit || value.isNull || ok(sub(v, value, vt))
            })
            ok(col.isNull || allOk)
          case _ => lit(true)
        }

      case "dependencies" =>
        (dt, v) match {
          case (st: StructType, deps: JObj) =>
            val perDep = deps.fields.map { case (k, dv) =>
              if (!st.fieldNames.contains(k)) lit(true)
              else {
                val present = col.getField(k).isNotNull
                val depOk = dv match {
                  case JArr(names) =>
                    names.collect { case JStr(n) => n }.map { n =>
                      if (!st.fieldNames.contains(n)) lit(false)
                      else ok(col.getField(n).isNotNull)
                    }.reduceOption(_ && _).getOrElse(lit(true))
                  case s => sub(s, col, dt)
                }
                ok(!present || depOk)
              }
            }
            ok(col.isNull || perDep.reduceOption(_ && _).getOrElse(lit(true)))
          case _ => lit(true)
        }

      case "propertyNames" =>
        dt match {
          case st: StructType =>
            val bad = st.fieldNames.filterNot { name =>
              graft.validate.Validator.validate(SchemaDoc.compile(v), JStr(name)).valid
            }.toSeq
            val perField = bad.map(k => ok(col.isNull || col.getField(k).isNull))
            ok(col.isNull || perField.reduceOption(_ && _).getOrElse(lit(true)))
          case MapType(StringType, _, _) =>
            ok(col.isNull || forall(map_keys(col), k => ok(sub(v, k, StringType))))
          case _ => lit(true)
        }

      case "maxProperties" | "minProperties" =>
        dt match {
          case st: StructType =>
            val n = v match { case x: JNum => x.v.toInt; case _ => return lit(true) }
            val cnt = st.fieldNames.map(k =>
              when(col.getField(k).isNotNull, 1).otherwise(0)).reduce(_ + _)
            ok(col.isNull || (if (kw == "maxProperties") cnt <= n else cnt >= n))
          case MapType(StringType, _, _) =>
            val n = v match { case x: JNum => x.v.toInt; case _ => return lit(true) }
            val cnt = size(map_keys(col))
            ok(col.isNull || (if (kw == "maxProperties") cnt <= n else cnt >= n))
          case _ => lit(true)
        }

      case "allOf" =>
        v match {
          case JArr(subs) => subs.map(s => sub(s, col, dt)).reduceOption(_ && _).getOrElse(lit(true))
          case _          => lit(true)
        }

      case "anyOf" =>
        v match {
          case JArr(subs) => ok(subs.map(s => sub(s, col, dt)).reduceOption(_ || _).getOrElse(lit(false)))
          case _          => lit(true)
        }

      case "oneOf" =>
        v match {
          case JArr(subs) =>
            val cnt = subs.map(s => when(sub(s, col, dt), 1).otherwise(0)).reduce(_ + _)
            ok(cnt === 1)
          case _ => lit(true)
        }

      case "not" => ok(!ok(sub(v, col, dt)))

      case "if" =>
        val thenOk = schema.get("then").map(s => sub(s, col, dt)).getOrElse(lit(true))
        val elseOk = schema.get("else").map(s => sub(s, col, dt)).getOrElse(lit(true))
        ok(when(ok(sub(v, col, dt)), thenOk).otherwise(elseOk))

      case "patternProperties" =>
        dt match {
          case st: StructType =>
            (v match { case p: JObj => Some(p); case _ => None }).map { pats =>
              val perField = st.fields.toSeq.flatMap { f =>
                pats.fields.filter { case (p, _) =>
                  java.util.regex.Pattern.compile(p).matcher(f.name).find()
                }.map { case (_, subSchema) =>
                  val child = col.getField(f.name)
                  ok(child.isNull || sub(subSchema, child, f.dataType))
                }
              }
              ok(col.isNull || perField.reduceOption(_ && _).getOrElse(lit(true)))
            }.getOrElse(lit(true))
          case MapType(StringType, vt, _) =>
            (v match { case p: JObj => Some(p); case _ => None }).map { pats =>
              val allOk = forall(map_entries(col), e => {
                val k = e.getField("key"); val value = e.getField("value")
                pats.fields.map { case (p, subSchema) =>
                  !k.rlike(p) || value.isNull || ok(sub(subSchema, value, vt))
                }.reduceOption(_ && _).getOrElse(lit(true))
              })
              ok(col.isNull || allOk)
            }.getOrElse(lit(true))
          case _ => lit(true)
        }

      case _ => lit(true)
    }
  }

  /** Try to compile an object-form `items` element schema into lambda-free
    * array-column conditions. Returns None (⇒ lambda fallback) unless EVERY
    * keyword is either statically satisfied by the element StructType or
    * expressible over extracted field arrays. Conservative by design. */
  private def vectorItemsValid(
      itemSchema: JObj, arrCol: Column, elemDt: DataType,
      containsNull: Boolean): Option[Column] = {
    val elem = elemDt match {
      case st: StructType if !containsNull => st
      case _ => return None
    }

    def typeCompatible(allowed: Seq[String], ft: DataType, nullable: Boolean): Boolean = {
      // inside `properties` the child check is gated on non-null, so a
      // nullable field only needs compatibility for its non-null values
      val t = try jsonTypeOf(ft) catch { case _: Unsupported => return false }
      allowed.contains(t) || (t == "integer" && allowed.contains("number"))
    }

    // per-field subschema → Some(conds) if fully vectorizable
    def fieldConds(sub0: JVal, fname: String, ft: DataType, nullable: Boolean): Option[Seq[Column]] = {
      val arrF = arrCol.getField(fname)
      val ftJson = try Some(jsonTypeOf(ft)) catch { case _: Unsupported => None }
      // scalar enum/const entries: a null field value means the property is
      // ABSENT (gated out), so nullable fields get a null sentinel in the
      // allowed list (array_except treats null as a distinct removable
      // value — codegen'd, unlike array_compact/filter). Type-incompatible
      // entries can never equal a typed column value and are dropped.
      def allowedValuesCond(items: Vector[JVal]): Option[Seq[Column]] =
        if (!items.forall(i =>
            i.isInstanceOf[JStr] || i.isInstanceOf[JNum] || i.isInstanceOf[JBool])) None
        else ftJson.map { jt =>
          val comparable = items.filter(literalComparable(_, jt)).map(literal)
          val allowed = if (nullable) comparable :+ lit(null).cast(ft) else comparable
          if (allowed.isEmpty) Seq(size(arrCol) === 0)
          else Seq(size(array_except(arrF, array(allowed: _*))) === 0)
        }
      sub0 match {
        case JBool(true) | JNull => Some(Nil)
        case o: JObj if o.has("$ref") => None
        case o: JObj =>
          val parts = o.fields.map {
            case (k, _) if inertKeywords.contains(k) => Some(Nil)
            case ("type", tv) =>
              val allowed = tv match {
                case JStr(t)     => Seq(t)
                case JArr(items) => items.collect { case JStr(s) => s }
                case _           => return None
              }
              if (typeCompatible(allowed, ft, nullable)) Some(Nil) else None
            case ("enum", JArr(items)) => allowedValuesCond(items)
            case ("const", c) => allowedValuesCond(Vector(c))
            case ("minimum", b: JNum) if numericType(ft) =>
              // array_min skips null elements — matches the non-null gating
              Some(Seq(coalesce(array_min(arrF) >= literal(b), lit(true))))
            case ("exclusiveMinimum", b: JNum) if numericType(ft) =>
              Some(Seq(coalesce(array_min(arrF) > literal(b), lit(true))))
            case ("maximum", b: JNum) if numericType(ft) =>
              Some(Seq(coalesce(array_max(arrF) <= literal(b), lit(true))))
            case ("exclusiveMaximum", b: JNum) if numericType(ft) =>
              Some(Seq(coalesce(array_max(arrF) < literal(b), lit(true))))
            case _ => None
          }
          if (parts.forall(_.isDefined)) Some(parts.flatMap(_.get)) else None
        case _ => None
      }
    }

    def numericType(ft: DataType): Boolean = ft match {
      case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType | _: DecimalType => true
      case _ => false
    }

    // element-schema subtree statically true? (zero conditions needed)
    def staticTrue(s: JVal): Boolean = elementConds(s).exists(_.isEmpty)

    // whole element schema → Some(conds)
    def elementConds(s: JVal): Option[Seq[Column]] = s match {
      case JBool(true) | JNull => Some(Nil)
      case o: JObj if o.has("$ref") => None
      case o: JObj =>
        val parts = o.fields.map {
          case (k, _) if inertKeywords.contains(k) && k != "then" && k != "else" => Some(Nil)
          case ("type", tv) =>
            val allowed = tv match {
              case JStr(t)     => Seq(t)
              case JArr(items) => items.collect { case JStr(s) => s }
              case _           => return None
            }
            // non-null struct elements are always objects
            if (allowed.contains("object")) Some(Nil) else None
          case ("required", JArr(reqs)) =>
            // non-nullable field: statically present. Nullable field:
            // null-presence detected with codegen'd array_intersect against
            // a null singleton (null field value = absent property). Field
            // missing from the struct entirely: required fails whenever the
            // array is non-empty.
            Some(reqs.collect { case JStr(n) => n }.flatMap { n =>
              elem.fields.find(_.name == n) match {
                case Some(f) if !f.nullable => Nil
                case Some(f) =>
                  Seq(size(array_intersect(arrCol.getField(n),
                    array(lit(null).cast(f.dataType)))) === 0)
                case None => Seq(size(arrCol) === 0)
              }
            })
          case ("properties", props: JObj) =>
            val perField = props.fields.map { case (fname, sub0) =>
              elem.fields.find(_.name == fname) match {
                case Some(f) => fieldConds(sub0, fname, f.dataType, f.nullable)
                case None    => Some(Nil) // property absent from struct → never present → gated out
              }
            }
            if (perField.forall(_.isDefined)) Some(perField.flatMap(_.get)) else None
          case ("allOf", JArr(subs)) =>
            val inner = subs.map(elementConds)
            if (inner.forall(_.isDefined)) Some(inner.flatMap(_.get)) else None
          case ("if", _) =>
            // safe only when both branches are statically true for this
            // struct — then the conditional contributes nothing
            val thenOk = o.get("then").forall(staticTrue)
            val elseOk = o.get("else").forall(staticTrue)
            if (thenOk && elseOk) Some(Nil) else None
          case ("then" | "else", _) => Some(Nil) // evaluated via their `if`
          case _ => None
        }
        if (parts.forall(_.isDefined)) Some(parts.flatMap(_.get)) else None
      case _ => None
    }

    elementConds(itemSchema)
      .map(conds => conds.reduceOption(_ && _).getOrElse(lit(true)))
  }
}

/** Format → Column-condition mapping for the compiled path. Simple regex
  * formats compile to anchored RLIKE (pure codegen'd builtins); everything
  * else — date/time parsing, IDN, regex-compilability, unknown-format
  * pass-through — runs the native [[graft.engine.expressions.FormatCheck]]
  * expression, which calls the SAME [[graft.validate.Formats.check]] the
  * row core uses (parity by construction, still whole-stage codegen). No
  * format ever forces a whole-schema row-core fallback. */
object FormatColumns {
  import graft.validate.Formats
  private def anchor(p: String): String = s"^(?:$p)$$"
  private val regexFormats: Map[String, String] = Map(
    "email" -> Formats.emailPattern,
    "ipv4" -> Formats.ipv4Pattern,
    "ipv6" -> Formats.ipv6Pattern,
    "uri" -> Formats.uriPattern,
    "json-pointer" -> Formats.jsonPointerPattern,
    "relative-json-pointer" -> Formats.relativeJsonPointerPattern
  ).map { case (k, v) => k -> anchor(v) }

  /** The (non-null) validity condition for a format. hostname adds the
    * RFC 1034 length caps on top of its regex, matching
    * [[Formats.hostname]]: total ≤ 255 chars (all-ASCII once the regex
    * passes, so `length` = bytes), and no label longer than 63 (a run of
    * 64+ label characters ⟺ some dot-separated label > 63). */
  def condition(fmt: String, col: Column): Column = fmt match {
    case "hostname" =>
      col.rlike(anchor(Formats.hostnamePattern)) &&
        length(col) <= 255 && !col.rlike("[A-Za-z0-9-]{64,}")
    case f if regexFormats.contains(f) => col.rlike(regexFormats(f))
    case other =>
      graft.engine.expressions.FormatCheckFunctions.formatCheck(col, other)
  }
}
