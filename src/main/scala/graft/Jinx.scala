package graft

import graft.json.{JVal, Json}
import graft.schema.{SchemaDoc, SchemaDsl}
import graft.validate.{Options, Validator, VResult}

/** The reference's public API surface, one-to-one
  * (`/root/reference/src/juxt/jinx/alpha.clj:9-23`): `schema` (compile +
  * conformance-check), `validate` (one instance against a compiled schema →
  * valid/errors/annotations/transformed instance/journal), and the shorthand
  * DSL (`clj->jsch`). A jinx user switches by calling these three; the
  * Spark-scale entry points ([[graft.engine.ValidationJob]],
  * [[graft.engine.SchemaRegistry]], [[graft.Main]]) build on the same
  * compiled [[graft.schema.SchemaDoc]].
  */
object Jinx {

  /** Compile + conformance-check a schema (reference `jinx/schema`,
    * `alpha.clj:12-13`). `strict` upgrades SHOULD conformance rules, like
    * the reference's `:strict?` (default true). */
  def schema(json: String): SchemaDoc = SchemaDoc.schema(json)
  def schema(root: JVal, strict: Boolean = true): SchemaDoc =
    SchemaDoc.schema(root, strict)

  /** Validate one instance (reference `jinx/validate`, `alpha.clj:15-18`).
    * Options carry resolvers, coercions, keyword order, and the `journal`
    * flag, mirroring the reference's options map. */
  def validate(schema: SchemaDoc, instance: JVal, opts: Options = Options()): VResult =
    Validator.validate(schema, instance, opts)
  def validate(schemaJson: String, instanceJson: String): VResult =
    Validator.validate(schemaJson, instanceJson)

  /** Shorthand DSL → JSON Schema (reference `jinx/clj->jsch`,
    * `alpha.clj:20-23`; Scala ADT instead of Clojure forms — see
    * [[graft.schema.SchemaDsl]] for the constructors). */
  def dslToSchemaJson(s: SchemaDsl.S): JVal = SchemaDsl.toJson(s)
  def dslToSchema(s: SchemaDsl.S): SchemaDoc = SchemaDsl.toSchema(s)

  /** Parse a JSON document into the engine's AST. */
  def parse(json: String): JVal = Json.parse(json)
}
