package graft.tools

import graft.json._
import graft.schema._
import graft.validate._

/** Tiny CLI surface over the row-level validator: validate one JSON instance
  * against one schema (the reference's `jinx/validate` entry point,
  * `/root/reference/src/juxt/jinx/alpha/alpha.clj:15-18`, as a command).
  *
  * Usage: ValidateCli '<schema-json>' '<instance-json>'
  * Prints `valid` or `invalid` plus one violation row per line; exit code 0/1.
  */
object ValidateCli {
  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("usage: ValidateCli <schema-json> <instance-json>")
      sys.exit(2)
    }
    val result =
      try Validator.validate(SchemaDoc.schema(args(0)), Json.parse(args(1)))
      catch {
        case e: Exception =>
          System.err.println(s"error: ${e.getMessage}")
          sys.exit(3)
      }
    println(if (result.valid) "valid" else "invalid")
    result.errors.foreach { v =>
      println(s"  at=/${v.path.stripPrefix("/")} keyword=${v.keyword} message=${v.message}")
    }
    if (!result.valid) sys.exit(1)
  }
}
