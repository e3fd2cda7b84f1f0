package graft.engine

import graft.engine.expressions.GraftExtensions
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface of the native expressions: every graft_* function is
  * callable from plain SQL after registration (the same builder list the
  * spark.sql.extensions injection path uses). */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("graft_hash64 / graft_bucket SQL functions match the JVM hash family") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_hash64('split:42', 42) h, graft_hash64('x') h0, " +
        "graft_bucket('split:42', 42, 10000) b").collect()(0)
    assert(r.getLong(0) === Dedup.hash64("split:42", 42))
    assert(r.getLong(1) === Dedup.hash64("x", 0))
    assert(r.getLong(2) === Pipeline.bucketOf(Dedup.hash64("split:42", 42), 10000))
  }

  test("graft_format_check SQL function dispatches the draft-7 checkers") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_format_check('2023-01-15', 'date') a, " +
        "graft_format_check('not a date', 'date') b, " +
        "graft_format_check('::1', 'ipv6') c").collect()(0)
    assert(r.getBoolean(0) && !r.getBoolean(1) && r.getBoolean(2))
  }

  test("graft_simhash64 matches the reference per-token counter loop and stays codegen'd") {
    GraftExtensions.register(spark)
    // driver-side reference: hash64(token, 0) per whitespace token, 64
    // up/down counters, sign -> bit
    def refSimhash(text: String): Long = {
      val counters = new Array[Int](64)
      text.trim.split("\\s+").foreach { t =>
        val hv = Dedup.hash64(t, 0)
        (0 until 64).foreach { j =>
          if (((hv >>> j) & 1L) == 1L) counters(j) += 1 else counters(j) -= 1
        }
      }
      (0 until 64).foldLeft(0L)((s, j) => if (counters(j) > 0) s | (1L << j) else s)
    }
    val texts = Seq("the quick brown fox", "  spaced   out  tokens ", "single", "")
    val got = spark.sql(
      texts.map(t => s"SELECT graft_simhash64('${t}') s").mkString(" UNION ALL "))
      .collect().map(_.getLong(0))
    assert(got.toSeq === texts.map(refSimhash))
    // and the Column API is the same expression (no interpreted HOFs): the
    // physical plan of a simhash projection must stay whole-stage codegen'd
    import spark.implicits._
    // repartition blocks local-relation constant folding so the projection
    // actually runs on executors and the codegen assertion is meaningful
    val df = texts.toDF("text").repartition(2)
      .select(Dedup.simhash64(org.apache.spark.sql.functions.col("text")).as("sig"))
    assert(df.collect().map(_.getLong(0)).sorted.toSeq ===
      texts.map(refSimhash).sorted)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expected whole-stage codegen, got:\n$plan")
  }

  test("graft_validate runs the full row core from SQL and stays codegen'd") {
    GraftExtensions.register(spark)
    val schema =
      """{"type":"object","required":["id"],
        |"properties":{"id":{"type":"string","pattern":"^doc-[0-9]+$"},
        |"n":{"type":"integer","minimum":0}}}""".stripMargin.replace("\n", "")
    val docs = Seq(
      """{"id":"doc-1","n":3}""",        // valid
      """{"id":"nope","n":-2}""",        // pattern + minimum violations
      """{"n":1}""",                     // required violation
      """{"id":"doc-2","n":"x"}""",      // type violation
      """not json at all""")             // parse violation, not a job failure
    import spark.implicits._
    // repartition blocks local-relation constant folding so the projection
    // actually runs on executors and the codegen assertion is meaningful
    val df = docs.toDF("doc").repartition(2)
      .selectExpr("doc", s"graft_validate(doc, '$schema') AS v")
      .selectExpr("doc", "v.valid AS valid", "v.violations AS violations")
    val got = df.collect().map(r => r.getString(0) ->
      (r.getBoolean(1), r.getSeq[org.apache.spark.sql.Row](2)
        .map(v => (v.getString(0), v.getString(1))).sorted)).toMap
    // differential vs the row core called directly
    docs.foreach { d =>
      val expect =
        try {
          val res = graft.validate.Validator.validate(schema, d)
          (res.valid, RowValidator.leafErrors(res.errors)
            .map(v => (v.path, v.keyword)).sorted)
        } catch { case _: Exception => (false, Vector(("", "parse"))) }
      assert(got(d)._1 === expect._1, s"valid mismatch for $d")
      assert(got(d)._2.toVector === expect._2.toVector, s"violations mismatch for $d")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expected whole-stage codegen, got:\n$plan")
  }

  test("graft_validate with a schema COLUMN dispatches per row") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val wantInt = """{"type":"integer"}"""
    val wantStr = """{"type":"string"}"""
    val rows = Seq(("1", wantInt), ("1", wantStr), ("\"x\"", wantStr), ("\"x\"", wantInt))
    val got = rows.toDF("doc", "schema").repartition(2)
      .selectExpr("doc", "schema", "graft_validate(doc, schema).valid AS valid")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(2)).toMap
    assert(got(("1", wantInt)) && !got(("1", wantStr)))
    assert(got(("\"x\"", wantStr)) && !got(("\"x\"", wantInt)))
    // and the Column API spells the same expression
    val viaColumn = Seq(("1", wantInt)).toDF("doc", "schema")
      .select(graft.engine.expressions.GraftFunctions.validateJson(
        org.apache.spark.sql.functions.col("doc"),
        org.apache.spark.sql.functions.col("schema")).getField("valid"))
      .collect()(0).getBoolean(0)
    assert(viaColumn)
  }

  test("graft_validate rejects non-string arguments at analysis time") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_validate(1, '{}')").collect()
    }
    assert(e.getMessage.contains("string") ||
      e.getCause != null && e.getCause.getMessage.contains("string"))
  }

  test("non-literal seed / format arguments fail loudly at plan time") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_hash64('x', CAST(rand() * 10 AS INT))").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getCause != null && e.getCause.getMessage.contains("integer literal"))
  }

  test("the extensions class wires every function without throwing") {
    new graft.engine.expressions.GraftExtensions()
      .apply(new org.apache.spark.sql.SparkSessionExtensions)
    assert(GraftExtensions.functions.map(_._1.funcName).sorted ===
      Seq("graft_bucket", "graft_exact_multiple_of", "graft_format_check",
        "graft_hash64", "graft_simhash64", "graft_validate"))
  }
}
