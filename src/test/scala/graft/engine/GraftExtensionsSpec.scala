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
      Seq("graft_bucket", "graft_exact_multiple_of", "graft_format_check", "graft_hash64"))
  }
}
