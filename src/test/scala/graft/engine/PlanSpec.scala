package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the shapes BASELINE.md claims must actually be
  * the plans Catalyst picks. These are the 100 TB guarantees — a regression
  * here (a surprise shuffle, a lost broadcast, a widened scan schema) is a
  * scale bug even when results stay correct. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("compiled validation is a shuffle-free narrow projection over the scan") {
    val docs = DocTable.docs(spark, sfDir)
    val verdicts = ValidationJob.withVerdicts(spark, docs, DocTable.docSchemaJson)
    val plan = physical(verdicts)
    assert(!plan.contains("Exchange"), s"validation must not shuffle:\n${plan.take(600)}")
    assert(!plan.contains("DeserializeToObject"),
      "doc schema must compile to Columns, not fall back to the row core")
  }

  test("referential check broadcasts the catalog side") {
    val refs = DocTable.docs(spark, sfDir)
      .select(explode(col("spans")).as("span"))
      .select(col("span.media_ref").as("media_ref"))
    val plan = physical(Checks.danglingRefs(refs, "media_ref",
      DocTable.mediaCatalog(spark), "media_ref"))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"catalog side must broadcast:\n${plan.take(600)}")
    assert(plan.contains("LeftAnti"), "dangling refs = anti join")
  }

  test("column selection prunes the parquet read schema") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), TextOps.tokenCount(coalesce(col("text"), lit(""))).as("n"))
    val scan = df.queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(scan).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"), readSchema)
    assert(!readSchema.contains("lang") && !readSchema.contains("url"),
      s"scan must not read unused columns: $readSchema")
  }

  test("filter pushdown reaches the parquet scan") {
    // fresh temp parquet: another suite may have .cache()d the shared events
    // table, which would substitute an InMemoryRelation and hide the scan
    val tmp = java.nio.file.Files.createTempDirectory("graft-pushdown").toString
    spark.read.parquet(s"$sfDir/events.parquet").write.mode("overwrite").parquet(tmp)
    val df = spark.read.parquet(tmp)
      .where(col("event_id") > 100).select("event_id", "value")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(event_id), GreaterThan(event_id,100)]") ||
      scan.contains("GreaterThan(event_id"),
      s"predicate must push to the scan:\n${scan.take(600)}")
  }

  test("whole-stage codegen covers the validation projection, with no interpreted lambdas") {
    val docs = DocTable.docs(spark, sfDir)
    val verdicts = ValidationJob.withVerdictsOnly(spark, docs, DocTable.docSchemaJson)
    val plan = physical(verdicts)
    // the Project computing `valid` must sit inside a WholeStageCodegen
    // subtree (rendered as a `*(n)` prefix) and use the vectorized
    // lambda-free array conditions, not interpreted forall()
    val validLine = plan.linesIterator.find(_.contains("AS valid")).getOrElse("")
    assert(validLine.trim.startsWith("*("),
      s"valid projection must be codegen'd: ${validLine.take(300)}")
    assert(!validLine.contains("forall("),
      s"span items must compile to vectorized array ops, not forall: ${validLine.take(300)}")
    assert(validLine.contains("array_except") || validLine.contains("array_min"),
      s"expected vectorized item conditions: ${validLine.take(300)}")
  }

  test("salted dedup pre-aggregates before the final shuffle (two-phase)") {
    val dups = Checks.duplicateKeys(DocTable.docs(spark, sfDir), "doc_id")
    val plan = physical(dups)
    // two aggregation levels: (key, salt) partials then key-level merge
    assert("HashAggregate".r.findAllIn(plan).size >= 4,
      s"expected partial+final aggregates at both phases:\n${plan.take(800)}")
  }
}
