package graft.tools

import graft.engine.Pipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic: generated-method sizes of the slow (where-keep) vs fast
  * (select-keep) quality plans — tests the JIT huge-method hypothesis. */
object KeepCodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").config("spark.sql.codegen.hugeMethodLimit", graft.engine.GraftSession.hugeMethodLimit).getOrCreate() // JIT-safe codegen cap, see GraftSession
    spark.sparkContext.setLogLevel("WARN")
    val table = graft.DedupBench.corpusTable(spark, "/root/testdata/sf0.1", 1)
    val docs = spark.read.parquet(table)
    import org.apache.spark.sql.execution.debug._
    def maxSizes(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val sizes = df.queryExecution.debug.codegenToSeq().map { case (_, code, stats) =>
        (stats.maxMethodCodeSize, code.length)
      }
      println(s"[codegen-probe] $name maxMethodCodeSize/codeLen per WSCG: " +
        sizes.map { case (m, l) => s"$m/$l" }.mkString(" "))
    }
    maxSizes("where(keep)",
      Pipeline.qualityVerdictsWithText(docs, "doc_id", "text")
        .where(col("keep")).select("doc_id", "text"))
    maxSizes("select(keep)",
      Pipeline.qualityVerdictsWithText(docs, "doc_id", "text")
        .select("keep"))
    maxSizes("filter-shape (qualityFilter→groupBy)",
      Pipeline.qualityFilter(docs, "doc_id", "text").groupBy("keep").count())
    spark.stop()
  }
}
