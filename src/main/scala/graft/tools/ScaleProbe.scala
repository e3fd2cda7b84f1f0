package graft.tools

import graft.engine.{DocTable, ValidationJob}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Two-parallelism scaling probe over a materialized parquet table. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val table = "/tmp/graft-bench/sf0.1-x8000"
    // materialize once
    locally {
      val s = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32).config("spark.ui.enabled", false).config("spark.sql.codegen.hugeMethodLimit", graft.engine.GraftSession.hugeMethodLimit).getOrCreate() // JIT-safe codegen cap, see GraftSession
      s.sparkContext.setLogLevel("ERROR")
      if (!new java.io.File(table, "_SUCCESS").exists())
        DocTable.docs(s, sfDir, 8000, partitions = 64).repartition(256)
          .write.mode("overwrite").parquet(table)
      s.stop()
    }
    Seq(4, 16).foreach { c =>
      val s = SparkSession.builder().master(s"local[$c]")
        .config("spark.sql.shuffle.partitions", c)
        .config("spark.ui.enabled", false).getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      def run(): Double = {
        val t0 = System.nanoTime()
        val docs = s.read.parquet(table)
        ValidationJob.withVerdicts(s, docs, DocTable.docSchemaJson)
          .agg(count(lit(1)), sum(when(col("valid"), 0L).otherwise(1L))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      run(); val t = (1 to 3).map(_ => run()).min
      println(f"cores=$c%2d  secs=$t%.2f  docs/sec=${40000000 / t}%.0f")
      s.stop()
    }
  }
}
