package graft.tools

import graft.engine.Pipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic: why does curate's quality+keep stage run ~10× slower
  * than the output-pruned qualityFilter on the same table? Bisects the
  * output shape of the SAME verdict computation. Run:
  * SPARK_GRAFT_CPUS=N sbt "runMain graft.tools.KeepProbe [replicate]". */
object KeepProbe {
  def main(args: Array[String]): Unit = {
    val replicate = args.headOption.map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").config("spark.sql.codegen.hugeMethodLimit", graft.engine.GraftSession.hugeMethodLimit).getOrCreate() // JIT-safe codegen cap, see GraftSession
    spark.sparkContext.setLogLevel("WARN")
    val table = graft.DedupBench.corpusTable(spark, "/root/testdata/sf0.1", replicate)
    val docs = spark.read.parquet(table)
    val n = docs.count()
    def time(name: String)(f: => Any): Unit = {
      f // warm
      val t0 = System.nanoTime(); f; val s = (System.nanoTime() - t0) / 1e9
      println(f"[keep-probe] $name%-34s $s%8.2f s  (${n / s}%.0f docs/s)")
      graft.engine.Caches.releaseAll()
    }
    time("filter:keep-only (PipeBench shape)") {
      Pipeline.qualityFilter(docs, "doc_id", "text").groupBy("keep").count().collect()
    }
    time("verdicts.where(keep).count") {
      Pipeline.qualityVerdictsWithText(docs, "doc_id", "text")
        .where(col("keep")).count()
    }
    time("chain: where.select(id,text).count") {
      Pipeline.qualityVerdictsWithText(docs, "doc_id", "text")
        .where(col("keep")).select("doc_id", "text").count()
    }
    time("chain+cache (curate shape)") {
      // drop the warm run's cache FIRST — otherwise Spark's CacheManager
      // matches the identical logical plan and this times a cache HIT,
      // underreporting exactly the shape under investigation
      graft.engine.Caches.releaseAll()
      graft.engine.Caches.persistTracked(
        Pipeline.qualityVerdictsWithText(docs, "doc_id", "text")
          .where(col("keep")).select("doc_id", "text")).count()
    }
    time("where.select(id) only") {
      Pipeline.qualityVerdictsWithText(docs, "doc_id", "text")
        .where(col("keep")).select("doc_id").count()
    }
    time("select(keep) no filter") {
      Pipeline.qualityVerdictsWithText(docs, "doc_id", "text")
        .select("keep").groupBy("keep").count().collect()
    }
    spark.stop()
  }
}
