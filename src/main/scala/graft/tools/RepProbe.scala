package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.{Pipeline, TextOps}

/** Dev diagnostic for the JIT compile-order hazard PipeBench documents:
  * measures qualityFilter / repetitionSignals throughput solo vs after
  * other pipeline ops have run in the same JVM. Modes (env
  * SPARK_GRAFT_PROBE_MODE): solo (default), afterpack, afterpackrelease,
  * aftersplitmix, qualfirst (warm quality, run pack, re-measure —
  * demonstrates immunity), afterwarm, pipebench. Measured on this box,
  * ×100 corpus, local[32]: solo 146-172k docs/s; afterpack 50k (3.4×);
  * afterpackrelease 63k (cache release does NOT recover); aftersplitmix
  * 136k (clean); qualfirst 172k before AND after pack (pre-warming
  * immunizes) — i.e. profile pollution of shared framework call sites at
  * first JIT compile, not a plan or cache effect. */
object RepProbe {
  def main(args: Array[String]): Unit = {
    val rep = sys.env.getOrElse("SPARK_GRAFT_DEDUP_REPLICATE", "1000").toInt
    val mode = sys.env.getOrElse("SPARK_GRAFT_PROBE_MODE", "solo")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false").config("spark.sql.codegen.hugeMethodLimit", graft.engine.GraftSession.hugeMethodLimit).getOrCreate() // JIT-safe codegen cap, see GraftSession
    spark.sparkContext.setLogLevel("WARN")
    val table = graft.DedupBench.corpusTable(spark, "/root/testdata/sf0.1", rep)
    val docs = spark.read.parquet(table)
      .withColumn("source", concat(lit("src"), pmod(col("doc_id"), lit(20))))
    val n = docs.count()
    def split(): Unit = { Pipeline.splitAssign(docs, "doc_id", salt = 42).groupBy("split").count().collect(); () }
    def mix(): Unit = { Pipeline.mixtureSample(docs, "doc_id", "source", rates = Map("src0" -> 0.25, "src1" -> 0.0), defaultRate = 0.8).agg(count(lit(1))).collect(); () }
    def pack(): Unit = { Pipeline.packChunks(docs, "doc_id", "text", budget = 2048, buckets = 256).agg(count(lit(1)), max("last_seq")).collect(); () }
    def quality(): Unit = { Pipeline.qualityFilter(docs, "doc_id", "text").groupBy("keep").count().collect(); () }
    def chunk(): Unit = { TextOps.chunkDocs(docs, "doc_id", "text", size = 64, overlap = 8).agg(count(lit(1)), sum("n_toks")).collect(); () }
    def repetition(): Unit = { TextOps.repetitionSignals(docs, "doc_id", "text").agg(avg("top_bigram_frac"), avg("dup_trigram_frac")).collect(); () }
    def t(f: () => Unit): Double = { val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9 }
    if (mode == "afterpack") {
      pack()
      val bq = (1 to 3).map(_ => t(quality _)).min
      println(f"[repprobe] MODE=afterpack quality x$rep best=${bq}%.2f s  ${n / bq}%.0f docs/s")
    } else if (mode == "afterpackrelease") {
      pack()
      graft.engine.Caches.releaseAll()
      val bq = (1 to 3).map(_ => t(quality _)).min
      println(f"[repprobe] MODE=afterpackrelease quality x$rep best=${bq}%.2f s  ${n / bq}%.0f docs/s")
    } else if (mode == "aftersplitmix") {
      split(); mix()
      val bq = (1 to 3).map(_ => t(quality _)).min
      println(f"[repprobe] MODE=aftersplitmix quality x$rep best=${bq}%.2f s  ${n / bq}%.0f docs/s")
    } else if (mode == "qualfirst") {
      quality()
      val b0 = (1 to 3).map(_ => t(quality _)).min
      println(f"[repprobe] MODE=qualfirst pre-pack  quality x$rep best=${b0}%.2f s  ${n / b0}%.0f docs/s")
      pack()
      val bq = (1 to 3).map(_ => t(quality _)).min
      println(f"[repprobe] MODE=qualfirst post-pack quality x$rep best=${bq}%.2f s  ${n / bq}%.0f docs/s")
    } else if (mode == "afterwarm") {
      split(); mix(); pack(); quality(); chunk(); repetition()
      val bq = (1 to 3).map(_ => t(quality _)).min
      println(f"[repprobe] MODE=afterwarm quality x$rep best=${bq}%.2f s  ${n / bq}%.0f docs/s")
    } else if (mode == "pipebench") {
      // exactly PipeBench's sequence up to the quality measurement
      split(); mix(); pack(); quality(); chunk(); repetition() // warm-up
      (1 to 3).foreach(_ => t(split _)); (1 to 3).foreach(_ => t(mix _)); (1 to 3).foreach(_ => t(pack _))
      val bq = (1 to 3).map(_ => t(quality _)).min
      println(f"[repprobe] MODE=pipebench quality x$rep best=${bq}%.2f s  ${n / bq}%.0f docs/s")
      val br = { (1 to 3).foreach(_ => t(chunk _)); (1 to 3).map(_ => t(repetition _)).min }
      println(f"[repprobe] MODE=pipebench repetition x$rep best=${br}%.2f s  ${n / br}%.0f docs/s")
    } else {
      quality(); val bq = (1 to 3).map(_ => t(quality _)).min
      println(f"[repprobe] MODE=solo quality x$rep best=${bq}%.2f s  ${n / bq}%.0f docs/s")
      repetition(); val br = (1 to 3).map(_ => t(repetition _)).min
      println(f"[repprobe] MODE=solo repetition x$rep best=${br}%.2f s  ${n / br}%.0f docs/s")
    }
    spark.stop()
  }
}
