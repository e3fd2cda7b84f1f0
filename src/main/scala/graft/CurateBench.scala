package graft

import graft.engine.{Caches, Dedup, Pipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end corpus-curation throughput at replicated scale: the composed
  * [[graft.engine.Pipeline.curate]] chain (quality filter → keepBest
  * canonical dedup → split assignment → train-split packing) over the
  * [[DedupBench]] corpus table, with PER-STAGE attribution and peak heap.
  *
  * One op, one JVM — the measured JIT compile-order hazard (BASELINE.md)
  * makes multi-op bench JVMs untrustworthy per-op, so the composed chain
  * gets its own main:
  * {{{
  * SPARK_GRAFT_DEDUP_REPLICATE=100 sbt "runMain graft.CurateBench"
  * }}}
  *
  * Two measurements:
  *  - stage pass: the chain unrolled (CurateProbe's shape), each stage an
  *    action over the previous stage's materialized frame — attribution.
  *  - composed pass: `Pipeline.curate` driven exactly like CurateMain
  *    (count every artifact a curation run writes) after a cache reset —
  *    the wall number a user sees, with the chain's own inter-phase
  *    barriers (kept / clusters / curated) doing the stage reuse.
  */
object CurateBench {
  private def time(f: => Any): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicate = sys.env.getOrElse("SPARK_GRAFT_DEDUP_REPLICATE", "100").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val outPath = sys.env.getOrElse("SPARK_GRAFT_CURATE_OUT", "curate_bench_out.json")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-curate-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").config("spark.sql.codegen.hugeMethodLimit", graft.engine.GraftSession.hugeMethodLimit).getOrCreate() // JIT-safe codegen cap, see GraftSession
    spark.sparkContext.setLogLevel("WARN")
    val table = DedupBench.corpusTable(spark, sfDir, replicate)
    val docs = spark.read.parquet(table)
    val n = docs.count()

    // -- stage pass (attribution): unrolled chain, each stage cached so the
    // next measures ONLY its own work --------------------------------------
    def stagePass(): Seq[(String, Double)] = {
      Caches.releaseAll()
      val verdicts = Pipeline.qualityVerdictsWithText(docs, "doc_id", "text")
      val kept = Caches.persistTracked(
        verdicts.where(col("keep")).select("doc_id", "text"))
      val tQuality = time(kept.count())
      val clusters = Caches.persistTracked(Dedup.keepBest(kept, "doc_id", "text"))
      val tCluster = time(clusters.count())
      val canon = kept.join(
        clusters.select(col("keep_id").as("doc_id")), Seq("doc_id"), "left_semi")
      val curated = Caches.persistTracked(Pipeline.withSplit(canon, "doc_id"))
      val tSplit = time(curated.groupBy("split").count().collect())
      val tPack = time(
        Pipeline.packChunks(curated.where(col("split") === "train"),
          "doc_id", "text", budget = 2048, buckets = 256)
          .agg(count(lit(1)), max("last_seq")).collect())
      Seq("quality" -> tQuality, "keepbest" -> tCluster,
        "split" -> tSplit, "pack" -> tPack)
    }

    // -- composed pass: what CurateMain executes (every artifact counted) --
    def composedPass(): Double = {
      Caches.releaseAll()
      time {
        val run = Pipeline.curate(docs, "doc_id", "text",
          budget = 2048, buckets = 256)
        run.quality.groupBy("keep").count().collect()
        run.clusters.agg(count(lit(1)), sum("n_members")).collect()
        run.curated.groupBy("split").count().collect()
        run.packed.agg(count(lit(1)), max("last_seq")).collect()
      }
    }

    stagePass(); composedPass() // warm-up (generated-class compilation)
    val stages = stagePass()
    val composed = (1 to 2).map(_ => composedPass()).min
    Caches.releaseAll()
    import scala.jdk.CollectionConverters._
    val peakHeap = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
      .asScala.filter(_.getType == java.lang.management.MemoryType.HEAP)
      .map(_.getPeakUsage.getUsed).sum
    val stageJson = stages
      .map { case (k, v) => s""""stage_${k}_sec":${f"$v%.2f"}""" }.mkString(",")
    val json =
      s"""{"docs":$n,"replicate":$replicate,"sf":"$sfDir","cpus":$cpus,""" +
      stageJson + "," +
      s""""stage_total_sec":${f"${stages.map(_._2).sum}%.2f"},""" +
      s""""composed_sec":${f"$composed%.2f"},""" +
      s""""composed_docs_per_sec":${f"${n / composed}%.0f"},""" +
      // 1dp double, not truncating integer division — a 0.9 GB peak must
      // not report as 0 (per-pool peaks are summed, so this reads as an
      // upper bound: pools may peak at different instants)
      s""""peak_heap_gb":${f"${peakHeap / (1L << 30).toDouble}%.1f"}}"""
    println(json)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath), (json + "\n").getBytes("UTF-8"))
    catch { case e: Exception => System.err.println(s"[curatebench] write failed: $e") }
    spark.stop()
  }
}
