package graft.tools

import graft.engine.{Dedup, Pipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic: per-stage wall time of the q_curate_assign chain. */
object CurateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").config("spark.sql.codegen.hugeMethodLimit", graft.engine.GraftSession.hugeMethodLimit).getOrCreate() // JIT-safe codegen cap, see GraftSession
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[curate-probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val d = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
      val corpus = d
        .unionByName(Seq((-999L, "buy now " * 30)).toDF("doc_id", "text"))
        .unionByName(d.where(col("doc_id") % 40 === 0)
          .withColumn("doc_id", -col("doc_id") - 1000000))
      val verdicts = Pipeline.qualityVerdictsWithText(corpus, "doc_id", "text")
      time("verdicts.count")(verdicts.count())
      val kept = verdicts.where(col("keep")).select("doc_id", "text")
      time("kept.count")(kept.count())
      val clusters = Dedup.keepBest(kept, "doc_id", "text")
      time("clusters.count")(clusters.count())
      val canon = kept.join(
        clusters.select(col("keep_id").as("doc_id")), Seq("doc_id"), "left_semi")
      time("canon.count")(canon.count())
      val curated = Pipeline.withSplit(canon, "doc_id")
      time("curated.count")(curated.count())
      time("curated.orderBy.collect")(
        curated.select("doc_id", "bucket", "split").orderBy("doc_id").collect())
      time("full chain via curate")(
        Pipeline.curate(corpus, "doc_id", "text", budget = 512, buckets = 32)
          .curated.select("doc_id", "bucket", "split").orderBy("doc_id").count())
    }
    spark.stop()
  }
}
