package graft.tools

import graft.engine.{Pipeline, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic: which stage of qualityFilter dominates, at which
  * parallelism. Run: SPARK_GRAFT_CPUS=N sbt "runMain graft.tools.QualityProbe". */
object QualityProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").config("spark.sql.codegen.hugeMethodLimit", graft.engine.GraftSession.hugeMethodLimit).getOrCreate() // JIT-safe codegen cap, see GraftSession
    spark.sparkContext.setLogLevel("WARN")
    val table = graft.DedupBench.corpusTable(spark, "/root/testdata/sf0.1", 100)
    val docs = spark.read.parquet(table)
    def time(name: String)(f: => Any): Unit = {
      f // warm
      val t0 = System.nanoTime(); f; val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-28s $s%8.2f s  (${500000 / s}%.0f docs/s)")
    }
    val text = coalesce(col("text"), lit(""))
    time("scan-only") {
      docs.agg(count(lit(1)), sum(length(text))).collect()
    }
    time("repetition-typed-only") {
      import spark.implicits._
      docs.select(col("doc_id"), text.as("t")).as[(Long, String)]
        .mapPartitions(_.map { case (id, t) => (id, TextOps.topBigramFrac(t)) })
        .toDF("doc_id", "f").agg(sum("f")).collect()
    }
    time("quality-columns-only") {
      val q = TextOps.qualityColumns(text).toMap
      docs.select(q("alpha_ratio").as("a"), q("digit_ratio").as("d"),
          q("mean_word_len").as("m"))
        .agg(sum("a"), sum("d"), sum("m")).collect()
    }
    time("langid-only") {
      docs.select(TextOps.langId(text).as("l")).groupBy("l").count().collect()
    }
    time("tokencount-only") {
      docs.select(TextOps.tokenCount(text).as("t")).agg(sum("t")).collect()
    }
    time("full-qualityFilter") {
      Pipeline.qualityFilter(docs, "doc_id", "text").groupBy("keep").count().collect()
    }
    // bisect: rules WITHOUT the typed repetition stage
    time("rules-only-no-rep") {
      import spark.implicits._
      val withRep = docs.select(col("doc_id"), text.as("text"))
        .withColumn("top_bigram_frac", lit(0.0))
      val q = TextOps.qualityColumns(col("text")).toMap
      val base = withRep.select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("tokens"),
        q("alpha_ratio").as("alpha_ratio"), q("digit_ratio").as("digit_ratio"),
        q("mean_word_len").as("mean_word_len"),
        TextOps.langId(col("text")).as("lang_id"),
        col("top_bigram_frac"))
      base.groupBy(col("tokens") < 10).count().collect()
    }
    // bisect: typed stage + a single regex column on top
    time("typed-plus-one-regex") {
      import spark.implicits._
      val withRep = docs.select(col("doc_id"), text.as("t")).as[(Long, String)]
        .mapPartitions(_.map { case (id, t) => (id, t, TextOps.topBigramFrac(t)) })
        .toDF("doc_id", "text", "top_bigram_frac")
      val q = TextOps.qualityColumns(col("text")).toMap
      withRep.select(q("alpha_ratio").as("a")).agg(sum("a")).collect()
    }
    // all rule inputs over the scan, NO pruning (aggregate every column)
    time("all-rule-cols-over-scan") {
      val q = TextOps.qualityColumns(text).toMap
      docs.select(TextOps.tokenCount(text).as("tokens"),
          q("alpha_ratio").as("a"), q("digit_ratio").as("d"),
          q("mean_word_len").as("m"), TextOps.langId(text).as("l"))
        .groupBy("l").agg(sum("tokens"), sum("a"), sum("d"), sum("m")).collect()
    }
    // full rules over the typed stage's output, repetition included
    locally {
      import spark.implicits._
      val cached = docs.select(col("doc_id"), text.as("t")).as[(Long, String)]
        .mapPartitions(_.map { case (id, t) => (id, t, TextOps.topBigramFrac(t)) })
        .toDF("doc_id", "text", "top_bigram_frac")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached.count()
      time("rules-over-cached-typed") {
        val q = TextOps.qualityColumns(col("text")).toMap
        cached.select(TextOps.tokenCount(col("text")).as("tokens"),
            q("alpha_ratio").as("a"), q("digit_ratio").as("d"),
            q("mean_word_len").as("m"), TextOps.langId(col("text")).as("l"),
            col("top_bigram_frac"))
          .groupBy("l").agg(sum("tokens"), sum("a"), sum("d"), sum("m"),
            sum("top_bigram_frac")).collect()
      }
      val q2 = TextOps.qualityColumns(col("text")).toMap
      time("typed-cache/simple") {
        cached.select(TextOps.tokenCount(col("text")).as("tokens"),
            q2("alpha_ratio").as("a"))
          .agg(sum("tokens"), sum("a")).collect()
      }
      time("typed-cache/rules-no-tbf") {
        cached.select(TextOps.tokenCount(col("text")).as("tokens"),
            q2("alpha_ratio").as("a"), q2("digit_ratio").as("d"),
            q2("mean_word_len").as("m"), TextOps.langId(col("text")).as("l"))
          .groupBy("l").agg(sum("tokens"), sum("a"), sum("d"), sum("m")).collect()
      }
      cached.unpersist()
    }
    // control: same rules over a cached copy of the RAW scan (no typed stage)
    locally {
      val cached = docs.select(col("doc_id"), text.as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached.count()
      time("rules-over-cached-raw") {
        val q = TextOps.qualityColumns(col("text")).toMap
        cached.select(TextOps.tokenCount(col("text")).as("tokens"),
            q("alpha_ratio").as("a"), q("digit_ratio").as("d"),
            q("mean_word_len").as("m"), TextOps.langId(col("text")).as("l"))
          .groupBy("l").agg(sum("tokens"), sum("a"), sum("d"), sum("m")).collect()
      }
      val q2 = TextOps.qualityColumns(col("text")).toMap
      time("raw-cache/simple") {
        cached.select(TextOps.tokenCount(col("text")).as("tokens"),
            q2("alpha_ratio").as("a"))
          .agg(sum("tokens"), sum("a")).collect()
      }
      cached.unpersist()
    }
    spark.stop()
  }
}
