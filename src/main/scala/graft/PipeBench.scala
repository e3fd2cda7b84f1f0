package graft

import graft.engine.Pipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus-assembly throughput at replicated scale: the [[DedupBench]]
  * corpus (documents ×N, fresh-word replicas) pushed through splitAssign,
  * mixtureSample, packChunks and qualityFilter at several parallelism
  * levels — the two-cluster-size scaling evidence for the Pipeline module,
  * committed to BASELINE.md like the validation and ANN sweeps. */
object PipeBench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-pipebench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus * 2)
      .config("spark.ui.enabled", "false")
      // engine-wide tuning (JIT-safe codegen cap) — see graft.engine.GraftSession
      .config("spark.sql.codegen.hugeMethodLimit", graft.engine.GraftSession.hugeMethodLimit)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[T](f: => T): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicate = sys.env.getOrElse("SPARK_GRAFT_DEDUP_REPLICATE", "100").toInt
    // JIT compile-order hazard (measured): an op whose generated hot loop
    // first compiles AFTER another op's has run in the same JVM can stay
    // ~3× slower for the JVM's lifetime (qualityFilter after packChunks:
    // 172k → 50k docs/s; immune when warmed first — profile pollution of
    // shared framework call sites, not a plan difference). Trustworthy
    // per-op numbers therefore need one JVM per op:
    //   for op in split mix pack quality chunk repetition: \
    //     SPARK_GRAFT_PIPE_OPS=$op SPARK_GRAFT_PIPE_OUT=/tmp/pipe_$op.json \
    //     sbt "runMain graft.PipeBench"
    // and merge the fragments. The default (all ops, one JVM) is kept for
    // quick relative runs.
    val opsWanted = sys.env.getOrElse("SPARK_GRAFT_PIPE_OPS",
      "split,mix,pack,quality,chunk,repetition,linescrub,dsir,ppl,caps,hh")
      .split(",").map(_.trim).toSeq
    val outPath = sys.env.getOrElse("SPARK_GRAFT_PIPE_OUT", "pipe_bench_out.json")
    // per-LEVEL isolation for the same reason: levels after the first in a
    // shared JVM re-fuse new generated classes against already-polluted
    // profiles; one JVM per (op, level) is the fully clean measurement
    val levelsWanted = sys.env.getOrElse("SPARK_GRAFT_PIPE_LEVELS", "32,16,8,4")
      .split(",").map(_.trim.toInt).toSeq
    val setup = session(32)
    val table = DedupBench.corpusTable(setup, sfDir, replicate)
    val n = setup.read.parquet(table).count()
    setup.stop()

    def run(cpus: Int): Map[String, Double] = {
      val s = session(cpus)
      try {
        // synthesize a source column (the replicated table carries id+text)
        val docs = s.read.parquet(table)
          .withColumn("source", concat(lit("src"), pmod(col("doc_id"), lit(20))))
        def split(): Double = time {
          Pipeline.splitAssign(docs, "doc_id", salt = 42)
            .groupBy("split").count().collect()
        }
        def mix(): Double = time {
          Pipeline.mixtureSample(docs, "doc_id", "source",
            rates = Map("src0" -> 0.25, "src1" -> 0.0), defaultRate = 0.8)
            .agg(count(lit(1))).collect()
        }
        def pack(): Double = time {
          Pipeline.packChunks(docs, "doc_id", "text", budget = 2048, buckets = 256)
            .agg(count(lit(1)), max("last_seq")).collect()
        }
        def quality(): Double = time {
          Pipeline.qualityFilter(docs, "doc_id", "text")
            .groupBy("keep").count().collect()
        }
        def chunk(): Double = time {
          graft.engine.TextOps.chunkDocs(docs, "doc_id", "text", size = 64, overlap = 8)
            .agg(count(lit(1)), sum("n_toks")).collect()
        }
        def repetition(): Double = time {
          graft.engine.TextOps.repetitionSignals(docs, "doc_id", "text")
            .agg(avg("top_bigram_frac"), avg("dup_trigram_frac")).collect()
        }
        // the replicated corpus has no newlines — inject the same
        // header/footer chrome shape the oracled query uses, so the bench
        // exercises the full explode → frequency → join → rebuild path
        def linescrub(): Double = time {
          val multi = docs.select(col("doc_id"),
            when(pmod(col("doc_id"), lit(3)) === 0,
              concat(lit("subscribe to our newsletter\n"), col("text"),
                lit("\nall rights reserved")))
              .when(pmod(col("doc_id"), lit(3)) === 1,
                concat(col("text"), lit("\nall rights reserved")))
              .otherwise(col("text")).as("text"))
          graft.engine.Dedup.scrubBoilerplateLines(multi, "doc_id", "text", minDocs = 50)
            .agg(count(lit(1)), sum("n_removed")).collect()
        }
        def dsir(): Double = time {
          Pipeline.importanceResample(docs,
              docs.where(pmod(col("doc_id"), lit(20)) === 0),
              "doc_id", "text", buckets = 512)
            .agg(count(lit(1)),
              sum(when(col("selected"), 1L).otherwise(0L))).collect()
        }
        def ppl(): Double = time {
          Pipeline.lmPerplexity(docs,
              docs.where(pmod(col("doc_id"), lit(20)) === 0),
              "doc_id", "text", buckets = 128)
            .agg(count(lit(1)), avg("ppl")).collect()
        }
        // per-source caps under REAL skew: half the corpus on one host —
        // the exact shape the two-phase salted window exists for (a plain
        // per-source window would sort n/2 rows in ONE partition)
        def caps(): Double = time {
          val skewed = docs.select(col("doc_id"), col("text"),
            when(pmod(col("doc_id"), lit(4)) < 2, lit("bighost"))
              .otherwise(concat(lit("src"), pmod(col("doc_id"), lit(1000))))
              .as("source"))
            .withColumn("prio", length(col("text")))
          Pipeline.capPerSource(skewed, "doc_id", "source", "prio",
              maxPerSource = 10000, salts = 64)
            .agg(count(lit(1)), countDistinct("source")).collect()
        }
        // Misra-Gries heavy hitters over the same skewed key column: ONE
        // partial-aggregable pass, no key-space shuffle
        def hh(): Double = time {
          val skewed = docs.select(
            when(pmod(col("doc_id"), lit(4)) < 2, lit("bighost"))
              .otherwise(concat(lit("src"), pmod(col("doc_id"), lit(1000))))
              .as("source"))
          graft.engine.TypedAggregators.heavyHitters(skewed, "source", capacity = 64)
            .agg(count(lit(1)), max("est_count")).collect()
        }
        val all: Seq[(String, () => Double)] = Seq(
          "split" -> (split _), "mix" -> (mix _), "pack" -> (pack _),
          "quality" -> (quality _), "chunk" -> (chunk _),
          "repetition" -> (repetition _), "linescrub" -> (linescrub _),
          "dsir" -> (dsir _), "ppl" -> (ppl _), "caps" -> (caps _),
          "hh" -> (hh _))
        val selected = all.filter { case (name, _) => opsWanted.contains(name) }
        selected.foreach { case (_, op) => op() } // warm-up (selected only)
        selected.map { case (name, op) =>
          name -> (1 to 3).map(_ => op()).min
        }.toMap
      } finally s.stop()
    }

    val levels = levelsWanted.map(c => c -> run(c)).toMap
    val ops = Seq("split", "mix", "pack", "quality", "chunk", "repetition",
      "linescrub", "dsir", "ppl", "caps", "hh").filter(opsWanted.contains)
    val json =
      s"""{"docs":$n,"replicate":$replicate,"sf":"$sfDir",""" +
      levelsWanted.flatMap { c =>
        ops.map(op => s""""${op}_docs_per_sec_local$c":${f"${n / levels(c)(op)}%.0f"}""")
      }.mkString(",") + "," +
      (if (levelsWanted.contains(4) && levelsWanted.contains(16))
        ops.map(op =>
          s""""${op}_efficiency_4_to_16":${f"${(levels(4)(op) / levels(16)(op)) / 4.0}%.3f"}""")
          .mkString(",")
      else s""""levels":"${levelsWanted.mkString("/")}"""") + "}"
    println(json)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath), (json + "\n").getBytes("UTF-8"))
    catch { case e: Exception => System.err.println(s"[pipebench] write failed: $e") }
  }
}
