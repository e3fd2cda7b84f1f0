package graft

import graft.engine.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ANN throughput at replicated scale (closes the round-2 "ANN latency"
  * question with data): the per-query bench times at sf0.1 are fixed-cost
  * dominated because `embeddings` is only 2,000 rows, so this bench
  * replicates it ×N (default 1,000 → 2M vectors, each replica
  * deterministically perturbed so replicas are NOT near-duplicates of the
  * original) and measures `annTopK` and `cosineNearDups` end-to-end at two
  * parallelism levels. Prints one JSON line with vectors/sec per level and
  * the N→4N efficiency; results are committed to BASELINE.md.
  */
object AnnBench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-annbench-$cpus")
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

  /** splitmix64-style mix for the perturbation (aperiodic in (k, i) — a
    * short-period pattern would make distinct replicas IDENTICAL, blowing
    * the near-dup output up to replicate²-scale). */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z ^= (z >>> 30); z *= 0xbf58476d1ce4e5b9L
    z ^= (z >>> 27); z *= 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Materialize the scaled corpus once (untimed setup): the sf table's
    * 2,000 originals (k = 0) plus (replicate−1) × 2,000 deterministic
    * pseudo-random direction vectors. Random directions keep pairwise
    * cosine near 0, so SRP buckets stay uniform (~n/2^bits) and the bench
    * measures the operator's real candidate-stage throughput — a corpus of
    * 1,000 mutual near-duplicates per vector would instead measure an
    * inherently quadratic output, which no bucketing can (or should) avoid. */
  private def corpusTable(spark: SparkSession, sfDir: String, replicate: Int): String = {
    val path = s"/tmp/graft-annbench/${new java.io.File(sfDir).getName}-x$replicate-v2"
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      import spark.implicits._
      val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id").cast("long"), col("embedding").cast("array<float>"))
        .as[(Long, Array[Float])].collect()
      spark.sparkContext.parallelize(0 until replicate, 128)
        .flatMap { k =>
          base.iterator.map { case (id, vec) =>
            if (k == 0) (id, vec)
            else {
              val out = new Array[Float](vec.length)
              var i = 0
              while (i < vec.length) {
                out(i) = ((mix(k.toLong * 1048573L + id * 131L + i) & 2047L) - 1024L) / 1024.0f
                i += 1
              }
              (id + k.toLong * 1000000L, out)
            }
          }
        }
        .toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicate = sys.env.getOrElse("SPARK_GRAFT_ANN_REPLICATE", "1000").toInt
    // one JVM per op for trustworthy numbers — the JIT compile-order hazard
    // (PipeBench) applies here too: drive with
    //   for op in ann neardup semdedup ivf; do
    //     SPARK_GRAFT_ANN_OPS=$op SPARK_GRAFT_ANN_OUT=/tmp/ann_$op.json sbt "runMain graft.AnnBench"
    //   done
    // and merge the JSON fragments.
    val opsWanted = sys.env.getOrElse("SPARK_GRAFT_ANN_OPS",
      "ann,neardup,semdedup,embeddecon,ivf").split(",").map(_.trim).toSeq
    val levelsWanted = sys.env.getOrElse("SPARK_GRAFT_ANN_LEVELS", "32,16,8,4")
      .split(",").map(_.trim.toInt).toSeq
    val outPath = sys.env.getOrElse("SPARK_GRAFT_ANN_OUT", "ann_bench_out.json")
    val setup = session(32)
    val table = corpusTable(setup, sfDir, replicate)
    val n = setup.read.parquet(table).count()
    setup.stop()

    def run(cpus: Int): Map[String, Double] = {
      val s = session(cpus)
      try {
        val corpus = s.read.parquet(table)
        val queries = corpus.where(col("vec_id") < 5)
        val ops: Seq[(String, () => Double)] = Seq(
          "ann" -> (() => time {
            Similarity.annTopK(corpus, queries, k = 10, bits = 16).count()
          }),
          "neardup" -> (() => time {
            Similarity.cosineNearDups(corpus, threshold = 0.995, bits = 16,
              maxBucket = 4096).count()
          }),
          // semDedup = the near-dup pair stage + one verdict join-back; its
          // delta over neardup is the cost of turning pairs into kept flags
          "semdedup" -> (() => time {
            Similarity.semDedup(corpus, threshold = 0.995, bits = 16,
              maxBucket = 4096)
              .agg(count(lit(1)), sum(when(col("kept"), 0L).otherwise(1L)))
              .collect()
          }),
          // embedding decontam: ~1/97 of the corpus, rescaled, plays the
          // benchmark; the probe side is the full replicated corpus
          "embeddecon" -> (() => time {
            val bench = corpus.where(col("vec_id") % 97 === 13)
              .withColumn("embedding",
                org.apache.spark.sql.functions.transform(
                  col("embedding"), x => x * lit(1.0005f)))
            Similarity.embedDecontam(corpus, bench, threshold = 0.995,
              bits = 16, maxBucket = 4096).count()
          }))
        ops.filter(o => opsWanted.contains(o._1)).map { case (name, f) =>
          f() // warm-up (codegen + JIT)
          name -> (1 to 3).map(_ => f()).min
        }.toMap
      } finally s.stop()
    }

    // highest level first so every level sees an equally JIT-warm JVM
    val timedOps = Seq("ann", "neardup", "semdedup", "embeddecon").filter(opsWanted.contains)
    val levels: Map[Int, Map[String, Double]] =
      if (timedOps.isEmpty) Map.empty
      else levelsWanted.sorted(Ordering[Int].reverse).map(c => c -> run(c)).toMap

    // -- IVF recall-vs-nProbe curve at full corpus scale -------------------
    // exact top-10 (brute force over all n vectors) is the ground truth;
    // each probe width re-runs the full ivfTopK pipeline (train + assign +
    // probe join), so `secs` is the end-to-end cost of that operating point
    // and `recall` the fraction of true neighbors it returns — the
    // measured trade-off a 10^12-vector deployment tunes nProbe against.
    val ivfCurve = if (!opsWanted.contains("ivf")) Seq.empty else {
      val s = session(32)
      try {
        val corpus = s.read.parquet(table)
        val queries = corpus.where(col("vec_id") < 5)
        val exact = Similarity.bruteForceTopK(corpus, queries, 10).collect()
          .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
          .map { case (q, rows) => q -> rows.map(_._2).toSet }
        Seq(1, 2, 4, 8, 16, 32, 64).map { p =>
          val t0 = System.nanoTime()
          val got = Similarity.ivfTopK(corpus, queries, k = 10,
              nlist = 64, nProbe = p).collect()
            .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
            .map { case (q, rows) => q -> rows.map(_._2).toSet }
          val secs = (System.nanoTime() - t0) / 1e9
          val recall = exact.map { case (q, truth) =>
            got.getOrElse(q, Set.empty[Long]).intersect(truth).size.toDouble / truth.size
          }.sum / exact.size
          (p, recall, secs)
        }
      } finally s.stop()
    }
    val ivfJson = ivfCurve.map { case (p, r, secs) =>
      s"""{"nProbe":$p,"recall":${f"$r%.3f"},"secs":${f"$secs%.2f"}}"""
    }.mkString("[", ",", "]")

    val perLevel = for {
      c <- levelsWanted.sorted(Ordering[Int].reverse); op <- timedOps
      secs <- levels(c).get(op)
    } yield s""""${op}_secs_local$c":${f"$secs%.2f"},"${op}_vecs_per_sec_local$c":${f"${n / secs}%.0f"}"""
    def eff(op: String, lo: Int, hi: Int): Option[String] = for {
      a <- levels.get(lo).flatMap(_.get(op)); b <- levels.get(hi).flatMap(_.get(op))
    } yield s""""${op}_efficiency_${lo}_to_$hi":${f"${(a / b) / (hi.toDouble / lo)}%.3f"}"""
    val effs = timedOps.flatMap(op => Seq(eff(op, 4, 16), eff(op, 8, 32)).flatten)
    val fields = Seq(s""""vectors":$n""", s""""replicate":$replicate""",
        s""""sf":"$sfDir"""") ++ perLevel ++ effs ++
      (if (opsWanted.contains("ivf")) Seq(s""""ivf_recall_curve":$ivfJson""") else Nil)
    val json = fields.mkString("{", ",", "}")
    println(json)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath), (json + "\n").getBytes("UTF-8"))
    catch { case e: Exception => System.err.println(s"[annbench] write failed: $e") }
  }
}
