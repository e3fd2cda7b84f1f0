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
    val setup = session(32)
    val table = corpusTable(setup, sfDir, replicate)
    val n = setup.read.parquet(table).count()
    setup.stop()

    def run(cpus: Int): (Double, Double) = {
      val s = session(cpus)
      try {
        val corpus = s.read.parquet(table)
        val queries = corpus.where(col("vec_id") < 5)
        def ann(): Double = time {
          Similarity.annTopK(corpus, queries, k = 10, bits = 16).count()
        }
        def dups(): Double = time {
          Similarity.cosineNearDups(corpus, threshold = 0.995, bits = 16,
            maxBucket = 4096).count()
        }
        ann(); dups() // warm-up (codegen + JIT)
        ((1 to 3).map(_ => ann()).min, (1 to 3).map(_ => dups()).min)
      } finally s.stop()
    }

    // highest level first so every level sees an equally JIT-warm JVM
    val levels = Seq(32, 16, 8, 4).map(c => c -> run(c)).toMap
    def annS(c: Int) = levels(c)._1
    def dupS(c: Int) = levels(c)._2

    // -- IVF recall-vs-nProbe curve at full corpus scale -------------------
    // exact top-10 (brute force over all n vectors) is the ground truth;
    // each probe width re-runs the full ivfTopK pipeline (train + assign +
    // probe join), so `secs` is the end-to-end cost of that operating point
    // and `recall` the fraction of true neighbors it returns — the
    // measured trade-off a 10^12-vector deployment tunes nProbe against.
    val ivfCurve = {
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

    val json =
      s"""{"vectors":$n,"replicate":$replicate,"sf":"$sfDir",""" +
      Seq(32, 16, 8, 4).map(c =>
        s""""ann_secs_local$c":${f"${annS(c)}%.2f"},"ann_vecs_per_sec_local$c":${f"${n / annS(c)}%.0f"},""" +
        s""""neardup_secs_local$c":${f"${dupS(c)}%.2f"},"neardup_vecs_per_sec_local$c":${f"${n / dupS(c)}%.0f"}""")
        .mkString(",") + "," +
      s""""ann_efficiency_4_to_16":${f"${(annS(4) / annS(16)) / 4.0}%.3f"},""" +
      s""""ann_efficiency_8_to_32":${f"${(annS(8) / annS(32)) / 4.0}%.3f"},""" +
      s""""neardup_efficiency_4_to_16":${f"${(dupS(4) / dupS(16)) / 4.0}%.3f"},""" +
      s""""neardup_efficiency_8_to_32":${f"${(dupS(8) / dupS(32)) / 4.0}%.3f"},""" +
      s""""ivf_recall_curve":$ivfJson}"""
    println(json)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("ann_bench_out.json"), (json + "\n").getBytes("UTF-8"))
    catch { case e: Exception => System.err.println(s"[annbench] write failed: $e") }
  }
}
