package graft

import graft.engine.{Dedup, Pipeline, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Text-dedup throughput at replicated scale: `documents` ×N (default 100 →
  * 500k docs; each replica gets replica-specific trailing tokens so the
  * corpus isn't a degenerate all-duplicates cluster, mirroring AnnBench's
  * design), measuring the three dedup pipelines end-to-end at two-plus
  * parallelism levels. Results are committed to BASELINE.md. */
object DedupBench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-dedupbench-$cpus")
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

  private[graft] def corpusTable(spark: SparkSession, sfDir: String, replicate: Int): String = {
    val path = s"/tmp/graft-dedupbench/${new java.io.File(sfDir).getName}-x$replicate"
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      import spark.implicits._
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id").cast("long"), coalesce(col("text"), lit("")).as("text"))
        .as[(Long, String)].collect()
      spark.sparkContext.parallelize(0 until replicate, 64)
        .flatMap { k =>
          base.iterator.map { case (id, text) =>
            // k = 0 keeps the originals verbatim; other replicas are FRESH
            // pseudo-random word sequences (shared vocabulary, disjoint
            // shingles) — a suffix-mutated copy would make every same-doc
            // replica pair a TRUE near-dup, turning the bench into a
            // measurement of an inherently quadratic 25M-pair output
            // instead of pipeline throughput under a sane dup rate
            val t =
              if (k == 0) text
              else {
                val words = 40 + (id % 80).toInt
                val sb = new StringBuilder
                var p = 0
                while (p < words) {
                  var z = k.toLong * 7368787L + id * 131L + p
                  z ^= (z >>> 30); z *= 0xbf58476d1ce4e5b9L; z ^= (z >>> 27)
                  sb.append("w").append(java.lang.Long.remainderUnsigned(z, 50000L)).append(' ')
                  p += 1
                }
                sb.toString.trim
              }
            (id + k.toLong * 1000000L, t)
          }
        }
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicate = sys.env.getOrElse("SPARK_GRAFT_DEDUP_REPLICATE", "100").toInt
    // winnowPairs runs on a SMALLER replication: winnowing selects window
    // MINIMA, which biases every doc toward the globally-smallest k-gram
    // hashes, so on this synthetic high-token-reuse corpus the inverted
    // index's candidate join emits Σ min(c_f, cap)² rows that grow ~×22
    // from ×20 to ×100 replication (measured 252M → 5.6G join rows;
    // WinnowProbe) — minutes per run at ×100 regardless of parallelism.
    // 100k docs keeps the measurement in the throughput regime; the cap is
    // sized 64·minShared per the operator's documented cost model.
    val winReplicate = sys.env.getOrElse("SPARK_GRAFT_WINNOW_REPLICATE",
      math.max(1, replicate / 5).toString).toInt
    // one JVM per op (and optionally per level) for trustworthy numbers —
    // the JIT compile-order hazard PipeBench documents applies here too
    val opsWanted = sys.env.getOrElse("SPARK_GRAFT_DEDUP_OPS",
      "exact,minhash,simhash,winnow,spans,fuzzydecon").split(",").map(_.trim).toSeq
    val levelsWanted = sys.env.getOrElse("SPARK_GRAFT_DEDUP_LEVELS", "32,16,8,4")
      .split(",").map(_.trim.toInt).toSeq
    val outPath = sys.env.getOrElse("SPARK_GRAFT_DEDUP_OUT", "dedup_bench_out.json")
    val setup = session(32)
    val table = corpusTable(setup, sfDir, replicate)
    val winTable = corpusTable(setup, sfDir, winReplicate)
    val n = setup.read.parquet(table).count()
    val winN = setup.read.parquet(winTable).count()
    setup.stop()

    def run(cpus: Int): Map[String, Double] = {
      val s = session(cpus)
      try {
        val docs = s.read.parquet(table)
        val ops: Seq[(String, () => Unit)] = Seq(
          "exact" -> (() => {
            docs.select(TextOps.fingerprint(col("text")).as("f"))
              .groupBy("f").agg(count(lit(1)).as("c")).where(col("c") > 1).count()
            ()
          }),
          "minhash" -> (() => {
            Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.8,
              maxBucket = 256).count(); ()
          }),
          "simhash" -> (() => {
            Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 2,
              maxBucket = 4096).count(); ()
          }),
          "winnow" -> (() => {
            Dedup.winnowPairs(s.read.parquet(winTable), "doc_id", "text",
              minShared = 8, maxBucket = 512).count(); ()
          }),
          "spans" -> (() => {
            Dedup.dupSpans(docs, "doc_id", "text", k = 20).count(); ()
          }),
          // fuzzy decontam: ~1/101 of the corpus, lightly edited, plays the
          // benchmark; the probe side is the full replicated corpus
          "fuzzydecon" -> (() => {
            val bench = docs.where(col("doc_id") % 101 === 7)
              .withColumn("text",
                concat(col("text"), lit(" extra trailing words appended")))
            Pipeline.fuzzyDecontam(docs, bench, "doc_id", "text",
              threshold = 0.5, maxBucket = 256).count(); ()
          }))
        ops.filter { case (name, _) => opsWanted.contains(name) }
          .map { case (name, op) =>
          val warmT = time(op()) // warm
          graft.engine.Caches.releaseAll()
          System.err.println(f"[dedupbench] local[$cpus] $name warm ${warmT}%.1f s")
          name -> (1 to 3).map { i =>
            val t = time(op()); graft.engine.Caches.releaseAll()
            System.err.println(f"[dedupbench] local[$cpus] $name run$i ${t}%.1f s")
            t
          }.min
        }.toMap
      } finally s.stop()
    }

    val opNames = Seq("exact", "minhash", "simhash", "winnow", "spans", "fuzzydecon")
      .filter(opsWanted.contains)
    val levels = levelsWanted.map(c => c -> run(c)).toMap
    def opDocs(o: String): Long = if (o == "winnow") winN else n
    val json =
      s"""{"docs":$n,"replicate":$replicate,"winnow_docs":$winN,""" +
      s""""winnow_replicate":$winReplicate,"sf":"$sfDir",""" +
      levelsWanted.flatMap { c =>
        opNames.map(o =>
          s""""${o}_docs_per_sec_local$c":${f"${opDocs(o) / levels(c)(o)}%.0f"}""")
      }.mkString(",") + "," +
      (if (levelsWanted.contains(4) && levelsWanted.contains(16))
        opNames.map(o =>
          s""""${o}_efficiency_4_to_16":${f"${(levels(4)(o) / levels(16)(o)) / 4.0}%.3f"}""")
          .mkString(",")
      else s""""levels":"${levelsWanted.mkString("/")}"""") + "}"
    println(json)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath), (json + "\n").getBytes("UTF-8"))
    catch { case e: Exception => System.err.println(s"[dedupbench] write failed: $e") }
  }
}
