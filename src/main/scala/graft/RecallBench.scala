package graft

import graft.engine.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured MinHash-LSH recall vs banding config at replicated scale.
  *
  * The correctness specs prove `minhashPairs` exact *given* a candidate
  * meeting in some band; what they cannot show is the probabilistic
  * candidate-generation loss of the banding itself — the S-curve
  * P(candidate | J) = 1 − (1 − J^r)^b (r = h/bands rows per band) that
  * decides which (h, bands) a 100 TB dedup run should pay for. This bench
  * measures it: a corpus of fresh pseudo-random background docs plus
  * planted twin pairs mutated at graded rates (so true Jaccard spreads
  * across [0.4, 1.0]), exact shingle-Jaccard ground truth computed
  * independently of the operator, and per-Jaccard-bin recall for each
  * banding config, with wall-time per config so the recall-vs-cost
  * trade-off is a committed table (BASELINE.md), not a formula.
  *
  * Everything is deterministic (splitmix streams keyed by doc id) — reruns
  * measure the same corpus. Recall counts are exact joins, unaffected by
  * JIT state, so configs share one JVM; the timing column follows the
  * warm + best-of-2 discipline and is secondary evidence.
  */
object RecallBench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-recallbench-$cpus")
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

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z ^= (z >>> 30); z *= 0xbf58476d1ce4e5b9L
    z ^= (z >>> 27); z *= 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def wordsOf(seed: Long, n: Int): Array[String] = {
    val out = new Array[String](n)
    var p = 0
    while (p < n) {
      out(p) = "w" + java.lang.Long.remainderUnsigned(mix(seed * 1000003L + p), 50000L)
      p += 1
    }
    out
  }

  /** Twin ids are original + this offset, so every planted pair is
    * (id, id + TwinOff) with id_a = id in the operator's (id_a < id_b)
    * orientation. */
  private val TwinOff = 1000000000L

  /** Word-substitution rates cycled over planted pairs. For rate p the
    * expected 3-shingle Jaccard is ≈ (1−p)³ / (2 − (1−p)³):
    * 0.01→0.94, 0.03→0.84, 0.06→0.71, 0.10→0.56, 0.15→0.44 — spread
    * across the bins the S-curve differentiates. */
  private val rates = Array(0.01, 0.03, 0.06, 0.10, 0.15)

  /** Background (fresh random word docs, ids 0..bg) + planted twins
    * (ids 10⁷+j and 10⁷+j+TwinOff), parquet-materialized once. */
  private[graft] def corpusTable(spark: SparkSession, bg: Int, planted: Int): String = {
    val path = s"/tmp/graft-recallbench/bg$bg-p$planted"
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      import spark.implicits._
      val bgDocs = spark.sparkContext.parallelize(0 until bg, 64).map { i =>
        (i.toLong, wordsOf(i * 31L + 5, 60 + Math.floorMod(mix(i.toLong), 80L).toInt).mkString(" "))
      }
      val twins = spark.sparkContext.parallelize(0 until planted, 32).flatMap { j =>
        val id = 10000000L + j
        val a = wordsOf(id * 31L + 7, 60 + Math.floorMod(mix(j + 999L), 80L).toInt)
        val cut = (rates(j % rates.length) * 10000).toLong
        val b = a.zipWithIndex.map { case (w, i) =>
          val z = mix(id * 131L + i)
          if (java.lang.Long.remainderUnsigned(z, 10000L) < cut)
            "m" + java.lang.Long.remainderUnsigned(mix(z + 1), 50000L)
          else w
        }
        Iterator((id, a.mkString(" ")), (id + TwinOff, b.mkString(" ")))
      }
      (bgDocs ++ twins).toDF("doc_id", "text").repartition(64)
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  def main(args: Array[String]): Unit = {
    val bg = sys.env.getOrElse("SPARK_GRAFT_RECALL_BG", "150000").toInt
    val planted = sys.env.getOrElse("SPARK_GRAFT_RECALL_PLANTED", "25000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val outPath = sys.env.getOrElse("SPARK_GRAFT_RECALL_OUT", "recall_bench_out.json")
    val threshold = 0.7
    val s = session(cpus)
    try {
      val docs = s.read.parquet(corpusTable(s, bg, planted))
      val nDocs = docs.count()

      // exact ground truth, computed independently of the operator: every
      // planted pair's TRUE 3-shingle Jaccard, binned by floor(10·J)
      val sh = docs.where(col("doc_id") >= 10000000L)
        .select(col("doc_id"),
          Dedup.wordShingles(coalesce(col("text"), lit("")), 3).as("sh"))
      val truthAll = sh.where(col("doc_id") < TwinOff).alias("a")
        .join(sh.where(col("doc_id") >= TwinOff).alias("b"),
          col("b.doc_id") === col("a.doc_id") + TwinOff)
        .select(col("a.doc_id").as("id"),
          Dedup.jaccard(col("a.sh"), col("b.sh")).as("j"))
        .withColumn("bin", floor(col("j") * 10).cast("int"))
        .persist()
      val allBins = truthAll.groupBy("bin").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      // minhash section: only pairs clearing the operator's verify threshold
      // are recallable at all
      val truth = truthAll.where(col("j") >= threshold)
      val totByBin = truth.groupBy("bin").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val bins = totByBin.keys.toSeq.sorted

      val configs = Seq((16, 4), (16, 8), (32, 8), (64, 8), (64, 16))
      val results = configs.map { case (h, b) =>
        def run(): DataFrame = Dedup.minhashPairs(docs, "doc_id", "text",
          k = 3, h = h, bands = b, threshold = threshold, maxBucket = 1024)
        val warm = time(run().count()); graft.engine.Caches.releaseAll()
        val secs = math.min(warm, {
          val t = time(run().count()); graft.engine.Caches.releaseAll(); t
        })
        // recall: planted pairs found, per true-Jaccard bin (the operator's
        // verify step makes precision 1.0 by construction; what banding
        // loses is candidates)
        val foundByBin = run()
          .where(col("id_b") === col("id_a") + TwinOff)
          .select(col("id_a").as("id"))
          .join(truth, "id")
          .groupBy("bin").count()
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        graft.engine.Caches.releaseAll()
        val r = h / b
        val recalls = bins.map { bin =>
          val rec = foundByBin.getOrElse(bin, 0L).toDouble / totByBin(bin)
          // S-curve at the bin midpoint, for the committed theory column
          val jMid = bin / 10.0 + 0.05
          val theory = 1.0 - math.pow(1.0 - math.pow(jMid, r), b)
          (bin, rec, theory)
        }
        System.err.println(f"[recallbench] h=$h b=$b r=$r ${secs}%.1f s " +
          recalls.map { case (bin, rec, th) =>
            f"bin$bin%d(J∈[${bin / 10.0}%.1f,${(bin + 1) / 10.0}%.1f))=$rec%.3f(th $th%.3f)" }.mkString(" "))
        (h, b, secs, recalls)
      }

      // SimHash section: the pigeonhole join is EXACT within hamming ≤
      // maxHamming (spec-gated), so recall-vs-true-Jaccard here measures
      // the intrinsic fidelity of 64-bit token simhash to shingle Jaccard
      // on this corpus — i.e. which maxHamming a dedup run needs to catch
      // J ≥ 0.8 twins, and what the radius costs. Bins cover ALL planted
      // pairs (simhash has no Jaccard verify step to floor them).
      val simBins = allBins.keys.toSeq.sorted
      val simResults = Seq(2, 3, 4, 6).map { mh =>
        def run(): DataFrame =
          Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = mh)
        val warm = time(run().count()); graft.engine.Caches.releaseAll()
        val secs = math.min(warm, {
          val t = time(run().count()); graft.engine.Caches.releaseAll(); t
        })
        val foundByBin = run()
          .where(col("id_b") === col("id_a") + TwinOff)
          .select(col("id_a").as("id"))
          .join(truthAll, "id")
          .groupBy("bin").count()
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        graft.engine.Caches.releaseAll()
        val recalls = simBins.map { bin =>
          (bin, foundByBin.getOrElse(bin, 0L).toDouble / allBins(bin))
        }
        System.err.println(f"[recallbench] simhash mh=$mh ${secs}%.1f s " +
          recalls.map { case (bin, rec) =>
            f"bin$bin%d(J∈[${bin / 10.0}%.1f,${(bin + 1) / 10.0}%.1f))=$rec%.3f" }.mkString(" "))
        (mh, secs, recalls)
      }

      val json =
        s"""{"docs":$nDocs,"bg":$bg,"planted_pairs":$planted,""" +
        s""""threshold":$threshold,"maxBucket":1024,""" +
        s""""true_pairs_by_bin":{${bins.map(b => s""""$b":${totByBin(b)}""").mkString(",")}},""" +
        s""""configs":[""" + results.map { case (h, b, secs, recalls) =>
          s"""{"h":$h,"bands":$b,"rows_per_band":${h / b},"secs":${f"$secs%.2f"},""" +
          recalls.map { case (bin, rec, th) =>
            f""""recall_bin$bin":$rec%.4f,"theory_bin$bin":$th%.4f""" }.mkString(",") + "}"
        }.mkString(",") + "]," +
        s""""all_pairs_by_bin":{${simBins.map(b => s""""$b":${allBins(b)}""").mkString(",")}},""" +
        s""""simhash":[""" + simResults.map { case (mh, secs, recalls) =>
          s"""{"maxHamming":$mh,"secs":${f"$secs%.2f"},""" +
          recalls.map { case (bin, rec) =>
            f""""recall_bin$bin":$rec%.4f""" }.mkString(",") + "}"
        }.mkString(",") + "]}"
      println(json)
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(outPath), (json + "\n").getBytes("UTF-8"))
      catch { case e: Exception => System.err.println(s"[recallbench] write failed: $e") }
    } finally s.stop()
  }
}
