package graft.tools

import graft.engine.{Dedup, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic: winnowing inverted-index shape at replicated scale —
  * fingerprint-bucket tail, candidate fan-out, pair counts per maxBucket.
  * Explains winnowPairs' bench scaling. */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val replicate = args.headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false").config("spark.sql.codegen.hugeMethodLimit", graft.engine.GraftSession.hugeMethodLimit).getOrCreate() // JIT-safe codegen cap, see GraftSession
    spark.sparkContext.setLogLevel("WARN")
    val table = graft.DedupBench.corpusTable(spark, "/root/testdata/sf0.1", replicate)
    val docs = spark.read.parquet(table)
    val inv = TextOps.winnowingFingerprints(docs, "doc_id", "text", 8, 16)
      .select(col("id"), explode(col("fingerprints")).as("f"))
      .persist()
    val n = inv.count()
    println(s"[winnow-probe] x$replicate inv rows = $n")
    val tail = inv.groupBy("f").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("distinct_f"), max("c").as("max_bucket"),
        sum(when(col("c") > 1000, col("c") * col("c"))).as("pairs_from_gt1000"),
        sum(col("c") * col("c")).as("sum_c2")).collect()(0)
    println(s"[winnow-probe] distinct_f=${tail.get(0)} max_bucket=${tail.get(1)} " +
      s"sum_c2=${tail.get(3)} pairs_from_buckets_gt1000=${tail.get(2)}")
    val hist = inv.groupBy("f").agg(count(lit(1)).as("c"))
      .select(when(col("c") === 1, "1").when(col("c") <= 10, "2-10")
        .when(col("c") <= 100, "11-100").when(col("c") <= 1000, "101-1k")
        .when(col("c") <= 10000, "1k-10k").otherwise(">10k").as("bucket"))
      .groupBy("bucket").count().collect()
      .map(r => s"${r.getString(0)}:${r.getLong(1)}").mkString(" ")
    println(s"[winnow-probe] bucket-size histogram: $hist")
    inv.unpersist()
    for (cap <- Seq(500, 2000, 10000)) {
      val t0 = System.nanoTime()
      val p = Dedup.winnowPairs(docs, "doc_id", "text", minShared = 8, maxBucket = cap).count()
      graft.engine.Caches.releaseAll()
      println(f"[winnow-probe] maxBucket=$cap pairs=$p in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
