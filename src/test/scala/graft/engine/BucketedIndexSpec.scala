package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The materialized near-dup index as a BUCKETED table: probe joins must
  * read the index without re-shuffling it — the pattern that makes
  * incremental ingestion affordable when the index is 10^12 rows and the
  * batch is small. */
class BucketedIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("bucketed minhash index joins probes with NO index-side exchange") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val corpus = TextOps.withMutatedTwins(docs, "doc_id", "text")
    val index = Dedup.minhashIndex(corpus.where(col("doc_id") >= 0),
      "doc_id", "text", maxBucket = 100000)
    Dedup.writeBucketedMinhashIndex(index, "graft_test_minhash_idx", numBuckets = 8)
    try {
      val probes = Dedup.signatureFrame(
          corpus.where(col("doc_id") < 0), "doc_id", "text", 3, 16, 4)
        .select(col("id").as("stream_id"), col("shingles").as("sh_s"),
          posexplode(col("bands")).as(Seq("band", "bucket")))
      def joined(idx: org.apache.spark.sql.DataFrame) = idx
        .select(col("band"), col("bucket"), col("id").as("static_id"),
          col("shingles").as("sh_i"))
        .join(probes, Seq("band", "bucket"))
        .where(col("stream_id") =!= col("static_id"))
        .withColumn("jaccard",
          size(array_intersect(col("sh_s"), col("sh_i"))).cast("double") /
            size(array_union(col("sh_s"), col("sh_i"))).cast("double"))
        .where(col("jaccard") >= 0.5)
        .select("stream_id", "static_id")
      // force the sort-merge/shuffle-hash path — with a broadcast join the
      // bucketing assertion would be vacuous at test-corpus size
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val viaBucketed = joined(spark.table("graft_test_minhash_idx"))
        val got = viaBucketed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val want = joined(index).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got === want)
        assert(got.nonEmpty, "twins must match their originals")
        // the plan must contain exactly ONE shuffle exchange: the probe
        // side reorganizing into the index's bucket layout. A second
        // exchange means the bucketed index was re-shuffled. (AQE's
        // toString appends the pre-execution "Initial Plan" — inspect only
        // the final plan section or the one exchange counts twice.)
        val plan = viaBucketed.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
        assert(exchanges === 1, s"expected 1 exchange (probe side only):\n$plan")
        // and the scan really is the bucketed read
        assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
          s"index scan is not bucketed:\n${plan.take(1500)}")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    } finally spark.sql("DROP TABLE IF EXISTS graft_test_minhash_idx")
  }
}
