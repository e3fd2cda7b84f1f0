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

  test("bucketed embed index: probe join has NO index-side exchange; decontam parity with in-memory index") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // benchmark = rescaled copies (cosine-invariant ⇒ known sim-1.0 leaks)
    val bench = emb.where(col("vec_id") % 23 === 5)
      .withColumn("embedding", transform(col("embedding"), x => x * lit(1.0005f)))
    val index = Similarity.embedIndex(bench, bits = 4, maxBucket = 512)
    Similarity.writeBucketedEmbedIndex(index, "graft_test_embed_idx", numBuckets = 8)
    try {
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        // the non-broadcast shape: a huge stored index joined in place —
        // only the probe batch may shuffle into the bucket layout
        val viaBucketed = Similarity.embedDecontamIndexed(
          emb, spark.table("graft_test_embed_idx"), threshold = 0.99, bits = 4)
        val got = viaBucketed.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
        val want = Similarity.embedDecontam(emb, bench, threshold = 0.99,
            bits = 4, maxBucket = 512).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
        assert(got === want)
        assert(got.nonEmpty, "planted leaks must be found")
        // exchanges in the final plan: ONE for the probe side entering the
        // bucket layout, ONE for the per-vector best-match aggregate —
        // and none for the index (a third would mean it was re-shuffled)
        val plan = viaBucketed.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
        assert(exchanges <= 2, s"index side must not re-shuffle:\n$plan")
        assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
          s"index scan is not bucketed:\n${plan.take(1500)}")
        // the streaming probe consumes the same table as its staticIndex —
        // same join contract, batch-verified here via the shared columns
        assert(spark.table("graft_test_embed_idx").columns.toSeq ===
          Seq("bucket", "id", "vec"))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    } finally spark.sql("DROP TABLE IF EXISTS graft_test_embed_idx")
  }

  test("persisted IVF index: probe equals in-line ivfTopK and prunes to the probed cells") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 5)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-spec").toString
    try {
      Similarity.writeIvfIndex(emb, path, nlist = 8)
      val idx = Similarity.loadIvfIndex(spark, path)
      assert(idx.centroids.length === 8)
      // deterministic training ⇒ the persisted index reproduces the in-line
      // result exactly, at exhaustive probing AND at a restricted nProbe
      for (nProbe <- Seq(8, 3)) {
        val viaIndex = Similarity.ivfTopKIndexed(idx, queries, k = 3, nProbe = nProbe)
          .collect().map(_.toSeq).toSeq
        val inline = Similarity.ivfTopK(emb, queries, k = 3, nlist = 8, nProbe = nProbe)
          .collect().map(_.toSeq).toSeq
        assert(viaIndex === inline, s"nProbe=$nProbe")
      }
      // partition pruning: the cell filter must land in the file source's
      // PartitionFilters (so only the probed cell directories are read —
      // .inputFiles can't see this, it reports the unfiltered relation)
      val cellsAll = spark.read.parquet(s"$path/cells")
      assert(cellsAll.select("cell").distinct().count() === 8)
      val pruned = cellsAll.where(col("cell").isin(0, 1))
      val scanPlan = pruned.queryExecution.executedPlan.toString
        .replaceAll("#\\d+L?", "")
      assert(scanPlan.contains("PartitionFilters") &&
        Seq("cell IN (0,1)", "cell IN (0, 1)").exists(scanPlan.contains),
        s"cell filter did not reach PartitionFilters:\n${scanPlan.take(1200)}")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(path)).deleteRecursively()
    }
  }

  test("IVF incremental append: new vectors join the frozen index; exhaustive probe equals brute force over the union") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 5)
    // the new batch: near-copies of existing vectors under fresh ids —
    // they must land in their originals' cells and appear in results
    val batch = emb.where(col("vec_id") % 100 === 7)
      .withColumn("vec_id", col("vec_id") + 5000000)
      .withColumn("embedding", transform(col("embedding"), x => x * lit(1.0005f)))
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-append").toString
    try {
      Similarity.writeIvfIndex(emb, path, nlist = 8)
      Similarity.appendToIvfIndex(spark, path, batch)
      val idx = Similarity.loadIvfIndex(spark, path)
      assert(idx.cells.count() === emb.count() + batch.count())
      // exhaustive probing (nProbe = nlist) over the appended index must
      // EQUAL exact brute force over the union corpus — the appended rows
      // are fully first-class index members
      val viaIndex = Similarity.ivfTopKIndexed(idx, queries, k = 3, nProbe = 8)
        .collect().map(_.toSeq).toSeq
      val exact = Similarity.bruteForceTopK(
          emb.unionByName(batch), queries, k = 3)
        .collect().map(_.toSeq).toSeq
      assert(viaIndex === exact)
      // the rescaled twins are cosine-identical to their originals, so at
      // least one appended id must actually surface in someone's top-k
      // (vec_id 7 % 100 == 7 twin of a query-adjacent vector may or may
      // not rank; assert membership over ALL corpus vectors' neighbors)
      val wide = Similarity.ivfTopKIndexed(idx,
        emb.where(col("vec_id") % 100 === 7), k = 1, nProbe = 8).collect()
      assert(wide.exists(_.getLong(2) >= 5000000),
        "an appended twin must be its original's nearest neighbor")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(path)).deleteRecursively()
    }
  }
}
