package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`): brute-force
  * cosine top-k as the exact baseline, and a sign-random-projection LSH
  * bucketed variant as the scale path (candidates only within matching
  * buckets; at 10^12 rows brute force is a non-starter, buckets cut the
  * join fan-out by ~2^bits).
  */
object Similarity {

  /** Cosine similarity between two float-array columns (double accumulation,
    * sequential fold ⇒ deterministic). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast(DoubleType) * q.cast(DoubleType)),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact top-k: for every query row, the k nearest non-query rows by
    * cosine. Queries are broadcast (small side); ranking is deterministic
    * (rounded sim desc, neighbor id asc). */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("id_a"), col(vecCol).as("vec_a")))
    val c = corpus.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    val scored = scorePairs(
      c.crossJoin(q).where(col("id_b") =!= col("id_a"))
        .select("id_a", "id_b", "vec_a", "vec_b"))
      .withColumnRenamed("id_a", "query_id").withColumnRenamed("id_b", "neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
      .orderBy("query_id", "rank")
  }

  /** Plain-loop cosine for typed projections (HOF `aggregate` is
    * CodegenFallback — interpreted per element; see the minhash signature
    * stage for the same ~100× lesson). */
  private[engine] def cosineArrays(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Score (id_a, id_b, vec_a, vec_b) pairs with a typed projection;
    * returns (id_a, id_b, sim) with sim rounded to 6dp. */
  private def scorePairs(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.select(col("id_a"), col("id_b"),
        col("vec_a").cast("array<float>"), col("vec_b").cast("array<float>"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .mapPartitions(_.map { case (a, b, va, vb) =>
        // HALF_UP to match SQL ROUND (both Spark's round() and DuckDB's)
        (a, b, new java.math.BigDecimal(cosineArrays(va, vb))
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
      })
      .toDF("id_a", "id_b", "sim")
  }

  /** Sign-random-projection bucket id: `bits` hyperplanes with deterministic
    * ±1 components derived from xxhash64(plane, dim). */
  def srpBucket(vec: Column, bits: Int = 8): Column = {
    val planes = (0 until bits).map { j =>
      val dotProj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) =>
          x.cast(DoubleType) *
            when(pmod(xxhash64(lit(j), i), lit(2)) === 0, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, v) => acc + v)
      when(dotProj > 0, shiftleft(lit(1L), j)).otherwise(0L)
    }
    planes.reduce((a, b) => a + b)
  }

  /** LSH-bucketed ANN top-k: exact cosine, but only within the query's SRP
    * bucket. Trades recall for a ~2^bits candidate reduction. */
  def annTopK(
      corpus: DataFrame, queries: DataFrame, k: Int, bits: Int = 6,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"),
      srpBucket(col(vecCol), bits).as("bucket"))
    val q = broadcast(queries.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"),
      srpBucket(col(vecCol), bits).as("bucket")))
    val scored = scorePairs(
      c.join(q, "bucket").where(col("id_b") =!= col("id_a"))
        .select("id_a", "id_b", "vec_a", "vec_b"))
      .withColumnRenamed("id_a", "query_id").withColumnRenamed("id_b", "neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
      .orderBy("query_id", "rank")
  }

  /** Embedding-cosine near-duplicate pairs (bucketed): pairs with
    * cosine ≥ threshold inside the same SRP bucket. */
  def cosineNearDups(
      corpus: DataFrame, threshold: Double, bits: Int = 6,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val withBucket = corpus.select(
      col(idCol).as("id"), col(vecCol).as("vec"),
      srpBucket(col(vecCol), bits).as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = withBucket.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = withBucket.select(col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    val pairs = a.join(b, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "vec_a", "vec_b")
    scorePairs(pairs)
      .where(col("sim") >= threshold)
      .orderBy("id_a", "id_b")
  }
}
