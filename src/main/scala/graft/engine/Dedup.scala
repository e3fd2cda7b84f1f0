package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Near-duplicate detection at corpus scale: MinHash+LSH (shingle → minhash
  * signature → banded buckets → candidate join → exact-Jaccard verify),
  * SimHash, and n-gram Jaccard verification.
  *
  * Scale shape: signatures are a narrow projection (no shuffle); the only
  * shuffles are the band-bucket join (keys are (band, bucket-hash), load
  * spread across `bands × buckets`) and the final pair dedup. Candidate
  * pairs — not all N² pairs — are verified. This is the standard LSH plan
  * for 10^12-doc dedup.
  */
object Dedup {

  /** Distinct word k-shingles; texts shorter than k words yield one shingle. */
  def wordShingles(text: Column, k: Int = 3): Column = {
    val words = split(trim(text), "\\s+")
    val n = size(words)
    when(n <= k, array(concat_ws(" ", words)))
      .otherwise(array_distinct(
        transform(sequence(lit(0), n - k), i =>
          concat_ws(" ", slice(words, i + 1, lit(k))))))
  }

  /** MinHash signature: for each of `h` hash families, the minimum xxhash64
    * over the shingles (seeded by the family index). */
  def minhashSignature(shingles: Column, h: Int = 16): Column =
    array((0 until h).map(j =>
      array_min(transform(shingles, s => xxhash64(s, lit(j))))): _*)

  /** LSH band keys: split the signature into `bands` rows of `rowsPerBand`
    * and hash each band. Same band key ⇒ candidate pair. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      xxhash64(concat_ws(",",
        transform(slice(sig, b * rowsPerBand + 1, rowsPerBand),
          x => x.cast(StringType))), lit(b))): _*)

  /** Full MinHash-LSH near-dup pipeline.
    * Input: (id, text); output: (id_a, id_b, jaccard) with id_a < id_b and
    * jaccard ≥ threshold (exact Jaccard over shingle sets — LSH only
    * generates candidates; the verify step is exact). */
  def minhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, h: Int = 16, bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    require(h % bands == 0, "bands must divide the signature length")
    val rows = h / bands
    val withSig = docs
      .select(col(idCol).as("id"), wordShingles(col(textCol), k).as("shingles"))
      .withColumn("bands", bandKeys(minhashSignature(col("shingles"), h), bands, rows))
    val exploded = withSig
      .select(col("id"), col("shingles"), posexplode(col("bands")).as(Seq("band", "bucket")))
    val a = exploded.select(
      col("band"), col("bucket"), col("id").as("id_a"), col("shingles").as("sh_a"))
    val b = exploded.select(
      col("band"), col("bucket"), col("id").as("id_b"), col("shingles").as("sh_b"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")
    candidates
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b"))).cast(DoubleType))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** Exact n-gram Jaccard for a candidate pair frame (columns sh_a, sh_b). */
  def jaccard(shA: Column, shB: Column): Column =
    size(array_intersect(shA, shB)).cast(DoubleType) /
      size(array_union(shA, shB)).cast(DoubleType)

  /** 32-bit SimHash over whitespace tokens (kept to 32 bits so the value and
    * its bit arithmetic stay in Long range; hamming distance via
    * `bit_count(a ^ b)`). */
  def simhash32(text: Column): Column = {
    val tokens = split(trim(text), "\\s+")
    val hashes = transform(tokens, t => xxhash64(t))
    // one per-bit counter fold; bit index is a Scala constant so the shift
    // amount stays static (shiftright takes Int)
    val bits = (0 until 32).map { j =>
      val counter = aggregate(hashes, lit(0L), (acc, hv) =>
        acc + when(shiftright(hv, j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(counter > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** SimHash near-dup pairs: bucket on the top `prefixBits` bits (cheap LSH
    * for hamming space), verify with full hamming distance ≤ maxHamming. */
  def simhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, prefixBits: Int = 8): DataFrame = {
    val withSig = docs.select(
      col(idCol).as("id"), simhash32(col(textCol)).as("sig"))
      .withColumn("bucket", shiftright(col("sig"), 32 - prefixBits))
    val a = withSig.select(col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = withSig.select(col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
      .dropDuplicates("id_a", "id_b")
      .orderBy("id_a", "id_b")
  }
}
