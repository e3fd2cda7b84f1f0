package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Engine-level data-quality checks (north rule §2.6): uniqueness with
  * salted-key skew mitigation, referential checks via broadcast/shuffle hash
  * join, per-column streaming stats, and distribution drift.
  */
object Checks {

  /** Duplicate keys and their counts via **salted two-phase aggregation**:
    * phase 1 pre-aggregates on (key, salt) so a hot key is spread over
    * `salts` reducers; phase 2 merges the partials. At 10^12 rows this keeps
    * a skewed doc_id from pinning one task; partial aggregation upstream
    * means the second shuffle moves at most `salts` rows per distinct key.
    */
  def duplicateKeys(df: DataFrame, key: String, salts: Int = 16): DataFrame = {
    val salted = df
      .withColumn("_salt", pmod(spark_partition_id(), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
    salted
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("cnt"))
      .where(col("cnt") > 1)
      .orderBy(col(key))
  }

  /** Referential check: rows of `refs.refCol` with no match in
    * `catalog.catCol`. The catalog side is broadcast when small (the
    * optimizer sees the hint); flip `broadcastCatalog=false` for a
    * shuffle-hash join at catalog scale. Output: (ref, ref_count) of
    * dangling references. */
  def danglingRefs(
      refs: DataFrame, refCol: String,
      catalog: DataFrame, catCol: String,
      broadcastCatalog: Boolean = true): DataFrame = {
    val renamed = catalog.select(col(catCol).as("_cat_key"))
    val cat = if (broadcastCatalog) broadcast(renamed) else renamed.hint("shuffle_hash")
    refs
      .where(col(refCol).isNotNull)
      .join(cat, col(refCol) === col("_cat_key"), "left_anti")
      .groupBy(col(refCol).as("ref"))
      .agg(count(lit(1)).as("ref_count"))
      .orderBy(col("ref"))
  }

  /** Per-column profile in ONE pass over the data (single aggregate — every
    * metric is a partial-aggregable expression, so map-side combine applies
    * and the shuffle carries one row per partition):
    * (column, total_count, null_count, min, max, distinct_count).
    * `approxDistinct` switches exact distinct (testable against an oracle)
    * to HyperLogLog++ (`approx_count_distinct`, the 10^12-scale path). */
  def profile(df: DataFrame, cols: Seq[String], approxDistinct: Boolean = false): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__total"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        min(col(c).try_cast(DoubleType)).as(s"${c}__min"),
        max(col(c).try_cast(DoubleType)).as(s"${c}__max"),
        (if (approxDistinct) approx_count_distinct(col(c), 0.01)
         else count_distinct(col(c))).as(s"${c}__distinct"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      one.select(
        lit(c).as("column"),
        col(s"${c}__total").as("total_count"),
        col(s"${c}__nulls").cast(LongType).as("null_count"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"),
        col(s"${c}__distinct").as("distinct_count"))
    }
    rows.reduce(_.unionAll(_)).orderBy(col("column"))
  }

  /** Fixed-width histogram of `valueCol` split into a reference and a
    * current population — the exact-count substrate for KS/PSI drift.
    * Bin counts are integers ⇒ oracle-checkable; [[Drift.psi]]/[[Drift.ks]]
    * turn two of these into drift scores. */
  def driftBins(df: DataFrame, valueCol: String, splitExpr: Column, binWidth: Double): DataFrame =
    df.groupBy(floor(col(valueCol) / binWidth).cast(IntegerType).as("bin"))
      .agg(
        sum(when(splitExpr, 1L).otherwise(0L)).as("ref_count"),
        sum(when(splitExpr, 0L).otherwise(1L)).as("cur_count"))
      .orderBy(col("bin"))
}

/** Two-sample drift measures over binned counts (driver-side, tiny). */
object Drift {

  /** Population Stability Index over two binned count vectors, with Laplace
    * smoothing (`alpha` pseudo-counts per bin) so sparse/empty bins don't
    * blow up the log-ratio. */
  def psi(refCounts: Seq[Long], curCounts: Seq[Long], alpha: Double = 0.5): Double = {
    val n = refCounts.length.max(1)
    val rTot = refCounts.sum.toDouble + alpha * n
    val cTot = curCounts.sum.toDouble + alpha * n
    refCounts.zip(curCounts).map { case (r, c) =>
      val rp = (r + alpha) / rTot
      val cp = (c + alpha) / cTot
      (cp - rp) * math.log(cp / rp)
    }.sum
  }

  /** Two-sample Kolmogorov–Smirnov statistic over binned counts (max ECDF
    * distance at bin boundaries). */
  def ks(refCounts: Seq[Long], curCounts: Seq[Long]): Double = {
    val rTot = refCounts.sum.toDouble.max(1)
    val cTot = curCounts.sum.toDouble.max(1)
    var rAcc = 0.0; var cAcc = 0.0; var maxD = 0.0
    refCounts.zip(curCounts).foreach { case (r, c) =>
      rAcc += r / rTot; cAcc += c / cTot
      maxD = math.max(maxD, math.abs(rAcc - cAcc))
    }
    maxD
  }
}
