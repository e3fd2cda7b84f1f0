package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch — a compact t-digest-style centroid summary.
  *
  * Centroids are (mean, weight) pairs kept sorted; inserts add unit
  * centroids, and [[compress]] greedily merges neighbors under the usual
  * t-digest size bound k·q(1−q), which keeps tail quantiles precise. The
  * buffer is a plain serializable case-class-free structure (two arrays), so
  * it is (a) mergeable across partitions/snapshots and (b) checkpointable —
  * the properties the north rule requires for drift tracking at 10^12 rows.
  */
final class QuantileSketch(
    val compression: Int,
    var means: Array[Double],
    var weights: Array[Double],
    var count: Long) extends Serializable {

  def this(compression: Int) = this(compression, Array.empty, Array.empty, 0L)

  // insert buffer: values batch up and flush in one sorted merge (amortized
  // O(log n) per insert instead of a full centroid merge each time)
  private val pending = scala.collection.mutable.ArrayBuffer.empty[Double]

  def insert(x: Double): QuantileSketch = {
    pending += x
    if (pending.length >= 512) flush()
    this
  }

  def flush(): Unit = {
    if (pending.isEmpty) return
    val sorted = pending.toArray.sorted
    pending.clear()
    val other = new QuantileSketch(
      compression, sorted, Array.fill(sorted.length)(1.0), sorted.length.toLong)
    val merged = mergeFlushed(other)
    means = merged.means; weights = merged.weights; count = merged.count
  }

  def merge(other: QuantileSketch): QuantileSketch = {
    flush(); other.flush()
    mergeFlushed(other)
  }

  // checkpoint consistency: a serialized sketch is always flushed, so the
  // persisted (means, weights, count) are the complete state — `count` read
  // from a restored checkpoint is exact, never lagging the insert buffer
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    flush()
    out.defaultWriteObject()
  }

  private def mergeFlushed(other: QuantileSketch): QuantileSketch = {
    if (other.count == 0) return this
    if (count == 0) return other
    val n = means.length + other.means.length
    val m = new Array[Double](n)
    val w = new Array[Double](n)
    var i = 0; var j = 0; var k = 0
    while (i < means.length || j < other.means.length) {
      val takeLeft = j >= other.means.length ||
        (i < means.length && means(i) <= other.means(j))
      if (takeLeft) { m(k) = means(i); w(k) = weights(i); i += 1 }
      else { m(k) = other.means(j); w(k) = other.weights(j); j += 1 }
      k += 1
    }
    val merged = new QuantileSketch(compression, m, w, count + other.count)
    merged.compress()
    merged
  }

  private def qBound(q: Double): Double =
    4.0 * count * q * (1 - q) / compression

  def compress(): Unit = {
    if (means.length <= 1) return
    val m = new Array[Double](means.length)
    val w = new Array[Double](means.length)
    var k = 0
    m(0) = means(0); w(0) = weights(0)
    var acc = weights(0)
    var i = 1
    while (i < means.length) {
      val q = (acc - w(k) / 2) / count.toDouble
      if (w(k) + weights(i) <= math.max(1.0, qBound(q))) {
        // merge into current centroid
        val tw = w(k) + weights(i)
        m(k) = (m(k) * w(k) + means(i) * weights(i)) / tw
        w(k) = tw
      } else {
        k += 1
        m(k) = means(i); w(k) = weights(i)
      }
      acc += weights(i)
      i += 1
    }
    means = m.take(k + 1)
    weights = w.take(k + 1)
  }

  /** Quantile estimate by linear interpolation over centroid midpoints. */
  def quantile(q: Double): Double = {
    flush()
    if (count == 0) return Double.NaN
    if (means.length == 1) return means(0)
    val target = q * count
    var acc = 0.0
    var i = 0
    while (i < means.length) {
      val mid = acc + weights(i) / 2
      if (target <= mid) {
        if (i == 0) return means(0)
        val prevMid = acc - weights(i - 1) / 2
        val frac = (target - prevMid) / (mid - prevMid)
        return means(i - 1) + frac * (means(i) - means(i - 1))
      }
      acc += weights(i)
      i += 1
    }
    means.last
  }

  /** Approximate CDF at x (for two-sample KS over sketches). */
  def cdf(x: Double): Double = {
    flush()
    if (count == 0) return Double.NaN
    var acc = 0.0
    var i = 0
    while (i < means.length && means(i) <= x) { acc += weights(i); i += 1 }
    math.min(1.0, acc / count)
  }
}

object QuantileSketch {
  def single(x: Double, compression: Int): QuantileSketch =
    new QuantileSketch(compression, Array(x), Array(1.0), 1L)

  /** Two-sample KS statistic over two sketches, evaluated at both sketches'
    * centroid locations (driver-side, tiny). */
  def ks(a: QuantileSketch, b: QuantileSketch): Double = {
    a.flush(); b.flush()
    val points = (a.means ++ b.means).sorted
    if (points.isEmpty) return 0.0
    points.map(x => math.abs(a.cdf(x) - b.cdf(x))).max
  }

  /** PSI over two sketches using `bins` equal-width bins spanning both. */
  def psi(a: QuantileSketch, b: QuantileSketch, bins: Int = 10, alpha: Double = 0.5): Double = {
    a.flush(); b.flush()
    if (a.count == 0 || b.count == 0) return 0.0
    val lo = math.min(a.means.head, b.means.head)
    val hi = math.max(a.means.last, b.means.last)
    if (hi <= lo) return 0.0
    val edges = (0 to bins).map(i => lo + (hi - lo) * i / bins)
    def massIn(s: QuantileSketch, l: Double, h: Double): Double =
      math.max(0.0, s.cdf(h) - s.cdf(l)) * s.count
    val aCounts = (0 until bins).map(i => massIn(a, edges(i), edges(i + 1)).round)
    val bCounts = (0 until bins).map(i => massIn(b, edges(i), edges(i + 1)).round)
    Drift.psi(aCounts, bCounts, alpha)
  }
}

/** Misra-Gries heavy-hitters sketch: at most `capacity` (key, count)
  * entries, one pass, mergeable — the scale answer to "top domains / top
  * tokens over 10^12 rows" when a full groupBy-count shuffle of the key
  * space is unaffordable. Estimates never overestimate, and the total
  * decrement `maxUnderestimate` (≤ processed/(capacity+1)) bounds the
  * underestimate exactly, so any key with true count above that bound is
  * GUARANTEED present — both properties hold under arbitrary partition
  * merge order (Agarwal et al.'s pointwise-sum-then-trim merge) and are
  * what the bound-check oracle asserts. When the global distinct-key count
  * is ≤ capacity no decrement ever fires and the sketch is EXACT — that
  * regime gets a plain value-equality oracle. */
final class MGSketch(
    val capacity: Int,
    val counts: scala.collection.mutable.HashMap[String, Long],
    var processed: Long,
    var decremented: Long) extends Serializable {

  def this(capacity: Int) =
    this(capacity, scala.collection.mutable.HashMap.empty, 0L, 0L)

  def insert(x: String): MGSketch = {
    processed += 1
    counts.get(x) match {
      case Some(c) => counts.update(x, c + 1)
      case None if counts.size < capacity => counts.update(x, 1L)
      case None =>
        // classic MG decrement round: the arriving key and `capacity`
        // stored keys each shed one count — ≤ processed/(capacity+1) rounds
        // can ever happen, which is exactly the underestimate bound
        decremented += 1
        val dead = scala.collection.mutable.ArrayBuffer.empty[String]
        counts.foreach { case (k, c) =>
          if (c == 1L) dead += k else counts.update(k, c - 1) }
        dead.foreach(counts.remove)
    }
    this
  }

  /** Pointwise-sum merge, trimmed back to `capacity` entries by subtracting
    * the (capacity+1)-largest combined count from everything (the merge
    * that preserves the MG error bound under any merge tree). */
  def merge(other: MGSketch): MGSketch = {
    other.counts.foreach { case (k, c) =>
      counts.update(k, counts.getOrElse(k, 0L) + c) }
    processed += other.processed
    decremented += other.decremented
    if (counts.size > capacity) {
      val cut = counts.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      decremented += cut
      val dead = scala.collection.mutable.ArrayBuffer.empty[String]
      counts.foreach { case (k, c) =>
        if (c <= cut) dead += k else counts.update(k, c - cut) }
      dead.foreach(counts.remove)
    }
    this
  }

  /** Exact worst-case underestimate of any key's count (0 ⇒ sketch exact). */
  def maxUnderestimate: Long = decremented
}

/** Typed Aggregators (north rule: "streaming stats via typed Aggregators"):
  * per-column stats, the quantile sketch and the heavy-hitters sketch, all
  * usable as `Dataset.select(agg.toColumn)` or registered column
  * functions. */
object TypedAggregators {

  final case class Stats(
      count: Long, nulls: Long, min: Double, max: Double, sum: Double) {
    def mean: Double = if (count - nulls == 0) Double.NaN else sum / (count - nulls)
    def nullRate: Double = if (count == 0) 0.0 else nulls.toDouble / count
  }

  /** Single-pass count/null/min/max/sum over a nullable numeric column. */
  val statsAgg: Aggregator[java.lang.Double, Stats, Stats] =
    new Aggregator[java.lang.Double, Stats, Stats] {
      def zero: Stats = Stats(0, 0, Double.PositiveInfinity, Double.NegativeInfinity, 0.0)
      def reduce(b: Stats, x: java.lang.Double): Stats =
        if (x == null) b.copy(count = b.count + 1, nulls = b.nulls + 1)
        else Stats(b.count + 1, b.nulls,
          math.min(b.min, x), math.max(b.max, x), b.sum + x)
      def merge(a: Stats, b: Stats): Stats =
        Stats(a.count + b.count, a.nulls + b.nulls,
          math.min(a.min, b.min), math.max(a.max, b.max), a.sum + b.sum)
      def finish(r: Stats): Stats = r
      def bufferEncoder: Encoder[Stats] = Encoders.product[Stats]
      def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
    }

  /** Quantile-sketch aggregator; buffer serialized via Kryo (mergeable +
    * checkpointable across snapshots). */
  def quantileAgg(compression: Int = 100): Aggregator[java.lang.Double, QuantileSketch, QuantileSketch] =
    new Aggregator[java.lang.Double, QuantileSketch, QuantileSketch] {
      def zero: QuantileSketch = new QuantileSketch(compression)
      def reduce(b: QuantileSketch, x: java.lang.Double): QuantileSketch =
        if (x == null) b else b.insert(x)
      def merge(a: QuantileSketch, b: QuantileSketch): QuantileSketch = a.merge(b)
      def finish(r: QuantileSketch): QuantileSketch = { r.flush(); r }
      def bufferEncoder: Encoder[QuantileSketch] = Encoders.kryo[QuantileSketch]
      def outputEncoder: Encoder[QuantileSketch] = Encoders.kryo[QuantileSketch]
    }

  /** Sketch a column of `df` (one pass, partial-merge across partitions). */
  def sketchColumn(df: DataFrame, valueCol: String, compression: Int = 100): QuantileSketch = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(valueCol).cast("double")).as[java.lang.Double]
      .select(quantileAgg(compression).toColumn)
      .collect()(0)
  }

  /** Misra-Gries heavy-hitters aggregator (buffer via Kryo, mergeable across
    * partitions and snapshots like [[quantileAgg]]). */
  def heavyHittersAgg(capacity: Int): Aggregator[String, MGSketch, MGSketch] =
    new Aggregator[String, MGSketch, MGSketch] {
      def zero: MGSketch = new MGSketch(capacity)
      def reduce(b: MGSketch, x: String): MGSketch =
        if (x == null) b else b.insert(x)
      def merge(a: MGSketch, b: MGSketch): MGSketch = a.merge(b)
      def finish(r: MGSketch): MGSketch = r
      def bufferEncoder: Encoder[MGSketch] = Encoders.kryo[MGSketch]
      def outputEncoder: Encoder[MGSketch] = Encoders.kryo[MGSketch]
    }

  /** Heavy-hitter keys of a column in ONE partial-aggregable pass — no
    * groupBy shuffle of the key space, ≤ `capacity` result rows (driver-
    * bounded by construction, the IVF-centroid discipline). Output per key:
    * (key, est_count, max_underestimate) with est ≤ true ≤ est +
    * max_underestimate; max_underestimate = 0 means the sketch is exact
    * (no decrement ever fired — guaranteed when global distinct ≤
    * capacity). */
  def heavyHitters(df: DataFrame, keyCol: String, capacity: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(capacity > 0, "capacity must be positive")
    val sk = df.select(col(keyCol).cast("string")).na.drop().as[String]
      .select(heavyHittersAgg(capacity).toColumn)
      .collect()(0)
    sk.counts.toSeq.sortBy { case (k, c) => (-c, k) }
      .map { case (k, c) => (k, c, sk.maxUnderestimate) }
      .toDF("key", "est_count", "max_underestimate")
  }
}
