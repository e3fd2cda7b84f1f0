package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, rng}

/** Quantile sketch accuracy + mergeability + the typed aggregators, against
  * exact computations. */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def exactQuantile(xs: Seq[Double], q: Double): Double = {
    val s = xs.sorted
    s(math.min(s.length - 1, math.max(0, (q * s.length).toInt)))
  }

  test("sketch quantiles track exact quantiles on uniform data") {
    val xs = (0 until 20000).map(i => (i * 37 % 20000).toDouble)
    val sk = new QuantileSketch(100)
    xs.foreach(sk.insert)
    Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99).foreach { q =>
      val approx = sk.quantile(q)
      val exact = exactQuantile(xs, q)
      assert(math.abs(approx - exact) / 20000 < 0.01,
        s"q=$q approx=$approx exact=$exact")
    }
  }

  test("merging partial sketches equals one big sketch (partition merge)") {
    val xs = (0 until 10000).map(i => math.sin(i).abs * 1000)
    val whole = new QuantileSketch(100)
    xs.foreach(whole.insert)
    val parts = xs.grouped(1000).map { chunk =>
      val s = new QuantileSketch(100); chunk.foreach(s.insert); s
    }.reduce(_ merge _)
    Seq(0.1, 0.5, 0.9).foreach { q =>
      assert(math.abs(whole.quantile(q) - parts.quantile(q)) / 1000 < 0.02)
    }
    assert(parts.count === xs.length)
  }

  test("sketch is checkpointable (java-serializable round trip)") {
    val sk = new QuantileSketch(50)
    (0 until 5000).foreach(i => sk.insert(i.toDouble))
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos); oos.writeObject(sk); oos.close()
    val in = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bos.toByteArray))
    val back = in.readObject().asInstanceOf[QuantileSketch]
    assert(math.abs(back.quantile(0.5) - sk.quantile(0.5)) < 1e-9)
    assert(back.count === sk.count)
  }

  test("merging 1000 partition sketches matches the global sketch within rank error") {
    // the north-rule drift story at 10^12 rows rests on merge associativity:
    // one sketch per input split, merged up a tree. 1000 partitions is the
    // cluster shape; rank error must stay bounded through the merge fan-in.
    val n = 200000
    val rnd = new scala.util.Random(7)
    val xs = Array.fill(n)(
      if (rnd.nextInt(20) == 0) 500 + rnd.nextGaussian() * 200 // heavy tail
      else rnd.nextDouble() * 100)
    val global = new QuantileSketch(100); xs.foreach(global.insert)
    val parts = Array.fill(1000)(new QuantileSketch(100))
    xs.zipWithIndex.foreach { case (v, i) => parts(i % 1000).insert(v) }
    val flat = parts.reduce(_ merge _)
    assert(flat.count === n.toLong)
    val sorted = xs.sorted
    def rankOf(x: Double): Double = sorted.count(_ <= x).toDouble / n
    for (q <- Seq(0.01, 0.1, 0.5, 0.9, 0.99)) {
      val rf = rankOf(flat.quantile(q))
      val rg = rankOf(global.quantile(q))
      assert(math.abs(rf - q) <= 0.05, s"q=$q flat-merged rank $rf")
      assert(math.abs(rg - q) <= 0.05, s"q=$q global rank $rg")
    }
    // tree-shaped merge (the real cluster reduction) holds the same bound
    val tree = parts.grouped(32).map(_.reduce(_ merge _)).reduce(_ merge _)
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val rt = rankOf(tree.quantile(q))
      assert(math.abs(rt - q) <= 0.05, s"q=$q tree-merged rank $rt")
    }
  }

  test("checkpoint/restore mid-stream, then continue: matches the uninterrupted sketch") {
    // simulated snapshot boundary: sketch half the stream, serialize (what
    // the checkpoint sink persists), restore, sketch the rest — quantiles
    // must match a never-interrupted sketch within rank error.
    def f(i: Int): Double = ((i.toLong * 2654435761L) % 100000L).toDouble / 100.0
    val uninterrupted = new QuantileSketch(100)
    (0 until 100000).foreach(i => uninterrupted.insert(f(i)))
    val first = new QuantileSketch(100)
    (0 until 50000).foreach(i => first.insert(f(i)))
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos); oos.writeObject(first); oos.close()
    val restored = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[QuantileSketch]
    (50000 until 100000).foreach(i => restored.insert(f(i)))
    restored.flush() // count is exact at flush points (and at serialization)
    assert(restored.count === 100000L)
    val sorted = (0 until 100000).map(f).sorted
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val r = sorted.count(_ <= restored.quantile(q)).toDouble / 100000
      assert(math.abs(r - q) <= 0.03, s"q=$q restored rank $r")
      assert(math.abs(restored.quantile(q) - uninterrupted.quantile(q)) <=
        (sorted.last - sorted.head) * 0.02, s"q=$q restored vs uninterrupted")
    }
  }

  test("sketch KS/PSI: same distribution ~0, shifted >> 0") {
    def sketchOf(xs: Seq[Double]): QuantileSketch = {
      val s = new QuantileSketch(100); xs.foreach(s.insert); s
    }
    val a = sketchOf((0 until 5000).map(i => (i % 100).toDouble))
    val b = sketchOf((0 until 5000).map(i => ((i * 7) % 100).toDouble))
    val c = sketchOf((0 until 5000).map(i => (i % 100).toDouble + 50))
    assert(QuantileSketch.ks(a, b) < 0.05)
    assert(QuantileSketch.ks(a, c) > 0.2)
    assert(QuantileSketch.psi(a, b) < 0.05)
    assert(QuantileSketch.psi(a, c) > 0.3)
  }

  test("typed stats aggregator matches exact column stats over Spark") {
    import spark.implicits._
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val stats = events.select(col("value").cast("double")).as[java.lang.Double]
      .select(TypedAggregators.statsAgg.toColumn).collect()(0)
    val vals = events.select("value").collect().map(_.getDouble(0))
    assert(stats.count === vals.length)
    assert(stats.min === vals.min)
    assert(stats.max === vals.max)
    assert(math.abs(stats.mean - vals.sum / vals.length) < 1e-9)
  }

  test("distributed sketch agg matches local sketch quantiles") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val distributed = TypedAggregators.sketchColumn(events, "value")
    val vals = events.select("value").collect().map(_.getDouble(0))
    Seq(0.1, 0.5, 0.9).foreach { q =>
      val exact = exactQuantile(vals.toSeq, q)
      assert(math.abs(distributed.quantile(q) - exact) <= (vals.max - vals.min) * 0.03,
        s"q=$q got ${distributed.quantile(q)} exact $exact")
    }
  }

  test("property: sketch median within 10% rank error (scalacheck gens)") {
    val gen = Gen.listOfN(500, Gen.choose(-1e6, 1e6))
    val seed0 = rng.Seed(42L)
    (0 until 20).foldLeft(seed0) { (seed, _) =>
      val xs = gen.pureApply(Gen.Parameters.default, seed)
      val sk = new QuantileSketch(100)
      xs.foreach(sk.insert)
      val med = sk.quantile(0.5)
      val rank = xs.count(_ <= med).toDouble / xs.length
      assert(rank >= 0.40 && rank <= 0.60, s"median rank $rank")
      seed.next
    }
  }

  test("MG heavy hitters are EXACT when global distinct keys fit the capacity") {
    import spark.implicits._
    val keys = (0 until 5000).map(i => s"k${i % 40}")
    val df = keys.toDF("key").repartition(17)
    val hh = TypedAggregators.heavyHitters(df, "key", capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(hh.map(t => t._1 -> t._2).toMap === exact)
    assert(hh.forall(_._3 === 0L)) // no decrement ever fired
    // physical layout cannot change an exact sketch's output
    val again = TypedAggregators.heavyHitters(keys.toDF("key").repartition(3),
      "key", capacity = 64).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq === hh.toSeq)
  }

  test("MG guarantees hold on skewed data at any partitioning: no overestimate, bounded underestimate, heavy keys present") {
    import spark.implicits._
    // zipf-ish: key j appears ~N/j times — few heavy keys, long singleton tail
    val keys = (1 to 400).flatMap(j => Seq.fill(2000 / j)(s"z$j"))
    val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = keys.size.toLong
    for (parts <- Seq(1, 13, 200)) {
      val hh = TypedAggregators.heavyHitters(
        keys.toDF("key").repartition(parts), "key", capacity = 8)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(hh.nonEmpty && hh.length <= 8, s"parts=$parts size=${hh.length}")
      val bound = hh.head._3
      assert(bound <= n / 9, s"parts=$parts bound=$bound > n/(cap+1)")
      hh.foreach { case (k, est, _) =>
        assert(est <= exact(k), s"parts=$parts overestimated $k")
        assert(exact(k) - est <= bound, s"parts=$parts $k outside bound")
      }
      // any key with true count above the reported bound MUST be present
      val present = hh.map(_._1).toSet
      exact.foreach { case (k, c) =>
        if (c > bound) assert(present(k), s"parts=$parts heavy $k missing (c=$c, bound=$bound)")
      }
    }
  }
}
