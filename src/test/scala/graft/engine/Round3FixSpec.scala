package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression tests for the round-3 fixes: linear-size exact-dup edges and
  * content-derived media features. */
class Round3FixSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("exactDupEdges is linear in group size (no quadratic stage on boilerplate)") {
    // one hot fingerprint with 1,000 copies + two small groups + singletons
    val rows =
      (0 until 1000).map(i => (i.toLong, "hot")) ++
        Seq((2000L, "g1"), (2001L, "g1"), (3000L, "g2"), (3001L, "g2"), (3002L, "g2")) ++
        Seq((4000L, "solo1"), (4001L, "solo2"))
    val fp = rows.toDF("id", "f")
    val edges = Dedup.exactDupEdges(fp, "id", "f")
    // a within-group self-join would emit 1000*999/2 = 499,500 pairs for the
    // hot group; the star builder emits exactly group_size-1 edges per group
    assert(edges.count() === 999L + 1L + 2L)
    assert(edges.where(col("id_a") === 0L).count() === 999L)
    // components over the star graph label every member with the group min
    val comp = Dedup.components(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L until 1000L).forall(comp(_) == 0L))
    assert(comp(2001L) === 2000L && comp(3001L) === 3000L && comp(3002L) === 3000L)
    // singletons appear in no edge and thus in no component row
    assert(!comp.contains(4000L) && !comp.contains(4001L))
  }

  test("componentsStar matches union-find ground truth on varied random graphs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val n = 60 + trial * 20
      val edges = (1 to n).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find ground truth
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val truth = nodes.map(x => x -> find(x)).toMap
      // verifyConvergenceExactly: every round the (count, checksum)
      // fixed-point signature is asserted against the exact two-anti-join
      // set equality — the production check and the debug check must agree
      val got = Dedup.componentsStar(edges.toDF("id_a", "id_b"),
          verifyConvergenceExactly = true).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === truth, s"trial $trial (n=$n)")
    }
  }

  test("componentsStar converges logarithmically where label propagation cannot") {
    // a 400-deep chain: diameter 399 ≫ components' 25-round safety rail,
    // but star contraction needs only O(log n) rounds
    val chain = (0L until 399L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException](Dedup.components(chain).collect())
    val labels = Dedup.componentsStar(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length === 400)
    assert(labels.forall(_._2 == 0L), "every chain node must label to the min")
    // parity with components on a near-clique dup-group shape
    val groups = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("id_a", "id_b")
    val a = Dedup.components(groups).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Dedup.componentsStar(groups).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("winnowPairs finds mutated twins through the inverted index, skew-capped") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val corpus = TextOps.withMutatedTwins(docs, "doc_id", "text")
    // minShared must respect the corpus' shortest docs: a ~12-word doc only
    // has a handful of distinct fingerprints, so an absolute 8 misses its
    // twin even though they share nearly everything (winnowing is local —
    // a suffix mutation leaves all earlier window minima identical)
    val pairs = Dedup.winnowPairs(corpus, "doc_id", "text", minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val twins = docs.where(col("doc_id") % 50 === 0).select("doc_id").collect()
      .map(_.getLong(0)).map(id => (-id - 1, id)).toSet
    twins.foreach(t => assert(pairs.contains(t), s"missed twin $t"))
    // boilerplate: one hot fingerprint set duplicated 500× must be capped,
    // not joined quadratically
    val boiler = (0 until 500).map(i => (i.toLong,
      "the exact same boilerplate sentence repeated across every document in the corpus"))
      .toDF("doc_id", "text")
    val capped = Dedup.winnowPairs(boiler, "doc_id", "text", minShared = 1, maxBucket = 100)
    assert(capped.count() === 0, "hot fingerprints above the cap must be dropped")
  }

  test("winnowPairs window-count formulation equals the unfiltered inverted-index groupBy join") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val corpus = TextOps.withMutatedTwins(docs, "doc_id", "text")
    // spans the parameter space: prose default, the tight oracle cap, and
    // minShared=1 (prefix = whole set, the no-filter degenerate case)
    for ((minShared, maxBucket) <- Seq((3, 10000), (8, 512), (1, 100))) {
      val got = Dedup.winnowPairs(corpus, "doc_id", "text",
          minShared = minShared, maxBucket = maxBucket)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // reference: the unfiltered capped inverted-index self-join (the
      // pre-prefix-filter formulation, also the oracle's semantics)
      val inv = TextOps.winnowingFingerprints(corpus, "doc_id", "text")
        .select(col("id"), explode(col("fingerprints")).as("f"))
      val small = inv.groupBy("f").agg(count(lit(1)).as("_n"))
        .where(col("_n") <= maxBucket).select("f")
      val pruned = inv.join(small, Seq("f"))
      val want = pruned.select(col("f"), col("id").as("id_a"))
        .join(pruned.select(col("f"), col("id").as("id_b")), Seq("f"))
        .where(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
        .where(col("shared") >= minShared)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === want, s"minShared=$minShared maxBucket=$maxBucket")
      graft.engine.Caches.releaseAll()
    }
  }

  test("dupSpans reports duplicated-window coverage exactly, with the skew cap") {
    val a = (0 until 30).map(i => s"a$i").mkString(" ")       // 30 tokens
    val cShared = (0 until 25).map(i => s"a$i").mkString(" ") // 25-token run of A
    val c = ((0 until 5).map(i => s"c$i") ++ (0 until 25).map(i => s"a$i") ++
      (5 until 10).map(i => s"c$i")).mkString(" ")            // 35 tokens
    val d = (0 until 30).map(i => s"d$i").mkString(" ")       // unique
    val corpus = Seq((1L, a), (2L, a), (3L, c), (4L, d)).toDF("doc_id", "text")
    val out = Dedup.dupSpans(corpus, "doc_id", "text", k = 20)
      .collect().map(r => r.getLong(0) -> r).toMap
    // docs 1/2 are verbatim dups: every window duplicated, full coverage
    Seq(1L, 2L).foreach { id =>
      assert(out(id).getAs[Int]("n_dup_windows") === 11) // 30 - 20 + 1
      assert(out(id).getAs[Int]("dup_tokens") === 30)
      assert(out(id).getAs[Double]("dup_frac") === 1.0)
    }
    // doc 3 shares a 25-token run → windows at offsets 0..5 of the run
    assert(out(3L).getAs[Int]("n_dup_windows") === 6)
    assert(out(3L).getAs[Int]("dup_tokens") === 25)
    assert(math.abs(out(3L).getAs[Double]("dup_frac") - 25.0 / 35) < 1e-12)
    // doc 1's own coverage: positions 0..24 duplicated into doc 3 — but its
    // verbatim twin already covers everything, so coverage stays 1.0 (above)
    assert(!out.contains(4L), "unique doc must not appear")
    // boilerplate: 500 identical docs with a low cap → hash dropped, no rows
    assert(cShared.nonEmpty)
    val boiler = (0 until 500).map(i => (i.toLong, a)).toDF("doc_id", "text")
    assert(Dedup.dupSpans(boiler, "doc_id", "text", k = 20, maxBucket = 100).count() === 0)
  }

  test("scrubDupSpans keeps exactly one canonical copy of every duplicated run") {
    val a = (0 until 30).map(i => s"a$i").mkString(" ")       // 30 tokens
    val c = ((0 until 5).map(i => s"c$i") ++ (0 until 25).map(i => s"a$i") ++
      (5 until 10).map(i => s"c$i")).mkString(" ")            // 35 tokens
    val d = (0 until 30).map(i => s"d$i").mkString(" ")       // unique
    val corpus = Seq((1L, a), (2L, a), (3L, c), (4L, d)).toDF("doc_id", "text")
    val out = Dedup.scrubDupSpans(corpus, "doc_id", "text", k = 20)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L), "every doc appears, scrubbed or not")
    // doc 1 holds the canonical (min (id, pos)) occurrences → keeps its text
    assert(out(1L).getAs[String]("kept_text") === a)
    assert(out(1L).getAs[Int]("dup_tokens") === 0)
    // doc 2 is a verbatim copy → fully scrubbed
    assert(out(2L).getAs[String]("kept_text") === "")
    assert(out(2L).getAs[Int]("dup_tokens") === 30)
    // doc 3 loses its shared 25-token run but keeps the unique flanks
    assert(out(3L).getAs[String]("kept_text") ===
      ((0 until 5) ++ (5 until 10)).map(i => s"c$i").mkString(" "))
    assert(out(3L).getAs[Int]("dup_tokens") === 25)
    // unique doc untouched
    assert(out(4L).getAs[String]("kept_text") === d)
    // conservation: kept token count == n_tokens - dup_tokens, every doc
    out.values.foreach { r =>
      val kept = r.getAs[String]("kept_text")
      val n = if (kept.isEmpty) 0 else kept.split(" ").length
      assert(n === r.getAs[Int]("n_tokens") - r.getAs[Int]("dup_tokens"))
    }
    // boilerplate above the cap is EXEMPT from scrubbing (same skew
    // discipline as dupSpans — a site-wide template is policy, not a dup)
    val boiler = (0 until 500).map(i => (i.toLong, a)).toDF("doc_id", "text")
    val scrubbed = Dedup.scrubDupSpans(boiler, "doc_id", "text", k = 20, maxBucket = 100)
      .collect()
    assert(scrubbed.forall(_.getAs[Int]("dup_tokens") === 0))
  }

  test("incrementalNew keeps one doc per new fingerprint and drops known ones") {
    val existing = Seq((10L, "alpha beta"), (20L, "gamma delta")).toDF("doc_id", "text")
    val newBatch = Seq(
      (100L, "ALPHA   beta"),   // normalizes to a known fingerprint → dropped
      (200L, "epsilon zeta"),   // fresh
      (201L, "epsilon  ZETA"),  // in-batch dup of 200 → min id kept
      (300L, "eta theta")).toDF("doc_id", "text")
    val accepted = Dedup.incrementalNew(newBatch, existing, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(accepted === Set(200L, 300L))
    // steady-state shape: same result against a pre-materialized index
    val fpIndex = existing.select(
      TextOps.fingerprint(coalesce(col("text"), lit(""))).as("f")).distinct()
    val viaIndex = Dedup.incrementalNewVsFingerprints(newBatch, fpIndex, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(viaIndex === accepted)
  }

  test("keepBest keeps the highest-quality cluster member, smallest id on ties") {
    val docs = Seq(
      (1L, "Hello world"),       // same fingerprint as 2, cleaner raw text
      (2L, "HELLO    WORLD..."), // same normalized?? no — trailing dots differ
      (3L, "solo doc here")).toDF("doc_id", "text")
    // construct a REAL same-fingerprint cluster: same normalized text,
    // different raw spacing (space_ratio differs → different scores)
    val cluster = Seq(
      (10L, "the quick brown fox"),
      (11L, "the  quick  brown  fox"),   // doubled spaces: lower alpha ratio
      (12L, "the quick brown fox"))      // verbatim tie with 10 → min id
      .toDF("doc_id", "text")
    val out = Dedup.keepBest(cluster, "doc_id", "text").collect()
    assert(out.length === 1)
    val r = out(0)
    // 10 and 12 tie on score (identical text); 11 scores lower (extra
    // spaces dilute alpha ratio but raise space ratio — verify by compute)
    val scores = cluster.select(col("doc_id"),
        TextOps.qualityColumns(col("text")).toMap.apply("quality_score").as("s"))
      .collect().map(row => row.getLong(0) -> row.getDouble(1)).toMap
    val expectedWinner =
      if (scores(11L) > scores(10L)) 11L else 10L // ties within {10,12} → 10
    assert(r.getAs[Long]("keep_id") === expectedWinner)
    assert(r.getAs[Long]("n_members") === 3L)
    assert(docs.count() === 3) // silence unused warning path
  }

  test("quantizeInt8 uses half-up rounding, clamps, and reports exact RMSE") {
    val vecs = Seq(
      (1L, Seq(1.0f, -0.5f, 0.0f)),
      (2L, Seq(0.0f, 0.0f)),
      (3L, Seq(-2.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(vecs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(math.abs(r1.getAs[Double]("scale") - 1.0 / 127) < 1e-15)
    // -0.5/scale = -63.5 → floor(-63.5 + 0.5) = -63 (half-up, not half-away)
    assert(r1.getAs[Seq[Int]]("codes") === Seq(127, -63, 0))
    val scale = 1.0 / 127
    val expectedRmse = math.sqrt((math.pow(1.0 - 127 * scale, 2) +
      math.pow(-0.5 - (-63) * scale, 2) + 0.0) / 3)
    assert(math.abs(r1.getAs[Double]("rmse") - expectedRmse) < 1e-12)
    assert(out(2L).getAs[Double]("scale") === 0.0)
    assert(out(2L).getAs[Seq[Int]]("codes") === Seq(0, 0))
    assert(out(2L).getAs[Double]("rmse") === 0.0)
    assert(out(3L).getAs[Seq[Int]]("codes") === Seq(-127, 64)) // 1/(2/127)=63.5 → 64
  }

  test("media features derive from decoded content (pixel/PCM/content-byte formulas)") {
    // PNG i=5: feature f samples the decoded blue channel at (f % w, (f*3) % h)
    val i = 5
    val (w, h) = MediaOps.pngDims(i)
    val (dw, dh, fr, feat) = MediaOps.Decoder.decode("image/png", MediaOps.pngPayload(i))
    assert((dw, dh, fr) === ((w, h, 1)))
    for (f <- 0 until 8) {
      val expected = (((f % w) * 31 + ((f * 3) % h) * 17 + i * 7919) % 256 + 1 + f) / 300.0f
      assert(feat(f) === expected, s"pixel feature $f")
    }
    // WAV i=7: feature f samples the PCM low byte of sample (f*5) % n
    val n = MediaOps.wavFrames(7)
    val (_, _, fr2, feat2) = MediaOps.Decoder.decode("audio/wav", MediaOps.wavPayload(7))
    assert(fr2 === n)
    for (f <- 0 until 8) {
      val j = (f * 5) % n
      val expected = ((7 * 31 + j * 7) % 32768 % 256 + 1 + f) / 300.0f
      assert(feat2(f) === expected, s"pcm feature $f")
    }
    // GFTV: feature f samples content byte (f*3) % 16 (md5 of the ref)
    val payload = MediaOps.videoPayload("m-2", 2)
    val md5 = java.security.MessageDigest.getInstance("MD5").digest("m-2".getBytes("UTF-8"))
    val (_, _, _, feat3) = MediaOps.Decoder.decode("video/mp4", payload)
    for (f <- 0 until 8) {
      val expected = ((md5((f * 3) % 16) & 0xff) + 1 + f) / 300.0f
      assert(feat3(f) === expected, s"content feature $f")
    }
  }
}
