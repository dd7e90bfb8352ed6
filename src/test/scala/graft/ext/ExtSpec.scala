package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Envelopes

/** Dedup + similarity extension checks that the SQL oracle cannot express:
  * LSH recall vs the exhaustive path, IVF recall vs brute force. */
class ExtSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("MinHash+LSH finds exactly the exhaustive n-gram Jaccard pairs") {
    val docs = Envelopes.table(spark, sfDir(), "documents")
    val sh = Dedup.shingles(docs, col("doc_id"), col("text"))
    val exact = pairs(Dedup.ngramJaccardPairs(sh, 1, 2))
    val lsh = pairs(Dedup.minhashLshPairs(sh, 1, 2))
    assert(lsh == exact)
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
  }

  test("prefix-filtered AllPairs equals the exhaustive n-gram Jaccard pairs") {
    val docs = Envelopes.table(spark, sfDir(), "documents")
    val sh = Dedup.shingles(docs, col("doc_id"), col("text"))
    val exact = Dedup.ngramJaccardPairs(sh, 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val pfx = Dedup.ngramJaccardPairsPrefix(sh, 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(pfx == exact, s"prefix filter must be lossless: " +
      s"missing ${exact.diff(pfx).size}, extra ${pfx.diff(exact).size}")
    assert(exact.nonEmpty, "fixture should contain near-dups")
    // the point of the algorithm: the prefix index is a strict subset
    val full = sh.count()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("__df"), col("s"))
    val pref = sh.join(sh.groupBy("s").agg(count(lit(1)).as("__df")), Seq("s"))
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      .filter(col("__rk") <= col("__n") - expr("(__n * 1 + 1) div 2") + 1)
      .count()
    assert(pref < full, s"prefix index ($pref) must shrink the full index ($full)")
  }

  test("positional filter is lossless on random corpora at several thresholds") {
    val s = spark
    import s.implicits._
    // adversarial shape for the positional filter: tiny vocab (every
    // shingle common), WIDELY varied doc lengths, seeded for reproducibility
    val rnd = new scala.util.Random(42)
    val vocab = ('a' to 'k').map(_.toString)
    val docs = (1L to 60L).map { id =>
      val len = 3 + rnd.nextInt(20)
      id -> Array.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val sh = docs.flatMap { case (id, t) =>
      val toks = t.split(" ")
      toks.sliding(3).map(_.mkString(" ")).toSeq.distinct.map(id -> _)
    }.toDF("doc_id", "s")
    for ((num, den) <- Seq((1, 2), (3, 10), (4, 5), (1, 1))) {
      val exact = Dedup.ngramJaccardPairs(sh, num, den)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val pfx = Dedup.ngramJaccardPairsPrefix(sh, num, den)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pfx == exact, s"positional/prefix filter lost pairs at $num/$den: " +
        s"missing ${exact.diff(pfx).size}, extra ${pfx.diff(exact).size}")
    }
  }

  test("SimHash pairs contain the highest-Jaccard near-dups") {
    val docs = Envelopes.table(spark, sfDir(), "documents")
    val sh = Dedup.shingles(docs, col("doc_id"), col("text"))
    // very-near dups (Jaccard >= 9/10): all within Hamming 8, most within 2
    // (short docs amplify simhash bit noise — observed max is 5 on sf0.001)
    val topJac = pairs(Dedup.ngramJaccardPairs(sh, 9, 10))
    val fps = Dedup.simhash32(docs, col("doc_id"), col("text"))
    val loose = pairs(Dedup.simhashPairs(fps, 8, bands = 16))
    val tight = pairs(Dedup.simhashPairs(fps, 2))
    assert(topJac.subsetOf(loose),
      s"missing ${topJac.diff(loose).size} of ${topJac.size} near-dup pairs at ham<=8")
    val frac = topJac.intersect(tight).size.toDouble / topJac.size
    assert(frac >= 0.7, s"only $frac of near-dups within ham<=2")
  }

  test("connected components are transitive and pick the minimum keeper") {
    val s = spark
    import s.implicits._
    // chain 1-2, 2-3 (one cluster) plus isolated pair 10-11
    val edges = Seq((2L, 3L), (1L, 2L), (10L, 11L)).toDF("a_id", "b_id")
    val got = Dedup.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connected components fail loudly when the diameter exceeds maxIter") {
    val s = spark
    import s.implicits._
    val chain = (1L to 6L).sliding(2).map(w => (w.head, w.last)).toSeq.toDF("a_id", "b_id")
    // the guard is a DISTRIBUTED-loop convergence check (a split cluster
    // must never return silently); force that path — the driver-local
    // union-find fast path is exact at any diameter and never throws
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 2, driverLocalMaxEdges = 0L)
        .collect()
    }
    // and converge fine when given room
    val ok = Dedup.connectedComponents(chain, maxIter = 10,
        driverLocalMaxEdges = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok.values.toSet == Set(1L))
    // the fast path returns the same components regardless of maxIter
    val fp = Dedup.connectedComponents(chain, maxIter = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp == ok)
  }

  test("SRP-LSH near-dup pairs: precision 1 and near-total recall vs brute force") {
    val e = Envelopes.table(spark, sfDir(), "embeddings")
    val brute = pairs(Similarity.cosinePairs(e, 0.45))
    val lsh = pairs(Similarity.srpPairs(e, 0.45, dim = 64))
    assert(lsh.subsetOf(brute), "exact verify must make precision 1")
    assert(brute.nonEmpty)
    val recall = lsh.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"SRP recall = $recall")
  }

  test("srpParams picks max-width bands meeting the recall floor in budget") {
    // weak threshold 0.45 (p ≈ 0.648): widest feasible band is 3 bits —
    // 15 bands reach 0.99; 4-bit bands would need 24 bands (96 bits > 63)
    assert(Similarity.srpParams(0.45, 0.99) == (45, 15))
    // high threshold 0.9 (p ≈ 0.856): 6-bit bands, 10 of them (60 bits)
    assert(Similarity.srpParams(0.9, 0.99) == (60, 10))
    // every computed pair satisfies its own contract: algebraic recall at or
    // above the floor, bit budget respected, band width divides the bits
    for (t <- Seq(0.3, 0.45, 0.6, 0.75, 0.9); f <- Seq(0.95, 0.99)) {
      val (bits, bands) = Similarity.srpParams(t, f)
      assert(bits <= 63 && bits % bands == 0, s"($bits, $bands) at $t/$f")
      val r = Similarity.srpRecall(t, bits, bands)
      assert(r >= f, s"recall $r < floor $f at threshold $t")
      // and maximality: one more bit per band cannot still meet the floor
      // within the budget (otherwise srpParams left pruning power unused)
      val g = bits / bands
      if (g < 31) {
        val p = 1.0 - math.acos(t) / math.Pi
        val bNeeded = math.ceil(math.log1p(-f) / math.log1p(-math.pow(p, g + 1)))
        assert((g + 1) * bNeeded > 63, s"wider band was feasible at $t/$f")
      }
    }
    // the round-5 hand-derived 63/21 sits above the same floor the auto
    // params target — the function would have found a cheaper equivalent
    assert(Similarity.srpRecall(0.45, 63, 21) >= 0.99)
  }

  test("lshParams picks max-width MinHash bands meeting the recall floor in budget") {
    // verify threshold j = 1/2: widest feasible band is 3 hashes — 35 bands
    // reach 0.99; 4-hash bands would need 72 (288 signatures > 128)
    assert(Dedup.lshParams(1, 2, 0.99) == ((105, 35)))
    // j = 9/10: 10-hash bands, 11 of them (110 signatures)
    assert(Dedup.lshParams(9, 10, 0.99) == ((110, 11)))
    // the engine default (32, 16) is the r = 2 point on the same curve —
    // the minimal-band solution at a 0.989 floor in a 32-signature budget —
    // recalling 0.9900 (to 4 digits) at the j = 1/2 verify threshold
    assert(Dedup.lshParams(1, 2, 0.989, maxK = 32) == ((32, 16)))
    assert(Dedup.lshRecall(1, 2, 32, 16) >= 0.9899)
    // every computed pair satisfies its own contract, maximally wide
    for ((n, d) <- Seq((1, 2), (7, 10), (9, 10)); f <- Seq(0.9, 0.99)) {
      val (k, b) = Dedup.lshParams(n, d, f)
      assert(k <= 128 && k % b == 0, s"($k, $b) at $n/$d/$f")
      assert(Dedup.lshRecall(n, d, k, b) >= f, s"($n/$d, $f) -> ($k, $b)")
      val r = k / b
      if (r < 128) {
        val j = n.toDouble / d
        val bNeeded = math.ceil(math.log1p(-f) / math.log1p(-math.pow(j, r + 1)))
        assert((r + 1) * bNeeded > 128, s"wider band was feasible at $n/$d/$f")
      }
    }
  }

  test("minhashLshPairsAuto finds planted near-dups at derived params") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then runs far away home"),
      (2L, "the quick brown fox jumps over the lazy dog and then runs far away tonight"),
      (3L, "a completely different sentence about training data curation pipelines at scale"),
      (4L, "bright copper kettles whistle softly inside the warm old kitchen every morning")
    ).toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, col("doc_id"), col("text"))
    val auto = Dedup.minhashLshPairsAuto(sh, 1, 2)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto == Set((1L, 2L)), s"$auto")
  }

  test("srpPairsAuto keeps precision 1 and the target recall on real data") {
    val e = Envelopes.table(spark, sfDir(), "embeddings")
    val brute = pairs(Similarity.cosinePairs(e, 0.45))
    val auto = pairs(Similarity.srpPairsAuto(e, 0.45, dim = 64))
    assert(auto.subsetOf(brute), "exact verify must make precision 1")
    val recall = auto.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"auto-param SRP recall = $recall")
  }

  test("semDedup keeps exactly one of each co-clustered near-dup pair") {
    val s = spark
    import s.implicits._
    val e = Envelopes.table(spark, sfDir(), "embeddings")
    val out = Similarity.semDedup(e, k = 8, threshold = 0.45).persist()
    assert(out.count() == e.count(), "one verdict row per input vector")
    val kept = out.filter(col("kept") === 1)
      .select("vec_id").as[Long].collect().toSet
    val label = out.select("vec_id", "label").as[(Long, Int)].collect().toMap
    val dups = pairs(Similarity.cosinePairs(e, 0.45))
    assert(dups.nonEmpty, "fixture should contain planted embedding near-dups")
    // a near-dup pair inside one cluster loses exactly one member; a pair
    // split across clusters is outside the operator's contract (the paper's
    // recall dial is k) and may keep both
    val coClustered = dups.filter { case (a, b) => label(a) == label(b) }
    coClustered.foreach { case (a, b) =>
      assert(!(kept(a) && kept(b)), s"both of co-clustered near-dups ($a,$b) kept")
    }
    // chains may drop both members of a middle pair (one-pass dominance),
    // but each cluster's dup-involved set keeps its best-priority member
    coClustered.flatMap(p => Seq(p._1, p._2)).groupBy(label).foreach {
      case (l, members) => assert(members.exists(kept),
        s"cluster $l dropped every dup-involved vector")
    }
    // a vector with no ≥-threshold neighbor in its cluster is never dropped
    val inDup = dups.flatMap(p => Seq(p._1, p._2))
    out.filter(col("kept") === 0).select("vec_id").as[Long].collect()
      .foreach(v => assert(inDup.contains(v), s"$v dropped without a near-dup"))
    // deterministic under input repartitioning
    val again = Similarity.semDedup(e.repartition(7), k = 8, threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(again == out.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet)
    out.unpersist()
  }

  test("IVF probed top-k recalls a reasonable share of brute-force neighbors") {
    val e = Envelopes.table(spark, sfDir(), "embeddings")
    val q = e.filter(col("vec_id") < 10)
    def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = topk(Similarity.bruteForceTopK(q, e, 5))
    val ivf = topk(Similarity.ivfTopK(q, e, 5, nProbe = 2))
    assert(ivf.keySet == brute.keySet)
    ivf.foreach { case (_, ns) => assert(ns.size == 5) }
    val recall = brute.map { case (k, bs) => ivf(k).intersect(bs).size.toDouble / bs.size }
      .sum / brute.size
    assert(recall >= 0.2, s"IVF recall@5 = $recall") // 2 of 10 random clusters probed
  }

  test("k-means labels are deterministic, in range, and drive a working IVF index") {
    val e = Envelopes.table(spark, sfDir(), "embeddings")
    def run(): Map[Long, Int] =
      Similarity.kmeansLabels(e, k = 8, iters = 3).collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val l1 = run()
    val l2 = run()
    assert(l1 == l2, "two identical fits diverged — centroid math is not order-free")
    assert(l1.nonEmpty && l1.values.forall(l => l >= 0 && l < 8))
    assert(l1.values.toSet.size > 1, "all vectors collapsed into one cell")
    // composed index-build + probe path: recall vs brute force stays usable
    val q = e.filter(col("vec_id") < 10)
    def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = topk(Similarity.bruteForceTopK(q, e, 5))
    val relabeled = e.drop("label")
      .join(Similarity.kmeansLabels(e, k = 8, iters = 3), "vec_id")
    val ivf = topk(Similarity.ivfTopK(q, relabeled, 5, nProbe = 2))
    val recall = brute.map { case (k, bs) => ivf(k).intersect(bs).size.toDouble / bs.size }
      .sum / brute.size
    assert(recall >= 0.2, s"IVF-over-kmeans recall@5 = $recall")
  }

  test("ivfParams derives the probe dial from measured recall; structured cells need fewer probes than random cells") {
    val e = Envelopes.table(spark, sfDir(), "embeddings")
    val sample = e.filter(col("vec_id") % 7 === 0).select("vec_id", "embedding")
    // the curve is a valid CDF: recall monotone, exactly 1.0 when every
    // cluster is probed, scanning the whole corpus at the far end
    val cdf = Similarity.ivfProbeCdf(e, sample).orderBy("p").collect()
      .map(r => (r.getAs[Int]("p"), r.getAs[Double]("recall"), r.getAs[Double]("scan_frac")))
    assert(cdf.map(_._1).toSeq == (1 to cdf.length).toSeq)
    assert(cdf.sliding(2).forall { case Array(a, b) => a._2 <= b._2 && a._3 <= b._3 })
    assert(cdf.last._2 == 1.0 && math.abs(cdf.last._3 - 1.0) < 1e-9)
    // the dial reflects measured structure: the testdata's random label
    // column spreads true neighbors uniformly over cells (recall ≈ p/k, so
    // a high floor forces probing almost everything), while k-means cells
    // concentrate them (few probes suffice) — the calibration SEES that
    val relabeled = e.drop("label")
      .join(Similarity.kmeansLabels(e, k = 8, iters = 3), "vec_id")
    val pRandom = Similarity.ivfParams(e, sample, recallFloor = 0.9)
    val pKmeans = Similarity.ivfParams(relabeled, sample, recallFloor = 0.9)
    assert(pKmeans < pRandom,
      s"kmeans cells should need fewer probes: $pKmeans vs $pRandom")
    // pin the derived dials byte-for-byte (deterministic sample, exact
    // centroid math): sf0.001's random 10-cell labels need 8 probes at a
    // 0.9 floor, the 8-cell kmeans fit needs 6 — the synthetic embeddings
    // are near-uniform, so even real cells only concentrate mildly here
    assert((pRandom, pKmeans) == ((8, 6)), s"($pRandom, $pKmeans)")
  }

  test("DF cap kills boilerplate-only pairs, keeps rare-shingle near-dups") {
    import spark.implicits._
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    // 40 docs whose ONLY mutual overlap is the shared boilerplate phrase
    // (each ends in a doc-unique token), plus one genuine near-dup pair on
    // rare content shingles
    val docs = ((1L to 40L).map(i => (i, s"$boiler u$i")) ++ Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta"),
      (101L, "alpha beta gamma delta epsilon zeta eta iota"))).toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, col("doc_id"), col("text"))
    // uncapped: the boilerplate drives C(40,2) = 780 quadratic pairs
    val uncapped = Dedup.ngramJaccardPairs(sh, 1, 2).count()
    assert(uncapped >= 780L, s"fixture should blow up uncapped, got $uncapped")
    // capped at 8 docs: every boilerplate shingle (df = 40) is dropped, the
    // doc-unique bridge shingles can't intersect, and only the genuine
    // rare-shingle pair survives
    val capped = Dedup.ngramJaccardPairsCapped(sh, 1, 2, maxDf = 8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L)), s"capped pairs: $capped")
  }

  test("containment finds the embedded doc Jaccard misses; ties pick the smaller id") {
    import spark.implicits._
    val core = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, core),                                       // inner: 3 shingles
      (2L, s"intro words here $core closing words here"), // outer: embeds core
      (3L, "totally unrelated content stream of words"),
      (10L, "mirror twin text payload body"),            // identical pair →
      (11L, "mirror twin text payload body")             // tie on set size
    ).toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, col("doc_id"), col("text"))
    val got = Dedup.containmentPairs(sh, 1, 1)
      .select("inner_id", "outer_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // (1 in 2): full embedding; (10, 11): identical sets, inner = smaller id.
    // Jaccard(1,2) = 3/11 — far below any dedup threshold, yet doc 1 is a
    // pure sub-document of doc 2.
    assert(got == Set((1L, 2L), (10L, 11L)), s"pairs: $got")
    val jac = Dedup.ngramJaccardPairs(sh, 1, 2)
      .filter(col("a_id") === 1L && col("b_id") === 2L).count()
    assert(jac == 0L, "fixture must be a Jaccard miss for the claim to hold")
  }

  test("matryoshka truncation keeps k dims at unit norm; zero prefix stays zero") {
    import spark.implicits._
    val fixture = Seq(
      (1L, Array(3.0f, 4.0f, 9.9f, -2.0f)),       // prefix (3,4): norm 5
      (2L, Array(0.0f, 0.0f, 7.5f, 1.0f)),        // zero PREFIX, nonzero tail
      (3L, Array(-1.5f, 0.5f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.matryoshka(fixture, 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(out(1) == Seq(0.6f, 0.8f)) // exact: 3/5, 4/5
    assert(out(2) == Seq(0.0f, 0.0f)) // zero prefix: no NaNs
    // real corpus: every truncated vector is unit-norm within float rounding
    val e = Envelopes.table(spark, sfDir(), "embeddings")
    val worst = Similarity.matryoshka(e, 16)
      .select(abs(Similarity.dot(col("emb_k"), col("emb_k")) - lit(1.0)).as("err"))
      .agg(max(col("err"))).collect()(0).getDouble(0)
    assert(worst <= 1e-6, s"renormalized norm drifts by $worst")
  }

  test("int8 quantization bounds codes, reconstructs within half a step, zero-vector safe") {
    import spark.implicits._
    val fixture = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f)),         // zero vector: scale 0, all-zero codes
      (3L, Array(-3.75f, 3.75f, 1.875f))
    ).toDF("vec_id", "embedding")
    val rows = Similarity.quantizeInt8(fixture).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getSeq[Int](3)))).toMap
    assert(rows(2) == ((0.0, Seq(0, 0, 0))))
    // max|x| maps to ±127 exactly; every code is in [-127, 127]
    assert(rows(3)._2 == Seq(-127, 127, 64))
    assert(rows.values.forall(_._2.forall(q => q >= -127 && q <= 127)))
    // reconstruction: |q/scale - x| <= 0.5/scale elementwise (real corpus)
    val e = Envelopes.table(spark, sfDir(), "embeddings")
    val worst = Similarity.quantizeInt8(e)
      .join(e, "vec_id")
      .select(greatest((for (i <- 0 until 4) yield
        abs(col("q").getItem(i) - col("embedding").getItem(i) * col("scale"))): _*).as("err"))
      .agg(max(col("err"))).collect()(0).getDouble(0)
    assert(worst <= 0.5 + 1e-9, s"worst rounding residual $worst exceeds half a step")
    // determinism under repartitioning
    val a = Similarity.quantizeInt8(e).select("vec_id", "q").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = Similarity.quantizeInt8(e.repartition(7, col("label"))).select("vec_id", "q")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a == b && a.nonEmpty)
  }

  test("mmrSelect: relevance pick first, diversity flip second, ties to lower id, bounded picks") {
    import spark.implicits._
    // d1 most relevant; d2 near-identical to d1; d3 orthogonal but weak;
    // d4 relevant-ish and similar to d1
    val cands = Seq(
      (1L, 10L, Seq(10, 0)),
      (2L, 9L, Seq(10, 0)),
      (3L, 1L, Seq(0, 10)),
      (4L, 8L, Seq(9, 1))
    ).toDF("doc_id", "rel", "q")
    val out = Similarity.mmrSelect(cands, k = 3, a = 10L, b = 1L)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // step 1: pure relevance -> d1 (10*10). step 2: d2/d4 are punished by
    // similarity to d1 (100 / 90), the orthogonal d3 wins at 10*1 - 0.
    // step 3: d2 (90-100) ties d4 (80-90) at -10 -> lower doc_id wins.
    assert(out == Seq((1L, 1L, 100L), (2L, 3L, 10L), (3L, 2L, -10L)), s"$out")
    // k beyond the shortlist yields exactly the shortlist, in order
    val all = Similarity.mmrSelect(cands, k = 10, a = 10L, b = 1L).collect()
    assert(all.length == 4)
    // partitioning never changes the picks
    val re = Similarity.mmrSelect(cands.repartition(5), k = 3, a = 10L, b = 1L)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(re == out)
  }
}
