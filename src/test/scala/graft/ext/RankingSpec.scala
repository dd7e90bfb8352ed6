package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Envelopes

/** Ranking operators (TF-IDF, BM25) + the Gopher gate and label-centroid
  * ops: the load-bearing properties are rank determinism under
  * repartitioning (float scores must be built from IEEE-exact ops in a
  * fixed order) and agreement with a row-at-a-time reference computation.
  */
class RankingSpec extends SparkSpec {

  private def docs = Envelopes.table(spark, sfDir(), "documents")
  private def embs = Envelopes.table(spark, sfDir(), "embeddings")

  test("tfIdfTop ranks rarest-heavy terms first and is partition-stable") {
    def run(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, String)] =
      Ranking.tfIdfTop(df, col("doc_id"), col("text"), topK = 3)
        .orderBy(col("doc_id"), col("rk"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    val a = run(docs)
    val b = run(docs.repartition(13, col("source")))
    assert(a == b && a.nonEmpty)
    // every doc yields at most topK rows, ranks are 1..k contiguous
    a.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._2).sorted == (1 to rows.size))
    }
    // spot-check one document against a local reference computation
    val docId = a.head._1
    val text = docs.filter(col("doc_id") === docId)
      .select("text").collect().head.getString(0)
    val tf = text.toLowerCase.split(" ").groupBy(identity).view.mapValues(_.length)
    val dfMap = Ranking.tfIdfTop(docs, col("doc_id"), col("text"), topK = 3)
      .filter(col("doc_id") === docId)
      .select("term", "tf", "df").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    dfMap.foreach { case (term, t, _) => assert(tf(term).toLong == t, term) }
  }

  test("bm25 top-k is deterministic and favors term-dense short docs") {
    val terms = Seq("spark", "window")
    def run(df: org.apache.spark.sql.DataFrame): Seq[(Int, Long)] =
      Ranking.bm25(df, col("doc_id"), col("text"), terms, topK = 10)
        .select("rk", "doc_id").collect()
        .map(r => (r.getInt(0), r.getLong(1))).toSeq.sorted
    val a = run(docs)
    assert(a.map(_._1) == (1 to 10))
    assert(a == run(docs.repartition(7, col("doc_id"))))
    // every returned doc contains at least one query term
    val hits = Ranking.bm25(docs, col("doc_id"), col("text"), terms, topK = 10)
    hits.collect().foreach { r =>
      assert(r.getLong(r.fieldIndex("tf_0")) + r.getLong(r.fieldIndex("tf_1")) > 0)
    }
  }

  test("bm25Batch: one pass agrees with the per-query operator; quantized sum is exact") {
    val s = spark
    import s.implicits._
    // ranking parity: the quantized multi-query pass must order docs as
    // the single-query float operator does (1e-9 resolution sits far
    // below real score gaps; doc_id breaks ties in both)
    val qt = Seq((0L, "spark"), (0L, "window")).toDF("query_id", "term")
    val multi = Ranking.bm25Batch(docs, col("doc_id"), col("text"), qt,
        topK = 10)
      .select("rk", "doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq.sorted
    val single = Ranking.bm25(docs, col("doc_id"), col("text"),
        Seq("spark", "window"), topK = 10)
      .select("rk", "doc_id").collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1))).toSeq.sorted
    assert(multi == single)
    // hand-computed fixture: 2 docs, dl 4 and 2, term 'x' in both
    // (df=2), 'y' only in doc 1 (df=1); n=2, avgdl=3
    val d2 = Seq((1L, "x x y z"), (2L, "x w")).toDF("doc_id", "text")
    val q2 = Seq((7L, "x"), (7L, "y")).toDF("query_id", "term")
    def sc(tf: Long, df: Long, dl: Long): Long =
      math.floor((2.0 / df) * (tf * 2.25) /
        (tf + 1.25 * (0.25 + 0.75 * (dl / 3.0))) * 1e9).toLong
    val got = Ranking.bm25Batch(d2, col("doc_id"), col("text"), q2,
      topK = 10).collect()
      .map(r => r.getLong(2) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) == ((2L, sc(2, 2, 4) + sc(1, 1, 4))))
    assert(got(2L) == ((1L, sc(1, 2, 2))))
    // partition-stable: integer sums are order-free by construction
    val rep = Ranking.bm25Batch(d2.repartition(5), col("doc_id"),
      col("text"), q2.repartition(3), topK = 10).collect()
      .map(r => r.getLong(2) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(rep == got)
  }

  test("prfExpand: co-occurring terms join the bag, originals excluded, ties lexical") {
    val s = spark
    import s.implicits._
    // query 'aa': docs 1..3 score highest (contain aa); across them 'bb'
    // appears 4x, 'cc' 2x, 'dd' 1x -> expansion at expK=2 is {bb, cc}.
    // doc 9 contains bb/cc but NOT aa - invisible to pass 1, retrieved
    // only after expansion: the vocabulary-mismatch fix observable.
    val d = Seq(
      (1L, "aa bb bb cc"), (2L, "aa bb cc"), (3L, "aa bb dd"),
      (9L, "bb cc bb cc"), (10L, "zz zz zz")).toDF("doc_id", "text")
    val q = Seq((5L, "aa")).toDF("query_id", "term")
    val exp = Ranking.prfExpand(d, col("doc_id"), col("text"), q,
      fbK = 3, expK = 2)
    val terms = exp.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(terms == Set((5L, "aa"), (5L, "bb"), (5L, "cc")))
    // pass 2 now retrieves doc 9; pass 1 could not
    val p1 = Ranking.bm25Batch(d, col("doc_id"), col("text"), q, topK = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val p2 = Ranking.bm25Batch(d, col("doc_id"), col("text"), exp, topK = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!p1.contains(9L) && p2.contains(9L))
    // expK = 0 is the identity expansion
    val id0 = Ranking.prfExpand(d, col("doc_id"), col("text"), q,
      fbK = 3, expK = 0).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(id0 == Set((5L, "aa")))
  }

  test("rrfFuseKeyed: per-query fusion equals the single-query operator per key") {
    val s = spark
    import s.implicits._
    val lex = Seq((0L, 10L, 1L), (0L, 11L, 2L), (1L, 20L, 1L), (1L, 10L, 2L))
      .toDF("query_id", "doc_id", "rk")
    val sem = Seq((0L, 11L, 1L), (0L, 12L, 2L), (1L, 10L, 1L))
      .toDF("query_id", "doc_id", "rk")
    val keyed = Ranking.rrfFuseKeyed(Seq(lex, sem)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5).toLong))).toMap
    for (q <- Seq(0L, 1L)) {
      val single = Ranking.rrfFuse(Seq(
          lex.filter(col("query_id") === q).select("doc_id", "rk"),
          sem.filter(col("query_id") === q).select("doc_id", "rk")))
        .collect()
        .map(r => (q, r.getLong(0)) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4).toLong))).toMap
      single.foreach { case (k, v) => assert(keyed(k) == v, s"key $k") }
    }
    // both-list docs outrank single-list docs at equal best rank
    assert(keyed((0L, 11L))._1 == 2L && keyed((0L, 11L))._4 == 1L)
  }

  test("overlapAtK: hand-counted hits, depth truncation, ref-only query holes") {
    val s = spark
    import s.implicits._
    val tst = Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L),
      (1L, 20L, 1L), (1L, 21L, 2L)).toDF("query_id", "doc_id", "rk")
    val ref = Seq((0L, 10L, 1L), (0L, 12L, 2L), (0L, 13L, 3L),
      (1L, 30L, 1L), (2L, 40L, 1L)).toDF("query_id", "doc_id", "rk")
    val got = Ranking.overlapAtK(tst, ref, k = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // k=2 truncates both sides: q0 test {10,11} vs ref {10,12} -> 1 hit;
    // q1 test {20,21} vs ref {30} -> 0; q2 exists in ref ONLY -> the
    // recall hole is reported, not dropped
    assert(got == Map(0L -> ((2L, 2L, 1L)), 1L -> ((1L, 2L, 0L)),
      2L -> ((1L, 0L, 0L))))
  }

  test("kendallPairs: hand-counted concordance, reversal, degenerate queries") {
    val s = spark
    import s.implicits._
    // q0: common {10,11,12}; test order 10<11<12, ref order 10<12<11 —
    // pairs (10,11)+(10,12) concordant, (11,12) discordant.
    // q1: common {20,21} fully REVERSED — 1 discordant pair.
    // q2: one common item — 0 pairs. q3: ref-only — zero row survives.
    val tst = Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L),
      (1L, 20L, 1L), (1L, 21L, 2L),
      (2L, 30L, 1L)).toDF("query_id", "doc_id", "rk")
    val ref = Seq((0L, 10L, 1L), (0L, 12L, 2L), (0L, 11L, 3L),
      (1L, 21L, 1L), (1L, 20L, 2L),
      (2L, 30L, 1L), (3L, 40L, 1L)).toDF("query_id", "doc_id", "rk")
    val got = Ranking.kendallPairs(tst, ref, k = 3).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      0L -> ((3L, 3L, 2L, 1L)), 1L -> ((2L, 1L, 0L, 1L)),
      2L -> ((1L, 0L, 0L, 0L)), 3L -> ((0L, 0L, 0L, 0L))))
  }

  test("ndcgAtK: perfect list scores idcg, swap costs the hand-computed delta") {
    val s = spark
    import s.implicits._
    val d = (1 to 3).map(i => Ranking.ndcgDiscount(i))
    // q0 test order = ideal (rel 3,2,1) → dcg == idcg; q1 swaps the top
    // two (rel 1,2 ranked 2,1) and ranks an ungraded doc first.
    val tst = Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L),
      (1L, 99L, 1L), (1L, 20L, 2L), (1L, 21L, 3L))
      .toDF("query_id", "doc_id", "rk")
    val rel = Seq((0L, 10L, 3L), (0L, 11L, 2L), (0L, 12L, 1L),
      (1L, 20L, 1L), (1L, 21L, 2L)).toDF("query_id", "doc_id", "rel")
    val got = Ranking.ndcgAtK(tst, rel, k = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val i0 = 3 * d(0) + 2 * d(1) + 1 * d(2)
    assert(got(0L) == ((i0, i0)))
    assert(got(1L) == ((0 * d(0) + 1 * d(1) + 2 * d(2), 2 * d(0) + 1 * d(1))))
    // discount table is strictly decreasing and anchored at scale
    assert(d(0) == 1000000000000L && d(0) > d(1) && d(1) > d(2))
  }

  test("gopherFilter verdict matches a row-local reference") {
    val out = TextStats.gopherFilter(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    val ref = docs.select("doc_id", "text").collect()
    assert(ref.nonEmpty)
    ref.foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1).toLowerCase)
      val t = text.split(" ", -1)
      val stops = Set("the", "a", "of", "to", "and")
      val (n, sumLen) = (t.length.toLong, t.map(_.length.toLong).sum)
      val stopCt = t.count(stops).toLong
      val alphaCt = t.count(_.matches("[a-z]+")).toLong
      val pass = n >= 50 && n <= 100000 && 3 * n <= sumLen &&
        sumLen <= 10 * n && stopCt >= 2 && 5 * alphaCt >= 4 * n
      assert(out(id) == ((n, sumLen, stopCt, alphaCt, pass)), s"doc $id")
    }
    // the gate must actually discriminate on this corpus (not all-true/false)
    val verdicts = out.values.map(_._5).toSet
    assert(verdicts == Set(true, false))
  }

  test("labelCentroidSums is exact and partition-order-independent") {
    val a = Similarity.labelCentroidSums(embs)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val b = Similarity.labelCentroidSums(embs.repartition(11, col("vec_id")))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(a == b && a.nonEmpty)
    // reference: per-label dim-1 sum computed row-at-a-time on the driver
    val ref = embs.select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).head))
      .groupBy(_._1).view
      .mapValues(vs => (vs.map(v => math.floor(v._2.toDouble * 1e6).toLong).sum,
        vs.size.toLong))
    ref.foreach { case (label, expect) => assert(a((label, 1L)) == expect, s"label $label") }
  }

  test("labelOutliers picks the least-central members, k per label") {
    val out = Similarity.labelOutliers(embs, k = 5).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val perLabel = out.groupBy(_._1)
    val nLabels = embs.select("label").distinct().count()
    assert(perLabel.size.toLong == nLabels)
    perLabel.values.foreach { rows => assert(rows.map(_._2).sorted.toSeq == (1 to 5)) }
    // determinism under repartitioning (decimal centroid sums are exact)
    val again = Similarity.labelOutliers(embs.repartition(9, col("vec_id")), k = 5)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(out.sorted.toSeq == again.sorted.toSeq)
  }

  test("hashedLinearScore equals the hand-computed dot product; absent buckets score 0") {
    import spark.implicits._
    val B = 64
    def bucketOf(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % B
    }
    // weights only for "good" and "bad"; every other token must contribute 0
    val weights = Seq((bucketOf("good"), 10L), (bucketOf("bad"), -25L))
      .toDF("bucket", "w")
    val docs = Seq(
      (1L, "good good unseen"),   // 2*10 + 0  = 20  → keep
      (2L, "bad good"),           // -25 + 10  = -15 → drop
      (3L, "zzz yyy")             // 0         = 0   → keep at bias 0
    ).toDF("doc_id", "text")
    val out = TextStats.hashedLinearScore(docs, col("doc_id"), col("text"),
        weights, buckets = B).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((3L, 20L, true)), s"${out(1L)}")
    assert(out(2L) == ((2L, -15L, false)), s"${out(2L)}")
    assert(out(3L) == ((2L, 0L, true)), s"${out(3L)}")
    // a positive bias flips the zero-score doc to drop
    val biased = TextStats.hashedLinearScore(docs, col("doc_id"), col("text"),
        weights, buckets = B, bias = 1L).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(biased == Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("rrfFuse: hand-computed fixed-point fusion, list-membership boost, determinism") {
    import spark.implicits._
    def recip(r: Long): Long = 1000000000000L / (60 + r) // exact for these values
    // system A ranks docs 1,2,3; system B ranks 2,4 — doc 2 is on BOTH lists
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "rk")
    val b = Seq((2L, 1L), (4L, 2L)).toDF("doc_id", "rk")
    val out = Ranking.rrfFuse(Seq(a, b)).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    assert(out(2L)._3 == recip(2) + recip(1), s"${out(2L)}")
    assert(out(1L)._3 == recip(1), s"${out(1L)}")
    // the two-list doc outranks every single-list doc here: its reciprocal
    // sum exceeds even the rank-1 singleton
    assert(out(2L)._4 == 1 && out(2L)._1 == 2L && out(2L)._2 == 1L)
    assert(out(1L)._4 == 2)
    // ties on score break to the lower doc_id: ranks are a permutation
    assert(out.values.map(_._4).toSeq.sorted == Seq(1, 2, 3, 4))
    // partitioning never changes the fused list
    val re = Ranking.rrfFuse(Seq(a.repartition(5), b.repartition(3))).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    assert(re == out)
  }
}
