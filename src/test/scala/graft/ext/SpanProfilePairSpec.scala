package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-4 additions: duplicated-span removal, table profiling, and
  * deterministic negative-pair sampling. */
class SpanProfilePairSpec extends SparkSpec {
  import spark.implicits._

  test("stripDupSpans keeps the global first occurrence and reassembles text") {
    // w=2 spans: doc 1 = [a b][c d], doc 2 = [a b][x y], doc 3 = [x y][x y]
    val df = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "x y x y")).toDF("doc_id", "text")
    val out = Dedup.stripDupSpans(df, col("doc_id"), col("text"), w = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("span_ct"), r.getAs[Long]("kept_ct"),
          r.getAs[String]("new_text")))).toMap
    // doc 1 owns both its spans (first occurrences)
    assert(out(1L) == ((2L, 2L, "a b c d")))
    // doc 2's "a b" was first seen in doc 1; "x y" is doc 2's own first
    assert(out(2L) == ((2L, 1L, "x y")))
    // doc 3: both "x y" copies lose to doc 2's
    assert(out(3L) == ((2L, 0L, "")))
  }

  test("stripDupSpans on an all-unique corpus is the identity on text") {
    val docs = graft.model.Envelopes.table(spark, sfDir(), "documents")
      .limit(50).select(col("doc_id"), col("text"))
    // make every span globally unique by prefixing tokens with the doc id
    val uniq = docs.select(col("doc_id"),
      concat_ws(" ", transform(split(lower(col("text")), " "),
        t => concat(col("doc_id").cast("string"), lit("_"), t))).as("text"))
    val out = Dedup.stripDupSpans(uniq, col("doc_id"), col("text"), w = 5)
    assert(out.filter(col("kept_ct") =!= col("span_ct")).count() == 0)
    val bad = out.join(uniq, "doc_id")
      .filter(col("new_text") =!= lower(col("text"))).count()
    assert(bad == 0, "reassembly must reproduce the original text")
  }

  test("exactBest keeps the highest-priority duplicate, ties to higher id") {
    val df = Seq(
      (1L, "dup", 10L), (2L, "dup", 99L), (3L, "dup", 99L), // best: p=99, id 3
      (4L, "uniq", 1L)).toDF("doc_id", "text", "prio")
    val out = Dedup.exactBest(df, col("doc_id"), col("text"), col("prio"))
      .collect().map(r => r.getAs[Long]("keeper_id") ->
        ((r.getAs[Long]("keeper_priority"), r.getAs[Long]("dup_ct")))).toMap
    assert(out == Map(3L -> ((99L, 3L)), 4L -> ((1L, 1L))))
  }

  test("profile counts nulls, distincts, and string-rendered extremes") {
    val df = Seq(
      (Some(1L), Some("b")), (Some(2L), None), (None, Some("a")),
      (Some(2L), Some("c"))).toDF("k", "s")
    val p = Profile.profile(df, Seq("k", "s")).collect()
      .map(r => r.getAs[String]("col_name") ->
        ((r.getAs[Long]("n_nonnull"), r.getAs[Long]("n_distinct"),
          r.getAs[String]("min_s"), r.getAs[String]("max_s")))).toMap
    assert(p("k") == ((3L, 2L, "1", "2")))
    assert(p("s") == ((3L, 3L, "a", "c")))
  }

  test("histQuantiles: lower-edge bound within one bin width, repartition-stable") {
    val s2 = spark
    import s2.implicits._
    val df = ((1 to 10000).map(i => ("a", (i.toLong * i) % 99991)) ++
      (1 to 50).map(i => ("tiny", 7L))).toDF("g", "v")
    val bins = 256
    val got = Profile.histQuantiles(df, Seq("g"), col("v"), bins = bins)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // exact quantiles of group a, computed independently
    val vs = ((1 to 10000).map(i => (i.toLong * i) % 99991)).sorted
    def exact(num: Int, den: Int): Long = vs((vs.length * num + den - 1) / den - 1)
    val w = (vs.max - vs.min) / bins + 1
    for (((num, den), got1) <- Seq((1, 2) -> got("a")._2, (9, 10) -> got("a")._3,
        (99, 100) -> got("a")._4)) {
      val ex = exact(num, den)
      assert(got1 <= ex && ex < got1 + w,
        s"$num/$den: estimate $got1 must be the bin lower edge of exact $ex (w=$w)")
    }
    // a constant group collapses to one bin: the estimate IS the value
    assert(got("tiny") == ((50L, 7L, 7L, 7L)), s"${got("tiny")}")
    // pure function of the multiset
    val again = Profile.histQuantiles(df.repartition(11), Seq("g"), col("v"), bins = bins)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(again == got)
  }

  test("kmvDistinct: exact below k, within-band estimate above, repartition-stable") {
    val s2 = spark
    import s2.implicits._
    // group "small": 100 distinct < k=128 → exact path; group "big": 5000
    // distinct → estimator path, std err ≈ 1/√126 ≈ 9 % (assert 25 %)
    val df = ((1 to 100).map(i => ("small", i.toLong)) ++
      (1 to 5000).map(i => ("big", i.toLong)) ++
      (1 to 100).map(i => ("small", i.toLong))).toDF("g", "v")
    val got = Profile.kmvDistinct(df, Seq("g"), col("v"), k = 128)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("small") == ((100L, 100L)), s"below k must be exact: ${got("small")}")
    assert(got("big")._1 == 128L)
    val est = got("big")._2
    assert(est > 3750 && est < 6250, s"estimate $est out of band for 5000")
    // null values don't count
    val withNull = df.union(Seq(("small", Option.empty[Long])).toDF("g", "v"))
    val gotN = Profile.kmvDistinct(withNull, Seq("g"), col("v"), k = 128)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(gotN("small") == 100L, "nulls must not count as a value")
    // mergeable/deterministic: any partitioning yields the identical sketch
    val again = Profile.kmvDistinct(df.repartition(13), Seq("g"), col("v"), k = 128)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(again == got)
  }

  test("approx profile: exact nn/extremes, distincts within rsd, no Expand") {
    val df = graft.model.Envelopes.table(spark, sfDir(), "orders")
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    def asMap(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      r.getAs[String]("col_name") ->
        ((r.getAs[Long]("n_nonnull"), r.getAs[Long]("n_distinct"),
          r.getAs[String]("min_s"), r.getAs[String]("max_s")))).toMap
    val exact = Profile.profile(df, cols)
    val approx = Profile.profile(df, cols, approx = true)
    val (ex, ap) = (asMap(exact.collect()), asMap(approx.collect()))
    cols.foreach { c =>
      val ((nn, nd, mn, mx), (nnA, ndA, mnA, mxA)) = (ex(c), ap(c))
      // everything but the distinct count is computed identically
      assert((nnA, mnA, mxA) == ((nn, mn, mx)), s"$c non-distinct stats differ")
      // HLL++ rsd=0.02: allow 3 sigma plus small-cardinality slack
      val tol = math.max(4.0, 3 * 0.02 * nd)
      assert(math.abs(ndA - nd) <= tol, s"$c: approx $ndA vs exact $nd (tol $tol)")
    }
    // the plan property the mode exists for: exact multi-distinct Expands
    // the scan ×(k+1); the sketch plan must not Expand at all
    assert(exact.queryExecution.executedPlan.toString.contains("Expand"),
      "exact multi-distinct should plan an Expand")
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"),
      "approx profile must keep the scan single-width")
  }

  test("negativePairs: m distinct non-self partners, stable under repartition") {
    val docs = graft.model.Envelopes.table(spark, sfDir(), "documents")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      Curation.negativePairs(df, col("doc_id"), m = 2, buckets = 8)
        .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("j"),
          r.getAs[Long]("b_id"))).toSet
    val a = pairs(docs)
    assert(a == pairs(docs.repartition(13, col("text"))))
    val byAnchor = a.groupBy(_._1)
    // 500 docs over 8 buckets: every bucket is far larger than m, so every
    // anchor gets exactly m pairwise-distinct partners, none itself
    assert(byAnchor.size == docs.count())
    byAnchor.foreach { case (anchor, ps) =>
      assert(ps.size == 2)
      val partners = ps.map(_._3)
      assert(partners.size == 2 && !partners.contains(anchor))
    }
  }

  test("resampleFfill grids each key and forward-fills the latest value") {
    val ev = Seq(
      ("u", 65000L, 1.0, 1L), ("u", 130000L, 2.0, 2L),
      ("w", 60000L, 5.0, 3L),
      // duplicate (key, ts): the higher event_id must win deterministically
      ("x", 59000L, 7.0, 4L), ("x", 59000L, 8.0, 5L), ("x", 61000L, 9.0, 6L))
      .toDF("user_id", "tms", "value", "event_id")
    val out = graft.ops.Windows.resampleFfill(ev, "user_id", "tms",
        Seq("value"), stepMs = 60000L, ordCol = col("event_id"))
      .collect().map(r => (r.getAs[String]("user_id"), r.getAs[Long]("tms")) ->
        r.getAs[Double]("value")).toMap
    // u: grid ceil(65000)→120000 .. floor(130000)→120000: one point, ffill 1.0
    // w: a grid point exactly at the event includes it
    // x: grid point 60000 sees the id-5 duplicate (8.0), not id-4
    assert(out == Map(("u", 120000L) -> 1.0, ("w", 60000L) -> 5.0,
      ("x", 60000L) -> 8.0))
  }

  test("fuzzyVocabPairs equals brute force — including longer-but-lex-smaller tokens") {
    // "abcd" < "bcd" lexicographically but is LONGER: a one-sided length
    // band would miss this deletion pair
    val vocab = Seq("abcd", "bcd", "cat", "bat", "cart", "dog", "dug", "zebra")
      .toDF("tok")
    def setOf(d: Int): Set[(String, String, Long)] =
      Dedup.fuzzyVocabPairs(vocab, maxDist = d).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val toks = vocab.collect().map(_.getString(0))
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1)((i, j) => i + j)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1,
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    for (d <- Seq(1, 2)) {
      val brute = (for (a <- toks; b <- toks if a < b && lev(a, b) <= d)
        yield (a, b, lev(a, b).toLong)).toSet
      assert(setOf(d) == brute, s"maxDist=$d")
    }
    assert(setOf(1).contains(("abcd", "bcd", 1L)))
    assert(setOf(1).contains(("bat", "cat", 1L)))
  }

  test("segment band is lossless: same pairs as the plain length band") {
    // real vocabulary (the q_fuzzy_vocab construction at sf0.001) plus the
    // adversarial cases: first-letter edits (the pair first-letter blocking
    // loses), deletions that shift every later segment, repeated-char
    // tokens (same substring at several shifts), and short tokens below
    // the segment threshold
    val docsVocab = graft.model.Envelopes.table(spark, sfDir(), "documents")
      .select(explode(split(lower(col("text")), " ")).as("tok")).distinct()
    val s = spark
    import s.implicits._
    val edge = Seq("abcd", "bcd", "cat", "bat", "aaaa", "aaab", "ab", "b", "a")
      .toDF("tok")
    val vocab = docsVocab.unionByName(edge).distinct()
    for (d <- Seq(1, 2)) {
      def run(seg: Boolean): Set[(String, String, Long)] =
        Dedup.fuzzyVocabPairs(vocab, maxDist = d, segmentBand = seg).collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val plain = run(seg = false)
      val banded = run(seg = true)
      assert(banded == plain,
        s"maxDist=$d: segment band lost ${(plain -- banded).take(5)} " +
          s"/ invented ${(banded -- plain).take(5)}")
      assert(plain.nonEmpty)
    }
  }

  test("corpusDiff classifies added/removed/changed/unchanged by fingerprint") {
    val oldV = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newV = Seq((2L, "b"), (3L, "cX"), (4L, "d")).toDF("doc_id", "text")
    val out = Curation.corpusDiff(oldV, newV, col("doc_id"), col("text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "added"))
  }

  test("sessionPaths emits gap-split ordered paths per user") {
    val ev = Seq(
      // user 1: two sessions (40-min gap between the pairs)
      (1L, 1L, 0L, "view"), (1L, 2L, 60000L, "click"),
      (1L, 3L, 60000L + 40 * 60000L, "view"),
      (1L, 4L, 61000L + 40 * 60000L, "purchase"),
      // user 2: one event
      (2L, 5L, 500L, "error")).toDF("user_id", "event_id", "tms", "event_type")
    val out = graft.ops.Windows.sessionPaths(ev, col("user_id"),
        timestamp_millis(col("tms")), col("event_type"), col("event_id"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sess_start")) ->
        ((r.getAs[Long]("ev_ct"), r.getAs[String]("path")))).toMap
    assert(out.size == 3)
    assert(out((1L, 0L)) == ((2L, "view>click")))
    assert(out((1L, 2460000L)) == ((2L, "view>purchase")))
    assert(out((2L, 500L)) == ((1L, "error")))
  }
}
