package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Envelopes

/** Curation operators: the load-bearing property is DETERMINISM — the same
  * rows must be selected regardless of partitioning, run, or ingestion
  * order (rand()-based sampling fails all three). */
class CurationSpec extends SparkSpec {

  test("deterministic sample picks identical rows under any partitioning") {
    val docs = Envelopes.table(spark, sfDir(), "documents")
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Curation.deterministicSample(df, col("doc_id"), 10)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids(docs)
    val b = ids(docs.repartition(17, col("text"))) // unrelated partitioning
    assert(a == b && a.nonEmpty)
    // rate lands near 10% (hash uniformity, loose bound)
    val total = docs.count()
    assert(a.size > total / 20 && a.size < total / 5, s"${a.size} of $total")
  }

  test("hash split is a partition of the corpus with stable assignment") {
    val docs = Envelopes.table(spark, sfDir(), "documents")
    val split = Curation.hashSplit(docs, col("doc_id"),
      Seq("train" -> 80, "val" -> 90, "test" -> 100))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == docs.count())
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > counts("val"), s"$counts")
    // the same doc never changes split across runs
    val again = Curation.hashSplit(docs.repartition(7), col("doc_id"),
        Seq("train" -> 80, "val" -> 90, "test" -> 100))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    split.select("doc_id", "split").collect()
      .foreach(r => assert(again(r.getLong(0)) == r.getString(1)))
  }

  test("bin packing is repartition-stable, covers every doc, and bounds overfill") {
    val docs = Envelopes.table(spark, sfDir(), "documents")
      .select(col("doc_id"), size(split(lower(col("text")), " ")).cast("long").as("n"))
    def pack(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      Curation.packBins(df, col("doc_id"), col("n"), budget = 256, groups = 8)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("pack_group"), r.getAs[Long]("bin")))).toMap
    val a = pack(docs)
    val b = pack(docs.repartition(13, col("n"))) // unrelated partitioning
    assert(a == b && a.nonEmpty, "assignment must not depend on partitioning")
    assert(a.size == docs.count(), "every doc packed exactly once")
    // overfill bound: every bin's total <= budget + its largest doc
    val tok = docs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    a.groupBy(_._2).foreach { case (bin, ds) =>
      val sizes = ds.keys.map(tok)
      assert(sizes.sum <= 256 + sizes.max, s"bin $bin overfilled: ${sizes.sum}")
    }
  }

  test("chunking is repartition-stable and reconstructs each document at stride boundaries") {
    // deterministic subset (an unordered limit() can pick different rows per action)
    val docs = Envelopes.table(spark, sfDir(), "documents").filter(col("doc_id") < 50)
    def chunks(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, String)] =
      TextStats.chunk(df, col("doc_id"), col("text"), size = 32, stride = 32)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
          r.getAs[String]("chunk"))).toSet
    val a = chunks(docs)
    assert(a == chunks(docs.repartition(7, col("text"))) && a.nonEmpty)
    // stride == size → zero overlap → concatenating a doc's chunks in
    // chunk_idx order restores its full lowercased text
    val rebuilt = a.groupBy(_._1).map { case (id, cs) =>
      id -> cs.toSeq.sortBy(_._2).map(_._3).mkString(" ")
    }
    val expected = docs.select(col("doc_id"), lower(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rebuilt == expected, "lossless at stride == size")
  }

  test("winnowing guarantee: docs sharing a >= w+k-1 substring share a fingerprint") {
    val s = spark
    import s.implicits._
    val common = "the quick brown fox jumps over the lazy dog near the river bank"
    val docs = Seq(
      (1L, s"PREFIX AAA $common SUFFIX one"),
      (2L, s"totally different opening words $common and another tail"),
      (3L, "no overlap here at all zzz qqq xxx vvv kkk mmm nnn ppp rrr www")
    ).toDF("doc_id", "text")
    val fps = TextStats.winnow(docs, col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // guarantee: the 60+ char shared substring (>= 8+4-1) forces a shared fp
    assert((byDoc(1L) & byDoc(2L)).nonEmpty, "shared substring must share a fingerprint")
    // doc 3 shares no 11-char substring with doc 1 → (almost surely) disjoint
    assert((byDoc(1L) & byDoc(3L)).isEmpty, "unrelated docs should not collide")
    // short docs yield nothing
    val short = TextStats.winnow(Seq((9L, "tiny")).toDF("doc_id", "text"),
      col("doc_id"), col("text")).count()
    assert(short == 0)
  }

  test("length buckets are monotone in length, tie-stable, and near-equal sized") {
    val docs = Envelopes.table(spark, sfDir(), "documents")
    val got = Curation.lengthBuckets(docs, col("doc_id"), col("text"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // monotone: longer docs never land in a lower bucket
    val byLen = got.sortBy(t => (t._2, t._1))
    byLen.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._3, s"bucket regressed: $a -> $b"); case _ => }
    // ties share a bucket
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).distinct.size == 1) }
    // near-equal sizes (exact split impossible with ties; loose bound)
    val sizes = got.groupBy(_._3).view.mapValues(_.size)
    assert(sizes.keys.toSet.subsetOf(Set(1L, 2L, 3L, 4L)))
    sizes.values.foreach(sz =>
      assert(sz > got.length / 8 && sz < got.length / 2, s"skewed: ${sizes.toMap}"))
  }

  test("quotaCap keeps exactly the top-k per group in order, stable under repartitioning") {
    val docs = Envelopes.table(spark, sfDir(), "documents")
    def capped(df: org.apache.spark.sql.DataFrame) =
      Curation.quotaCap(df, col("source"), 3, Seq(col("n_chars").desc, col("doc_id")))
        .select("doc_id", "source", "rk")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val got = capped(docs)
    val again = capped(docs.repartition(13, col("text")))
    assert(got == again, "cap is not deterministic under repartitioning")
    // every group ≤ 3 rows, ranks are 1..k contiguous
    got.groupBy(_._2).foreach { case (src, rows) =>
      assert(rows.size <= 3, s"$src over cap")
      assert(rows.map(_._3).toSeq.sorted == (1L to rows.size).toSeq, s"$src ranks")
    }
    // the kept rows really are the longest per group (spot-check one group)
    val bySrc = docs.select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._2)
    bySrc.foreach { case (src, rows) =>
      val want = rows.sortBy(t => (-t._3, t._1)).take(3).map(_._1).toSet
      val have = got.filter(_._2 == src).map(_._1)
      assert(have == want, s"$src kept $have, want $want")
    }
  }

  test("stratified sample composes: lower rate is a subset of higher rate per stratum") {
    val docs = Envelopes.table(spark, sfDir(), "documents")
    def ids(rates: Seq[(String, Int)], dflt: Int): Set[Long] =
      Curation.stratifiedSample(docs, col("doc_id"), col("lang"), rates, dflt)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val wide = ids(Seq("en" -> 60, "zh" -> 40), 20)
    val narrow = ids(Seq("en" -> 30, "zh" -> 10), 5)
    assert(narrow.subsetOf(wide), "nested rates must nest the kept sets")
    assert(wide.nonEmpty && narrow.nonEmpty && narrow.size < wide.size)
    // per-stratum rates actually differ: en keeps more than the default strata
    val langOf = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byLang = wide.groupBy(langOf)
    val total = langOf.groupBy(_._2).view.mapValues(_.size).toMap
    val enRate = byLang("en").size.toDouble / total("en")
    val deRate = byLang.getOrElse("de", Set.empty[Long]).size.toDouble / total("de")
    assert(enRate > deRate, s"en rate $enRate should exceed default-lang rate $deRate")
  }

  test("temperature mix flattens source shares, nests in budget, and is repartition-stable") {
    // the fixture's natural sources are equal-sized, so flatten a skewed
    // 60/30/10 grouping derived from the id (same shape as q_temp_mix)
    val grp = when(col("doc_id") % 10 < 6, "head")
      .when(col("doc_id") % 10 < 9, "torso").otherwise("tail")
    val docs = Envelopes.table(spark, sfDir(), "documents").withColumn("src_grp", grp)
    def ids(df: org.apache.spark.sql.DataFrame, pct: Int): Set[Long] =
      Curation.temperatureMix(df, col("doc_id"), col("src_grp"), alpha = 0.5, targetPct = pct)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = ids(docs, 30)
    assert(kept == ids(docs.repartition(13, col("text")), 30), "partitioning must not matter")
    assert(ids(docs, 15).subsetOf(kept), "smaller budget must nest inside larger")
    // flattening: the smallest group keeps a strictly higher FRACTION of
    // itself than the largest (that is the point of alpha < 1): expected
    // rates here are ~0.19 (head) vs ~0.47 (tail)
    val sizes = docs.groupBy("src_grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val srcOf = docs.select("doc_id", "src_grp").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val fracOf = kept.groupBy(srcOf).view.mapValues(_.size).toMap
    val fTail = fracOf.getOrElse("tail", 0).toDouble / sizes("tail")
    val fHead = fracOf.getOrElse("head", 0).toDouble / sizes("head")
    assert(fTail > fHead,
      s"tail keep rate $fTail must exceed head keep rate $fHead")
    // overall budget lands near 30% (loose hash-uniformity bound)
    val total = docs.count()
    assert(kept.size > total * 15 / 100 && kept.size < total * 45 / 100,
      s"${kept.size} of $total")
  }

  test("globalPrefix equals the single-task global window cumsum exactly") {
    val d = Envelopes.table(spark, sfDir(), "documents")
      .select(col("doc_id"), col("n_chars"))
    val got = Curation.globalPrefix(d, col("doc_id"), col("n_chars"), parts = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val rows = d.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val want = rows.map { case (id, v) => val before = acc; acc += v; id -> before }.toMap
    assert(got == want && got.nonEmpty)
    // stable under an adversarial input partitioning
    val got2 = Curation.globalPrefix(
      d.repartition(11, col("n_chars")), col("doc_id"), col("n_chars"), parts = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got2 == want)
  }

  test("tokenBudget keeps exactly the prefix whose offsets start inside the budget") {
    val d = Envelopes.table(spark, sfDir(), "documents")
      .select(col("doc_id"), (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1)
        .cast("long").as("n_toks"))
    val budget = 5000L
    val kept = Curation.tokenBudget(d, col("doc_id"), col("n_toks"), budget, parts = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(kept.nonEmpty && kept.forall(_._3 < budget))
    // the kept set is a PREFIX in id order: every doc before the last kept id
    // is kept, every doc after is dropped
    val lastKept = kept.map(_._1).max
    val all = d.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(all.filter(_._1 <= lastKept).map(_._1).toSet == kept.map(_._1).toSet)
    // at most one straddler: all kept docs except possibly the last END
    // within the budget
    val straddlers = kept.filter(k => k._3 + k._2 > budget)
    assert(straddlers.size <= 1 && straddlers.forall(_._1 == lastKept))
  }

  test("leakageSafeSplit keeps every cluster wholly in one split") {
    val s = spark
    import s.implicits._
    val docs = (1L to 100L).toDF("doc_id")
    // clusters: {1,2,3} -> keeper 1, {10,20} -> keeper 10; rest unclustered
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (20L, 10L))
      .toDF("doc_id", "keeper_id")
    val out = Curation.leakageSafeSplit(docs, col("doc_id"), labels,
        Seq("train" -> 80, "val" -> 90, "test" -> 100))
      .select("doc_id", "keeper_id", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length == 100)
    val byDoc = out.map(r => r._1 -> ((r._2, r._3))).toMap
    // cluster members share the keeper's split — no near-dup straddles
    assert(byDoc(1L) == byDoc(2L) && byDoc(2L) == byDoc(3L))
    assert(byDoc(10L) == byDoc(20L))
    // unclustered docs are their own cluster and split on their own id
    assert(byDoc(50L)._1 == 50L)
    // per-keeper split count is exactly 1 across the whole frame
    assert(out.groupBy(_._2).forall { case (_, g) => g.map(_._3).distinct.length == 1 })
    // and a per-DOC hash split would NOT have this property for cluster
    // members (the defect this operator exists to prevent): doc 2 and 3
    // hash to different percentiles than keeper 1 in general — pin one
    // concrete divergence so the test fails if the keeper hash is dropped
    val perDoc = Curation.hashSplit(docs, col("doc_id"),
        Seq("train" -> 80, "val" -> 90, "test" -> 100))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(Seq(1L, 2L, 3L, 10L, 20L).exists(i => perDoc(i) != byDoc(i)._2),
      "fixture too lucky: every cluster member hashed to its keeper's split anyway")
    // loud contracts: pre-existing keeper_id/split columns are refused
    // (ambiguous coalesce / silent shadowing), duplicate label rows fold
    intercept[IllegalArgumentException] {
      Curation.leakageSafeSplit(labels /* has keeper_id */, col("doc_id"), labels,
        Seq("train" -> 100))
    }
    val dupLabels = labels.union(labels)
    val dedup = Curation.leakageSafeSplit(docs, col("doc_id"), dupLabels,
      Seq("train" -> 80, "val" -> 90, "test" -> 100))
    assert(dedup.count() == 100, "duplicate label rows must not multiply the corpus")
    // the internal working column is refused too — an input that already
    // has __lss_id would otherwise produce a duplicate/ambiguous column
    intercept[IllegalArgumentException] {
      Curation.leakageSafeSplit(docs.withColumn("__lss_id", col("doc_id")),
        col("doc_id"), labels, Seq("train" -> 100))
    }
  }

  test("shardShuffle is a seed-keyed bijective layout, stable under repartitioning") {
    val docs = Envelopes.table(spark, sfDir(), "documents")
    def layout(df: org.apache.spark.sql.DataFrame, seed: Long) =
      Curation.shardShuffle(df, col("doc_id"), seed, shards = 8)
        .select("doc_id", "shard", "pos").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val a = layout(docs, 42L)
    assert(a == layout(docs.repartition(9, col("text")), 42L), "layout must be partition-independent")
    // positions within each shard are contiguous 1..n
    a.values.groupBy(_._1).foreach { case (shard, slots) =>
      val ps = slots.map(_._2).toSeq.sorted
      assert(ps == (1L to ps.size), s"shard $shard positions not contiguous: $ps")
    }
    // every doc is placed exactly once, and a different seed moves documents
    assert(a.keySet == docs.select("doc_id").collect().map(_.getLong(0)).toSet)
    val b = layout(docs, 43L)
    assert(a != b, "a new seed must produce a different layout")
  }

  test("dsirScreen keeps target-like docs, drops alien vocabulary, deterministically") {
    import spark.implicits._
    // target vocabulary: {alpha beta gamma}; raw pool: one target-like doc,
    // one alien doc (tokens unseen in either model beyond itself)
    val target = Seq((100L, "alpha beta gamma alpha"), (101L, "beta gamma alpha"))
      .toDF("doc_id", "text")
    val raw = Seq((1L, "alpha beta gamma"), (2L, "zq xv wk jj qq zz pp"))
      .toDF("doc_id", "text")
    val out = Curation.dsirScreen(raw, target, col("doc_id"), col("text"),
        buckets = 4096).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(1L)._3, s"target-like doc must survive: ${out(1L)}")
    assert(!out(2L)._3, s"alien doc must be dropped: ${out(2L)}")
    // masses are exact: doc 1's tokens appear 3/2/2 times in the target
    // model (+1 smoothing each) and once each in raw (+1)
    assert(out(1L)._1 == (3 + 1) + (2 + 1) + (2 + 1), s"${out(1L)}")
    assert(out(1L)._2 == 3 * (1 + 1), s"${out(1L)}")
    // partition-independent (exact integer path — no summation-order drift)
    val re = Curation.dsirScreen(raw.repartition(7, col("text")), target,
        col("doc_id"), col("text"), buckets = 4096).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(re == out)
  }

  test("dsirScreen emits the degenerate keep verdict for tokenless docs, like screenBatch") {
    import spark.implicits._
    val target = Seq((100L, "alpha beta")).toDF("doc_id", "text")
    val raw = Seq((1L, "alpha beta"), (2L, null: String), (3L, ""))
      .toDF("doc_id", "text")
    val out = Curation.dsirScreen(raw, target, col("doc_id"), col("text"),
        buckets = 4096)
      .select("doc_id", "n_toks", "tgt_mass", "raw_mass", "keep").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // the null-text doc produces NO token rows: one output row with the
    // smoothing-only verdict (zero masses, keep = 0 >= 0 = true), matching
    // IncrementalDsir.screenBatch — a filter-on-keep pipeline must behave
    // the same in batch and streaming form
    assert(out.keySet == Set(1L, 2L, 3L), s"one row per raw doc: ${out.keySet}")
    assert(out(2L) == ((0L, 0L, 0L, true)), s"${out(2L)}")
    // the empty STRING is not tokenless — it tokenizes to one empty token
    assert(out(3L)._1 == 1L, s"${out(3L)}")
  }

  test("mixApportion: Hamilton seats, availability caps, absent sources, determinism") {
    import spark.implicits._
    // sources: a 50, b 20, c 3 (will exhaust), d unweighted (excluded);
    // weights include absent 'x' whose seats must NOT be redistributed
    val df = ((1L to 50L).map(i => (i, "a")) ++ (101L to 120L).map(i => (i, "b")) ++
      Seq((201L, "c"), (202L, "c"), (203L, "c")) ++ (301L to 310L).map(i => (i, "d")))
      .toDF("doc_id", "src")
    val out = Curation.mixApportion(df, col("doc_id"), col("src"),
        Seq("a" -> 3L, "b" -> 2L, "c" -> 2L, "x" -> 3L), budget = 40L)
      .select("doc_id", "src", "rk", "quota").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // W = 10; base seats: a 12, b 8, c 8, x 12; no remainders (exact tenths),
    // so leftover = 0; caps: c → 3, x → 0 (absent); d excluded (unweighted)
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc == Map("a" -> 12, "b" -> 8, "c" -> 3), s"$bySrc")
    assert(out.filter(_._2 == "c").forall(_._4 == 3L), "c's quota is its availability")
    assert(out.filter(_._2 == "a").map(_._3).sorted.toSeq == (1L to 12L), "ranks dense")
    // remainder seats: budget 41 leaves 1 seat after bases (a 12, b 8, c 8,
    // x 12 → Σ 40); it goes to the largest remainder (all rem = wt·41 mod 10:
    // a 3, b 2, c 2, x 3 → tie a/x broken by source asc → a)
    val out41 = Curation.mixApportion(df, col("doc_id"), col("src"),
        Seq("a" -> 3L, "b" -> 2L, "c" -> 2L, "x" -> 3L), budget = 41L)
      .select("src").collect().map(_.getString(0))
    val by41 = out41.groupBy(identity).view.mapValues(_.length).toMap
    assert(by41 == Map("a" -> 13, "b" -> 8, "c" -> 3), s"$by41")
    // selection is a pure function of (corpus, weights, budget)
    val again = Curation.mixApportion(df.repartition(7), col("doc_id"), col("src"),
        Seq("a" -> 3L, "b" -> 2L, "c" -> 2L, "x" -> 3L), budget = 40L)
      .select("doc_id", "src", "rk", "quota").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(again.sorted.toSeq == out.sorted.toSeq)
  }

  test("cdc chunking re-synchronizes after an insertion and is repartition-stable") {
    val s = spark
    import s.implicits._
    val base = (1 to 60).map(i => s"w${i % 17}x${i % 5}").mkString(" ")
    val df = Seq((1L, base), (2L, "INSERTED token " + base)).toDF("doc_id", "text")
    val out = TextStats.cdcChunks(df, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val fpsA = out.filter(_._1 == 1L).sortBy(_._2).map(x => (x._3, x._4))
    val fpsB = out.filter(_._1 == 2L).sortBy(_._2).map(x => (x._3, x._4))
    assert(fpsA.length >= 3, s"divisor 16 over 60 tokens should cut: ${fpsA.length} chunks")
    // CDC property: after the first boundary past the insertion, doc 2's
    // chunk stream re-synchronizes to doc 1's — the shared tail is intact
    val common = fpsA.toSet.intersect(fpsB.toSet)
    assert(common.size >= fpsA.length - 2,
      s"re-sync failed: ${common.size} of ${fpsA.length} chunks shared")
    // identical content under a different id chunks identically
    val dup = TextStats.cdcChunks(Seq((9L, base)).toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(dup.map(x => (x._2, x._3)).toSeq == fpsA.toSeq,
      "chunking must be a pure function of content")
    // repartition-stable
    val again = TextStats.cdcChunks(df.repartition(7), col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.sorted.toSeq == out.sorted.toSeq)
  }

  test("unimax water-filling: caps honored, budget conserved, uniform tail") {
    val s = spark
    import s.implicits._
    // capacities ×2 epochs: a→4, b→10, c→40. Budget 20: a saturates
    // (4·2+4=12 ≤ 20), b? 10·1+14=24 > 20 → unsaturated; R=16 over u=2 →
    // 8 each. a repeats: every doc 2×; b: 10 docs alloc 8 → 8 docs 1×, 2
    // docs 0; c: 20 docs alloc 8.
    val df = ((1 to 2).map(i => (i.toLong, "a")) ++
      (11 to 20).map(i => (i.toLong, "b")) ++
      (21 to 40).map(i => (i.toLong, "c"))).toDF("doc_id", "lang")
    val out = Curation.unimaxRepeats(df, col("doc_id"), col("lang"),
      budget = 20L, maxEpochs = 2)
    val byLang = out.groupBy("lang").agg(
        max(col("alloc")).as("alloc"), sum(col("repeats")).as("reps"),
        max(col("repeats")).as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byLang("a") == ((4L, 4L, 2L)), s"a: ${byLang("a")}")
    assert(byLang("b") == ((8L, 8L, 1L)), s"b: ${byLang("b")}")
    assert(byLang("c") == ((8L, 8L, 1L)), s"c: ${byLang("c")}")
    assert(byLang.values.map(_._2).sum == 20L, "budget must be conserved")
    // over-budget: everything saturates at cap, shortfall visible
    val sat = Curation.unimaxRepeats(df, col("doc_id"), col("lang"),
        budget = 1000L, maxEpochs = 2)
      .agg(sum(col("repeats"))).collect()(0).getLong(0)
    assert(sat == 64L, s"all-saturated total should be 2×32=64, got $sat")
    // repartition-stable materialization
    val a = out.select("doc_id", "repeats").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = Curation.unimaxRepeats(df.repartition(7), col("doc_id"), col("lang"),
        budget = 20L, maxEpochs = 2)
      .select("doc_id", "repeats").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.toSeq == b.toSeq)
  }
}
