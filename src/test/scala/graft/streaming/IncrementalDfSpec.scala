package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Ranking

/** Cross-batch document-frequency index: store-backed BM25 == the batch
  * operator over concatenated history at every horizon; stats and df
  * exact; replay safety; a new batch scores in the GLOBAL term economy. */
class IncrementalDfSpec extends SparkSpec {

  private def docs = graft.model.Envelopes.table(spark, sfDir(), "documents")

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("store-backed bm25 equals batch bm25 over concatenated history at every horizon") {
    val d = docs.localCheckpoint(true)
    val store = Files.createTempDirectory("inc_df").toString + "/df"
    val terms = Seq("spark", "window")
    var hist: DataFrame = null
    for (i <- 0 until 3) {
      val b = d.filter(col("doc_id") % 3 === i)
      hist = if (hist == null) b else hist.unionByName(b)
      IncrementalDf.mergeBatch(b, store, col("doc_id"), col("text"),
        batchId = i.toLong)
      val got = IncrementalDf.bm25Store(spark, store, hist, col("doc_id"),
        col("text"), terms, topK = 20)
      val want = Ranking.bm25(hist, col("doc_id"), col("text"), terms,
        topK = 20)
      assert(sameRows(got, want), s"horizon $i diverged")
    }
    graft.util.Blocks.freeCheckpoint(d)
  }

  test("stats and per-term df match direct aggregates; replay folds nothing") {
    val d = docs.localCheckpoint(true)
    val store = Files.createTempDirectory("inc_df_st").toString + "/df"
    IncrementalDf.mergeBatch(d.filter(col("doc_id") % 2 === 0), store,
      col("doc_id"), col("text"), batchId = 0L)
    IncrementalDf.mergeBatch(d.filter(col("doc_id") % 2 === 1), store,
      col("doc_id"), col("text"), batchId = 1L)
    val tok = d.select(col("doc_id"),
      graft.ext.TextStats.toks(col("text")).as("t"))
    val wantDocs = d.count()
    val wantDl = tok.agg(sum(size(col("t")))).head().getLong(0)
    val dt = tok.select(col("doc_id"), explode(col("t")).as("term"))
      .distinct().localCheckpoint(true)
    val wantTerms = dt.select("term").distinct().count()
    val st = IncrementalDf.readStats(spark, store).head()
    assert((st.getLong(0), st.getLong(1), st.getLong(2)) ==
      ((wantDocs, wantDl, wantTerms)))
    // per-term df: the distinct-membership count, 0 for unseen
    val wantSpark = dt.filter(col("term") === "spark").count()
    val got = IncrementalDf.readDf(spark, store, Seq("spark", "__nosuch__"))
    assert(got == Map("spark" -> wantSpark, "__nosuch__" -> 0L))
    // replay batch 1 with DIFFERENT rows: stats untouched
    IncrementalDf.mergeBatch(d.limit(5), store, col("doc_id"), col("text"),
      batchId = 1L)
    val st2 = IncrementalDf.readStats(spark, store).head()
    assert((st2.getLong(0), st2.getLong(1), st2.getLong(2)) ==
      ((wantDocs, wantDl, wantTerms)))
    graft.util.Blocks.freeCheckpoint(dt)
    graft.util.Blocks.freeCheckpoint(d)
  }

  test("deleteBatch: post-delete scoring equals batch bm25 over survivors; guards fire") {
    val d = docs.localCheckpoint(true)
    val store = Files.createTempDirectory("inc_df_del").toString + "/df"
    val terms = Seq("spark", "window")
    for (i <- 0 until 3)
      IncrementalDf.mergeBatch(d.filter(col("doc_id") % 3 === i), store,
        col("doc_id"), col("text"), batchId = i.toLong)
    IncrementalDf.deleteBatch(d.filter(col("doc_id") % 5 === 0), store,
      col("doc_id"), col("text"), batchId = 3L)
    val surv = d.filter(col("doc_id") % 5 =!= 0)
    // stats == survivor aggregates, integer-exact
    val st = IncrementalDf.readStats(spark, store).head()
    val wantN = surv.count()
    val wantSdl = surv.select(
      coalesce(sum(size(graft.ext.TextStats.toks(col("text"))).cast("long")),
        lit(0L))).head().getLong(0)
    assert(st.getLong(0) == wantN && st.getLong(1) == wantSdl,
      s"stats (${st.getLong(0)}, ${st.getLong(1)}) != ($wantN, $wantSdl)")
    // ranking == the batch operator over survivors
    val got = IncrementalDf.bm25Store(spark, store, surv, col("doc_id"),
      col("text"), terms, topK = 20)
    val want = Ranking.bm25(surv, col("doc_id"), col("text"), terms, topK = 20)
    assert(sameRows(got, want), "post-delete scoring != batch over survivors")
    // replay is a no-op
    val gen = KeyedStore.latestGeneration(spark, store)
    IncrementalDf.deleteBatch(d.filter(col("doc_id") % 5 === 0), store,
      col("doc_id"), col("text"), batchId = 3L)
    assert(KeyedStore.latestGeneration(spark, store) == gen)
    graft.util.Blocks.freeCheckpoint(d)
  }

  test("deleteBatch: unfolded text aborts before writing; zeroed terms reseed on re-fold") {
    val s2 = spark
    import s2.implicits._
    val store = Files.createTempDirectory("inc_df_delg").toString + "/df"
    val a = Seq((1L, "alpha beta"), (2L, "alpha gamma")).toDF("doc_id", "text")
    IncrementalDf.mergeBatch(a, store, col("doc_id"), col("text"), batchId = 0L)
    // a doc that was never folded (term 'delta' absent) aborts loudly
    val gen = KeyedStore.latestGeneration(spark, store)
    intercept[IllegalArgumentException] {
      IncrementalDf.deleteBatch(Seq((9L, "alpha delta")).toDF("doc_id", "text"),
        store, col("doc_id"), col("text"), batchId = 1L)
    }
    assert(KeyedStore.latestGeneration(spark, store) == gen, "store mutated")
    // delete doc 1: beta's df reaches 0 and tombstones; n_terms drops
    IncrementalDf.deleteBatch(Seq((1L, "alpha beta")).toDF("doc_id", "text"),
      store, col("doc_id"), col("text"), batchId = 1L)
    assert(IncrementalDf.readDf(spark, store, Seq("alpha", "beta"))
      == Map("alpha" -> 1L, "beta" -> 0L))
    val st = IncrementalDf.readStats(spark, store).head()
    assert((st.getLong(0), st.getLong(1), st.getLong(2)) == ((1L, 2L, 2L)))
    // re-folding a doc with the zeroed term reseeds it from zero
    IncrementalDf.mergeBatch(Seq((3L, "beta beta")).toDF("doc_id", "text"),
      store, col("doc_id"), col("text"), batchId = 2L)
    assert(IncrementalDf.readDf(spark, store, Seq("beta")) == Map("beta" -> 1L))
    val st2 = IncrementalDf.readStats(spark, store).head()
    assert((st2.getLong(0), st2.getLong(1), st2.getLong(2)) == ((2L, 4L, 3L)))
  }

  test("unseen query terms are dropped, never NaN-poison; all-unseen fails fast") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, "aa bb"), (2L, "aa"), (3L, "bb cc"))
      .toDF("doc_id", "text")
    val store = Files.createTempDirectory("inc_df_z").toString + "/df"
    IncrementalDf.mergeBatch(corpus, store, col("doc_id"), col("text"), 0L)
    // '__ghost__' is absent from the index: its df = 0 idf is infinite —
    // the score must equal the query WITHOUT it (docs that would match
    // the ghost in the candidate set included)
    val cand = corpus.unionByName(Seq((9L, "__ghost__ aa")).toDF("doc_id", "text"))
    val withGhost = IncrementalDf.bm25Store(spark, store, cand,
      col("doc_id"), col("text"), Seq("aa", "__ghost__"), topK = 10)
    val without = IncrementalDf.bm25Store(spark, store, cand,
      col("doc_id"), col("text"), Seq("aa"), topK = 10)
    assert(sameRows(withGhost, without))
    assert(!withGhost.collect().exists(r => r.anyNull ||
      r.toSeq.exists { case d: Double => d.isNaN || d.isInfinite; case _ => false }))
    intercept[IllegalArgumentException] {
      IncrementalDf.bm25Store(spark, store, cand, col("doc_id"),
        col("text"), Seq("__ghost__"), topK = 10)
    }
  }

  test("a new batch scores in the global term economy, not its own") {
    val s = spark
    import s.implicits._
    // corpus: 'aa' is common (df 9), 'bb' rare (df 3) — globally, the
    // bb document must outrank the aa document; scored alone as a batch
    // (df 1 vs 1), they tie and doc_id breaks it the other way
    val corpus = (Seq((1L, "aa aa aa"), (2L, "bb bb bb")) ++
      (3L to 10L).map(i => (i, "aa xx")) ++
      Seq((11L, "bb yy"), (12L, "bb zz"))).toDF("doc_id", "text")
    val store = Files.createTempDirectory("inc_df_gl").toString + "/df"
    IncrementalDf.mergeBatch(corpus, store, col("doc_id"), col("text"),
      batchId = 0L)
    val subset = corpus.filter(col("doc_id") <= 2)
    val globalTop = IncrementalDf.bm25Store(spark, store, subset,
      col("doc_id"), col("text"), Seq("aa", "bb"), topK = 2)
      .filter(col("rk") === 1).head().getLong(1)
    val localTop = Ranking.bm25(subset, col("doc_id"), col("text"),
      Seq("aa", "bb"), topK = 2)
      .filter(col("rk") === 1).head().getLong(1)
    assert(globalTop == 2L, "global idf must favor the rare-term doc")
    assert(localTop == 1L, "batch-local stats tie and break by doc_id")
  }
}
