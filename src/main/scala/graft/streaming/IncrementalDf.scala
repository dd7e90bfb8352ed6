package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-batch document-frequency index — the lexical-retrieval complement
  * of [[IncrementalIvf]]: the corpus statistics BM25 needs (per-term
  * document frequency, total document count, total token count) maintained
  * in a [[KeyedStore]] as the crawl grows, so any candidate set can be
  * scored against GLOBAL statistics without re-reading history. All three
  * statistics are plain integer adds over disjoint document batches, so
  * after any number of folds the store is bit-identical to the one-pass
  * aggregate over the concatenated corpus — and [[bm25Store]] routes those
  * stats through [[graft.ext.Ranking.bm25Score]], the SAME expression tree
  * the batch operator uses, so equal stats give bit-identical rankings
  * (spec-anchored; `q_bm25_stream`'s oracle is the batch twin verbatim,
  * the `q_bloom_stream` precedent).
  *
  * Tokenization is [[graft.ext.TextStats.toks]] via
  * [[graft.ext.Ranking.bm25Base]]'s contract: a document CONTAINS a term
  * iff some whitespace token equals it exactly — df here counts distinct
  * (doc, token) memberships, the same predicate as the batch `tf_i > 0`.
  *
  * Contract: each document id folds ONCE (the [[IncrementalDedup]]
  * assumption — re-ingested docs should pass the exact-dedup store first);
  * replay of a whole batch is safe via the counting-sketch protocol
  * (`batchId` as the `ver` seq, a meta row as the high-water mark, a
  * replayed fold returns current stats without touching the store).
  *
  * State: one row per distinct term ever seen (Heaps-law bounded — the
  * vocabulary grows ~√corpus, not linearly) + one corpus row + one meta
  * row. Per-fold cost: one batch tokenize + distinct, a store read, and a
  * bucketed upsert of only the terms the batch touched. */
object IncrementalDf {

  private def liveRows(spark: SparkSession, storePath: String): DataFrame =
    KeyedStore.read(spark, storePath)
      .map(_.filter(col("op_type") =!= "delete")
        .select(col("kind"), col("term"), col("df"), col("n"), col("sdl"),
          col("ver")))
      .getOrElse {
        import spark.implicits._
        Seq.empty[(String, String, Long, Long, Long, Long)]
          .toDF("kind", "term", "df", "n", "sdl", "ver")
      }

  private def statsOf(live: DataFrame): DataFrame = {
    val c = live.filter(col("kind") === "c")
      .agg(coalesce(sum(col("n")), lit(0L)).as("n_docs"),
        coalesce(sum(col("sdl")), lit(0L)).as("sum_dl"))
    val v = live.filter(col("kind") === "v").agg(count(lit(1)).as("n_terms"))
    c.crossJoin(v)
  }

  /** Fold one micro-batch of documents into the index at `storePath`
    * (created on first use) and return the updated corpus stats
    * (n_docs, sum_dl, n_terms). */
  def mergeBatch(batch: DataFrame, storePath: String, idCol: Column,
      textCol: Column, batchId: Long, numBuckets: Int = 4): DataFrame = {
    val spark = batch.sparkSession
    val live = liveRows(spark, storePath).localCheckpoint(true)
    val meta = live.filter(col("kind") === "m").select(col("ver")).collect()
    if (meta.exists(mr => batchId <= mr.getLong(0))) {
      val out = statsOf(live).localCheckpoint(true)
      graft.util.Blocks.freeCheckpoint(live)
      return out
    }
    val toks = batch.select(idCol.as("doc_id"),
        graft.ext.TextStats.toks(textCol).as("__toks"))
      .localCheckpoint(true) // one tokenize feeds df AND the length sums
    val batchDf = toks
      .select(col("doc_id"), explode(col("__toks")).as("term")).distinct()
      .groupBy("term").agg(count(lit(1)).as("bdf"))
    val cur = live.filter(col("kind") === "v")
      .select(col("term"), col("df"))
    val vRows = batchDf.join(cur, Seq("term"), "left_outer")
      .select(lit("v").as("kind"), col("term"),
        (coalesce(col("df"), lit(0L)) + col("bdf")).as("df"),
        lit(0L).as("n"), lit(0L).as("sdl"),
        lit(batchId).as("ver"), lit("put").as("op_type"))
    val bStats = toks.agg(count(lit(1)).as("bn"),
      coalesce(sum(size(col("__toks")).cast("long")), lit(0L)).as("bsdl"))
      .head()
    val curC = live.filter(col("kind") === "c")
      .agg(coalesce(sum(col("n")), lit(0L)),
        coalesce(sum(col("sdl")), lit(0L))).head()
    val cRow = spark.range(1).select(lit("c").as("kind"), lit("").as("term"),
      lit(0L).as("df"), lit(curC.getLong(0) + bStats.getLong(0)).as("n"),
      lit(curC.getLong(1) + bStats.getLong(1)).as("sdl"),
      lit(batchId).as("ver"), lit("put").as("op_type"))
    val mRow = spark.range(1).select(lit("m").as("kind"), lit("").as("term"),
      lit(0L).as("df"), lit(0L).as("n"), lit(0L).as("sdl"),
      lit(batchId).as("ver"), lit("put").as("op_type"))
    val changed = vRows.unionByName(cRow).unionByName(mRow)
      .localCheckpoint(true) // pin BEFORE the merge mutates the store
    KeyedStore.merge(changed, storePath,
      keys = Seq("kind", "term"), seqCols = Seq("ver"),
      numBuckets = numBuckets)
    // stats after the fold: stored state with the changed rows swapped in
    // (batchDf still reads the pinned toks — free only after this)
    val nTerms = cur.join(batchDf.select(col("term")), Seq("term"),
      "left_anti").count() + batchDf.count()
    graft.util.Blocks.freeCheckpoint(toks)
    val out = spark.range(1).select(
        lit(curC.getLong(0) + bStats.getLong(0)).as("n_docs"),
        lit(curC.getLong(1) + bStats.getLong(1)).as("sum_dl"),
        lit(nTerms).as("n_terms"))
      .localCheckpoint(true)
    graft.util.Blocks.freeCheckpoint(live)
    graft.util.Blocks.freeCheckpoint(changed)
    out
  }

  /** The current corpus stats at `storePath` without folding. */
  def readStats(spark: SparkSession, storePath: String): DataFrame =
    statsOf(liveRows(spark, storePath))

  /** Per-term stored document frequencies for `terms` (0 for unseen). */
  def readDf(spark: SparkSession, storePath: String,
      terms: Seq[String]): Map[String, Long] = {
    val hit = liveRows(spark, storePath)
      .filter(col("kind") === "v" && col("term").isin(terms: _*))
      .select(col("term"), col("df")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    terms.map(t => t -> hit.getOrElse(t, 0L)).toMap
  }

  /** BM25-rank `docs` against the STORE's corpus statistics — the
    * production shape: global idf/avgdl from the index, per-document tf
    * from the candidate set alone. When `docs` IS the concatenated folded
    * corpus this is bit-identical to [[graft.ext.Ranking.bm25]] over it
    * (same stats values through the same [[graft.ext.Ranking.bm25Score]]
    * tree); when `docs` is a new batch, it is the batch scored in the
    * index's global term economy. */
  def bm25Store(spark: SparkSession, storePath: String, docs: DataFrame,
      idCol: Column, textCol: Column, terms: Seq[String], topK: Int = 20,
      k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val st = readStats(spark, storePath).head()
    require(st.getLong(0) > 0,
      s"empty index at $storePath — n_docs = 0 would score NaN (0/0 idf)")
    val dfs = readDf(spark, storePath, terms)
    val stats = spark.range(1).select(
      Seq(lit(st.getLong(0)).as("n"), lit(st.getLong(1)).as("sumdl")) ++
        terms.zipWithIndex.map { case (t, i) => lit(dfs(t)).as(s"df_$i") }: _*)
    val base = graft.ext.Ranking.bm25Base(docs, idCol, textCol, terms)
    graft.ext.Ranking.bm25Score(base, stats, terms.size, topK, k1, b)
  }
}
