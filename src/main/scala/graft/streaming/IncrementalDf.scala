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
  * row. The corpus row carries the RUNNING vocabulary size (`nt`), so no
  * read path ever counts the term table. Store access is bucket-pruned
  * throughout (the [[IncrementalScd2]] pattern, buckets keyed by `term`):
  * a fold reads only the batch terms' buckets + the corpus/meta bucket,
  * [[readDf]] reads only the query terms' buckets, [[readStats]] one
  * bucket — a million-term index costs a fold the same file reads as a
  * thousand-term one. Per-fold cost: one batch tokenize + distinct, the
  * pruned read, and a bucketed upsert of only the terms the batch
  * touched. */
object IncrementalDf {

  private val Cols =
    Seq("kind", "term", "df", "n", "sdl", "nt", "ver", "op_type")

  private def prunedLive(spark: SparkSession, storePath: String,
      probe: DataFrame): Option[DataFrame] =
    KeyedStore.readPruned(spark, storePath, probe)
      .map(_.filter(col("op_type") =!= "delete").select(Cols.map(col): _*))

  private def metaProbe(spark: SparkSession): DataFrame = {
    // LocalRelation on purpose (not range(1).select): readPruned's
    // driver-local fast path then resolves the probe's bucket with ZERO
    // Spark jobs (Range does not fold to a LocalRelation)
    import spark.implicits._
    Seq("").toDF("term")
  }

  /** (n_docs, sum_dl, n_terms, hwm) — the manifest note (ZERO Spark jobs)
    * when present, else one pruned bucket read over the corpus + meta
    * rows, never a term-table scan. */
  private def corpusRow(spark: SparkSession,
      storePath: String): (Long, Long, Long, Option[Long]) =
    KeyedStore.readNote(spark, storePath).map { nn =>
      val d = KeyedStore.Note.decode(nn)
      (d("n").toLong, d("sdl").toLong, d("nt").toLong, Some(d("ver").toLong))
    }.getOrElse {
      val rows = prunedLive(spark, storePath, metaProbe(spark))
        .map(_.filter(col("kind") =!= "v")
          .select(col("kind"), col("n"), col("sdl"), col("nt"), col("ver"))
          .collect()).getOrElse(Array.empty)
      val c = rows.find(_.getString(0) == "c")
      val m = rows.find(_.getString(0) == "m").map(_.getLong(4))
      c.map(r => (r.getLong(1), r.getLong(2), r.getLong(3), m))
        .getOrElse((0L, 0L, 0L, m))
    }

  private def statsFrame(spark: SparkSession, n: Long, sdl: Long,
      nt: Long): DataFrame =
    spark.range(1).select(lit(n).as("n_docs"), lit(sdl).as("sum_dl"),
      lit(nt).as("n_terms"))

  /** Fold one micro-batch of documents into the index at `storePath`
    * (created on first use) and return the updated corpus stats
    * (n_docs, sum_dl, n_terms). */
  def mergeBatch(batch: DataFrame, storePath: String, idCol: Column,
      textCol: Column, batchId: Long, numBuckets: Int = 4): DataFrame = {
    val spark = batch.sparkSession
    val toks = batch.select(idCol.as("doc_id"),
        graft.ext.TextStats.toks(textCol).as("__toks"))
      // LAZY pin: batchDf's eager checkpoint materializes it; one
      // tokenize still feeds df AND the length sums
      .localCheckpoint(false)
    val batchDf = toks
      .select(col("doc_id"), explode(col("__toks")).as("term")).distinct()
      .groupBy("term").agg(count(lit(1)).as("bdf"))
      .localCheckpoint(true) // feeds the probe, the df join, the nt anti
    // ONE pruned read serves the whole fold: batch terms' buckets (df
    // upsert + new-vocabulary anti-join can only match there) + the
    // corpus/meta bucket (term = "")
    val probe = batchDf.select(col("term"))
      .unionByName(metaProbe(spark))
    val pruned = prunedLive(spark, storePath, probe)
    // corpus scalars + HWM ride the manifest note (zero Spark jobs; the
    // pruned meta-row collect survives as the pre-note legacy fallback)
    val (n0, sdl0, nt0, hwm) = KeyedStore.readNote(spark, storePath)
      .map { nn =>
        val d = KeyedStore.Note.decode(nn)
        (d("n").toLong, d("sdl").toLong, d("nt").toLong,
          Some(d("ver").toLong): Option[Long])
      }
      .getOrElse {
        val cm = pruned.map(_.filter(col("kind") =!= "v")
          .select(col("kind"), col("n"), col("sdl"), col("nt"), col("ver"))
          .collect()).getOrElse(Array.empty[org.apache.spark.sql.Row])
        val m = cm.find(_.getString(0) == "m").map(_.getLong(4))
        cm.find(_.getString(0) == "c")
          .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), m))
          .getOrElse((0L, 0L, 0L, m))
      }
    if (hwm.exists(batchId <= _)) { // replay: current stats, store untouched
      graft.util.Blocks.freeCheckpoint(batchDf)
      graft.util.Blocks.freeCheckpoint(toks)
      // literal-only frame: nothing to pin
      return statsFrame(spark, n0, sdl0, nt0)
    }
    val cur = pruned.map(_.filter(col("kind") === "v")
        .select(col("term"), col("df")))
      .getOrElse(batchDf.select(col("term"), lit(0L).as("df")).limit(0))
    val vRows = batchDf.join(cur, Seq("term"), "left_outer")
      .select(lit("v").as("kind"), col("term"),
        (coalesce(col("df"), lit(0L)) + col("bdf")).as("df"),
        lit(0L).as("n"), lit(0L).as("sdl"), lit(0L).as("nt"),
        lit(batchId).as("ver"), lit("put").as("op_type"))
    val freshTerms = batchDf.join(cur, Seq("term"), "left_anti").count()
    val bStats = toks.agg(count(lit(1)).as("bn"),
      count_distinct(col("doc_id")).as("bnd"),
      coalesce(sum(size(col("__toks")).cast("long")), lit(0L)).as("bsdl"))
      .head()
    // within-batch duplicate guard (the IncrementalIvf.mergeBatch stance):
    // batchDf distincts (doc, term) so df would count a repeated doc ONCE
    // while the raw-row n_docs/sum_dl sums below would count it TWICE —
    // silently corrupting the corpus stats. Abort before anything writes.
    require(bStats.getLong(0) == bStats.getLong(1),
      s"mergeBatch: batch holds duplicate doc ids (${bStats.getLong(0)} rows" +
        s", ${bStats.getLong(1)} distinct) — each doc id folds once; route " +
        "re-ingested docs through IncrementalDedup upstream")
    val (n1, sdl1, nt1) = (n0 + bStats.getLong(0), sdl0 + bStats.getLong(2),
      nt0 + freshTerms)
    def row(kind: String, n: Long, sdl: Long, nt: Long) =
      spark.range(1).select(lit(kind).as("kind"), lit("").as("term"),
        lit(0L).as("df"), lit(n).as("n"), lit(sdl).as("sdl"),
        lit(nt).as("nt"), lit(batchId).as("ver"), lit("put").as("op_type"))
    val changed = vRows.unionByName(row("c", n1, sdl1, nt1))
      .unionByName(row("m", 0L, 0L, 0L))
      // LAZY pin: the merge's own stage write is the one materialization
      .localCheckpoint(false)
    KeyedStore.merge(changed, storePath,
      keys = Seq("kind", "term"), seqCols = Seq("ver"),
      numBuckets = numBuckets, bucketCols = Seq("term"),
      note = Some(KeyedStore.Note.encode(
        "n" -> n1.toString, "sdl" -> sdl1.toString, "nt" -> nt1.toString,
        "ver" -> batchId.toString)))
    graft.util.Blocks.freeCheckpoint(changed)
    graft.util.Blocks.freeCheckpoint(batchDf)
    graft.util.Blocks.freeCheckpoint(toks)
    // literal-only frame: nothing to pin
    statsFrame(spark, n1, sdl1, nt1)
  }

  /** CDC DELETE half for the BM25 index (round 13 — the
    * [[IncrementalIvf.deleteBatch]] family member for lexical
    * retrieval; the production case is the right-to-erasure pass over a
    * search index): remove documents' contributions from the term
    * frequencies and corpus statistics.
    *
    * Contract: each deleted doc must have been folded exactly ONCE,
    * with the SAME text (a CDC delete carries the full row) — the store
    * records TERMS, not doc ids, so full liveness cannot be enforced
    * the way [[IncrementalIvf]]'s ids store allows; route document
    * identity through [[IncrementalDedup]] upstream where re-delivery
    * is possible. PARTIALLY enforced here: a batch term missing from
    * the store, or with stored df smaller than the batch's, aborts
    * loudly BEFORE anything writes (it proves a never-folded doc or
    * drifted text).
    *
    * All decrements are integer-exact, so after any fold/delete
    * interleaving the stored (df, n_docs, sum_dl) equal the one-pass
    * aggregate over the SURVIVING corpus — [[bm25Store]] over survivor
    * candidates is then bit-identical to the batch
    * [[graft.ext.Ranking.bm25]] over survivors (`q_bm25_delta`). Terms
    * whose df reaches 0 TOMBSTONE (and n_terms decrements — the live
    * vocabulary, matching the fold's fresh-term increments); a later
    * re-fold reseeds them through the fold's coalesce. Returns the
    * updated (n_docs, sum_dl, n_terms). */
  def deleteBatch(batch: DataFrame, storePath: String, idCol: Column,
      textCol: Column, batchId: Long, numBuckets: Int = 4): DataFrame = {
    val spark = batch.sparkSession
    val toks = batch.select(idCol.as("doc_id"),
        graft.ext.TextStats.toks(textCol).as("__toks"))
      // LAZY pin: batchDf's eager checkpoint materializes it
      .localCheckpoint(false)
    val batchDf = toks
      .select(col("doc_id"), explode(col("__toks")).as("term")).distinct()
      .groupBy("term").agg(count(lit(1)).as("bdf"))
      .localCheckpoint(true) // feeds the probe, the guard, and the decrement
    val probe = batchDf.select(col("term"))
      .unionByName(metaProbe(spark))
    val pruned = prunedLive(spark, storePath, probe)
    val (n0, sdl0, nt0, hwm) = KeyedStore.readNote(spark, storePath)
      .map { nn =>
        val d = KeyedStore.Note.decode(nn)
        (d("n").toLong, d("sdl").toLong, d("nt").toLong,
          Some(d("ver").toLong): Option[Long])
      }
      .getOrElse {
        val cm = pruned.map(_.filter(col("kind") =!= "v")
          .select(col("kind"), col("n"), col("sdl"), col("nt"), col("ver"))
          .collect()).getOrElse(Array.empty[org.apache.spark.sql.Row])
        val m = cm.find(_.getString(0) == "m").map(_.getLong(4))
        cm.find(_.getString(0) == "c")
          .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), m))
          .getOrElse((0L, 0L, 0L, m))
      }
    if (hwm.exists(batchId <= _)) { // replay: current stats, store untouched
      graft.util.Blocks.freeCheckpoint(batchDf)
      graft.util.Blocks.freeCheckpoint(toks)
      return statsFrame(spark, n0, sdl0, nt0)
    }
    val cur = pruned.map(_.filter(col("kind") === "v")
        .select(col("term"), col("df")))
      .getOrElse(batchDf.select(col("term"), lit(0L).as("df")).limit(0))
    val dec = batchDf.join(cur, Seq("term"), "left_outer")
    // the enforceable half of the contract: a term the store lacks (or
    // holds fewer docs of) proves an unfolded doc or drifted text
    val bad = dec.filter(col("df").isNull || col("df") < col("bdf"))
      .select(col("term")).limit(3).collect().map(_.getString(0))
    require(bad.isEmpty,
      s"deleteBatch: terms ${bad.mkString(", ")}… are not in the index at " +
        s"$storePath with df >= the batch's — the batch holds a doc that " +
        "was never folded or whose text drifted since folding. (A " +
        "cross-batch double delete is caught only when it happens to push " +
        "some term's df below the batch's — the store records terms, not " +
        "doc ids; route document identity through IncrementalDedup " +
        "upstream for full enforcement.)")
    val vRows = dec
      .select(lit("v").as("kind"), col("term"),
        (col("df") - col("bdf")).as("df"),
        lit(0L).as("n"), lit(0L).as("sdl"), lit(0L).as("nt"),
        lit(batchId).as("ver"),
        when(col("df") === col("bdf"), lit("delete")).otherwise(lit("put"))
          .as("op_type"))
    val zeroed = dec.filter(col("df") === col("bdf")).count()
    val bStats = toks.agg(count(lit(1)).as("bn"),
      count_distinct(col("doc_id")).as("bnd"),
      coalesce(sum(size(col("__toks")).cast("long")), lit(0L)).as("bsdl"))
      .head()
    // within-batch duplicate guard (mirrors IncrementalIvf.deleteBatch's
    // delete-once check): batchDf distincts (doc, term) so df decrements a
    // repeated doc ONCE while the raw-row sums would decrement n_docs and
    // sum_dl TWICE — the df >= bdf guard above cannot see that asymmetry.
    require(bStats.getLong(0) == bStats.getLong(1),
      s"deleteBatch: batch holds duplicate doc ids (${bStats.getLong(0)} " +
        s"rows, ${bStats.getLong(1)} distinct) — each folded doc deletes " +
        "once; dedup the delete batch by doc id")
    val (n1, sdl1, nt1) = (n0 - bStats.getLong(0), sdl0 - bStats.getLong(2),
      nt0 - zeroed)
    def row(kind: String, n: Long, sdl: Long, nt: Long) =
      spark.range(1).select(lit(kind).as("kind"), lit("").as("term"),
        lit(0L).as("df"), lit(n).as("n"), lit(sdl).as("sdl"),
        lit(nt).as("nt"), lit(batchId).as("ver"), lit("put").as("op_type"))
    val changed = vRows.unionByName(row("c", n1, sdl1, nt1))
      .unionByName(row("m", 0L, 0L, 0L))
      // LAZY pin: the merge's own stage write is the one materialization
      .localCheckpoint(false)
    KeyedStore.merge(changed, storePath,
      keys = Seq("kind", "term"), seqCols = Seq("ver"),
      numBuckets = numBuckets, bucketCols = Seq("term"),
      note = Some(KeyedStore.Note.encode(
        "n" -> n1.toString, "sdl" -> sdl1.toString, "nt" -> nt1.toString,
        "ver" -> batchId.toString)))
    // self-scheduled tombstone maintenance (round 14, VERDICT r13 item 6):
    // a df-reached-0 tombstone is safe to drop — the HWM serializes folds
    // (no late lower-seq put to resurrect), and an absent term reads
    // exactly as a tombstoned one on every path (the fold's coalesce
    // reseeds from 0, readDf returns 0) — so a delete-heavy index
    // compacts itself and reads stay O(live terms).
    KeyedStore.maintain(spark, storePath)
    graft.util.Blocks.freeCheckpoint(changed)
    graft.util.Blocks.freeCheckpoint(batchDf)
    graft.util.Blocks.freeCheckpoint(toks)
    // literal-only frame: nothing to pin
    statsFrame(spark, n1, sdl1, nt1)
  }

  /** The current corpus stats at `storePath` without folding. */
  def readStats(spark: SparkSession, storePath: String): DataFrame = {
    val (n, sdl, nt, _) = corpusRow(spark, storePath)
    statsFrame(spark, n, sdl, nt)
  }

  /** Per-term stored document frequencies for `terms` (0 for unseen) —
    * a pruned read of only the query terms' buckets. */
  def readDf(spark: SparkSession, storePath: String,
      terms: Seq[String]): Map[String, Long] = {
    import spark.implicits._
    val hit = prunedLive(spark, storePath, terms.toDF("term"))
      .map(_.filter(col("kind") === "v" && col("term").isin(terms: _*))
        .select(col("term"), col("df")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
      .getOrElse(Map.empty)
    terms.map(t => t -> hit.getOrElse(t, 0L)).toMap
  }

  /** BM25-rank `docs` against the STORE's corpus statistics — the
    * production shape: global idf/avgdl from the index, per-document tf
    * from the candidate set alone. When `docs` IS the concatenated folded
    * corpus this is bit-identical to [[graft.ext.Ranking.bm25]] over it
    * (same stats values through the same [[graft.ext.Ranking.bm25Score]]
    * tree); when `docs` is a new batch, it is the batch scored in the
    * index's global term economy. Query terms the index has NEVER seen
    * (df = 0) are DROPPED before scoring — the index has no economy for
    * them, and their idf = n/0 would otherwise poison every matching
    * document's sum to NaN; a query of only unseen terms fails fast (the
    * n_docs = 0 stance). */
  def bm25Store(spark: SparkSession, storePath: String, docs: DataFrame,
      idCol: Column, textCol: Column, terms: Seq[String], topK: Int = 20,
      k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val (n, sdl, _, _) = corpusRow(spark, storePath)
    require(n > 0,
      s"empty index at $storePath — n_docs = 0 would score NaN (0/0 idf)")
    val dfs = readDf(spark, storePath, terms)
    val live = terms.filter(t => dfs(t) > 0L)
    require(live.nonEmpty,
      s"no query term indexed at $storePath — df = 0 idf is infinite; " +
        s"terms were ${terms.mkString(", ")}")
    val stats = spark.range(1).select(
      Seq(lit(n).as("n"), lit(sdl).as("sumdl")) ++
        live.zipWithIndex.map { case (t, i) => lit(dfs(t)).as(s"df_$i") }: _*)
    val base = graft.ext.Ranking.bm25Base(docs, idCol, textCol, live)
    graft.ext.Ranking.bm25Score(base, stats, live.size, topK, k1, b)
  }
}
