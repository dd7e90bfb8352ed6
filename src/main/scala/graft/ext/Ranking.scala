package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus relevance-ranking operators — the retrieval half of a
  * training-data pipeline (scoring documents against probe queries for
  * curriculum selection, eval-set mining, or quality weighting): per-document
  * TF-IDF top terms and BM25 keyword ranking.
  *
  * Numeric posture: every ranking score is built ONLY from IEEE-exact
  * operations (`+ − × ÷` on doubles are correctly rounded by the standard, so
  * any two engines produce bit-identical values; `ln`/`exp` are NOT
  * guaranteed and never appear here). The idf factor is therefore the raw
  * reciprocal `N/df` rather than the textbook `ln(N/df)` — per-document
  * ranking order is preserved for TF-IDF (monotone transform applied
  * per-term), and for BM25 it is the documented "raw idf" variant. Outputs
  * carry integers and ranks, never floats.
  */
object Ranking {

  /** Top-`topK` TF-IDF terms per document. idf is reciprocal document
    * frequency (see object doc); since the corpus size N multiplies every
    * term's score equally, `tf/df` ranks identically to `tf·(N/df)` and
    * needs no corpus-count pass.
    *
    * Shape at scale: token explode → (doc, term) count (shuffle 1, map-side
    * combine), document frequency on the term key (shuffle 2, vocab-sized
    * output), score join reusing the term-keyed exchange, then the per-doc
    * window (shuffle 3 on doc_id). All three shuffles are linear in tokens /
    * vocab — the canonical distributed TF-IDF plan.
    *
    * @return (doc_id, rk, term, tf, df) — rank ties broken by term. */
  def tfIdfTop(df: DataFrame, idCol: Column, textCol: Column, topK: Int = 3): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val tok = Dedup.spread(df.select(idCol.as("doc_id"), TextStats.toks(textCol).as("__toks")))
      .select(col("doc_id"), explode(col("__toks")).as("term"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // tf is distinct per (doc, term), so count(*) per term IS the document
    // frequency — no second distinct pass.
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dfq, "term")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy((col("tf").cast("double") / col("df")).desc, col("term"))))
      .filter(col("rk") <= topK)
      .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("df"))
  }

  /** BM25 (raw-idf variant) ranking of documents against a bag of query
    * terms: per term, `(N/df) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))`,
    * summed over terms IN FIXED ORDER (float addition is order-sensitive; a
    * SUM aggregate would be partition-order-nondeterministic, a column-wise
    * `s1 + s2` is not). Defaults k1=1.25, b=0.75 are standard-range values
    * chosen exactly representable in binary so decimal-vs-double literal
    * parsing can never diverge between engines.
    *
    * Shape at scale: per-term tf via row-local array filters (no explode, no
    * shuffle — the query bag rides the scan), one single-row corpus-stats
    * aggregate broadcast back, then top-k by `orderBy().limit()` — Spark
    * plans TakeOrderedAndProject (per-partition partial top-k, no global
    * sort), and the final rank window runs over `topK` rows only.
    *
    * @return (rk, doc_id, dl, tf_0.., one col per query term) */
  def bm25(df: DataFrame, idCol: Column, textCol: Column, terms: Seq[String],
      topK: Int = 20, k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    // Known edge (applies to bm25Store too): a term matching NO document
    // has df = 0, and its per-doc score term is Inf·0 = NaN — poisoning
    // every anyHit doc's sum and degrading the ranking to NaN order.
    // Validate the bag upstream where that can occur; [[bm25Batch]] is
    // structurally immune (absent terms drop out of its df inner join).
    val base = bm25Base(df, idCol, textCol, terms)
    val stats = base.agg(
      count(lit(1)).as("n"),
      (Seq(sum(col("dl")).as("sumdl")) ++ terms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))): _*)
    bm25Score(base, stats, terms.size, topK, k1, b)
  }

  /** The per-document half of [[bm25]]: (doc_id, dl, tf_0..) — row-local
    * array filters, no shuffle. Shared with the store-backed scorer so the
    * tokenizer and tf definitions can never drift. */
  private[graft] def bm25Base(df: DataFrame, idCol: Column, textCol: Column,
      terms: Seq[String]): DataFrame =
    df.select(idCol.as("doc_id"), TextStats.toks(textCol).as("__toks"))
      .withColumn("dl", size(col("__toks")).cast("long"))
      .select(Seq(col("doc_id"), col("dl")) ++ terms.zipWithIndex.map { case (t, i) =>
        size(filter(col("__toks"), x => x === lit(t))).cast("long").as(s"tf_$i")
      }: _*)

  /** The scoring half: rank `base` rows against a ONE-ROW corpus-stats
    * frame (n, sumdl, df_0..df_{k-1}) — whether those stats came from the
    * same one-pass aggregate ([[bm25]]) or a cross-batch store
    * ([[graft.streaming.IncrementalDf.bm25Store]]), the expression tree is
    * THIS one, so equal stats values give bit-identical scores. */
  private[graft] def bm25Score(base: DataFrame, stats: DataFrame,
      nTerms: Int, topK: Int, k1: Double, b: Double): DataFrame = {
    // avgdl and each per-term score are built as ONE expression tree, mirrored
    // token-for-token by the SQL oracle — identical op order ⇒ identical bits.
    val avgdl = col("sumdl").cast("double") / col("n")
    def termScore(i: Int): Column =
      (col("n").cast("double") / col(s"df_$i")) *
        (col(s"tf_$i") * lit(k1 + 1.0)) /
        (col(s"tf_$i") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl)))
    val score = (0 until nTerms).map(termScore).reduce(_ + _)
    val anyHit = (0 until nTerms).map(i => col(s"tf_$i") > 0).reduce(_ || _)
    val outCols = Seq(col("doc_id"), col("dl")) ++ (0 until nTerms).map(i => col(s"tf_$i"))
    val top = base.crossJoin(broadcast(stats))
      .filter(anyHit)
      .select(outCols :+ score.as("__score"): _*)
      .orderBy(col("__score").desc, col("doc_id"))
      .limit(topK)
    top.withColumn("rk", row_number().over(
        Window.orderBy(col("__score").desc, col("doc_id"))))
      .select(col("rk") +: outCols: _*)
  }

  /** BATCH multi-query BM25 — the production retrieval shape: a TABLE of
    * (query_id, term) rows scores against the corpus in ONE corpus pass,
    * instead of one [[bm25]] scan per query (at 10⁴ eval queries over
    * 100 TB that is the difference between one shuffle and ten thousand
    * scans). Same raw-idf formula as [[bm25]].
    *
    * Determinism: per-(query, doc, term) scores are doubles from a fixed
    * IEEE expression tree (bit-identical on any engine), but SUMMING
    * doubles per (query, doc) would be partition-order-nondeterministic —
    * so each term score is QUANTIZED first (`floor(score · scale)`, one
    * deterministic floor of a deterministic double) and the per-document
    * score is an order-free INTEGER sum of those fixed-point terms. The
    * output is exact integers at 1/scale resolution (default 10⁻⁹ — far
    * below any real ranking gap), so the operator hash-oracles
    * (`q_bm25_multi`). Ranks tie-break by doc_id.
    *
    * Shape at scale: one tokenize + (doc, term) count (shuffle 1,
    * map-side combined), document frequency on the term key (shuffle 2,
    * vocab-sized), the query-term join rides the SAME term-keyed exchange
    * (query terms are retrieval-bag-sized — broadcast), one
    * (query_id, doc_id) integer-sum aggregate (shuffle 3, map-side
    * combined), one per-query rank window over matched docs only. The
    * corpus never cartesians against the query table — docs matching no
    * query term never leave shuffle 1.
    *
    * @param queries (query_id, term) rows — duplicates dropped
    * @return (query_id, rk, doc_id, n_terms, score_fp) — top `topK` per
    *   query by quantized score; n_terms = matched query terms */
  def bm25Batch(df: DataFrame, idCol: Column, textCol: Column,
      queries: DataFrame, topK: Int = 10, k1: Double = 1.25,
      b: Double = 0.75, scale: Long = 1000000000L): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val tok = Dedup.spread(df.select(idCol.as("doc_id"),
        TextStats.toks(textCol).as("__toks")))
      .select(col("doc_id"), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("term"))
    val tf = tok.groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = df.select(TextStats.toks(textCol).as("__toks"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(size(col("__toks")).cast("long")), lit(0L)).as("sumdl"))
    val qt = queries.select(col("query_id"), col("term")).distinct()
    // one expression tree, mirrored token-for-token by the SQL twin
    val avgdl = col("sumdl").cast("double") / col("n")
    val termScore =
      (col("n").cast("double") / col("df")) *
        (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_fp").desc, col("doc_id"))
    tf.join(broadcast(qt), "term")
      .join(dfq, "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        floor(termScore * lit(scale)).cast("long").as("__sfp"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("__sfp")).as("score_fp"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("query_id"), col("rk").cast("long").as("rk"),
        col("doc_id"), col("n_terms"), col("score_fp"))
  }

  /** Pseudo-relevance-feedback query EXPANSION (the RM-family two-stage
    * retrieval trick, integer-deterministic form): run a first
    * [[bm25Batch]] pass, take each query's top `fbK` documents as assumed-
    * relevant feedback, and add the `expK` terms with the highest TOTAL
    * term frequency across that query's feedback docs (ties to the
    * lexicographically smaller term; the query's own terms excluded) —
    * the vocabulary-mismatch fix every lexical retrieval stack ships
    * (a query for "spark" pulls in "window" if the spark docs keep saying
    * it). Term selection is pure integer counting, so the expanded query
    * table — and therefore the second-pass ranking through
    * [[bm25Batch]]'s quantized scores — hash-oracles end to end
    * (`q_prf`).
    *
    * Shape at scale: the first pass is [[bm25Batch]]; the feedback join
    * touches `queries × fbK` doc ids against the (doc, term) count table
    * (doc-keyed equi join), and the per-query term rank window runs over
    * feedback-doc vocabularies only. A production run shares the tokenize
    * between the two passes; here each stage derives it independently so
    * the operator stays a pure function (the SQL twin shares one CTE).
    *
    * @return the expanded (query_id, term) table — original ∪ expansion */
  def prfExpand(df: DataFrame, idCol: Column, textCol: Column,
      queries: DataFrame, fbK: Int = 3, expK: Int = 2, k1: Double = 1.25,
      b: Double = 0.75, scale: Long = 1000000000L): DataFrame = {
    require(fbK >= 1 && expK >= 0, s"need fbK >= 1, expK >= 0, got ($fbK, $expK)")
    val first = bm25Batch(df, idCol, textCol, queries, fbK, k1, b, scale)
      .select(col("query_id"), col("doc_id"))
    val tf = Dedup.spread(df.select(idCol.as("doc_id"),
        TextStats.toks(textCol).as("__toks")))
      .select(col("doc_id"), explode(col("__toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val qt = queries.select(col("query_id"), col("term")).distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__s").desc, col("term"))
    val expansion = first.join(tf, "doc_id")
      .join(qt.withColumn("__orig", lit(1)), Seq("query_id", "term"),
        "left_outer")
      .filter(col("__orig").isNull)
      .groupBy("query_id", "term").agg(sum(col("tf")).as("__s"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= expK)
      .select(col("query_id"), col("term"))
    qt.unionByName(expansion)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) — the
    * standard way to combine a LEXICAL ranking (BM25) with a SEMANTIC one
    * (embedding cosine) into one hybrid retrieval list without score
    * calibration: each system contributes `1 / (k + rank)` per document, and
    * documents high on ANY list float to the top. This is the fusion step of
    * every hybrid RAG / eval-mining retrieval stack.
    *
    * Exactness: the reciprocal is computed in FIXED POINT — `scale div
    * (k + rank)` with integer division — so the fused score is an exact
    * integer, bit-identical on every engine and partitioning (the float
    * `1/(k+r)` sums the paper writes are order-dependent in the last ulp).
    * With the default `scale` = 10^12, two distinct rank profiles can only
    * collide if their reciprocal sums agree to a part in 10^12 — and ties
    * break deterministically on doc_id.
    *
    * Shape at scale: each input ranking is already top-k-bounded (a
    * retrieval list, not a corpus), so the union + groupBy touch at most
    * `rankings.size × k` rows and the final global rank window is
    * driver-safe by construction. Fusing FULL corpus rankings is a misuse —
    * cut each system to its top-k first, as the paper does.
    *
    * @param rankings one DataFrame per system, each carrying (doc_id, rk)
    *   with rk = 1-based rank within that system
    * @param k the RRF smoothing constant (60 in the paper)
    * @return (doc_id, n_sys, best_rk, rrf_score, rk) — rk = fused 1-based
    *   rank by rrf_score desc, doc_id asc */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 60,
      scale: Long = 1000000000000L): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k >= 0, s"k must be >= 0, got $k")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val u = rankings.map(_.select(col("doc_id"), col("rk").cast("long").as("rk")))
      .reduce(_ unionByName _)
    u.groupBy("doc_id").agg(
        count(lit(1)).as("n_sys"),
        min(col("rk")).as("best_rk"),
        sum(expr(s"$scale div ($k + rk)")).as("rrf_score"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rrf_score").desc, col("doc_id"))))
      .select(col("doc_id"), col("n_sys"), col("best_rk"),
        col("rrf_score"), col("rk"))
  }

  /** Ranking agreement at depth k — the recall@k / overlap@k number every
    * ANN deployment is judged by, as EXACT integers: per query,
    * `hits` = |top-k(test) ∩ top-k(ref)|, and the caller divides
    * hits / ref_k (emitting the ratio as a float would trade a hash oracle
    * for nothing). Both inputs carry (query_id, doc_id, rk); lists shorter
    * than k (fewer candidates than k exist) are handled by reporting each
    * side's actual depth. Queries present in `ref` only still report
    * (test_k = 0, hits = 0) — a silent per-query recall hole is exactly
    * what this metric exists to surface. Pure integer counting over
    * top-k-bounded lists (queries × k rows) — hash-oracles
    * (`q_ann_recall`).
    * @return (query_id, ref_k, test_k, hits) */
  def overlapAtK(test: DataFrame, ref: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val t = test.filter(col("rk") <= k).select(col("query_id"), col("doc_id"))
    val r = ref.filter(col("rk") <= k).select(col("query_id"), col("doc_id"))
    val refK = r.groupBy("query_id").agg(count(lit(1)).as("ref_k"))
    val testK = t.groupBy("query_id").agg(count(lit(1)).as("test_k"))
    val hits = t.join(r, Seq("query_id", "doc_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    refK.join(testK, Seq("query_id"), "left_outer")
      .join(hits, Seq("query_id"), "left_outer")
      .select(col("query_id"), col("ref_k"),
        coalesce(col("test_k"), lit(0L)).as("test_k"),
        coalesce(col("hits"), lit(0L)).as("hits"))
  }

  /** Multi-QUERY reciprocal-rank fusion — [[rrfFuse]] with a query key:
    * every input carries (query_id, doc_id, rk) and fusion + final rank
    * happen PER QUERY, so a whole probe-query batch fuses its lexical and
    * semantic lists in one map-side-combined aggregate and one per-query
    * rank window (the serving shape beside [[bm25Batch]]'s one-pass
    * scoring). Same exact fixed-point reciprocal as [[rrfFuse]]; inputs
    * are top-k retrieval lists, so the aggregate touches
    * `queries × systems × k` rows.
    * @return (query_id, doc_id, n_sys, best_rk, rrf_score, rk) */
  def rrfFuseKeyed(rankings: Seq[DataFrame], k: Int = 60,
      scale: Long = 1000000000000L): DataFrame = {
    require(rankings.nonEmpty, "rrfFuseKeyed needs at least one ranking")
    require(k >= 0, s"k must be >= 0, got $k")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val u = rankings.map(_.select(col("query_id"), col("doc_id"),
        col("rk").cast("long").as("rk")))
      .reduce(_ unionByName _)
    u.groupBy("query_id", "doc_id").agg(
        count(lit(1)).as("n_sys"),
        min(col("rk")).as("best_rk"),
        sum(expr(s"$scale div ($k + rk)")).as("rrf_score"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf_score").desc, col("doc_id"))))
      .select(col("query_id"), col("doc_id"), col("n_sys"),
        col("best_rk"), col("rrf_score"), col("rk"))
  }

  /** Kendall rank agreement at depth k — the ORDERING companion to
    * [[overlapAtK]] (recall says whether the right items surfaced; Kendall
    * says whether they surfaced in the right order), as EXACT integers:
    * over the items COMMON to both top-k lists, a pair is concordant when
    * the two rankings order it the same way, discordant otherwise (ranks
    * inside a top-k list are distinct, so there are no ties). The caller
    * derives τ = (concordant − discordant) / n_pairs.
    *
    * Pairing is a per-query self-join over top-k-BOUNDED lists — k² pairs
    * per query, the MMR shortlist contract (k ≤ ~1000; never feed unbounded
    * rankings). Queries present in `ref` with zero/one common item still
    * report (n_pairs = 0) — the eval hole the metric exists to surface.
    * Pure integer counting → hash-oracles (`q_rank_corr`).
    * @return (query_id, n_common, n_pairs, concordant, discordant) */
  def kendallPairs(test: DataFrame, ref: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val t = test.filter(col("rk") <= k)
      .select(col("query_id"), col("doc_id"), col("rk").cast("long").as("rt"))
    val r = ref.filter(col("rk") <= k)
      .select(col("query_id"), col("doc_id"), col("rk").cast("long").as("rr"))
    val c = t.join(r, Seq("query_id", "doc_id"))
    val a = c.select(col("query_id"), col("doc_id").as("da"),
      col("rt").as("ta"), col("rr").as("ra"))
    val b = c.select(col("query_id"), col("doc_id").as("db"),
      col("rt").as("tb"), col("rr").as("rb"))
    val sgn = (col("ta") - col("tb")) * (col("ra") - col("rb"))
    val pairs = a.join(b, Seq("query_id")).filter(col("da") < col("db"))
      .groupBy("query_id").agg(
        count(lit(1)).as("n_pairs"),
        sum(when(sgn > 0, 1L).otherwise(0L)).as("concordant"),
        sum(when(sgn < 0, 1L).otherwise(0L)).as("discordant"))
    ref.filter(col("rk") <= k).select(col("query_id")).distinct()
      .join(c.groupBy("query_id").agg(count(lit(1)).as("n_common")),
        Seq("query_id"), "left_outer")
      .join(pairs, Seq("query_id"), "left_outer")
      .select(col("query_id"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("concordant"), lit(0L)).as("concordant"),
        coalesce(col("discordant"), lit(0L)).as("discordant"))
  }

  /** The position-i nDCG discount as a fixed-point INTEGER:
    * ⌊scale / log₂(i+1)⌋. Computed ONCE driver-side and embedded as
    * literals in both the Spark plan and the SQL oracle — the graded sums
    * then add integers, so the metric is exact by construction (no
    * engine-libm log in any per-row path). */
  def ndcgDiscount(i: Int, scale: Long = 1000000000000L): Long =
    math.floor(scale / (math.log(i + 1) / math.log(2))).toLong

  /** nDCG@k numerator/denominator as exact integers — the graded-relevance
    * eval beside [[overlapAtK]] (hits) and [[kendallPairs]] (order):
    * dcg_num = Σ rel(doc) · disc(rank in test), idcg_num the same sum over
    * the ideal (relevance-descending) ordering of `rel`; the caller divides
    * for nDCG = dcg_num / idcg_num. `rel` carries (query_id, doc_id, rel ≥
    * 0 integer grades) and DEFINES the query set; test docs without a grade
    * count 0 (the standard convention). Discount table is k broadcast-
    * joined literal rows via [[ndcgDiscount]]. Hash-oracles (`q_ndcg`).
    * @return (query_id, dcg_num, idcg_num) */
  def ndcgAtK(test: DataFrame, rel: DataFrame, k: Int,
      scale: Long = 1000000000000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val s = test.sparkSession
    import s.implicits._
    val dTab = (1 to k).map(i => (i.toLong, ndcgDiscount(i, scale)))
      .toDF("__pos", "__disc")
    val r = rel.select(col("query_id"), col("doc_id"),
      col("rel").cast("long").as("__rel"))
    val dcg = test.filter(col("rk") <= k)
      .select(col("query_id"), col("doc_id"), col("rk").cast("long").as("__pos"))
      .join(r, Seq("query_id", "doc_id"), "left_outer")
      .withColumn("__rel", coalesce(col("__rel"), lit(0L)))
      .join(broadcast(dTab), Seq("__pos"))
      .groupBy("query_id")
      .agg(sum(col("__rel") * col("__disc")).as("dcg_num"))
    val ideal = r.filter(col("__rel") > 0)
      .withColumn("__pos", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("__rel").desc, col("doc_id"))).cast("long"))
      .filter(col("__pos") <= k)
      .join(broadcast(dTab), Seq("__pos"))
      .groupBy("query_id")
      .agg(sum(col("__rel") * col("__disc")).as("idcg_num"))
    r.select(col("query_id")).distinct()
      .join(dcg, Seq("query_id"), "left_outer")
      .join(ideal, Seq("query_id"), "left_outer")
      .select(col("query_id"),
        coalesce(col("dcg_num"), lit(0L)).as("dcg_num"),
        coalesce(col("idcg_num"), lit(0L)).as("idcg_num"))
  }
}
