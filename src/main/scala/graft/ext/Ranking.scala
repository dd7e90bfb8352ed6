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
    val base = df.select(idCol.as("doc_id"), TextStats.toks(textCol).as("__toks"))
      .withColumn("dl", size(col("__toks")).cast("long"))
      .select(Seq(col("doc_id"), col("dl")) ++ terms.zipWithIndex.map { case (t, i) =>
        size(filter(col("__toks"), x => x === lit(t))).cast("long").as(s"tf_$i")
      }: _*)
    val stats = base.agg(
      count(lit(1)).as("n"),
      (Seq(sum(col("dl")).as("sumdl")) ++ terms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))): _*)
    // avgdl and each per-term score are built as ONE expression tree, mirrored
    // token-for-token by the SQL oracle — identical op order ⇒ identical bits.
    val avgdl = col("sumdl").cast("double") / col("n")
    def termScore(i: Int): Column =
      (col("n").cast("double") / col(s"df_$i")) *
        (col(s"tf_$i") * lit(k1 + 1.0)) /
        (col(s"tf_$i") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl)))
    val score = terms.indices.map(termScore).reduce(_ + _)
    val anyHit = terms.indices.map(i => col(s"tf_$i") > 0).reduce(_ || _)
    val outCols = Seq(col("doc_id"), col("dl")) ++ terms.indices.map(i => col(s"tf_$i"))
    val top = base.crossJoin(broadcast(stats))
      .filter(anyHit)
      .select(outCols :+ score.as("__score"): _*)
      .orderBy(col("__score").desc, col("doc_id"))
      .limit(topK)
    top.withColumn("rk", row_number().over(
        Window.orderBy(col("__score").desc, col("doc_id"))))
      .select(col("rk") +: outCols: _*)
  }
}
