package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language-ID heuristic, quality scoring, token counting, document
  * fingerprinting. All pure column expressions (codegen'd, shuffle-free per
  * row) — at 100 TB these run embedded in the scan stage.
  */
object TextStats {

  /** Single-space tokenizer matching DuckDB `string_split(lower(x), ' ')`. */
  def toks(text: Column): Column = split(lower(text), " ")

  private val Stopwords = Seq("the", "a", "of", "to", "and")

  /** Quality metrics: length, token count, stopword ratio, alpha-char ratio
    * and a composite score. Ratios are int/int double divisions (bit-exact
    * across engines). */
  def quality(df: DataFrame, text: Column): DataFrame = {
    val t = toks(text)
    val nToks = size(t)
    val nStop = size(filter(t, w => w.isInCollection(Stopwords)))
    val nChars = length(text)
    val nAlpha = length(regexp_replace(text, "[^a-z]", ""))
    df.withColumn("n_chars_calc", nChars.cast("long"))
      .withColumn("n_toks", nToks.cast("long"))
      .withColumn("stop_ratio", nStop.cast("double") / nToks.cast("double"))
      .withColumn("alpha_ratio", nAlpha.cast("double") / nChars.cast("double"))
      .withColumn("quality_score",
        lit(0.5) * (nStop.cast("double") / nToks.cast("double")) +
          lit(0.5) * (nAlpha.cast("double") / nChars.cast("double")))
  }

  /** Language-ID n-gram/marker heuristic (deterministic, intentionally
    * simple — the synthetic corpus shares one vocabulary, so this documents
    * the operator shape rather than real discrimination power). */
  def langId(df: DataFrame, text: Column): DataFrame = {
    val t = toks(text)
    val en = size(filter(t, w => w.isInCollection(Seq("the", "a", "of"))))
    df.withColumn("en_hits", en.cast("long"))
      .withColumn("lang_pred", when(en > 0, "en").otherwise("unk"))
  }

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs | digit runs | single punctuation). */
  def tokenCounts(df: DataFrame, text: Column): DataFrame =
    df.withColumn("ws_toks", size(split(text, " ")).cast("long"))
      .withColumn("re_toks",
        size(expr("regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 ]', 0)")).cast("long"))

  /** Document fingerprint: md5 of whitespace-normalized lowercase text.
    * (A content-defined rolling hash is the richer variant; md5-of-normalized
    * is the engine-portable batch form.) */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))
}
