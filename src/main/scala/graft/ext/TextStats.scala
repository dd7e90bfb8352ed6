package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  /** The composite quality score as a single column expression — shared by
    * [[quality]] and the `graft_quality` SQL function so the DataFrame and
    * SQL surfaces can never drift apart. */
  def qualityScore(text: Column): Column = {
    val t = toks(text)
    val nToks = size(t)
    val nStop = size(filter(t, w => w.isInCollection(Stopwords)))
    lit(0.5) * (nStop.cast("double") / nToks.cast("double")) +
      lit(0.5) * (length(regexp_replace(text, "[^a-z]", "")).cast("double") /
        length(text).cast("double"))
  }

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
      .withColumn("quality_score", qualityScore(text))
  }

  /** Corpus-level token-frequency statistics per document — the
    * document-frequency half of a KenLM-style quality signal, kept in EXACT
    * integer arithmetic (no float log-probs, so the result is bit-identical
    * on every engine): for each doc, its token count, distinct-token count,
    * how many of its distinct tokens are corpus-RARE (document frequency ≤
    * `rareDf` — a high rare ratio flags gibberish/OCR noise, the
    * Gopher-style signal), and the sum of its distinct tokens' document
    * frequencies (high mean df = boilerplate vocabulary).
    *
    * Two shuffles, both linear: token document-frequency aggregates on the
    * token (map-side combine), then the per-doc rollup re-joins on the same
    * token key (exchange reuse) and aggregates on doc_id. No pairwise work —
    * the same shape as [[Dedup.crossDocDupStats]]. */
  def corpusTokenStats(df: DataFrame, idCol: Column, textCol: Column,
      rareDf: Int = 2): DataFrame = {
    val base = Dedup.spread(df.select(idCol.as("doc_id"), toks(textCol).as("__toks")))
    val nt = base.select(col("doc_id"), size(col("__toks")).cast("long").as("n_toks"))
    val td = base.select(col("doc_id"), explode(array_distinct(col("__toks"))).as("t"))
    val dfq = td.groupBy("t").agg(count(lit(1)).as("df"))
    val per = td.join(dfq, "t").groupBy("doc_id").agg(
      count(lit(1)).as("n_distinct_toks"),
      sum(when(col("df") <= rareDf, 1L).otherwise(0L)).as("rare_tok_ct"),
      sum(col("df")).as("tok_df_sum"))
    nt.join(per, Seq("doc_id"))
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
        size(regexp_extract_all(lower(text),
          lit("[a-z0-9]+|[^a-z0-9 ]"), lit(0))).cast("long"))

  /** Repetition signal (the Gopher-rules duplicate-n-gram fraction, Rae et
    * al. 2021 §A1.1): per document, the share of word n-grams that are
    * repeats — `1 − distinct/total`. High values flag boilerplate/spam for
    * quality filtering. Documents with fewer than `n` tokens are excluded
    * (no n-grams to judge). Pure per-row column work: no shuffle, no
    * cross-document state — embeds in the scan stage at any scale. */
  def repetition(df: DataFrame, idCol: Column, textCol: Column, n: Int = 2): DataFrame = {
    val t = col("__toks")
    val grams = transform(sequence(lit(1), size(t) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(o => element_at(t, i + o)): _*))
    df.select(idCol.as("doc_id"), toks(textCol).as("__toks"))
      .filter(size(t) >= n)
      .select(col("doc_id"), grams.as("__g"))
      .select(col("doc_id"),
        size(col("__g")).cast("long").as("total_ngrams"),
        size(array_distinct(col("__g"))).cast("long").as("distinct_ngrams"))
      .withColumn("dup_ratio",
        (col("total_ngrams") - col("distinct_ngrams")).cast("double") /
          col("total_ngrams").cast("double"))
  }

  /** Gopher-style document-filter verdict (Rae et al. 2021 §A1.1): the
    * rule-based quality gate a pretraining pipeline runs before any
    * model-based scoring. Each rule is kept in EXACT integer arithmetic —
    * mean-word-length bounds become cross-multiplications
    * (`lo·n ≤ Σlen ≤ hi·n`), the alpha-token fraction becomes
    * `5·alpha_ct ≥ 4·n` — so the verdict is bit-identical on every engine.
    * Pure per-row column work (array folds inside codegen): no shuffle, the
    * gate embeds in the scan stage at any corpus size.
    *
    * Rules (documents table is a clean word soup, so symbol/ellipsis rules
    * collapse to the alpha check): token count in [minToks, maxToks]; mean
    * word length in [3, 10]; ≥ 2 stopword hits; ≥ 80 % alphabetic tokens.
    *
    * @return (doc_id, n_toks, sum_tok_len, stop_ct, alpha_ct, pass) */
  def gopherFilter(df: DataFrame, idCol: Column, textCol: Column,
      minToks: Int = 50, maxToks: Int = 100000): DataFrame = {
    val t = toks(textCol)
    val nToks = size(t).cast("long")
    val sumLen = aggregate(t, lit(0L), (acc, w) => acc + length(w)).cast("long")
    val stopCt = size(filter(t, w => w.isInCollection(Stopwords))).cast("long")
    val alphaCt = size(filter(t, w => w.rlike("^[a-z]+$"))).cast("long")
    df.select(idCol.as("doc_id"), nToks.as("n_toks"), sumLen.as("sum_tok_len"),
        stopCt.as("stop_ct"), alphaCt.as("alpha_ct"))
      .withColumn("pass",
        col("n_toks").between(minToks, maxToks) &&
          lit(3) * col("n_toks") <= col("sum_tok_len") &&
          col("sum_tok_len") <= lit(10) * col("n_toks") &&
          col("stop_ct") >= 2 &&
          lit(5) * col("alpha_ct") >= lit(4) * col("n_toks"))
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase text.
    * (See [[winnow]] for the rolling-hash variant.) */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** Sliding-window token chunking — context-window preparation for training
    * examples / RAG ingestion: each document yields chunks of up to `size`
    * tokens starting every `stride` tokens (overlap = size − stride), the
    * final chunk keeping whatever tail remains. Pure per-row explode
    * arithmetic (`slice` over the token array inside codegen): no shuffle,
    * no cross-document state — embeds in the scan stage at any corpus size.
    *
    * @return (doc_id, chunk_idx, n_chunk_toks, chunk) */
  def chunk(df: DataFrame, idCol: Column, textCol: Column,
      size: Int, stride: Int): DataFrame = {
    require(size >= 1, s"size must be >= 1, got $size")
    require(stride >= 1 && stride <= size,
      s"stride must be in [1, size], got $stride")
    val t = col("__toks")
    val n = org.apache.spark.sql.functions.size(t)
    // starts 1, 1+stride, ... capped at n − (size − stride): a tail start
    // beyond that cap would yield a chunk fully contained in the previous
    // window (pure duplicate data for training/RAG prep), so it is
    // suppressed; the cap floor of 1 keeps short docs emitting their single
    // chunk
    val starts = sequence(lit(1), greatest(lit(1), n - lit(size - stride)), lit(stride))
    df.select(idCol.as("doc_id"), toks(textCol).as("__toks"))
      .filter(n >= 1)
      .select(col("doc_id"), t, explode(starts).as("s"))
      .select(col("doc_id"),
        ((col("s") - 1) / stride).cast("long").as("chunk_idx"),
        least(lit(size), n - col("s") + 1).cast("long").as("n_chunk_toks"),
        concat_ws(" ", slice(t, col("s"), lit(size))).as("chunk"))
  }

  /** PII redaction: replace e-mail addresses, IPv4 addresses, and phone-like
    * digit runs with typed sentinels. Pure regexp_replace chain (codegen'd,
    * embeds in the scan stage — the shape every at-scale scrubber needs); the
    * patterns deliberately stick to syntax shared by Java regex and RE2 so an
    * engine-portable oracle can replay them. Order matters: e-mails first
    * (their local parts may contain digits), then IPs (dots exclude them from
    * the phone pattern, but not vice versa), then phones. */
  def scrubPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]")
    val ip = regexp_replace(email,
      "([0-9]{1,3}\\.){3}[0-9]{1,3}", "[IP]")
    regexp_replace(ip, "\\+?[0-9][0-9() -]{6,}[0-9]", "[PHONE]")
  }

  /** URL canonicalization for crawl-scale dedup (the CC-Net / CCNet-style
    * URL-level screen that runs BEFORE content dedup in web-corpus
    * pipelines): two surface forms of the same page must map to one key so
    * the cheap exact-dedup pass can collapse re-crawls without touching
    * the text. Normalizations, in order:
    *
    *   - scheme and host lowercased (RFC 3986 §6.2.2.1 — only these parts
    *     are case-insensitive; path and query case is preserved),
    *   - leading `www.` dropped, scheme-default ports (`:80` http,
    *     `:443` https) dropped,
    *   - fragment dropped (never sent to the server),
    *   - duplicate path slashes collapsed, trailing slashes stripped
    *     (`/p/` ≡ `/p`; the root path renders as bare authority),
    *   - tracking query params removed (`utm_*`, `fbclid`, `gclid`,
    *     `ref`), the surviving params SORTED (param order is
    *     server-insignificant for the overwhelming majority of pages —
    *     the standard aggressive-canonicalizer trade-off, documented).
    *
    * Deliberately NOT done: percent-decoding and `/../` resolution (both
    * can change semantics on exotic servers; a canonicalizer that only
    * deletes provable noise never merges two genuinely different pages
    * beyond the documented param-order assumption).
    *
    * Pure regexp/column chain (codegen'd except the final `sort_array`,
    * which is eval'd per-row on a tiny params array), patterns restricted
    * to Java-regex/RE2 shared syntax so a DuckDB oracle can replay them.
    * Inputs without a `scheme://` prefix pass through trimmed (relative
    * refs have no authority to normalize). */
  /** Scheme (lowercased) of a trimmed absolute URL; "" when not absolute. */
  private def urlScheme(u: Column): Column =
    lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Canonical authority of a trimmed URL given its scheme — ONE
    * definition of the lowercase / `www.`-strip / default-port rules so
    * [[canonicalizeUrl]]'s groups and [[urlHost]]'s domains can never
    * disagree. */
  private def urlAuthority(u: Column, scheme: Column): Column = {
    val host0 = regexp_replace(
      lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)),
      "^www\\.", "")
    when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
  }

  def canonicalizeUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = urlScheme(u)
    val host = urlAuthority(u, scheme)
    // tail = path + query; the fragment is excluded by the [^#]* capture
    val tail = regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val path = regexp_replace(
      regexp_replace(regexp_extract(tail, "^([^?]*)", 1), "/{2,}", "/"),
      "/+$", "")
    // strip tracking params (each match eats its leading '&' when it has
    // one), then repair separator runs the removals left behind
    val q = regexp_replace(regexp_replace(regexp_replace(
      regexp_extract(tail, "^[^?]*\\?(.*)$", 1),
      "(?:^|&)(?:utm_[A-Za-z0-9_]*|fbclid|gclid|ref)=[^&]*", ""),
      "&{2,}", "&"), "^&+|&+$", "")
    val query = array_join(sort_array(split(q, "&")), "&")
    when(scheme === "", u).otherwise(concat(
      scheme, lit("://"), host, path,
      when(length(query) > 0, concat(lit("?"), query)).otherwise(lit(""))))
  }

  /** The canonical host of a URL — [[canonicalizeUrl]]'s authority rules
    * (lowercase, `www.`-less, default-port-less) as a standalone column,
    * for per-domain corpus statistics and domain-level quality screens.
    * Non-absolute inputs yield the empty string. */
  def urlHost(url: Column): Column = {
    val u = trim(url)
    urlAuthority(u, urlScheme(u))
  }

  /** Rolling-hash document fingerprints by winnowing (Schleimer, Wilkerson,
    * Aiken, "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD 2003): hash every character k-gram, slide a w-wide window over
    * the hash sequence, keep each window's minimum, emit the distinct
    * survivors. Guarantee: two documents sharing any substring of at least
    * w+k−1 characters share at least one fingerprint — the partial-overlap
    * detector exact/MinHash dedup doesn't provide.
    *
    * Engine-portable hashing (md5-prefix → int, the SimHash trick), and
    * scale-shaped: one explode, one keyed window on doc_id (a doc's grams
    * stay in one partition), one distinct — no cross-document work at all;
    * matching docs later is an equi-join on `fp`.
    *
    * @return (doc_id, fp) — distinct selected fingerprints per document;
    *         documents shorter than k+w−1 chars yield no rows. */
  def winnow(df: DataFrame, idCol: Column, textCol: Column,
      k: Int = 8, w: Int = 4): DataFrame = {
    // Explode gram POSITIONS first, then hash each gram with plain column
    // expressions: a `transform` lambda computing the hash per array element
    // would run interpreted (HOFs are CodegenFallback) — measured 2× the
    // whole operator's cost. This way substring/md5/conv stay inside
    // whole-stage codegen, and the duplicated text column never crosses a
    // stage boundary (it is consumed by the same codegen stage the explode
    // runs in).
    val hashed = Dedup.spread(df.select(idCol.as("doc_id"), textCol.as("__txt")))
      // spread gated on input width (see Dedup.spread): the testdata parquet
      // is a single row group; a wide input skips the exchange
      .filter(length(col("__txt")) >= k + w - 1) // also guards sequence(1, n<1)
      .select(col("doc_id"), col("__txt"),
        (length(col("__txt")) - (k - 1)).cast("long").as("__n"))
      .select(col("doc_id"), col("__txt"), col("__n"),
        posexplode(sequence(lit(1L), col("__n"))).as(Seq("pos", "i")))
      .select(col("doc_id"), col("__n"), col("pos"),
        conv(substring(md5(col("__txt").substr(col("i"), lit(k))), 1, 8), 16, 10)
          .cast("long").as("h"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    hashed.withColumn("fp", min(col("h")).over(win))
      .filter(col("pos") <= col("__n") - w) // only full windows select
      .select(col("doc_id"), col("fp")).distinct()
  }

  /** Hashed-feature linear classifier scoring — the fastText-style
    * model-based quality filter (a trained linear model over hashed token
    * features, the filter CCNet/Llama-era pipelines run after the rule
    * gates). The MODEL is data: a `(bucket LONG, w LONG)` weight table with
    * fixed-point integer weights (scale chosen by the trainer, e.g. 1e6 ×
    * float weight), so scoring is exact integer arithmetic — bit-identical
    * across engines, partitionings and summation orders, unlike float dot
    * products. Swap in real trained weights without touching the plumbing.
    *
    * score(doc) = Σ_tok w[md5_bucket(tok) mod buckets]  (absent bucket = 0)
    * keep ⇔ score ≥ bias (the decision threshold, same fixed-point scale).
    * CONTRACT: `weights` must carry at most one row per bucket — a
    * duplicated bucket would fan the token join out and silently
    * double-count (trainers emit dense unique tables; not re-aggregated
    * here so the scoring plan stays a pure broadcast join).
    *
    * Shape at scale: the weight table is ≤ `buckets` rows and BROADCAST;
    * tokens explode corpus-linearly and the per-doc rollup is the one
    * exchange (map-side partial sums on doc_id). The corpus never shuffles
    * on the model join.
    *
    * @return (doc_id, n_toks, score, keep) one row per input doc */
  def hashedLinearScore(df: DataFrame, idCol: Column, textCol: Column,
      weights: DataFrame, buckets: Int, bias: Long = 0L): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val toksB = df
      .select(idCol.as("doc_id"), explode(toks(textCol)).as("tok"))
      .select(col("doc_id"),
        (conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long") % buckets)
          .as("bucket"))
    toksB
      .join(broadcast(weights.select(col("bucket"), col("w"))),
        Seq("bucket"), "left_outer")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_toks"),
        sum(coalesce(col("w"), lit(0L))).as("score"))
      .withColumn("keep", col("score") >= bias)
  }

  /** Hashed bigram-LM surprise screen — the CCNet-style language-model
    * quality filter (score every document against an n-gram LM trained on a
    * trusted target corpus; drop what the LM finds implausible), made exact
    * and model-bounded the same way [[Curation.dsirScreen]] treats its
    * unigram importance model:
    *
    *  - the LM is HASHED: bigrams and their left contexts reduce to
    *    `buckets` md5 buckets, so the model is `buckets`-bounded no matter
    *    how the vocabulary grows — it stays broadcastable at any corpus
    *    scale (the same argument as DSIR's 31→285-of-4096 fill measurement);
    *  - the score is the fixed-point ARITHMETIC-mean inverse probability:
    *    per bigram, add-one surprise `(c1+buckets)·scale div (c2+1)` — an
    *    exact integer — summed per doc. True perplexity is the GEOMETRIC
    *    mean of `1/p` and needs `ln`/`exp` (not cross-engine exact, see
    *    [[Ranking]]'s numeric posture); by AM ≥ GM the arithmetic mean is a
    *    conservative upper bound that preserves the screen's intent —
    *    high-surprise (OOV-heavy, out-of-domain) documents score high — and
    *    is bit-identical on every engine and summation order.
    *
    * keep ⇔ surprise ≤ n_bigrams · scale · (num/den), i.e. the mean
    * per-bigram inverse probability stays under the `num/den` dial, decided
    * in DECIMAL(38,0) cross-multiplication (no division, no rounding).
    * Documents with fewer than two tokens carry the degenerate verdict
    * (n_bi = 0, surprise = 0, keep = true) — one row per raw doc, as
    * [[Curation.dsirScreen]]'s spine contract.
    *
    * Integer bounds: a per-bigram term is ≤ (c1+buckets)·scale; with the
    * default scale 1e6 the BIGINT term holds context-bucket counts to ~9e12
    * tokens, and the per-doc SUM accumulates in DECIMAL(38,0).
    *
    * Shape at scale: one pass over the target builds the two bucket-count
    * models (map-side combined, ≤ `buckets` rows each, BROADCAST); the raw
    * corpus explodes to bigram rows, probes both models by broadcast join —
    * never shuffling on the model — and rolls up per doc in the one
    * exchange. The doc-spine re-anchor is a doc-keyed left join.
    *
    * @return (doc_id, n_bi, oov_ct, surprise DECIMAL(38,0), keep) */
  def hashedLmSurprise(raw: DataFrame, target: DataFrame, idCol: Column,
      textCol: Column, buckets: Int = 4096, scale: Long = 1000000L,
      num: Long = 2048L, den: Long = 1L): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(scale >= 1L, s"scale must be >= 1, got $scale")
    require(num >= 1L && den >= 1L, s"threshold must be positive, got $num/$den")
    def bucketOf(c: Column): Column =
      conv(substring(md5(c), 1, 8), 16, 10).cast("long") % buckets
    def bigrams(df: DataFrame): DataFrame = df
      .select(idCol.as("doc_id"), toks(textCol).as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(__t) - 2), " +
          "i -> struct(__t[i] AS u, concat(__t[i], ' ', __t[i+1]) AS bg))")).as("p"))
      .select(col("doc_id"), bucketOf(col("p.u")).as("b1"),
        bucketOf(col("p.bg")).as("b2"))
    // ONE pass over the target builds BOTH bucket-count models: each bigram
    // row explodes into its two (kind, bucket) keys, one map-side-combined
    // aggregate counts them, and the two models are filtered views of the
    // ≤ 2·buckets-row result (checkpointed — tiny; without this the
    // unmaterialized bigram plan would re-tokenize the target once per
    // model, doubling the dominant build cost the scaladoc prices)
    val counts = bigrams(target)
      .select(explode(array(
        struct(lit("c").as("k"), col("b1").as("b")),
        struct(lit("g").as("k"), col("b2").as("b")))).as("e"))
      .groupBy(col("e.k").as("k"), col("e.b").as("b"))
      .agg(count(lit(1)).as("ct"))
      .localCheckpoint(true)
    val ctx = counts.filter(col("k") === "c")
      .select(col("b").as("b1"), col("ct").as("c1"))
    val big = counts.filter(col("k") === "g")
      .select(col("b").as("b2"), col("ct").as("c2"))
    val scored = bigrams(raw)
      .join(broadcast(big), Seq("b2"), "left_outer")
      .join(broadcast(ctx), Seq("b1"), "left_outer")
      .select(col("doc_id"), col("c2").isNull.as("__oov"),
        ((coalesce(col("c1"), lit(0L)) + buckets) * scale).as("__sn"),
        (coalesce(col("c2"), lit(0L)) + 1).as("__sd"))
      .withColumn("__term", expr("__sn div __sd"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_bi"),
        sum(when(col("__oov"), 1L).otherwise(0L)).as("oov_ct"),
        sum(col("__term").cast("decimal(38,0)")).cast("decimal(38,0)").as("surprise"))
    raw.select(idCol.as("doc_id")).join(scored, Seq("doc_id"), "left_outer")
      .withColumn("n_bi", coalesce(col("n_bi"), lit(0L)))
      .withColumn("oov_ct", coalesce(col("oov_ct"), lit(0L)))
      .withColumn("surprise",
        coalesce(col("surprise"), lit(0L).cast("decimal(38,0)")))
      .withColumn("keep",
        col("surprise") * den <=
          col("n_bi").cast("decimal(38,0)") * scale * num)
  }

  /** Content-defined chunking (the Rabin/CDC rule storage dedup is built
    * on, applied token-level): a chunk boundary falls AFTER token `i`
    * whenever the rolling `window`-gram hash ending at `i` satisfies
    * `h % divisor == 0` — so boundaries are a function of CONTENT, not
    * position, and an insertion early in a document perturbs only the
    * chunks it touches: every later chunk re-synchronizes to the identical
    * (fingerprint, content) pair. That re-sync is what makes sub-document
    * dedup robust to edits, where fixed-stride chunking ([[chunk]]) shifts
    * every downstream boundary. Expected chunk length ≈ `divisor` tokens.
    *
    * Deterministic: the rolling hash is the md5-slice idiom over the
    * space-joined gram, the chunk fingerprint is the md5 slice of the
    * space-rejoined chunk (order pinned via sort_array over (pos, tok) —
    * collect_list alone is partition-order-unstable), both reproduced
    * token-for-token by the SQL twin.
    *
    * Shape at scale: one per-doc window pass (the lag gram + running cut
    * count share a single doc-keyed sort) and one (doc, chunk) rollup —
    * two corpus-linear exchanges, no joins. Docs with no tokens (null
    * text) have no chunks by definition.
    *
    * @return (doc_id, chunk_id, n_toks, fp) — chunk_id 0-based per doc */
  def cdcChunks(df: DataFrame, idCol: Column, textCol: Column,
      window: Int = 3, divisor: Int = 16): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(divisor >= 1, s"divisor must be >= 1, got $divisor")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val tok = df
      .select(idCol.as("doc_id"), posexplode(toks(textCol)).as(Seq("pos", "tok")))
      .withColumn("pos", col("pos") + 1) // 1-based, as the SQL twin
    val gram = concat_ws(" ",
      ((window - 1) to 0 by -1).map(k => lag(col("tok"), k).over(w)): _*)
    val cut = col("pos") >= window &&
      conv(substring(md5(gram), 1, 8), 16, 10).cast("long") % divisor === 0
    tok
      .withColumn("chunk_id", coalesce(
        sum(when(cut, 1L).otherwise(0L)).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .groupBy("doc_id", "chunk_id")
      .agg(count(lit(1)).as("n_toks"),
        sort_array(collect_list(struct(col("pos"), col("tok")))).as("__pt"))
      .withColumn("fp", conv(substring(md5(
        concat_ws(" ", expr("transform(__pt, x -> x.tok)"))), 1, 8), 16, 10)
        .cast("long"))
      .select(col("doc_id"), col("chunk_id"), col("n_toks"), col("fp"))
  }

  /** Batch form of chunk-level storage dedup over [[cdcChunks]]: the full
    * chunk layout with `is_first = 1` on the canonical first
    * (doc_id, chunk_id) occurrence of each fingerprint — the rows whose
    * content a content-addressed store would physically hold; every other
    * row is a reference. The cross-batch form (same semantics against a
    * persistent fingerprint store) is
    * [[graft.streaming.IncrementalChunkDedup]].
    *
    * One extra fp-keyed rank window on the chunk table — chunk-linear, no
    * joins. @return (doc_id, chunk_id, n_toks, fp, is_first) */
  def cdcChunkDedup(df: DataFrame, idCol: Column, textCol: Column,
      window: Int = 3, divisor: Int = 16): DataFrame =
    cdcChunks(df, idCol, textCol, window, divisor)
      .withColumn("is_first",
        (row_number().over(Window.partitionBy(col("fp"))
          .orderBy(col("doc_id"), col("chunk_id"))) === 1).cast("int"))

  /** Greedy longest-match subword tokenization counts — real
    * vocabulary-driven token accounting (the WordPiece/SentencePiece
    * maximal-munch rule: at each position consume the LONGEST vocabulary
    * piece that matches; no match consumes one character as UNK; words
    * longer than `maxWordLen` chars collapse to a single UNK, the standard
    * WordPiece max_input_chars guard). Continuation markers ("##") are
    * deliberately dropped: the vocabulary is position-independent, which is
    * the SentencePiece-unigram surface — documented deviation, not a gap.
    *
    * Execution is a ROW-LOCAL integer fold, no driver loop and no
    * per-position join: `aggregate(sequence(1, len), 0L, step)` carries the
    * cursor packed as `pos·10⁶ + pieces·10³ + unk` (all three bounded by
    * `maxWordLen` ≤ 999), and each step either skips (the cursor has
    * already passed this index) or advances by the longest literal-vocab
    * match — an expression tree whose SQL twin is a RECURSIVE-CTE fold over
    * the same packed cursor (NOT `list_reduce`: DuckDB's `list_reduce` with
    * outer-column capture proved nondeterministic — see the round-7 ledger
    * in SURVEY.md and `queries/ExtQueries.scala`'s `WITH RECURSIVE` twin),
    * so the counts are bit-identical by construction.
    *
    * Shape at scale: tokenization runs on the DISTINCT-WORD table, not the
    * corpus — Heaps' law bounds distinct words ~√(corpus), so the expensive
    * fold touches a vanishing fraction of rows at 100 TB while the corpus
    * pays only an explode, a (doc, word) count, the word-keyed join back,
    * and the doc rollup. The vocabulary rides the expression as literals
    * (codegen'd comparisons — nothing to broadcast or join).
    *
    * @param vocab  lowercase pieces, each 1..maxPieceLen chars
    * @return (doc_id, n_words, n_pieces, n_unk) one row per input doc */
  def wordpieceCounts(df: DataFrame, idCol: Column, textCol: Column,
      vocab: Seq[String], maxPieceLen: Int = 3, maxWordLen: Int = 64): DataFrame = {
    require(vocab.nonEmpty, "vocab must not be empty")
    require(maxPieceLen >= 1 && maxPieceLen <= 99,
      s"maxPieceLen must be in [1,99], got $maxPieceLen")
    require(maxWordLen >= 1 && maxWordLen <= 999,
      s"packed cursor holds word lengths to 999, got $maxWordLen")
    require(vocab.forall(p => p.nonEmpty && p.length <= maxPieceLen),
      s"every piece must be 1..$maxPieceLen chars")
    // Spark's SQL lexer does NOT support ''-doubling inside a string
    // literal ('it''s' lexes as two adjacent literals that concatenate to
    // "its") — escape with backslash, which Spark does support; the DuckDB
    // oracle twin builds its own ''-escaped list separately
    val inList = vocab
      .map(p => "'" + p.replace("\\", "\\\\").replace("'", "\\'") + "'")
      .mkString(", ")
    val pos = "(acc div 1000000)"
    val whens = (maxPieceLen to 1 by -1).map { l =>
      s"WHEN substring(w, CAST($pos AS INT) + 1, $l) IN ($inList) " +
        s"THEN ($pos + $l) * 1000000 + acc % 1000000 + 1000"
    }.mkString(" ")
    val fold = s"aggregate(sequence(1, length(w)), CAST(0 AS BIGINT), " +
      s"(acc, i) -> CASE WHEN $pos + 1 <> i THEN acc ELSE " +
      s"CASE $whens ELSE ($pos + 1) * 1000000 + acc % 1000000 + 1 END END)"
    val packed = s"CASE WHEN w IS NULL OR length(w) = 0 THEN CAST(0 AS BIGINT) " +
      s"WHEN length(w) > $maxWordLen THEN CAST(1 AS BIGINT) ELSE $fold END"
    val wordCt = df
      .select(idCol.as("doc_id"), explode(toks(textCol)).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("ct"))
    val pieced = wordCt.select("w").distinct()
      .withColumn("__pk", expr(packed))
      .select(col("w"), expr("(__pk div 1000) % 1000").as("__pieces"),
        expr("__pk % 1000").as("__unk"))
    val scored = wordCt.join(pieced, Seq("w"))
      .groupBy("doc_id").agg(
        sum(col("ct")).as("n_words"),
        sum(col("ct") * col("__pieces")).as("n_pieces"),
        sum(col("ct") * col("__unk")).as("n_unk"))
    df.select(idCol.as("doc_id")).join(scored, Seq("doc_id"), "left_outer")
      .withColumn("n_words", coalesce(col("n_words"), lit(0L)))
      .withColumn("n_pieces", coalesce(col("n_pieces"), lit(0L)))
      .withColumn("n_unk", coalesce(col("n_unk"), lit(0L)))
  }

  /** BPE merge TRAINING (Sennrich et al. ACL'16) — learns a subword
    * vocabulary from the corpus, the piece [[wordpieceCounts]] assumes as
    * given. Deterministic byte^H^Hchar-level BPE: words start as character
    * sequences; each round counts adjacent symbol pairs over ALL positions
    * (overlaps included — "aaa" holds (a,a) twice, the reference zip
    * semantics), weighted by corpus word frequency, merges the most
    * frequent pair — ties broken by (lhs, rhs) ascending, a total order,
    * so training is a pure function of the corpus — greedily LEFT-TO-RIGHT
    * non-overlapping in every word, and repeats.
    *
    * Shape at scale: training state lives on the DISTINCT-WORD table with
    * multiplicities (Heaps-law bounded — the corpus pays one tokenize +
    * word count, every round thereafter touches only distinct words). Per
    * round: one pair explode + map-side-combined count, a driver-side
    * top-1 (a SCALAR per round, the k-means/MMR discipline — never a
    * corpus collect), and a row-local `aggregate` fold that rewrites each
    * word's symbol array greedily (the fold IS left-to-right non-overlap:
    * a merged symbol `lhs||rhs` can never equal `lhs`, so a fresh merge
    * never chains into the next position). State is localCheckpointed per
    * round with superseded generations freed — the [[graft.ops.Graph]]
    * iteration discipline.
    *
    * Stops early if the corpus runs out of pairs (all words single-symbol);
    * callers wanting exactly `merges` rows must provide a corpus rich
    * enough, which any real corpus is.
    *
    * @return one row per learned merge, in training order:
    *   (merge_ix, lhs, rhs, merged, pair_ct) */
  def bpeTrain(df: DataFrame, textCol: Column, merges: Int,
      maxWordLen: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (learned, state) = bpeTrainCore(df, textCol, merges, maxWordLen)
    graft.util.Blocks.freeCheckpoint(state)
    learned.toDF("merge_ix", "lhs", "rhs", "merged", "pair_ct")
  }

  /** The learned SUBWORD VOCABULARY after `merges` training rounds: every
    * surviving symbol (single characters + merged pieces) with its
    * corpus-weighted occurrence count — what the final symbol table of
    * [[bpeTrain]] holds, rolled up. The piece the trainer just created can
    * itself be consumed by a later merge, so `n_occ` counts SURVIVING
    * occurrences, not historical merge counts (the distinction a vocab
    * pruning pass needs). Same distinct-word execution shape as training;
    * the SQL twin ([[bpeVocabSql]]) reuses the training chain's final
    * symbol table.
    * @return (piece, n_occ) */
  def bpeVocab(df: DataFrame, textCol: Column, merges: Int,
      maxWordLen: Int = 64): DataFrame = {
    val (_, state) = bpeTrainCore(df, textCol, merges, maxWordLen)
    val out = state
      .select(explode(col("syms")).as("piece"), col("ct"))
      .groupBy("piece").agg(sum(col("ct")).as("n_occ"))
      .localCheckpoint(true)
    graft.util.Blocks.freeCheckpoint(state)
    out
  }

  /** Shared trainer loop: returns the learned merges AND the final
    * (ct, syms) distinct-word state (checkpointed — the CALLER frees). */
  private def bpeTrainCore(df: DataFrame, textCol: Column, merges: Int,
      maxWordLen: Int): (Seq[(Int, String, String, String, Long)], DataFrame) = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    val wc = df.select(explode(toks(textCol)).as("w"))
      .filter(length(col("w")) > 0 && length(col("w")) <= maxWordLen)
      .groupBy("w").agg(count(lit(1)).as("ct"))
    var state = wc
      .select(col("ct"),
        filter(split(col("w"), ""), s => length(s) > 0).as("syms"))
      .localCheckpoint(true)
    val learned = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var ix = 1
    var dry = false
    while (ix <= merges && !dry) {
      val top = state.filter(size(col("syms")) >= 2)
        .select(col("ct"), explode(transform(
          sequence(lit(1), size(col("syms")) - 1),
          j => struct(element_at(col("syms"), j).as("l"),
            element_at(col("syms"), j + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("ct")).as("pc"))
        .orderBy(col("pc").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) dry = true
      else {
        val (l, r, pc) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        val merged = l + r
        learned += ((ix, l, r, merged, pc))
        val prev = state
        state = state.withColumn("syms",
            aggregate(col("syms"), array().cast("array<string>"),
              (acc, x) => when(size(acc) > 0 &&
                  element_at(acc, -1) === lit(l) && x === lit(r),
                concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
                .otherwise(concat(acc, array(x)))))
          .localCheckpoint(true)
        graft.util.Blocks.freeCheckpoint(prev)
        ix += 1
      }
    }
    (learned.toSeq, state)
  }

  /** The DuckDB twin of [[bpeVocab]]: the training chain's final symbol
    * table, rolled up by symbol. */
  def bpeVocabSql(docsCte: String, merges: Int, maxWordLen: Int = 64): String = {
    val chain = bpeTrainSql(docsCte, merges, maxWordLen)
    val body = chain.substring(0, chain.lastIndexOf("SELECT CAST(1 AS INT)")).trim
    s"""$body
       |SELECT sym AS piece, CAST(SUM(ct) AS BIGINT) AS n_occ
       |FROM w$merges GROUP BY 1 ORDER BY piece""".stripMargin
  }

  /** BPE APPLICATION — tokenize the corpus with a learned merge list (the
    * [[bpeTrain]] output), completing the train→apply tokenizer story:
    * each word starts as characters and replays the merges IN TRAINING
    * ORDER, greedy left-to-right per merge — the standard BPE inference
    * rule (merge-rank order, not longest-match; [[wordpieceCounts]] is the
    * maximal-munch alternative). Piece counting, like training, runs on
    * the DISTINCT-WORD table (Heaps-law bounded) and joins back to the
    * corpus by word — the corpus pays one tokenize + count + join + doc
    * rollup, the merge replay touches only distinct words as |merges|
    * chained row-local folds (expression-only — the merge pair rides as
    * literals, nothing to broadcast or join).
    *
    * @param merges (lhs, rhs) pairs in training order
    * @return (doc_id, n_words, n_pieces) — n_pieces = Σ per-word symbols
    *         after all merges, weighted by occurrence */
  def bpeApply(df: DataFrame, idCol: Column, textCol: Column,
      merges: Seq[(String, String)], maxWordLen: Int = 64): DataFrame = {
    val wc = df.select(idCol.as("doc_id"), explode(toks(textCol)).as("w"))
      .filter(length(col("w")) > 0 && length(col("w")) <= maxWordLen)
      .groupBy("doc_id", "w").agg(count(lit(1)).as("ct"))
    var pieced = wc.select("w").distinct()
      .withColumn("syms", filter(split(col("w"), ""), s => length(s) > 0))
    for ((l, r) <- merges)
      pieced = pieced.withColumn("syms",
        aggregate(col("syms"), array().cast("array<string>"),
          (acc, x) => when(size(acc) > 0 &&
              element_at(acc, -1) === lit(l) && x === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
            .otherwise(concat(acc, array(x)))))
    val perWord = pieced.select(col("w"), size(col("syms")).cast("long").as("__p"))
    val scored = wc.join(perWord, Seq("w"))
      .groupBy("doc_id").agg(sum(col("ct")).as("n_words"),
        sum(col("ct") * col("__p")).as("n_pieces"))
    df.select(idCol.as("doc_id")).join(scored, Seq("doc_id"), "left_outer")
      .withColumn("n_words", coalesce(col("n_words"), lit(0L)))
      .withColumn("n_pieces", coalesce(col("n_pieces"), lit(0L)))
  }

  /** The DuckDB twin of [[bpeApply]] fed by TRAINED merges: reuses the
    * [[bpeTrainSql]] CTE chain verbatim through its final symbol table
    * `w<merges>` — training and application can never drift — then counts
    * surviving symbols per word and rolls up per document. */
  def bpeApplySql(docsCte: String, merges: Int, maxWordLen: Int = 64): String = {
    require(docsCte.contains("doc_id"),
      "bpeApplySql's docsCte must expose d(doc_id, text) — the per-doc " +
        "rollup needs the id the training twin could ignore")
    val chain = bpeTrainSql(docsCte, merges, maxWordLen)
    // keep the WITH chain (ends at the last round CTE's close paren), swap
    // the final merge-list SELECT for the per-doc rollup
    val body = chain.substring(0, chain.lastIndexOf("SELECT CAST(1 AS INT)")).trim
    s"""$body,
       |pw AS MATERIALIZED (SELECT w, CAST(COUNT(*) AS BIGINT) AS p
       |      FROM w$merges GROUP BY 1),
       |dwc AS (SELECT doc_id, w, COUNT(*) AS ct FROM (
       |          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM d)
       |        WHERE length(w) > 0 AND length(w) <= $maxWordLen GROUP BY 1, 2),
       |sc AS (SELECT doc_id, CAST(SUM(ct) AS BIGINT) AS n_words,
       |         CAST(SUM(ct * p) AS BIGINT) AS n_pieces
       |       FROM dwc JOIN pw USING (w) GROUP BY 1)
       |SELECT dd.doc_id, COALESCE(sc.n_words, 0) AS n_words,
       |       COALESCE(sc.n_pieces, 0) AS n_pieces
       |FROM (SELECT doc_id FROM d) dd LEFT JOIN sc USING (doc_id)
       |ORDER BY dd.doc_id""".stripMargin
  }

  /** The DuckDB twin of [[bpeTrain]], rounds unrolled as chained CTEs and
    * generated from the same parameters so the two can never drift. State
    * is the POSITIONAL form (word, ct, pos, sym) — the array fold becomes
    * pure window algebra: pair counts via `lead`, and greedy left-to-right
    * non-overlap via alternating selection inside runs of consecutive
    * candidates (adjacent candidates exist ONLY when lhs = rhs — for
    * lhs ≠ rhs two adjacent candidate positions would need the shared
    * middle symbol to equal both — so taking the 1st, 3rd, … candidate of
    * each run IS the greedy schedule). All window functions and joins —
    * deterministic in DuckDB, per the `list_reduce` lesson. Every chained
    * CTE is MATERIALIZED: DuckDB inlines plain CTEs per reference, and the
    * multi-reference fan-out per round (w feeds p+c, c feeds t+w, t twice)
    * would otherwise re-evaluate the whole chain exponentially in rounds
    * (observed as "Too many open files" on the base parquet at 8 rounds). */
  def bpeTrainSql(docsCte: String, merges: Int, maxWordLen: Int = 64): String = {
    val rounds = (1 to merges).map { i =>
      s"""p$i AS MATERIALIZED (SELECT sym AS l, nxt AS r, CAST(SUM(ct) AS BIGINT) AS pc FROM (
         |          SELECT ct, sym, lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
         |          FROM w${i - 1}) WHERE nxt IS NOT NULL GROUP BY 1, 2),
         |g$i AS MATERIALIZED (SELECT l, r, pc FROM p$i ORDER BY pc DESC, l, r LIMIT 1),
         |c$i AS MATERIALIZED (SELECT w, ct, pos, sym,
         |          lead(sym) OVER wpo AS nxt, lead(pos) OVER wpo AS npos,
         |          ROW_NUMBER() OVER wpo AS rn
         |        FROM w${i - 1} WINDOW wpo AS (PARTITION BY w ORDER BY pos)),
         |t$i AS MATERIALIZED (SELECT w, pos, npos, sym || nxt AS msym FROM (
         |          SELECT w, pos, npos, sym, nxt,
         |            ROW_NUMBER() OVER (PARTITION BY w, isl ORDER BY pos) AS k
         |          FROM (SELECT w, pos, npos, sym, nxt,
         |                  rn - ROW_NUMBER() OVER (PARTITION BY w ORDER BY pos) AS isl
         |                FROM c$i
         |                WHERE sym = (SELECT l FROM g$i)
         |                  AND nxt = (SELECT r FROM g$i)))
         |        WHERE k % 2 = 1),
         |w$i AS MATERIALIZED (SELECT c.w, c.ct, c.pos, COALESCE(t.msym, c.sym) AS sym
         |        FROM c$i c
         |        LEFT JOIN t$i t ON c.w = t.w AND c.pos = t.pos
         |        LEFT JOIN t$i d ON c.w = d.w AND c.pos = d.npos
         |        WHERE d.w IS NULL)""".stripMargin
    }
    val out = (1 to merges).map { i =>
      s"SELECT CAST($i AS INT) AS merge_ix, l AS lhs, r AS rhs, " +
        s"l || r AS merged, pc AS pair_ct FROM g$i"
    }.mkString("\nUNION ALL\n")
    s"""WITH $docsCte,
       |wc AS MATERIALIZED (SELECT w, COUNT(*) AS ct FROM (
       |         SELECT unnest(string_split(lower(text), ' ')) AS w FROM d)
       |       WHERE length(w) > 0 AND length(w) <= $maxWordLen GROUP BY 1),
       |w0 AS MATERIALIZED (SELECT w, ct,
       |         unnest(generate_series(1, CAST(length(w) AS BIGINT))) AS pos,
       |         unnest(list_transform(generate_series(1, CAST(length(w) AS BIGINT)),
       |                i -> substring(w, CAST(i AS INT), 1))) AS sym
       |       FROM wc),
       |${rounds.mkString(",\n")}
       |$out
       |ORDER BY merge_ix""".stripMargin
  }

  /** Feature-hashing document vectors (the hashing trick, Weinberger et
    * al. 2009) — the TEXT → VECTOR bridge that lets the whole embedding
    * family (cosine near-dup, k-means, SemDeDup, PQ/IVF) run on corpora
    * with NO embedding model: token t contributes `sign(t) · count(t)` to
    * component `h(t) mod dim`, with the sign bit from the next hash bit
    * making collisions cancel in expectation (the unbiased-estimator
    * property that separates this from plain count bucketing).
    *
    * Every component is an exact small-integer sum carried as float
    * (exact well past any real token count), on the same deterministic
    * md5-slice hash as the sketch family — so the vector table is a pure
    * function of the text and hash-oracles, and the output schema
    * (id, embedding array<float>) is exactly what `ext/Similarity`
    * consumes.
    *
    * Shape at scale: one token explode into a map-side-combined
    * (doc, component) sum (≤ dim rows per doc out of the shuffle), then
    * a per-doc dense assembly — no joins, no corpus-width state.
    *
    * @return (doc_id, embedding) — the id column is always named
    *   `doc_id` regardless of `idCol`; dense float array of `dim` */
  def hashEmbed(df: DataFrame, idCol: Column, textCol: Column,
      dim: Int = 64): DataFrame = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    val comp = df.select(idCol.as("__id"), explode(toks(textCol)).as("__t"))
      .filter(length(col("__t")) > 0)
      .withColumn("__h",
        conv(substring(md5(col("__t")), 1, 8), 16, 10).cast("long"))
      .select(col("__id"), expr(s"__h % $dim").as("__pos"),
        when(expr(s"(__h div $dim) % 2") === 0, lit(1L))
          .otherwise(lit(-1L)).as("__sign"))
      .groupBy("__id", "__pos").agg(sum(col("__sign")).as("__v"))
    comp.groupBy("__id")
      .agg(map_from_entries(collect_list(
        struct(col("__pos").cast("int"), col("__v")))).as("__m"))
      .select(col("__id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("__m"), i), lit(0L)).cast("float"))
          .as("embedding"))
      .withColumnRenamed("__id", "doc_id")
  }
}
