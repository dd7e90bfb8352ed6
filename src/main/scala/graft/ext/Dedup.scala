package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines:
  * exact (hash-groupBy), n-gram Jaccard (inverted-index join), MinHash+LSH
  * (shingle → signature → band-bucket join → candidate verify), SimHash.
  *
  * Scale posture: nothing here is O(n²) over documents. Exact dedup is one
  * hash aggregation; Jaccard pairs come from an inverted-index equi-join on
  * shingles (shuffle on shingle, combiner-friendly); MinHash narrows the same
  * join to LSH band buckets so the verify step only touches candidates;
  * SimHash pairs come from fingerprint buckets. Thresholds are integer
  * cross-multiplications (`den·I ≥ num·(|A|+|B|−I)`) — no float compares.
  */
object Dedup {

  /** Session-shared dedup index over ONE corpus — the public form of the
    * share-the-intermediate pattern the engine's own verify queries use:
    * tokenize the corpus ONCE into the (doc_id, s) shingle table, derive the
    * verified MinHash+LSH pair table and the connected-component keeper
    * labels from it at most once each, and feed every downstream screen
    * (Jaccard / containment / span-dup / contamination via [[shingles]],
    * keeper filtering and capping via [[clusterLabels]]) from the same
    * checkpointed tables. At 100 TB the corpus tokenize+gram explosion is
    * the dominant cost of every shingle screen, so N screens over an index
    * cost one tokenize + N cheap derivations instead of N tokenizes.
    *
    * Materialized state is eagerly localCheckpointed and bounded: shingles
    * are corpus-linear, pairs and labels are duplicate-set-sized. Blocks are
    * pinned for the life of the instance; [[release]] frees them all, and a
    * released index transparently recomputes on next access, so releasing
    * between pipeline stages is always safe. Thread-safe: concurrent
    * consumers compute each table once.
    *
    * @param docs the corpus
    * @param n shingle width in tokens
    * @param num,den LSH verify threshold — keep pairs at Jaccard ≥ num/den
    * @param k,bands MinHash signature length / LSH band count (see
    *   [[minhashLshPairs]]; use [[lshParams]]-style derivations upstream to
    *   choose them) */
  final class SharedIndex(docs: DataFrame, idCol: Column, textCol: Column,
      n: Int = 3, num: Int = 1, den: Int = 2, k: Int = 32, bands: Int = 16) {
    private[this] var shinglesV: DataFrame = _
    private[this] var pairsV: DataFrame = _
    private[this] var labelsV: DataFrame = _

    /** The checkpointed distinct word-n-gram shingle table (doc_id, s). */
    def shingles: DataFrame = synchronized {
      if (shinglesV == null)
        shinglesV = Dedup.shingles(docs, idCol, textCol, n).localCheckpoint(true)
      shinglesV
    }

    /** Verified MinHash+LSH near-dup pairs (a_id, b_id, inter_ct, union_ct)
      * at Jaccard ≥ num/den, checkpointed. */
    def lshPairs: DataFrame = synchronized {
      if (pairsV == null) pairsV = minhashLshPairs(shingles, num, den, k, bands)
      pairsV
    }

    /** (doc_id, keeper_id) cluster labels over [[lshPairs]], checkpointed. */
    def clusterLabels: DataFrame = synchronized {
      if (labelsV == null) labelsV = connectedComponents(lshPairs)
      labelsV
    }

    /** Free every pinned block; the next accessor call recomputes from the
      * corpus. A localCheckpoint's blocks ARE its data (lineage truncated),
      * so frames handed out BEFORE the release are invalidated, not lazily
      * recomputed — release between consumers, not under one (see
      * [[graft.util.Blocks.freeCheckpoint]]). */
    def release(): Unit = synchronized {
      Seq(shinglesV, pairsV, labelsV).filter(_ != null)
        .foreach(graft.util.Blocks.freeCheckpoint)
      shinglesV = null; pairsV = null; labelsV = null
    }
  }

  /** Exact dedup: group identical texts by md5, keep the smallest doc_id. */
  def exact(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.groupBy(md5(textCol).as("text_hash"))
      .agg(min(idCol).as("keeper_id"), count(lit(1)).as("dup_ct"))

  /** Exact dedup keeping the BEST duplicate rather than the lowest id — the
    * keeper policy real pipelines want (among byte-identical re-crawls, keep
    * the copy with the richest metadata / best provenance score). Keeper =
    * max by (priority, id): `max(struct(priority, id))` is one algebraic
    * aggregate — same single map-side-combining shuffle as [[exact]], no
    * window, no second pass. Ties break to the higher id deterministically.
    *
    * @return (text_hash, keeper_id, keeper_priority, dup_ct) */
  def exactBest(df: DataFrame, idCol: Column, textCol: Column,
      priorityCol: Column): DataFrame =
    df.groupBy(md5(textCol).as("text_hash"))
      .agg(max(struct(priorityCol.as("p"), idCol.as("id"))).as("__best"),
        count(lit(1)).as("dup_ct"))
      .select(col("text_hash"), col("__best.id").as("keeper_id"),
        col("__best.p").as("keeper_priority"), col("dup_ct"))

  /** Distinct word n-gram shingles per document: (doc_id, s). Documents with
    * fewer than `n` tokens produce no shingles.
    *
    * The token array is projected to its own column FIRST: inlining the
    * tokenizer into the `transform` lambda would re-evaluate the full-text
    * split for every `element_at` call (n per gram × grams per doc — measured
    * ~5× the whole stage's cost on the sf0.1 corpus). */
  def shingles(df: DataFrame, idCol: Column, textCol: Column, n: Int = 3): DataFrame = {
    val t = col("__toks")
    val grams = when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(t, i + o)): _*))
    ).otherwise(array().cast("array<string>"))
    // The testdata parquet is a single row group → a 1-partition scan; spread
    // the (cheap, narrow) token rows across cores BEFORE the gram explosion,
    // which is the CPU-heavy part. Gated: a properly-partitioned input skips
    // the exchange entirely.
    spread(df.select(idCol.as("doc_id"), TextStats.toks(textCol).as("__toks")))
      .select(col("doc_id"), explode(array_distinct(grams)).as("s"))
  }

  /** Repartition `df` across the cluster only when it arrives narrower than
    * the available parallelism (e.g. a single-row-group local file). A wide
    * input passes through untouched — no unconditional shuffle baked in.
    *
    * Any FILE-BACKED frame decides on metadata alone (`inputFiles` walks the
    * logical plan — no physical planning): ≥ parallelism files pass through,
    * fewer files repartition. The trade in the few-file case is explicit: a
    * handful of giant files might have split wide enough anyway, and the
    * gate then pays one narrow exchange — cheap, bounded, and AQE-coalesced
    * — instead of the unbounded `.rdd` cost of physically planning a 100 TB
    * lineage on the driver, outside AQE. Only a NON-file input (in-memory
    * test data, post-exchange views) still pays the `.rdd` probe for an
    * accurate split count, and `spark.graft.spread.probe=false` turns even
    * that into a pass-through for callers whose non-file lineage is too
    * large to plan twice. [[SpreadProbe]] counts probe hits so tests can
    * assert file inputs NEVER physically plan. */
  private[ext] def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val want = spark.sparkContext.defaultParallelism
    val nFiles = df.inputFiles.length
    if (nFiles > 0) {
      if (nFiles >= want) df else df.repartition(want)
    } else if (!spark.conf.get("spark.graft.spread.probe", "true").toBoolean) {
      df
    } else {
      SpreadProbe.hits.incrementAndGet()
      if (df.rdd.getNumPartitions < want) df.repartition(want) else df
    }
  }

  /** The shared probe counter ([[graft.util.SpreadProbe]]) — both wideners
    * ([[spread]] here and `Envelopes.widen`) count their `.rdd` probes in
    * one place so the scale-guard specs cover every entry point. */
  private[graft] val SpreadProbe = graft.util.SpreadProbe

  /** Shingle-set sizes per doc. */
  private def sizes(sh: DataFrame): DataFrame =
    sh.groupBy("doc_id").agg(count(lit(1)).as("n"))

  /** Shared Jaccard tail: join per-doc set sizes onto (a_id, b_id, inter_ct)
    * rows, derive the union size, keep pairs ≥ num/den by integer
    * cross-multiplication (`den·I ≥ num·(|A|+|B|−I)`). ONE definition — the
    * exhaustive and LSH paths must apply the identical threshold contract. */
  private def attachJaccard(inter: DataFrame, sz: DataFrame,
      num: Int, den: Int): DataFrame =
    inter
      .join(sz.as("za"), col("a_id") === col("za.doc_id"))
      .join(sz.as("zb"), col("b_id") === col("zb.doc_id"))
      .select(col("a_id"), col("b_id"), col("inter_ct"),
        (col("za.n") + col("zb.n") - col("inter_ct")).as("union_ct"))
      .filter(col("inter_ct") * den >= col("union_ct") * num)

  /** Attach exact intersection/union counts to candidate (a_id, b_id) pairs
    * and keep pairs with Jaccard ≥ num/den. `shc` must already be pruned to
    * the candidate docs (see [[minhashLshPairs]]) AND pinned by the caller:
    * it is walked three times here (both sides of the intersection join plus
    * the size rollup), so an unpersisted full-corpus lineage would replay
    * the shingle scan three times over. */
  private def verifyJaccard(cand: DataFrame, shc: DataFrame,
      num: Int, den: Int): DataFrame = {
    val inter = cand
      .join(shc.as("sa"), col("a_id") === col("sa.doc_id"))
      .join(shc.as("sb"), col("b_id") === col("sb.doc_id") && col("sa.s") === col("sb.s"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("inter_ct"))
    attachJaccard(inter, sizes(shc), num, den)
  }

  /** Exhaustive n-gram Jaccard pairs ≥ num/den via inverted-index self-join
    * on shingles. One pass: the equi-join on the shingle produces one row per
    * shared shingle, so `count(*)` per (a, b) IS the intersection size — no
    * candidate-distinct pre-pass, no re-join of the shingle table. */
  def ngramJaccardPairs(sh: DataFrame, num: Int, den: Int): DataFrame = {
    // sh is consumed twice (self-join + sizes); recomputing the narrow
    // shingle lineage is cheaper than pinning it in cache for the session
    // lifetime (these functions return lazy plans, so a persist here could
    // never be paired with an unpersist).
    val inter = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter_ct"))
    attachJaccard(inter, sizes(sh), num, den)
  }

  /** DF-capped exhaustive n-gram Jaccard: [[ngramJaccardPairs]] with
    * shingles appearing in more than `maxDf` documents dropped BEFORE the
    * self-join — the standard inverted-index guard against ultra-common
    * shingles (stop-phrases, boilerplate) whose posting lists drive the
    * join's quadratic term: a shingle in d docs contributes d·(d−1)/2 join
    * rows, so capping d bounds the per-shingle fan-out at maxDf²/2
    * regardless of corpus size. The measured motivation is the 100×
    * replication probe (SCALING.md): uncapped, stopword-only shingles grow
    * candidates quadratically in copies.
    *
    * Deterministic — the cap is a pure function of the corpus — so the
    * result carries a full SQL oracle, unlike a sampling-based guard.
    * Semantics are the Jaccard over the CAPPED shingle sets (both
    * intersection and sizes derive from the same filtered table, keeping
    * the ratio internally consistent); pairs whose overlap rode only on
    * ultra-common shingles drop out, which is the point. */
  def ngramJaccardPairsCapped(sh: DataFrame, num: Int, den: Int,
      maxDf: Int): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val kept = sh.join(
      sh.groupBy("s").agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxDf).select("s"),
      Seq("s"), "left_semi")
    ngramJaccardPairs(kept, num, den)
  }

  /** Prefix-filtered exact n-gram Jaccard pairs — the AllPairs/SSJoin
    * algorithm (Bayardo et al. WWW'07; Chaudhuri et al. ICDE'06): identical
    * OUTPUT contract to [[ngramJaccardPairs]] (same oracle), different
    * candidate generation. Order every document's shingles by GLOBAL rarity
    * (document frequency asc, shingle asc — any shared total order works);
    * for threshold `num/den`, a doc with n shingles need only index its
    * first `p = n − ⌈n·num/den⌉ + 1` rarest shingles: two docs at
    * Jaccard ≥ t share ≥ ⌈t·max(n_a, n_b)⌉ shingles, and sets that overlap
    * that much MUST collide within these prefixes (the prefix-filtering
    * theorem) — so the self-join runs on the PREFIX index only, and exact
    * intersection/union are then verified row-locally per candidate via
    * array intersection of the two docs' full shingle sets.
    *
    * Why it matters at 100 TB: this is the EXACT counterpart of the LSH
    * path — zero false negatives by theorem (LSH trades recall for speed;
    * the DF cap changes semantics) — while indexing only the ≈(1−t)
    * fraction of each posting list that rarity-ordering leaves in prefixes,
    * and rare-first ordering puts the surviving join keys on the SHORTEST
    * posting lists, collapsing the quadratic term the full inverted index
    * pays on common shingles.
    *
    * On top of prefix filtering sits PPJoin's POSITIONAL filter (Xiao et
    * al. WWW'08): collision rows carry each shingle's rarity RANK in both
    * docs, and for every candidate pair the EARLIEST collision (min rank —
    * which, because both docs rank by the same global order, is the pair's
    * globally earliest common shingle, provably inside both prefixes for
    * any qualifying pair) bounds the overlap at
    * `1 + min(n_a − rk_a, n_b − rk_b)`: everything before that collision in
    * either doc is non-shared by minimality, everything after contributes
    * at most the shorter tail. Pairs whose bound cannot reach the minimum
    * qualifying overlap `⌈(n_a+n_b)·t/(1+t)⌉` are pruned BEFORE the
    * set-array verify — zero false negatives, same theorem family as the
    * prefix bound. This prunes exactly the common-shingle pathology:
    * candidates that collide only deep in both prefixes with short tails.
    *
    * Shape: one df pass (vocab-sized), one per-doc rank window, the
    * prefix-bounded equi self-join with a per-pair positional screen on
    * the collision aggregate, then a doc-keyed join to the collected
    * shingle-set arrays for the exact verify — no pair ever re-touches the
    * inverted index. */
  def ngramJaccardPairsPrefix(sh: DataFrame, num: Int, den: Int): DataFrame = {
    val (cand, prefix) = prefixCandidates(sh, num, den)
    val sets = sh.groupBy("doc_id")
      .agg(collect_set(col("s")).as("__ss"), count(lit(1)).as("__n"))
      .localCheckpoint(true)
    val out = cand
      .join(sets.select(col("doc_id").as("a_id"), col("__ss").as("__sa"),
        col("__n").as("__na")), Seq("a_id"))
      .join(sets.select(col("doc_id").as("b_id"), col("__ss").as("__sb"),
        col("__n").as("__nb")), Seq("b_id"))
      .withColumn("inter_ct", size(array_intersect(col("__sa"), col("__sb"))).cast("long"))
      .withColumn("union_ct", col("__na") + col("__nb") - col("inter_ct"))
      .filter(col("inter_ct") * den >= col("union_ct") * num)
      .select(col("a_id"), col("b_id"), col("inter_ct"), col("union_ct"))
      .localCheckpoint(true) // pair-sized; frees the scaffolding below
    graft.util.Blocks.freeCheckpoint(prefix)
    graft.util.Blocks.freeCheckpoint(sets)
    out
  }

  /** [[ngramJaccardPairsPrefix]]'s candidate generation, shared with the
    * ScaleProbe candidate-statistics probe so measurements can never drift
    * from the operator. Returns `(candidates(a_id, b_id), prefixCheckpoint)`
    * — the CALLER must `Blocks.freeCheckpoint` the prefix handle once the
    * candidates have been consumed. `positional = false` skips the PPJoin
    * positional screen (probe-only dial for measuring what it prunes). */
  private[graft] def prefixCandidates(sh: DataFrame, num: Int, den: Int,
      positional: Boolean = true): (DataFrame, DataFrame) = {
    require(num >= 1 && den >= 1 && num <= den,
      s"threshold must be in (0,1]: $num/$den")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("__df"), col("s"))
    val ranked = sh
      .join(sh.groupBy("s").agg(count(lit(1)).as("__df")), Seq("s"))
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
    // the prefix index and the per-doc set arrays each feed BOTH sides of a
    // join — checkpoint them so the df pass + rank windows (resp. the set
    // collection) run once, not once per side (the minhashLshPairs `sig`
    // discipline; measured ~2× the whole query without it)
    val prefix = ranked
      .filter(col("__rk") <= col("__n") - expr(s"(__n * $num + ${den - 1}) div $den") + 1)
      .select(col("doc_id"), col("s"), col("__rk"), col("__n"))
      .localCheckpoint(true)
    // (The classic AllPairs LENGTH filter — J ≥ t ⇒ min(n) ≥ t·max(n) — was
    // measured here in round 7 and removed; since round 8 it is SUBSUMED:
    // at an earliest collision of ranks (1, 1) the positional bound
    // 1 + min(n_a − 1, n_b − 1) = min(n_a, n_b) ≥ ⌈(n_a+n_b)·t/(1+t)⌉ is
    // algebraically the length filter, and deeper collisions only tighten
    // it — so the positional screen below prunes a superset.)
    // Positional filter: one row per pair via the collision groupBy (which
    // replaces the old distinct — same exchange shape), keeping the
    // earliest collision's ranks. struct min is lexicographic on (ra, rb);
    // ra alone already identifies the earliest common shingle (ranks are
    // unique per doc), the second field just rides along.
    val grouped = prefix.as("a").join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(min(struct(col("a.__rk").as("ra"), col("b.__rk").as("rb"))).as("__m"),
        max(col("a.__n")).as("__pna"), max(col("b.__n")).as("__pnb"))
    val screened =
      if (positional)
        grouped.filter((lit(1) + least(col("__pna") - col("__m.ra"),
            col("__pnb") - col("__m.rb"))) * (num + den)
          >= (col("__pna") + col("__pnb")) * num)
      else grouped
    (screened.select(col("a_id"), col("b_id")), prefix)
  }

  /** Shingle-set containment pairs — Broder's containment measure
    * C(A,B) = |A∩B| / min(|A|,|B|): keep pairs where at least `num/den` of
    * the SMALLER doc's shingles appear in the larger's. At num = den this is
    * exact sub-document detection (one doc's shingle set fully inside
    * another's — quoted articles, page-plus-boilerplate wrappers, partial
    * crawls), the duplicate class Jaccard systematically misses: a 100-line
    * doc embedded in a 10 000-line doc has Jaccard ≈ 0.01 but containment 1.
    *
    * Same inverted-index self-join shape (and the same quadratic posting-
    * list exposure — compose with the DF-cap screen of
    * [[ngramJaccardPairsCapped]] at scale) followed by the integer
    * cross-multiplied threshold, so the whole result is exact and carries a
    * full SQL oracle. Output row per kept pair: `inner_id` (the smaller
    * shingle set; ties broken toward the smaller doc_id), `outer_id`,
    * `inter_ct`, `n_inner`, `n_outer`. */
  def containmentPairs(sh: DataFrame, num: Int, den: Int): DataFrame = {
    require(num >= 1 && den >= 1 && num <= den,
      s"containment threshold must satisfy 0 < num/den <= 1, got $num/$den")
    val inter = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter_ct"))
    val sz = sizes(sh)
    // a_id < b_id by the join, so an equal-size tie resolves to a as inner
    val aInner = col("za.n") <= col("zb.n")
    inter
      .join(sz.as("za"), col("a_id") === col("za.doc_id"))
      .join(sz.as("zb"), col("b_id") === col("zb.doc_id"))
      .filter(col("inter_ct") * den >= least(col("za.n"), col("zb.n")) * num)
      .select(
        when(aInner, col("a_id")).otherwise(col("b_id")).as("inner_id"),
        when(aInner, col("b_id")).otherwise(col("a_id")).as("outer_id"),
        col("inter_ct"),
        least(col("za.n"), col("zb.n")).as("n_inner"),
        greatest(col("za.n"), col("zb.n")).as("n_outer"))
  }

  /** MinHash signatures (k hashes via seeded xxhash64 over shingles) banded
    * into `bands` buckets of r = k/bands rows; docs sharing a band bucket are
    * LSH candidates, then exact-verified at Jaccard ≥ num/den.
    *
    * With k=32, bands=16 (r=2) the miss probability for a true pair at
    * Jaccard j is (1−j²)^16 — ≈3e-12 at j=0.9. The synthetic corpus's
    * near-dup pairs all sit ≥0.9, so LSH+verify equals the exhaustive result.
    */
  /** MinHash signature per document: k per-permutation minima as columns
    * h0..h{k−1}. The variable-length shingle string is hashed ONCE
    * (`xxhash64(s)`), each permutation re-hashes the fixed 8-byte digest
    * with its index as seed — independent up to 2^-64 digest collisions,
    * string bytes walked once. Docs with no shingles yield no row. */
  def minhashSignatures(sh: DataFrame, k: Int = 32): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    sh.select(col("doc_id"), xxhash64(col("s")).as("hb"))
      .groupBy("doc_id").agg(
        min(xxhash64(lit(0), col("hb"))).as("h0"),
        (1 until k).map(i => min(xxhash64(lit(i), col("hb"))).as(s"h$i")): _*)
  }

  /** LSH band keys from a signature table: (doc_id, band, bkey) — one row
    * per band, bkey = hash of the band's r = k/bands signature rows. */
  def bandBuckets(sig: DataFrame, k: Int = 32, bands: Int = 16): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        hash((0 until r).map(j => col(s"h${b * r + j}")): _*).as("bkey"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
  }

  /** MinHash LSH parameters (k signatures, bands) derived from the collision
    * algebra instead of hand-tuning — the Jaccard twin of
    * [[graft.ext.Similarity.srpParams]]: a pair at Jaccard j agrees on one
    * MinHash with probability j, an r = k/bands row band matches with j^r,
    * and b bands recall 1 − (1 − j^r)^b. Pruning power rises with the band
    * width r (background-pair candidates ∝ j_bg^r per band), so this picks
    * the LARGEST r whose minimal recall-meeting band count still fits the
    * signature budget (r·b ≤ maxK), then that minimal b.
    *
    * The budget is the dial's price: k is the per-doc signature width (k
    * longs carried through the band shuffle) and the per-doc hashing CPU.
    * The engine default (32, 16) = r 2 sits at the budget-lean end — it
    * recalls 0.990 at the verify threshold j = 1/2 (see [[lshRecall]]) —
    * while a 128-signature budget buys r = 3 bands at the same floor.
    *
    * If even 1-hash bands cannot reach the floor within the budget
    * (threshold ≈ 0 or floor ≈ 1), falls back loudly to (maxK, maxK) —
    * callers wanting guaranteed recall there should use
    * [[ngramJaccardPairs]].
    *
    * @param num,den the Jaccard threshold num/den the pairs are verified at
    * @return (k, bands) ready to pass to [[minhashLshPairs]] */
  def lshParams(num: Int, den: Int, recallFloor: Double = 0.99,
      maxK: Int = 128): (Int, Int) = {
    require(num >= 1 && den >= 1 && num <= den,
      s"threshold must be a fraction in (0, 1], got $num/$den")
    require(recallFloor > 0.0 && recallFloor < 1.0,
      s"recallFloor must be in (0, 1), got $recallFloor")
    require(maxK >= 1, s"maxK must be >= 1, got $maxK")
    val j = num.toDouble / den
    val feasible = (1 to maxK).reverse.iterator.map { r =>
      val jr = math.pow(j, r)
      // minimal b with (1 - j^r)^b <= 1 - recallFloor; at large r the band
      // match probability underflows and b explodes past any budget —
      // bound it at maxK + 1 BEFORE narrowing so the infeasible marker
      // survives the Double→Long conversion instead of overflowing
      val b = math.max(1.0,
        math.min(math.ceil(math.log1p(-recallFloor) / math.log1p(-jr)),
          (maxK + 1).toDouble)).toLong
      (r, b)
    }.collectFirst { case (r, b) if b >= 1 && r.toLong * b <= maxK =>
      (r * b.toInt, b.toInt)
    }
    feasible.getOrElse {
      // the "loudly" the scaladoc promises: the contract (recall >= floor)
      // is NOT met at this budget, and a silent (maxK, maxK) would hand the
      // caller sub-floor recall with no signal anywhere
      val achieved = lshRecall(num, den, maxK, maxK)
      System.err.println(f"lshParams: recall floor $recallFloor%.3f at " +
        f"threshold $num/$den is infeasible within maxK=$maxK hashes; " +
        f"falling back to (k=$maxK, bands=$maxK) with algebraic recall " +
        f"$achieved%.3f — raise maxK or use ngramJaccardPairs for " +
        "guaranteed recall")
      (maxK, maxK)
    }
  }

  /** Algebraic recall of (k, bands) at Jaccard `num/den` — the 1−(1−j^r)^b
    * curve [[lshParams]] inverts; exposed so specs and capacity planning
    * can read the achieved floor rather than re-deriving it. */
  def lshRecall(num: Int, den: Int, k: Int, bands: Int): Double = {
    require(bands >= 1 && k % bands == 0, s"bad ($k, $bands)")
    val j = num.toDouble / den
    1.0 - math.pow(1.0 - math.pow(j, k / bands), bands)
  }

  /** [[minhashLshPairs]] with (k, bands) derived by [[lshParams]] from the
    * verify threshold and a target recall floor. */
  def minhashLshPairsAuto(sh: DataFrame, num: Int, den: Int,
      recallFloor: Double = 0.99, maxK: Int = 128): DataFrame = {
    val (k, bands) = lshParams(num, den, recallFloor, maxK)
    minhashLshPairs(sh, num, den, k, bands)
  }

  def minhashLshPairs(sh: DataFrame, num: Int, den: Int,
      k: Int = 32, bands: Int = 16): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    // Hash the (variable-length) shingle string ONCE, then derive the k
    // per-permutation hashes by re-hashing the fixed 8-byte digest with the
    // permutation index as seed. Each derived hash is a full avalanche mix of
    // the base digest — independent permutations up to 2^-64 digest
    // collisions — but the string bytes are only walked once, which cuts the
    // CPU of the signature stage (its dominant cost) by ~k/2×.
    // The shingle lineage (tokenize → gram transform → explode) is the most
    // expensive recomputable plan in this function and is needed TWICE — the
    // signature aggregation here and the candidate-pruned verify below. Every
    // other consumer reads a materialized derivative instead of replaying it:
    //  * `sig` is eagerly checkpointed, so the band self-join's two sides and
    //    the bucket explode read #docs × (8 + 8k)-byte cached rows rather
    //    than re-running the shingle scan + 32-way min-agg per side (measured
    //    2× the whole stage at sf0.1);
    //  * `shc` (candidate shingles only — tiny next to the corpus, that
    //    asymmetry is the point of LSH) is pinned across verify's three
    //    walks and released before return.
    // All pinned state is bounded: sig is O(#docs), cand/shc are
    // candidate-sized; the verified pairs are localCheckpointed so the
    // returned plan is detached from every cache before the unpersists.
    val sig = minhashSignatures(sh, k).localCheckpoint(true)
    val buckets = bandBuckets(sig, k, bands)
    val cand = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
      .persist()
    val candDocs = cand.select(col("a_id").as("doc_id"))
      .union(cand.select(col("b_id").as("doc_id"))).distinct()
    val shc = sh.join(broadcast(candDocs), Seq("doc_id"), "left_semi").persist()
    val verified = verifyJaccard(cand, shc, num, den).localCheckpoint(true)
    shc.unpersist()
    cand.unpersist()
    graft.util.Blocks.freeCheckpoint(sig) // checkpointed: plain unpersist is a no-op
    verified
  }

  /** Connected components over near-dup pairs → keeper assignment: every doc
    * in a duplicate cluster maps to the cluster's minimum doc_id (the row a
    * pipeline keeps). Min-label propagation with DOUBLE pointer jumping: each
    * round takes the min label over neighbors, then rewrites
    * `keeper := keeper(keeper)` twice in the same plan — reach roughly
    * triples per materialized round, so the fixpoint arrives in O(log
    * diameter) barriers, the same shortcutting idea as large-star/small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond").
    *
    * Driver-sequencing cost (the measured bottleneck — the barrier count,
    * not the row count, dominated on small graphs) is held down three ways:
    * (1) both jumps ride in ONE plan per round, halving barriers vs
    * jump-per-action; (2) every in-loop shuffle is sized to the edge count —
    * ~1M edge rows per partition, so a test-scale graph collapses to one
    * partition and a 100 TB graph still gets full width — instead of paying
    * the session's shuffle width per round on a table that shrinks to a few
    * hundred rows after round 1; (3) convergence is read off the label SUM
    * (labels only ever decrease, so the sum is strictly smaller iff any doc
    * changed) — a cached-block scan, no extra join and no change-flag column.
    *
    * @param pairs (a_id, b_id) undirected near-dup edges
    * @return (doc_id, keeper_id) for every doc appearing in any pair
    * @throws IllegalStateException if DISTRIBUTED propagation hasn't
    *         converged after maxIter rounds (double pointer jumping needs
    *         ~log3(diameter) rounds, so the default bound is far beyond
    *         any real graph — silently returning a split cluster would
    *         corrupt keeper assignment). The driver-local fast path below
    *         is a direct union-find — exact at any diameter, so maxIter
    *         never applies to graphs at or under `driverLocalMaxEdges`. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50,
      driverLocalMaxEdges: Long = 200000L): DataFrame = {
    val spark = pairs.sparkSession
    // Materialize the pair set ONCE before mirroring it: `pairs` is usually an
    // expensive lazy plan (an LSH or inverted-index join), and a union of two
    // projections of it would execute that plan twice (shuffle reuse recovers
    // only part of the cost — measured ~1.7× on the 10× probe).
    val p = pairs.select(col("a_id").as("x"), col("b_id").as("y")).localCheckpoint(true)
    val edges0 = p.union(p.select(col("y").as("x"), col("x").as("y")))
      .distinct().localCheckpoint(true)
    graft.util.Blocks.freeCheckpoint(p)
    val edgeCt = edges0.count() // cached-block scan, no shuffle
    // DRIVER-LOCAL fast path (round 15, VERDICT r14 item 5 — the
    // store-fold driver-job floor): the incremental folds feed
    // BATCH-sized edge sets (batch pairs + affected clusters' star
    // edges), where the distributed loop's wall is pure driver latency —
    // ~6 AQE stage jobs PER pointer-jump round over a few hundred rows,
    // the reason the CC drives swing 2–3× with box state. At or below
    // the gate, the identical min-label components come out of ONE
    // cached-block collect + a union-find + a LocalRelation — two driver
    // actions total instead of O(rounds × stages) jobs. The gate is the
    // EDGE COUNT, not corpus size: a 100 TB corpus-wide pair graph blows
    // past it and keeps the full distributed loop below, and a long
    // stream's fold stays under it exactly when its delta does — the
    // sparse-delta regime the fold protocol is built for. Result parity
    // is definitional (components and min-labels are unique) and pinned
    // by CcPropertySpec across the gate.
    if (edgeCt > 0 && edgeCt <= driverLocalMaxEdges &&
        edges0.schema.fields.forall(_.dataType ==
          org.apache.spark.sql.types.LongType)) {
      val rows = edges0.collect()
      if (!rows.exists(r => r.isNullAt(0) || r.isNullAt(1))) {
        val idx = new java.util.HashMap[Long, Integer](rows.length * 2)
        val ids = new scala.collection.mutable.ArrayBuffer[Long](rows.length)
        def idOf(v: Long): Int = {
          val got = idx.get(v)
          if (got != null) got.intValue()
          else { val i = ids.length; ids += v; idx.put(v, i); i }
        }
        val parent = new Array[Int](rows.length * 2)
        var n = 0
        def find(x0: Int): Int = {
          var r = x0
          while (parent(r) != r) r = parent(r)
          var c = x0
          while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
          r
        }
        rows.foreach { r =>
          val a = idOf(r.getLong(0)); val b = idOf(r.getLong(1))
          while (n < ids.length) { parent(n) = n; n += 1 }
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(ra) = rb
        }
        // keeper = component MINIMUM doc_id — the distributed loop's
        // min-label fixpoint, computed in one pass over the id table
        val minOf = new Array[Long](ids.length)
        java.util.Arrays.fill(minOf, Long.MaxValue)
        var i = 0
        while (i < ids.length) {
          val r = find(i)
          if (ids(i) < minOf(r)) minOf(r) = ids(i)
          i += 1
        }
        import spark.implicits._
        graft.util.Blocks.freeCheckpoint(edges0)
        return ids.indices.map(j => (ids(j), minOf(find(j)))).toSeq
          .toDF("doc_id", "keeper_id")
      }
    }
    // Loop shuffle width ∝ data: ~1M narrow edge rows (two longs) per
    // partition stays far under executor memory at any scale while collapsing
    // a near-dup graph at test scale to a single partition, where per-round
    // scheduling overhead would otherwise dwarf the work.
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions").toLong
    val loopParts =
      math.max(1L, math.min(sessionParts, (edgeCt >> 20) + 1)).toInt
    val edges =
      if (loopParts < edges0.rdd.getNumPartitions) edges0.coalesce(loopParts)
      else edges0
    // Width control is PLAN-LOCAL: every in-loop shuffle is an explicit
    // repartition(loopParts, key) whose HashPartitioning satisfies the
    // required distribution of the op that follows (same key, same count), so
    // Catalyst inserts no session-width exchange on top of it and NOTHING
    // session-global is mutated — a concurrent unrelated query planned
    // mid-loop keeps full session width (asserted by CcConcurrencySpec), and
    // no lock is needed.
    def byKey(df: DataFrame, k: Column): DataFrame = df.repartition(loopParts, k)
    // Initialize labels with the first hop already applied — min(self,
    // direct neighbors) — instead of the identity: same single shuffle as a
    // distinct-vertices init, but it does round 1's work for free.
    var labels = byKey(edges, col("x")).groupBy(col("x").as("doc_id"))
      .agg(min(col("y")).as("__nbr_min"))
      .select(col("doc_id"), least(col("doc_id"), col("__nbr_min")).as("keeper_id"))
      .localCheckpoint(true)
    // Decimal, not long: at 1e12 docs × 1e9-scale ids the long sum overflows.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("keeper_id").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")))
        .first().getDecimal(0)
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // Min label among direct neighbors (one hop). The edge side is
      // pre-partitioned on the join key; labels comes out of its checkpoint
      // already hash-partitioned on doc_id at loopParts (LogicalRDD preserves
      // the physical partitioning), so the join adds no exchange, and the
      // rollup's width is set by the explicit repartition on e.x.
      val msgs = byKey(byKey(edges, col("y")).as("e")
          .join(labels.as("m"), col("e.y") === col("m.doc_id")), col("e.x"))
        .groupBy(col("e.x").as("doc_id")).agg(min(col("m.keeper_id")).as("nbr_min"))
      val hop = labels.join(msgs, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          least(col("keeper_id"), coalesce(col("nbr_min"), col("keeper_id"))).as("k1"))
      // Double pointer jump through the (checkpointed, leaf) label table:
      // follow the new keeper to ITS keeper, twice. Labels only ever hold
      // doc_ids present in the label table, so the left_outer+coalesce is
      // defensive, not load-bearing.
      val j1 = byKey(hop, col("k1")).as("h")
        .join(labels.as("l1"), col("h.k1") === col("l1.doc_id"), "left_outer")
        .select(col("h.doc_id").as("doc_id"),
          least(col("h.k1"), coalesce(col("l1.keeper_id"), col("h.k1"))).as("k2"))
      val next = byKey(j1, col("k2")).as("j")
        .join(labels.as("l2"), col("j.k2") === col("l2.doc_id"), "left_outer")
        .select(col("j.doc_id").as("doc_id"),
          least(col("j.k2"), coalesce(col("l2.keeper_id"), col("j.k2"))).as("keeper_id"))
        .localCheckpoint(true) // the single data-sized action this round
      val curSum = labelSum(next) // cached-block scan
      converged = curSum.compareTo(prevSum) == 0
      prevSum = curSum
      graft.util.Blocks.freeCheckpoint(labels) // bound cached generations at two
      labels = next
      iter += 1
    }
    graft.util.Blocks.freeCheckpoint(edges0) // labels is checkpointed; the edge blocks are done
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(pointer-jumping rounds exceeded ~log of the cluster diameter) — " +
          "raise maxIter")
    labels.select(col("doc_id"), col("keeper_id"))
  }

  /** C4-style cross-document span duplication: for each doc, how many of its
    * distinct n-gram shingles also appear in at least one OTHER document, and
    * a keep/drop verdict at `num/den` (drop when dup_span_ct·den ≥
    * span_ct·num). Complements the per-doc repetition signal
    * ([[TextStats.repetition]]) with the cross-corpus signal C4/RefinedWeb
    * filter on.
    *
    * One shuffle on the shingle: the per-shingle doc count and the join back
    * to (doc_id, s) share the same key, so the exchange is reused; the final
    * per-doc rollup shuffles only (doc_id, counts) rows. No pairwise work —
    * cost is linear in total shingles at any corpus size. */
  def crossDocDupStats(sh: DataFrame, num: Int = 1, den: Int = 2): DataFrame = {
    // sh is distinct per (doc_id, s), so count(*) per s IS the doc frequency
    val docCt = sh.groupBy("s").agg(count(lit(1)).as("doc_ct"))
    sh.join(docCt, "s")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("span_ct"),
        sum(when(col("doc_ct") > 1, 1L).otherwise(0L)).as("dup_span_ct"))
      .withColumn("keep", col("dup_span_ct") * den < col("span_ct") * num)
  }

  /** Fuzzy vocabulary pairs — record-linkage / typo-clustering over a token
    * vocabulary: all unordered token pairs within Levenshtein distance
    * `maxDist`, found by LENGTH-BAND blocking + exact verify. The blocking
    * is lossless, not approximate: edit distance ≤ d forces |len(a) −
    * len(b)| ≤ d, so banding by length drops no true pair — candidates
    * shrink from vocab² to Σ per-band products while recall stays exact
    * (unlike first-letter blocking, which silently loses "cat"≈"bat").
    *
    * Shape at scale: vocabulary extraction is one distinct agg (vocab-sized
    * output — tokens, not corpus rows); each token emits `2·maxDist + 1`
    * band keys on ONE side only (the lexicographically-smaller token of a
    * pair can be either the longer or the shorter one, so the band must
    * span ±maxDist), and every candidate pair meets on exactly one equi key
    * — len(a) — so no post-join distinct is needed; the `a < b` guard takes
    * each unordered pair once. Candidate verify is codegen `levenshtein`.
    *
    * For a WEB-SCALE vocabulary the length bands themselves get hot (every
    * 7-letter token in one band): `segmentBand = true` extends the key with
    * a PassJoin-style segment term — still lossless. Pigeonhole: partition
    * the a-side token into `maxDist + 1` even segments; ≤ maxDist edits
    * touch ≤ maxDist segments, so at least one survives untouched and
    * appears VERBATIM in the other token, shifted by at most ±maxDist (net
    * prefix insertions/deletions are bounded by the distance). The key
    * becomes (len(a), segIdx, segment); the b-side emits each substring
    * that could be a surviving segment (lengths ±maxDist × segIdx × shift
    * ±maxDist ⇒ ≤ (2d+1)²(d+1) keys per token, 18 at d=1 — constant), and
    * bands shrink from |len-class| to |len-class sharing an exact
    * substring|. Tokens shorter than maxDist+1 (no non-empty segments) keep
    * the plain length key. A pair can now meet under several segment keys,
    * so the verified output is deduped — a distinct over TRUE pairs only,
    * not candidates.
    *
    * @param vocab one `tok` string column, assumed distinct
    * @return (a_tok, b_tok, dist) with a_tok < b_tok, dist ≤ maxDist */
  def fuzzyVocabPairs(vocab: DataFrame, maxDist: Int = 1,
      segmentBand: Boolean = false): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    if (!segmentBand || maxDist == 0) {
      val a = vocab.select(col("tok").as("a_tok"), length(col("tok")).as("__l"))
      val b = vocab.select(col("tok").as("b_tok"),
          explode(sequence(length(col("tok")) - maxDist,
            length(col("tok")) + maxDist)).as("__l"))
      a.join(b, Seq("__l"))
        .filter(col("a_tok") < col("b_tok"))
        .withColumn("dist", levenshtein(col("a_tok"), col("b_tok")).cast("long"))
        .filter(col("dist") <= maxDist)
        .select(col("a_tok"), col("b_tok"), col("dist"))
    } else {
      val d = maxDist
      val s = d + 1
      def segStart(l: Column, i: Column) = floor(i * l / s)
      def segLen(l: Column, i: Column) = segStart(l, i + 1) - segStart(l, i)
      val aBase = vocab.select(col("tok").as("a_tok"), length(col("tok")).as("__l"))
      val aKeys = aBase.filter(col("__l") < s)
        .select(col("a_tok"), col("__l"), lit(-1L).as("__i"), lit("").as("__seg"))
        .unionByName(aBase.filter(col("__l") >= s)
          .select(col("a_tok"), col("__l"),
            explode(sequence(lit(0L), lit(d.toLong))).as("__i"))
          .select(col("a_tok"), col("__l"), col("__i"),
            col("a_tok").substr(
              (segStart(col("__l"), col("__i")) + 1).cast("int"),
              segLen(col("__l"), col("__i")).cast("int")).as("__seg")))
      val bL = vocab.select(col("tok").as("b_tok"), length(col("tok")).as("__bl"))
        .select(col("b_tok"), col("__bl"),
          explode(sequence(greatest(col("__bl") - d, lit(1)),
            col("__bl") + d)).as("__l"))
      val bKeys = bL.filter(col("__l") < s)
        .select(col("b_tok"), col("__l"), lit(-1L).as("__i"), lit("").as("__seg"))
        .unionByName(bL.filter(col("__l") >= s)
          .select(col("b_tok"), col("__bl"), col("__l"),
            explode(sequence(lit(0L), lit(d.toLong))).as("__i"))
          .withColumn("__sl", segLen(col("__l"), col("__i")))
          .select(col("b_tok"), col("__bl"), col("__l"), col("__i"), col("__sl"),
            explode(sequence(segStart(col("__l"), col("__i")) - d,
              segStart(col("__l"), col("__i")) + d)).as("__p"))
          .filter(col("__p") >= 0 && col("__p") + col("__sl") <= col("__bl"))
          .select(col("b_tok"), col("__l"), col("__i"),
            col("b_tok").substr((col("__p") + 1).cast("int"),
              col("__sl").cast("int")).as("__seg")))
        // one token can yield the same substring at several shifts
        // ("aaaa"): fold before the join rather than fan the band out
        .distinct()
      aKeys.join(bKeys, Seq("__l", "__i", "__seg"))
        .filter(col("a_tok") < col("b_tok"))
        .withColumn("dist", levenshtein(col("a_tok"), col("b_tok")).cast("long"))
        .filter(col("dist") <= d)
        .select(col("a_tok"), col("b_tok"), col("dist"))
        .distinct()
    }
  }

  /** C4-style duplicated-span REMOVAL: partition each document into
    * non-overlapping `w`-token spans, keep only the globally FIRST occurrence
    * of every distinct span text (ordered by doc_id, then position), and
    * reassemble the surviving spans — the pass C4 runs with three-sentence
    * spans to strip boilerplate repeated across pages while keeping one copy.
    * Complements [[crossDocDupStats]] (which only scores) by producing the
    * cleaned text.
    *
    * Two shuffles, both linear in total spans: the first-occurrence rank on
    * the span key, and the per-doc reassembly rollup. The rank is a window
    * rather than a min-struct + self-join because both hit the same span-key
    * skew on a pathological single-span corpus, and the window does it in
    * one exchange. Reassembly sorts each doc's kept spans by position inside
    * an `array_sort` (doc-sized arrays), never a global sort.
    *
    * @return (doc_id, span_ct, kept_ct, new_text) — new_text is "" when
    *         every span of the doc occurred earlier elsewhere */
  def stripDupSpans(df: DataFrame, idCol: Column, textCol: Column, w: Int = 5): DataFrame = {
    require(w >= 1, s"span width must be >= 1, got $w")
    val t = col("__toks")
    val n = size(t)
    val spans = spread(df.select(idCol.as("doc_id"), TextStats.toks(textCol).as("__toks")))
      .filter(n >= 1)
      .select(col("doc_id"), t, explode(sequence(lit(1), n, lit(w))).as("s"))
      .select(col("doc_id"), ((col("s") - 1) / w).cast("long").as("pos"),
        concat_ws(" ", slice(t, col("s"), lit(w))).as("span"))
    val ranked = spans.withColumn("rk", row_number().over(
      Window.partitionBy(col("span")).orderBy(col("doc_id"), col("pos"))))
    ranked.groupBy("doc_id").agg(
      count(lit(1)).as("span_ct"),
      sum(when(col("rk") === 1, 1L).otherwise(0L)).as("kept_ct"),
      array_join(transform(
        array_sort(collect_list(when(col("rk") === 1, struct(col("pos"), col("span"))))),
        p => p.getField("span")), " ").as("new_text"))
  }

  /** Benchmark-contamination screen: (train doc, eval doc) pairs sharing at
    * least `minOverlap` n-gram shingles — the decontamination pass a training
    * pipeline runs against its eval suites before training.
    *
    * The eval side is broadcast: benchmark suites are metadata-sized next to
    * a 100 TB corpus, so the train shingles NEVER shuffle — the screen is one
    * map-side join over the corpus scan plus a rollup of the (tiny) hit set.
    *
    * The broadcast assumption is GUARDED, not hoped: an eval side above
    * `maxEvalShingles` rows fails fast with a named error instead of an
    * opaque broadcast-size/driver-OOM failure deep in execution. The guard is
    * a bounded `limit(n+1).count()` — it never scans more than n+1 rows. */
  def contamination(trainSh: DataFrame, evalSh: DataFrame,
      minOverlap: Int = 3, maxEvalShingles: Long = 50L * 1000 * 1000): DataFrame = {
    val probed = evalSh.limit((maxEvalShingles + 1).min(Int.MaxValue).toInt).count()
    require(probed <= maxEvalShingles,
      s"contamination: eval shingle set exceeds $maxEvalShingles rows — too " +
        "large to broadcast. Shrink the eval suite, raise maxEvalShingles " +
        "(with executor memory to match), or use a shuffle join variant.")
    trainSh.as("t")
      .join(broadcast(evalSh.as("e")),
        col("t.s") === col("e.s") && col("t.doc_id") =!= col("e.doc_id"))
      .groupBy(col("t.doc_id").as("train_id"), col("e.doc_id").as("eval_id"))
      .agg(count(lit(1)).as("overlap_ct"))
      .filter(col("overlap_ct") >= minOverlap)
  }

  /** The shuffle-strategy twin of [[contamination]] — IDENTICAL output
    * contract (train docs sharing ≥ `minOverlap` distinct shingles with an
    * eval doc), with the eval side joined by shuffle instead of broadcast,
    * for eval suites too large to ship to every executor (the modern
    * many-benchmark eval stack easily clears the broadcast budget). Both
    * sides hash-partition on the shingle — co-located equi-join, overlap
    * counts map-side combined on (train, eval). The `shuffle_merge` hint
    * pins the strategy so a small eval set in testing doesn't silently flip
    * the plan back to broadcast and invalidate the scale claim. Hot-shingle
    * fan-out is the same risk as the broadcast form (it is pair-multiplicity,
    * not join-strategy, driven) — screen stopword-heavy shingles upstream
    * with the DF-cap idiom if the corpus needs it. */
  def contaminationShuffle(trainSh: DataFrame, evalSh: DataFrame,
      minOverlap: Int = 3): DataFrame =
    trainSh.as("t")
      .join(evalSh.hint("shuffle_merge").as("e"),
        col("t.s") === col("e.s") && col("t.doc_id") =!= col("e.doc_id"))
      .groupBy(col("t.doc_id").as("train_id"), col("e.doc_id").as("eval_id"))
      .agg(count(lit(1)).as("overlap_ct"))
      .filter(col("overlap_ct") >= minOverlap)

  /** Cross-corpus MinHash+LSH near-dup JOIN (the R-S form of
    * [[minhashLshPairs]]): find (a, b) pairs with Jaccard ≥ num/den where
    * `a` comes from corpus A and `b` from corpus B — doc-level
    * decontamination of a training corpus against an eval corpus too large
    * to broadcast, or matching a fresh crawl against an existing index.
    * Same seeded signature derivation on both sides, band-bucket equi-join
    * across the corpora (each side shuffles once on the band key; neither
    * broadcasts), then the exact shingle-intersection verify with per-side
    * size tables — precision 1 by construction, recall the 1−(1−j^r)^b LSH
    * curve ([[lshParams]] picks k/bands for a floor).
    *
    * Caller contract: the two shingle tables must carry DISTINCT doc-id
    * spaces if identity matters downstream (ids are reported as-is,
    * A-side as `a_id`, B-side as `b_id`; no id-inequality filter is
    * applied).
    *
    * @return (a_id, b_id, inter_ct, union_ct) at Jaccard ≥ num/den */
  def minhashLshJoin(shA: DataFrame, shB: DataFrame, num: Int, den: Int,
      k: Int = 32, bands: Int = 16): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    // same pinning discipline as minhashLshPairs: signatures checkpointed
    // (each feeds a band explode), candidate-pruned shingles pinned across
    // the verify walks, result checkpointed before the frees
    val sigA = minhashSignatures(shA, k).localCheckpoint(true)
    val sigB = minhashSignatures(shB, k).localCheckpoint(true)
    val cand = bandBuckets(sigA, k, bands).as("x")
      .join(bandBuckets(sigB, k, bands).as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
      .persist()
    val shcA = shA.join(broadcast(cand.select(col("a_id").as("doc_id")).distinct()),
      Seq("doc_id"), "left_semi").persist()
    val shcB = shB.join(broadcast(cand.select(col("b_id").as("doc_id")).distinct()),
      Seq("doc_id"), "left_semi").persist()
    val inter = cand
      .join(shcA.as("sa"), col("a_id") === col("sa.doc_id"))
      .join(shcB.as("sb"), col("b_id") === col("sb.doc_id") && col("sa.s") === col("sb.s"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("inter_ct"))
    val out = inter
      .join(sizes(shcA).as("za"), col("a_id") === col("za.doc_id"))
      .join(sizes(shcB).as("zb"), col("b_id") === col("zb.doc_id"))
      .select(col("a_id"), col("b_id"), col("inter_ct"),
        (col("za.n") + col("zb.n") - col("inter_ct")).as("union_ct"))
      .filter(col("inter_ct") * den >= col("union_ct") * num)
      .localCheckpoint(true)
    shcA.unpersist(); shcB.unpersist(); cand.unpersist()
    graft.util.Blocks.freeCheckpoint(sigA)
    graft.util.Blocks.freeCheckpoint(sigB)
    out
  }

  /** Capped cluster dedup — keep up to `k` exemplars per near-dup cluster
    * (the C4-style per-group cap, generalizing keep-one): rank docs within
    * their [[connectedComponents]] cluster by doc_id and keep the first `k`.
    * The window is keyed on the cluster label, so the ranking shuffles the
    * (pairs-sized) label table only — never the corpus. */
  def keepPerCluster(labels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    labels.withColumn("rk", row_number().over(
        Window.partitionBy(col("keeper_id")).orderBy(col("doc_id"))))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("keeper_id"), col("rk").cast("long").as("rk"))
  }

  /** 32-bit weighted SimHash from md5 hex digits: bit i of token t is
    * `parity(hexDigit_i(md5(t)))`; per-doc bit sums weighted by token count;
    * fingerprint bit i set iff the sum is positive. Engine-portable (md5 and
    * integer ops only). */
  def simhash32(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val tok = spread(df.select(idCol.as("doc_id"), TextStats.toks(textCol).as("__toks")))
      .select(col("doc_id"), explode(col("__toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
    // Parse the 32 hex digits in FOUR 8-digit conv() calls instead of 32
    // substring+conv pairs; each digit's parity is then one shift+mask on the
    // decoded long. Same bit definition as the oracle's per-digit
    // ('0x'||substr)::INT % 2 — digit i (1-based) lives in group i/8 at
    // nibble 7-(i-1)%8.
    val withMd5 = tok.withColumn("h", md5(col("tok")))
    val groups = (0 until 4).map(k =>
      conv(substring(col("h"), k * 8 + 1, 8), 16, 10).cast("long").as(s"g$k"))
    val withG = withMd5.select(Seq(col("doc_id"), col("cnt")) ++ groups: _*)
    val sums = (0 until 32).map { i =>
      val (k, j) = (i / 8, i % 8)
      sum(when(shiftright(col(s"g$k"), 4 * (7 - j)).bitwiseAND(lit(1L)) === 1,
        col("cnt")).otherwise(-col("cnt"))).as(s"s$i")
    }
    val s = withG.groupBy("doc_id").agg(sums.head, sums.tail: _*)
    val fp = (0 until 32).map(i => when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    s.select(col("doc_id"), fp.as("fp"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHam, banded: split the
    * 32-bit fingerprint into `bands` equal slices — by pigeonhole, any pair
    * within `maxHam < bands` bit flips shares at least one identical slice —
    * and equi-join on (band, slice) instead of an all-pairs nested loop. The
    * band key is the shuffle key at scale; the exact `bit_count` check then
    * runs only on bucket collisions. */
  /** The (band, bval) bucket layout of 32-bit fingerprints shared by
    * [[simhashPairs]] and `streaming/IncrementalSimhash` — ONE derivation,
    * so the store's probe keys can never drift from the batch operator's
    * (the [[bandBuckets]] discipline, SimHash-side). */
  private[graft] def simhashBandBuckets(fps: DataFrame, bands: Int): DataFrame = {
    require(32 % bands == 0, "bands must divide 32")
    val width = 32 / bands
    val mask = (1L << width) - 1
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("fp"), b * width).bitwiseAND(lit(mask)).as("bval"))
    }
    fps.select(col("doc_id"), col("fp"),
        explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("fp"), col("bk.band").as("band"),
        col("bk.bval").as("bval"))
  }

  def simhashPairs(fps: DataFrame, maxHam: Int, bands: Int = 4): DataFrame = {
    require(maxHam < bands, "pigeonhole needs maxHam < bands")
    val buckets = simhashBandBuckets(fps, bands)
    buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.doc_id") < col("b.doc_id"))
      .filter(expr(s"bit_count(a.fp ^ b.fp) <= $maxHam"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        expr("bit_count(a.fp ^ b.fp)").as("ham"))
      .distinct()
  }

  /** Bloom-filter n-gram decontamination screen — the constant-size
    * alternative to the exact shingle join of [[contamination]] for eval
    * suites whose SHINGLE SET is too large to join but whose BIT ARRAY is
    * not: every eval shingle sets `k` bit positions in an `m`-bit filter
    * (the Dolma / RedPajama production pattern), and a train shingle is
    * "possibly contaminating" iff all `k` of its positions are set. False
    * positives are inherent and PRICED (rate ≈ (1−e^{−kn/m})^k); false
    * negatives are impossible, which is the property a decontamination
    * screen needs.
    *
    * Determinism: positions are `k` disjoint 32-bit slices of `md5(s)`
    * reduced mod `m` — the repo's standard hashing idiom, reproduced
    * token-for-token by the SQL twin, so the screen (INCLUDING its false
    * positives) is bit-identical on every engine and partitioning.
    *
    * Shape at scale: the filter is materialized as the DISTINCT position
    * table (≤ m rows ≈ KBs — m-bounded NO MATTER how large the eval suite
    * grows, unlike [[contamination]]'s eval-shingle broadcast), and each of
    * the `k` membership probes is a broadcast hash join keyed on one
    * position column — the train corpus never shuffles; the only exchange is
    * the final map-side-combined per-doc count. Row width, not row count,
    * carries the k probes.
    *
    * @param trainSh (doc_id, s) train shingles, distinct per doc
    * @param evalSh  (doc_id, s) eval-suite shingles
    * @param m       filter size in bits (positions)
    * @param k       hash probes per shingle (≤ 4 — md5 yields four slices)
    * @param minHits flag a doc when at least this many shingles bloom-hit
    * @return (doc_id, shingle_ct, hit_ct, flagged) per train doc */
  def bloomScreen(trainSh: DataFrame, evalSh: DataFrame, m: Int = 1 << 14,
      k: Int = 3, minHits: Int = 3): DataFrame = {
    require(m >= 2, s"filter needs at least 2 positions, got $m")
    require(k >= 1 && k <= 4, s"md5 yields 4 32-bit slices, got k=$k")
    require(minHits >= 1, s"minHits must be >= 1, got $minHits")
    def pos(i: Int): Column =
      conv(substring(md5(col("s")), 1 + 8 * i, 8), 16, 10).cast("long") % m
    // the bit table feeds k separate broadcast probes (per-probe
    // projections defeat ReuseExchange) — checkpoint it so the eval-shingle
    // scan + position explode runs ONCE, not k times (the whole point when
    // the eval suite is large); the block is ≤ m rows ≈ KBs, reclaimed by
    // the ContextCleaner when the returned plan is collected
    val bits = evalSh
      .select(explode(array((0 until k).map(pos): _*)).as("pos"))
      .distinct()
      .localCheckpoint(true)
    bloomProbe(trainSh, bits, m, k, minHits)
  }

  /** The probe half of [[bloomScreen]], shared with the cross-batch store
    * form ([[graft.streaming.IncrementalBloom]]): screens `trainSh` against
    * an already-materialized set-bit table `bits(pos)` built with the SAME
    * (m, k). */
  private[graft] def bloomProbe(trainSh: DataFrame, bits: DataFrame, m: Int,
      k: Int, minHits: Int): DataFrame = {
    def pos(i: Int): Column =
      conv(substring(md5(col("s")), 1 + 8 * i, 8), 16, 10).cast("long") % m
    val probed = (0 until k).foldLeft(
      trainSh.select(Seq(col("doc_id")) ++ (0 until k).map(i => pos(i).as(s"__p$i")): _*)) {
      (acc, i) =>
        acc.join(broadcast(bits.select(col("pos").as(s"__p$i"), lit(1).as(s"__h$i"))),
          Seq(s"__p$i"), "left_outer")
    }
    val allSet = (0 until k).map(i => col(s"__h$i").isNotNull).reduce(_ && _)
    probed.groupBy("doc_id").agg(
        count(lit(1)).as("shingle_ct"),
        sum(when(allSet, 1L).otherwise(0L)).as("hit_ct"))
      .withColumn("flagged", col("hit_ct") >= minHits)
  }
}
