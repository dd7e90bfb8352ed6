package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation operators for training-data pipelines: deterministic
  * sampling / split assignment and quantile bucketing.
  *
  * Scale posture: sampling and split assignment are stateless row-local
  * predicates on a content hash — no shuffle, reproducible across runs,
  * engines and partitionings (md5 of the id, NOT rand(): a reshuffled rerun
  * must keep the same rows). Quantile bucketing deliberately avoids
  * `ntile(n) OVER (ORDER BY ...)`, whose empty-partition global window would
  * funnel 100 TB through one task; instead it aggregates the (bounded-domain)
  * length histogram, ranks THAT small table, and broadcast-joins bucket ids
  * back — the classic scale-safe histogram method. Ties share a bucket, which
  * is what makes the result independent of row order. */
object Curation {

  /** Uniform hash bucket 0..mod−1 from the row id — md5-based so every
    * engine agrees (same trick as the SimHash oracle). Eight hex digits: a
    * 32-bit value mod 100 carries ~4e-8 relative bias (a 16-bit one would be
    * a very real ~0.1 %). ONE definition — pctBucket and packBins must never
    * drift apart on the engine-portability-critical expression. */
  private def hashBucket(idCol: Column, mod: Int): Column =
    conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10).cast("long") % mod

  private def pctBucket(idCol: Column): Column = hashBucket(idCol, 100)

  /** Deterministic `pct`% sample: keep rows whose id-hash bucket falls below
    * the rate. Rerunning (or re-partitioning, or re-ingesting) selects the
    * SAME rows — the property curation pipelines need from a sample. */
  def deterministicSample(df: DataFrame, idCol: Column, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, "pct must be 0..100")
    df.filter(pctBucket(idCol) < pct)
  }

  /** Deterministic WEIGHTED sample: keep each row with probability equal to
    * its `weightCol` (in [0, 1]) — e.g. quality-weighted data selection,
    * where high-quality docs are kept preferentially. The coin flip is the
    * row's 32-bit id hash scaled to [0, 1) compared against the weight:
    * row-local, shuffle-free, and the SAME rows survive on every run,
    * partitioning, and engine (the identical double arithmetic on both
    * sides of the oracle). */
  def weightedSample(df: DataFrame, idCol: Column, weightCol: Column): DataFrame =
    df.filter(
      conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10).cast("long")
        .cast("double") / lit(4294967296.0) < weightCol)

  /** Deterministic train/validation/test assignment from cumulative
    * percentage cuts, e.g. `Seq("train" -> 80, "val" -> 90, "test" -> 100)`.
    * Row-local, no shuffle, stable under re-ingestion. */
  def hashSplit(df: DataFrame, idCol: Column,
      cuts: Seq[(String, Int)], as: String = "split"): DataFrame = {
    require(cuts.nonEmpty && cuts.last._2 == 100, "last cut must reach 100")
    require(cuts.map(_._2) == cuts.map(_._2).sorted, "cuts must be ascending")
    val b = pctBucket(idCol)
    val expr = cuts.init.foldRight(lit(cuts.last._1): Column) {
      case ((name, cut), rest) => when(b < cut, name).otherwise(rest)
    }
    df.withColumn(as, expr)
  }

  /** Leakage-safe (cluster-aware) train/val/test split: every near-dup
    * CLUSTER lands wholly in one split. Hashing per DOCUMENT would let a
    * training example's near-duplicate fall into test — the classic
    * contamination that silently inflates eval scores; hashing the cluster
    * KEEPER instead moves the whole clique together. `labels` is a
    * (doc_id, keeper_id) table (e.g. connected components over near-dup
    * pairs); docs absent from it are their own cluster (keeper = doc_id).
    * The split itself is [[hashSplit]]'s deterministic md5 percentile,
    * applied to the keeper id.
    *
    * Scale: one left join on the doc id (labels are duplicate-set-sized, so
    * AQE broadcasts them until they outgrow the threshold) plus the
    * row-local hash — no other shuffle.
    *
    * @return df + (keeper_id, split) */
  def leakageSafeSplit(df: DataFrame, idCol: Column, labels: DataFrame,
      cuts: Seq[(String, Int)], as: String = "split"): DataFrame = {
    // loud contracts: a pre-existing keeper_id would make the coalesce
    // ambiguous, and the output column must not silently shadow an input
    require(!df.columns.contains("keeper_id"),
      "df already has a keeper_id column — drop/rename it, or pass it as labels")
    require(!df.columns.contains(as), s"df already has a '$as' column")
    require(!df.columns.contains("__lss_id"),
      "df already has a __lss_id column (internal working name) — drop/rename it")
    // exact duplicate label rows are harmless upstream noise — fold them;
    // conflicting keepers for one doc would still be malformed input, and
    // surface as duplicated doc rows in the output
    val keyed = df.withColumn("__lss_id", idCol)
      .join(labels.select(col("doc_id").as("__lss_id"), col("keeper_id")).distinct(),
        Seq("__lss_id"), "left_outer")
      .withColumn("keeper_id", coalesce(col("keeper_id"), col("__lss_id")))
      .drop("__lss_id")
    hashSplit(keyed, col("keeper_id"), cuts, as)
  }

  /** Deterministic cumulative bin packing — the "documents → fixed-budget
    * training sequences" grouping step: docs are spread across `groups`
    * hash groups (the parallel unit — packing is inherently sequential, so
    * the sequential scan runs per group, never globally), ordered by id
    * within the group, and assigned `bin = floor(tokens_before / budget)`.
    * A doc straddling a boundary goes wholly to the bin its cumulative
    * offset lands in, so a bin overfills by at most one doc — the standard
    * approximate-packing contract (exact first-fit would need a sequential
    * pass; this keeps one keyed window per group and nothing else).
    * Deterministic across runs/partitionings/engines (md5 group, id order).
    *
    * @return input + (pack_group, bin) */
  def packBins(df: DataFrame, idCol: Column, tokensCol: Column,
      budget: Int, groups: Int = 32): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(groups >= 1, s"groups must be >= 1, got $groups")
    val grp = hashBucket(idCol, groups).as("pack_group")
    val w = Window.partitionBy(col("pack_group")).orderBy(idCol)
    df.withColumn("pack_group", grp)
      .withColumn("__before",
        coalesce(sum(tokensCol).over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("bin", floor(col("__before") / budget))
      .drop("__before")
  }

  /** Per-group quota cap — the C4/RefinedWeb "at most k documents per
    * domain/source" curation step: rank rows within `group` by `order` and
    * keep the first `k`. The rank-filter shape triggers Spark's
    * WindowGroupLimit: each map task pre-prunes to its local top-k BEFORE
    * the shuffle, so a hot group (one domain dominating the crawl) ships
    * k·#maps rows, not its full row count — the skew protection is in the
    * plan, not a salt (`PlanSpec` pins the operator).
    *
    * @param order must be a deterministic total order within a group
    *              (extend with the id column for ties) */
  def quotaCap(df: DataFrame, group: Column, k: Int, order: Seq[Column]): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.withColumn("rk",
        row_number().over(Window.partitionBy(group).orderBy(order: _*)).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Target-mixture apportionment — the explicit-weights data-mixing step
    * of a pretraining recipe ("50 % web, 30 % code, 20 % books, N docs
    * total", the Pile/DoReMi-style mixture SPEC, as opposed to
    * [[temperatureSample]]'s size-derived `n_s^α` rule): split an exact doc
    * `budget` across sources in proportion to integer `weights` using
    * Hamilton largest-remainder apportionment — base_s = ⌊budget·w_s/W⌋,
    * the ⌊⌋-lost seats go one each to the largest remainders (ties → source
    * asc) — then cap each quota at the source's availability and keep each
    * source's first `quota_s` docs in deterministic md5-of-id order.
    *
    * Single-round by design: seats a source cannot fill (capped, or a
    * weighted source absent from the corpus) are REPORTED as shortfall via
    * the output's `quota`/`rk` structure rather than silently redistributed
    * — a mixture spec that cannot be met should be visible, not papered
    * over (re-run with adjusted weights to redistribute).
    *
    * All arithmetic is exact integers (the one division is an
    * integer-valued quotient, exact in double far below 2^53 — guarded),
    * the selection order is the md5 rank both engines share, so the kept
    * set is a pure function of (corpus, weights, budget) — stable under
    * reruns, repartitioning, and engines. Scale shape: one metadata-sized
    * per-source aggregate + a ≤ |weights|-row apportionment joined
    * broadcast back; the corpus pays the per-source rank window (see
    * [[quotaCap]]'s WindowGroupLimit note — map-side top-quota pre-prune
    * guards the hot source).
    *
    * @param weights (source, weight ≥ 1); sources not listed are excluded
    * @return kept rows: input columns + (rk, quota) — rk ≤ quota ≤
    *         apportioned seats */
  def mixApportion(df: DataFrame, idCol: Column, srcCol: Column,
      weights: Seq[(String, Long)], budget: Long): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.forall(_._2 >= 1), s"weights must be >= 1: $weights")
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate sources in $weights")
    val totW = weights.map(_._2).sum
    require(budget >= 0 && budget <= (1L << 52) / math.max(1L, weights.map(_._2).max),
      s"budget $budget × max weight overflows exact double arithmetic")
    val spark = df.sparkSession
    val w = spark.createDataFrame(weights).toDF("__src", "__wt")
    val avail = df.groupBy(srcCol.as("__src")).agg(count(lit(1)).as("__n"))
    // weighted-but-absent sources stay in the apportionment (their seats
    // cap to availability 0 below) so the seat math is spec-faithful
    val seats = w.join(avail, Seq("__src"), "left_outer")
      .withColumn("__n", coalesce(col("__n"), lit(0L)))
      .withColumn("__prod", lit(budget) * col("__wt"))
      .withColumn("__rem", pmod(col("__prod"), lit(totW)))
      .withColumn("__base",
        ((col("__prod") - col("__rem")) / lit(totW)).cast("long"))
    val apportioned = seats
      .withColumn("__left",
        lit(budget) - sum(col("__base")).over(Window.partitionBy()))
      .withColumn("__rrk", row_number().over(
        Window.orderBy(col("__rem").desc, col("__src"))))
      .withColumn("quota",
        least(col("__base") + when(col("__rrk") <= col("__left"), 1L)
          .otherwise(0L), col("__n")))
      .select(col("__src"), col("quota"))
    df.withColumn("rk", row_number().over(
        Window.partitionBy(srcCol)
          .orderBy(md5(idCol.cast("string")), idCol)).cast("long"))
      .join(broadcast(apportioned), srcCol === col("__src"))
      .filter(col("rk") <= col("quota"))
      .drop("__src")
  }

  /** UniMax epoch-capped mixture allocation (Chung et al. 2023) — the
    * BUDGET-driven multilingual mixing rule, complementing
    * [[mixApportion]]'s explicit-weights spec: spread a total example
    * `budget` as uniformly as possible across languages, except no language
    * may be drawn for more than `maxEpochs` passes over its data. Exact
    * integer water-filling: languages sorted by capacity `cap = n·maxEpochs`
    * ascending (ties → lang asc); a language SATURATES (gets its full cap)
    * iff `cap_i·(k−i) + P_i ≤ budget` (P = running capacity sum — the
    * classic level condition, monotone in i so the saturated set is a
    * prefix); the remaining budget splits uniformly over the `u` unsaturated
    * languages as `R div u` each, the `R mod u` leftover going one each to
    * the smallest-capacity unsaturated languages. Unfillable budget (all
    * languages saturated) is VISIBLE as Σalloc < budget, the
    * [[mixApportion]] no-silent-redistribution stance.
    *
    * The allocation is then MATERIALIZED doc-level: within a language every
    * doc repeats `alloc div n` times and the first `alloc mod n` docs in
    * md5-of-id order repeat once more — so `repeats` sums exactly to the
    * language's allocation, 0 marks docs a sub-epoch allocation drops, and
    * the whole mixture is a pure function of (corpus, budget, maxEpochs):
    * stable under reruns, repartitioning, and engines.
    *
    * Shape at scale: the water-filling runs on the LANGUAGE table (k rows —
    * its unpartitioned windows are metadata-sized by construction), joins
    * back broadcast; the corpus pays one per-language rank window.
    *
    * @return input rows + (rk, alloc, repeats) */
  def unimaxRepeats(df: DataFrame, idCol: Column, langCol: Column,
      budget: Long, maxEpochs: Int): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    val caps = df.groupBy(langCol.as("__lang")).agg(count(lit(1)).as("__n"))
      .withColumn("__cap", col("__n") * maxEpochs)
    val capOrd = Window.orderBy(col("__cap"), col("__lang"))
    val o = caps
      .withColumn("__i", row_number().over(capOrd).cast("long"))
      .withColumn("__p", sum(col("__cap")).over(
        capOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__k", count(lit(1)).over(Window.partitionBy()))
      .withColumn("__sat",
        col("__cap") * (col("__k") - col("__i")) + col("__p") <= budget)
    val ag = o.agg(
      coalesce(sum(when(col("__sat"), 1L).otherwise(0L)), lit(0L)).as("__j"),
      coalesce(max(when(col("__sat"), col("__p"))), lit(0L)).as("__pj"))
    val alloc = o.crossJoin(broadcast(ag))
      .withColumn("__u", greatest(col("__k") - col("__j"), lit(1L)))
      .withColumn("__r", lit(budget) - col("__pj"))
      .withColumn("alloc", when(col("__sat"), col("__cap")).otherwise(
        expr("__r div __u") +
          when(col("__i") - col("__j") <= col("__r") % col("__u"), 1L)
            .otherwise(0L)))
      .select(col("__lang"), col("__n"), col("alloc"))
    df.withColumn("rk", row_number().over(
        Window.partitionBy(langCol)
          .orderBy(md5(idCol.cast("string")), idCol)).cast("long"))
      .join(broadcast(alloc), langCol === col("__lang"))
      .withColumn("repeats",
        expr("alloc div __n") +
          when(col("rk") <= col("alloc") % col("__n"), 1L).otherwise(0L))
      .drop("__lang", "__n")
  }

  /** Deterministic STRATIFIED sample: per-stratum keep rates (percent), e.g.
    * rebalancing a multilingual corpus (`en` → 60%, `zh` → 40%, rest 20%).
    * Same md5 bucket as [[deterministicSample]], so the kept set is stable
    * under reruns/repartitioning/re-ingestion AND nested samples compose:
    * a 10% sample is a subset of the 60% sample of the same stratum. */
  def stratifiedSample(df: DataFrame, idCol: Column, stratum: Column,
      rates: Seq[(String, Int)], defaultPct: Int): DataFrame = {
    require((defaultPct +: rates.map(_._2)).forall(p => p >= 0 && p <= 100),
      "rates must be 0..100")
    val rate = rates.foldRight(lit(defaultPct): Column) {
      case ((value, pct), rest) => when(stratum === value, pct).otherwise(rest)
    }
    df.filter(pctBucket(idCol) < rate)
  }

  /** Deterministic FIXED-SIZE sample: the k rows with the smallest id
    * hashes per stratum — the held-out-eval-set primitive the rate-based
    * samples can't provide (a rate keeps `pct%` of whatever arrives; an
    * eval set needs EXACTLY k docs no matter how the corpus grows). The
    * md5 order makes it a uniform random sample that is stable under
    * reruns/repartitioning and MERGEABLE: bottomK(A ∪ B) =
    * bottomK(bottomK(A) ∪ bottomK(B)) — the property the cross-batch fold
    * ([[graft.streaming.IncrementalSample]]) and distributed execution
    * both ride (Spark's rank-limit pushdown turns the window filter into
    * per-partition top-k before the stratum shuffle, so only k·partitions
    * rows ever move). Duplicate (stratum, id) rows collapse first — set
    * semantics, so re-ingestion never double-counts.
    * @return (g, id, h) — stratum, id, and its sample hash */
  def bottomKSample(df: DataFrame, idCol: Column, stratumCol: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.select(stratumCol.cast("string").as("g"), idCol.cast("long").as("id"))
      .distinct()
      .withColumn("h",
        conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
          .cast("long"))
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("g")).orderBy(col("h"), col("id"))))
      .filter(col("__rk") <= k)
      .select(col("g"), col("id"), col("h"))
  }

  /** Temperature-flattened mixture sampling — the multi-source rebalancing
    * step of LLM pretraining mixes (the `p_s ∝ n_s^α` rule): a source's
    * share of the kept corpus is proportional to its size raised to
    * `alpha < 1`, which up-weights small sources relative to raw
    * proportional sampling. `targetPct` sets the overall keep budget; the
    * per-source keep rate is `min(1, budget · p_s / n_s)`.
    *
    * Scale posture: one metadata-sized per-source aggregate (sources are a
    * bounded domain), rates broadcast back, then the same row-local md5
    * coin flip as [[weightedSample]] — the corpus itself never shuffles and
    * the kept set is stable under reruns/repartitioning/re-ingestion.
    *
    * Determinism across engines: counts stay integral; the α-weight uses
    * `sqrt` when `alpha == 0.5` (IEEE-exact in every engine, unlike `pow`);
    * the weight sum goes through DECIMAL(38,18) so its value cannot depend
    * on float addition order; the rate expression is left-associated
    * exact-rounded ops only. An oracle can therefore reproduce the kept set
    * bit-for-bit. */
  def temperatureMix(df: DataFrame, idCol: Column, sourceCol: Column,
      alpha: Double, targetPct: Int): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(targetPct >= 0 && targetPct <= 100, "targetPct must be 0..100")
    val spark = df.sparkSession
    val stats = df.groupBy(sourceCol.as("__src"))
      .agg(count(lit(1)).as("__n"))
    val aw = if (alpha == 0.5) sqrt(col("__n").cast("double"))
      else pow(col("__n").cast("double"), alpha)
    val weights = stats.withColumn("__w", aw)
    val tot = weights.agg(sum(col("__n")).as("__tot"),
      sum(col("__w").cast("decimal(38,18)")).cast("double").as("__wsum"))
    val rates = weights.crossJoin(broadcast(tot))
      .select(col("__src"),
        least(lit(1.0),
          lit(targetPct).cast("double") / lit(100.0) * col("__tot").cast("double")
            / col("__wsum") * col("__w") / col("__n").cast("double")).as("__rate"))
    df.join(broadcast(rates), sourceCol === col("__src"))
      .filter(
        conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10).cast("long")
          .cast("double") / lit(4294967296.0) < col("__rate"))
      .drop("__src", "__rate")
  }

  /** Global ordered running total WITHOUT a global single-task window — the
    * distributed prefix-sum: deterministic arithmetic id ranges give each
    * task a contiguous chunk (phase 1: per-chunk running sums in parallel),
    * the per-chunk totals — `parts` rows — are prefix-summed on one tiny
    * table (phase 2), and the offsets broadcast back (phase 3). The result
    * equals `SUM(v) OVER (ORDER BY id ROWS UNBOUNDED PRECEDING ... 1
    * PRECEDING)` but the corpus-sized data only ever moves through ONE
    * range shuffle, never a single task. Chunk ranges come from (min, max)
    * of the id — a 1-row metadata aggregate — so the assignment is
    * deterministic (no sampled range boundaries to pin).
    *
    * Skew note: arithmetic ranges assume ids are roughly uniform over
    * [min, max] (true for ingestion-assigned ids). Pathologically clustered
    * ids concentrate chunks; raise `parts` or pre-map ids if so.
    *
    * @return (id, v, cum_before) with `cum_before` = sum of `v` over all
    *         rows with smaller id */
  def globalPrefix(df: DataFrame, idCol: Column, valCol: Column,
      parts: Int = 64): DataFrame = {
    require(parts >= 1, s"parts must be >= 1, got $parts")
    val base = df.select(idCol.cast("long").as("id"), valCol.cast("long").as("v"))
    val mm = base.agg(min(col("id")).as("mn"), max(col("id")).as("mx")).collect()(0)
    if (mm.isNullAt(0)) return base.withColumn("cum_before", lit(0L))
    val (mn, mx) = (mm.getLong(0), mm.getLong(1))
    val span = math.max(1L, (mx - mn) / parts + 1)
    val withPid = base.withColumn("pid", ((col("id") - mn) / span).cast("int"))
    val wIn = Window.partitionBy(col("pid")).orderBy(col("id"))
    val offs = withPid.groupBy("pid").agg(sum(col("v")).as("psum"))
    val wOff = Window.orderBy(col("pid")) // parts rows — single-task is fine HERE
    val offsets = offs
      .withColumn("offset",
        coalesce(sum(col("psum")).over(wOff.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("pid"), col("offset"))
    withPid
      .withColumn("__run", sum(col("v")).over(wIn)) // inclusive, within chunk
      .join(broadcast(offsets), Seq("pid"))
      .select(col("id"), col("v"),
        (col("__run") + col("offset") - col("v")).as("cum_before"))
  }

  /** Cut a corpus to a global token budget: keep the prefix of docs in
    * ascending-id order whose cumulative token offset starts inside the
    * budget (the doc straddling the boundary is kept whole — same
    * approximate contract as [[packBins]]). Built on [[globalPrefix]], so
    * the cut is exact, deterministic, and never funnels the corpus through
    * one task. */
  def tokenBudget(df: DataFrame, idCol: Column, tokensCol: Column,
      budget: Long, parts: Int = 64): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    globalPrefix(df, idCol, tokensCol, parts).filter(col("cum_before") < budget)
  }

  /** Deterministic global shuffle for training-order export: seed-keyed md5
    * assigns each row a shard and a position within it — the "shuffle 100 TB
    * reproducibly into N output shards" step before sequence packing.
    * Position ranks run per shard (parallel unit = shard; no global
    * order-by), and the whole layout is a pure function of (id, seed): a
    * rerun, a different partitioning, or a different engine lays out the
    * corpus identically. Re-shuffling is changing `seed`, not re-rolling.
    *
    * @return input + (shard, pos) — pos is 1-based within shard */
  def shardShuffle(df: DataFrame, idCol: Column, seed: Long,
      shards: Int): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val key = md5(concat_ws(":", lit(seed), idCol.cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("__key"), idCol)
    df.withColumn("__key", key)
      .withColumn("shard",
        conv(substring(col("__key"), 1, 8), 16, 10).cast("long") % shards)
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__key")
  }

  /** Exact `n`-quantile bucket (1-based) of `length(textCol)` per row,
    * computed scale-safe: histogram of distinct lengths (bounded domain) →
    * cumulative counts over that SMALL table → broadcast the length→bucket
    * map back onto the corpus. `bucket = floor(n · rows_before / total) + 1`,
    * so ties (equal lengths) always share a bucket and the assignment is
    * independent of row order — unlike `ntile`, which splits ties by
    * partition-arrival order AND needs a global single-task sort. */
  def lengthBuckets(df: DataFrame, idCol: Column, textCol: Column, n: Int): DataFrame = {
    val lens = df.select(idCol.as("doc_id"), length(textCol).cast("long").as("n_chars"))
    val hist = lens.groupBy("n_chars").agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("n_chars")) // small table: one row per distinct length
    val cum = hist
      .withColumn("cum_before",
        coalesce(sum(col("cnt")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("total",
        sum(col("cnt")).over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("n_chars"),
        (floor(lit(n) * col("cum_before") / col("total")) + 1).as("bucket"))
    lens.join(broadcast(cum), Seq("n_chars"))
      .select(col("doc_id"), col("n_chars"), col("bucket"))
  }

  /** Corpus snapshot diff — dataset-versioning's `git status`: classify every
    * doc id across two corpus versions as added / removed / changed /
    * unchanged by content fingerprint. One co-keyed full-outer join (both
    * sides shuffle once on the id); the fingerprint rides the scan, so the
    * texts themselves never move twice. Feeding the "changed ∪ added" set to
    * an incremental pipeline is what keeps a 100 TB refresh from
    * reprocessing the unchanged 99 %.
    *
    * @return (doc_id, status) for every id present in either version */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame, idCol: Column,
      textCol: Column): DataFrame = {
    val o = oldDf.select(idCol.as("doc_id"), md5(textCol).as("__oh"))
    val n = newDf.select(idCol.as("doc_id"), md5(textCol).as("__nh"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("__oh").isNull, "added")
          .when(col("__nh").isNull, "removed")
          .when(col("__oh") === col("__nh"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Deterministic negative-pair sampling — contrastive-training data prep
    * (each anchor needs `m` "random" non-matching partners, and a rerun /
    * re-partition / re-ingest must produce the SAME pairs so training is
    * reproducible).
    *
    * Ring construction: rows land in `buckets` hash buckets, are ranked
    * inside their bucket by (id-hash, id) — a pseudo-random but deterministic
    * ring order — and anchor rank r pairs with ranks r+1..r+m (mod bucket
    * size). Within-bucket windows and a (bucket, rank) equi self-join: no
    * global rank, no cross-bucket traffic, no rand(). Partner j = the j-th
    * successor on a hash-shuffled ring, so partners are uniform over the
    * bucket and never repeat while m < bucket size (anchors in smaller
    * buckets just yield fewer pairs — the self/duplicate guard filters them).
    * Size `buckets` ≈ shuffle width at the target scale: each bucket's rank
    * window sorts one bucket, so buckets bound the per-task sort exactly like
    * shuffle partitions bound a join.
    *
    * @return (a_id, j, b_id) — j in 1..m, b_id the j-th ring successor */
  def negativePairs(df: DataFrame, idCol: Column, m: Int = 1,
      buckets: Int = 16): DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    def h(c: Column): Column =
      conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")
    val ring = df.select(idCol.as("id"))
      .withColumn("b", h(col("id")) % buckets)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("b")).orderBy(h(col("id")), col("id"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("b"))))
    val anchors = ring.select(col("b"), col("id").as("a_id"), col("n"), col("rk"),
        explode(sequence(lit(1L), lit(m.toLong))).as("j"))
      .filter(col("j") < col("n")) // ring smaller than m: stop before wrapping to self
      .withColumn("p_rk", (col("rk") - 1 + col("j")) % col("n") + 1)
    anchors.join(ring.select(col("b"), col("rk").as("p_rk"), col("id").as("b_id")),
        Seq("b", "p_rk"))
      .select(col("a_id"), col("j"), col("b_id"))
  }

  /** DSIR-style importance screen (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score each raw document by
    * how much its hashed-unigram profile looks like a TARGET exemplar corpus
    * versus the raw corpus itself, and keep the target-like ones — the
    * "select web data that resembles Wikipedia/books" pass.
    *
    * DSIR's architecture is kept intact: tokens hash into `buckets` feature
    * buckets (collision-tolerant by design — the hashed n-gram trick), an
    * add-one-smoothed unigram model is built over the buckets for the target
    * and the raw corpus, and each document is scored by contrasting the two
    * models over its own tokens. One deliberate deviation, documented for the
    * record: the paper scores Σ log(p_tgt/p_raw) per token; float log sums
    * are partition-order-dependent and engine-ULP-fragile, so the screen
    * contrasts the two SMOOTHED MASS SUMS instead —
    *   tgt_mass = Σ_tok (ct_tgt[b(tok)] + 1),  raw_mass = Σ_tok (ct_raw[b(tok)] + 1)
    * and keeps a doc iff
    *   tgt_mass · rawTotal · den ≥ raw_mass · tgtTotal · num
    * i.e. normalized-mass ratio ≥ num/den (totals = corpus token count +
    * `buckets`, the add-one normalizers; 1/1 = "at least as target-like as
    * raw-like"). Exact integer cross-multiplication in
    * DECIMAL(38,0) — bit-identical on every engine and partitioning. Rank
    * order differs from the true log-ratio score, but the selection
    * structure, feature hashing, and smoothing are DSIR's; swap the mass
    * contrast for a float log-ratio scorer when ULP determinism is not
    * required.
    *
    * Shape at scale: both bucket-count tables are ≤ `buckets` rows
    * (hash-grouped with map-side combine, then BROADCAST — never shuffle the
    * corpus on a model join); the per-doc mass rollup is the only
    * corpus-sized shuffle (one exchange on the id). The target corpus is
    * typically tiny (exemplar set) and the raw corpus arbitrarily large.
    *
    * Tokenless docs (null text — no token rows at all): one row with the
    * degenerate smoothing-only verdict (n_toks = 0, zero masses, keep =
    * (0 ≥ 0) = true), never a dropped or NULL row — the SAME contract as
    * [[graft.streaming.IncrementalDsir.screenBatch]], so a filter-on-keep
    * pipeline behaves identically in batch and streaming form. (An empty
    * STRING is not tokenless: it tokenizes to one empty token.)
    *
    * @return (doc_id, n_toks, tgt_mass, raw_mass, keep) one row per raw doc */
  def dsirScreen(raw: DataFrame, target: DataFrame, idCol: Column,
      textCol: Column, buckets: Int = 1 << 16,
      num: Int = 1, den: Int = 1): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(num >= 1 && den >= 1, s"threshold must be positive, got $num/$den")
    def bucketOf(tok: Column): Column =
      conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % buckets
    def toks(df: DataFrame): DataFrame = df
      .select(idCol.as("doc_id"), explode(TextStats.toks(textCol)).as("tok"))
      .select(col("doc_id"), bucketOf(col("tok")).as("b"))
    def model(df: DataFrame): DataFrame =
      toks(df).groupBy("b").agg(count(lit(1)).as("ct"))
    val tgtModel = model(target)
    val rawModel = model(raw)
    // add-one normalizers: corpus token count + one per bucket. The sum is
    // coalesced so an EMPTY target or raw corpus degrades to the
    // smoothing-only model (total = buckets) instead of a NULL total that
    // would NULL every keep verdict — matching IncrementalDsir.screenBatch
    // and the SQL twin's COALESCE(SUM(ct), 0) + buckets.
    val totals = tgtModel.agg((coalesce(sum(col("ct")), lit(0L)) + buckets).as("__tt"))
      .crossJoin(rawModel.agg((coalesce(sum(col("ct")), lit(0L)) + buckets).as("__rt")))
    val scored = toks(raw)
      .join(broadcast(tgtModel.withColumnRenamed("ct", "__tc")), Seq("b"), "left_outer")
      .join(broadcast(rawModel.withColumnRenamed("ct", "__rc")), Seq("b"), "left_outer")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_toks"),
        sum(coalesce(col("__tc"), lit(0L)) + 1).as("tgt_mass"),
        sum(coalesce(col("__rc"), lit(0L)) + 1).as("raw_mass"))
    // re-anchor on the raw-doc spine: a tokenless (null-text) doc produces
    // no token rows, and without this join it would simply vanish from the
    // output — while the streaming twin (screenBatch) emits its degenerate
    // verdict. One row per raw doc, keep never NULL, in both forms.
    raw.select(idCol.as("doc_id")).join(scored, Seq("doc_id"), "left_outer")
      .crossJoin(broadcast(totals))
      .withColumn("n_toks", coalesce(col("n_toks"), lit(0L)))
      .withColumn("tgt_mass", coalesce(col("tgt_mass"), lit(0L)))
      .withColumn("raw_mass", coalesce(col("raw_mass"), lit(0L)))
      .withColumn("keep",
        col("tgt_mass").cast("decimal(38,0)") * col("__rt") * den >=
          col("raw_mass").cast("decimal(38,0)") * col("__tt") * num)
      .select(col("doc_id"), col("n_toks"), col("tgt_mass"), col("raw_mass"),
        col("keep"))
  }

  /** Longest-match URL policy screen — the robots.txt / ban-list decision
    * (RFC 9309 §2.2.2) evaluated corpus-side: for each document URL, the
    * most specific matching rule for its canonical host decides, with the
    * RFC's two tie rules — the LONGEST matching path prefix wins, and at
    * equal length Allow beats Disallow (least-restrictive). No matching
    * rule, or a host with no rules at all, defaults to allowed. Matching
    * runs on the CANONICAL path+query ([[TextStats.canonicalizeUrl]]'s
    * output after the authority; the root path matches as `/`), so two
    * surface forms of one page always get one verdict.
    *
    * Scale shape: the rule set (small — ban lists and robots snapshots are
    * KB-scale per host) is grouped into ONE array row per host and
    * broadcast, so the corpus never shuffles: the decision is a row-local
    * fold over the host's rules. The fold is max-by-(prefix length, allow)
    * — commutative and associative, so the undefined `collect_list` order
    * cannot change the verdict; `aggregate`/`filter` run interpreted
    * (CodegenFallback) but touch only the ≤ |rules-per-host| array, not
    * the text. A SQL engine replays the same decision relationally
    * (join + rank by length desc, allow desc) — equal because both sides
    * compute the same argmax under a total preference order.
    *
    * @param rules (domain, prefix, allow) — domain matches
    *              [[TextStats.urlHost]]'s canonical form
    * @return input + (domain, path, allowed) */
  def robotsScreen(df: DataFrame, urlCol: Column, rules: DataFrame): DataFrame = {
    val ragg = rules.groupBy(col("domain")).agg(
      collect_list(struct(col("prefix").as("p"),
        col("allow").cast("boolean").as("a"))).as("__rules"))
    val canon = TextStats.canonicalizeUrl(urlCol)
    val path0 = regexp_extract(canon,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    val init = struct(lit(-1).as("len"), lit(true).as("a"))
    df.withColumn("domain", TextStats.urlHost(urlCol))
      .withColumn("path", when(path0 === "", lit("/")).otherwise(path0))
      .join(broadcast(ragg), Seq("domain"), "left_outer")
      .withColumn("allowed", when(col("__rules").isNull, lit(true))
        .otherwise(aggregate(
          filter(col("__rules"), r => startswith(col("path"), r("p"))),
          init,
          (acc, r) => when(
            length(r("p")) > acc("len") ||
              (length(r("p")) === acc("len") && r("a")),
            struct(length(r("p")).as("len"), r("a").as("a"))).otherwise(acc),
          acc => acc("a"))))
      .drop("__rules")
  }
}
