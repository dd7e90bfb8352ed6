package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling — the `ANALYZE TABLE`-style statistics pass a pipeline
  * runs before planning a large ingest (row counts, per-column null rates,
  * cardinalities, value ranges feed partition sizing, skew prediction, and
  * data-quality gates).
  *
  * Scale posture: ONE pass over the table computes every column's stats in a
  * single aggregation; the per-column stacking happens on the one resulting
  * row, not on the data. Exact distinct counts make this a multi-distinct
  * aggregate, which Spark plans with an `Expand` of (k+1)× the input rows —
  * the standard exact plan; swap `count_distinct` for
  * `approx_count_distinct` when 2 % error is acceptable at 100 TB and the
  * Expand multiplier matters. Min/max compare the STRING rendering (cast
  * before compare) so the contract is identical for every column type and
  * engine-portable.
  */
object Profile {

  /** Per-column profile of `cols`: non-null count, distinct count (exact by
    * default), and lexicographic min/max of the string rendering.
    *
    * @param approx estimate distinct counts with HLL++
    *               (`approx_count_distinct`, `rsd` relative error) instead of
    *               exactly. The exact plan Expands the input ×(k+1) for k
    *               distinct columns (measured ~7× wall at 10× rows —
    *               SCALING.md); the approx plan keeps the scan single-width
    *               (one fixed-size sketch per column, map-side combined), the
    *               right trade at 100 TB when ~2 % error is acceptable.
    * @param rsd    maximum estimation error of HLL++ (default 0.02); only
    *               read when `approx` is set
    * @return one row per column: (col_name, n_nonnull, n_distinct, min_s, max_s) */
  def profile(df: DataFrame, cols: Seq[String], approx: Boolean = false,
      rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      val nd = if (approx) approx_count_distinct(col(c), rsd)
               else countDistinct(col(c))
      Seq(count(col(c)).as(s"__nn_$c"),
        nd.as(s"__nd_$c"),
        min(col(c).cast("string")).as(s"__mn_$c"),
        max(col(c).cast("string")).as(s"__mx_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("col_name"), col(s"__nn_$c").as("n_nonnull"),
          col(s"__nd_$c").as("n_distinct"), col(s"__mn_$c").as("min_s"),
          col(s"__mx_$c").as("max_s"))
      }: _*)).as("__p"))
      .select(col("__p.*"))
  }

  /** KMV (k-minimum-values) distinct-count sketch, per group — the
    * DETERMINISTIC cardinality estimator (Bar-Yossef et al. 2002): hash
    * every value to a 32-bit md5 slice, keep the k SMALLEST distinct
    * hashes, estimate `(k−1)·2³² / h_k` from the k-th smallest. Unlike
    * HLL++ (`approx_count_distinct`), every step is exact integer
    * arithmetic on a deterministic hash — the estimate is a pure function
    * of the value SET, reproducible bit-for-bit on any engine (the SQL
    * twin hash-matches it), mergeable by construction (k smallest of a
    * union = k smallest of the per-partition k-smallest — which is exactly
    * how the rank-limit window computes it distributed), and stable under
    * reruns/repartitioning. Standard error ≈ 1/√(k−2).
    *
    * Groups with < k distinct values report their EXACT count (`h_k` is
    * then the max hash, not a k-th order statistic — the estimator is
    * undefined; the count is free from the same pass).
    *
    * Shape at scale: distinct (group, hash) → per-group rank window — the
    * rank-≤-k filter plans as WindowGroupLimit, so each map task forwards
    * at most k rows per group before the shuffle — → one k-row-per-group
    * rollup. State is O(k) per group at every stage; the exact
    * `count_distinct` alternative shuffles the full distinct set.
    *
    * @return (group cols..., n_seen, kmv_est) — n_seen = min(k, distinct),
    *         kmv_est = exact count below k, else the KMV estimate */
  /** Fixed-bin histogram quantile estimates, per group — the DETERMINISTIC
    * mergeable quantile sketch completing the sketch trio (Misra-Gries =
    * heavy hitters, KMV = distinct counts, this = quantiles): a per-group
    * min/max stats pass fixes `bins` equal integer bins of width
    * `w = (max−min) div bins + 1`; the histogram is one map-side-combined
    * count per (group, bin); the `num/den`-quantile estimate is the LOWER
    * EDGE of the first bin whose cumulative count reaches
    * `⌈n·num/den⌉` — so the estimate errs by at most one bin width, every
    * step is exact integer arithmetic, and the result is a pure function of
    * the value multiset (engine/partitioning/rerun-stable; the SQL twin
    * hash-matches it — unlike t-digest/GK sketches, whose estimates depend
    * on merge order).
    *
    * Mergeable by construction: histograms over the same (min, max, bins)
    * frame add bin-wise — the distributed aggregation IS the merge.
    *
    * Shape at scale: two passes (stats agg, histogram agg), both map-side
    * combined; the stats and the per-group cumulative walk touch only
    * group- and bin-bounded rows (≤ groups·bins), broadcast back. The exact
    * alternative is a full per-group sort — the trade this sketch exists
    * for.
    *
    * @param qs quantiles as (num, den) rationals in (0, 1]
    * @return (group cols..., n, est_{num}_{den}...) — estimates in the
    *         value's own integer units */
  def histQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      bins: Int = 1024, qs: Seq[(Int, Int)] = Seq((1, 2), (9, 10), (99, 100))): DataFrame = {
    require(groupCols.nonEmpty, "histQuantiles needs at least one group column")
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(qs.nonEmpty && qs.forall { case (n, d) => n >= 1 && n <= d },
      s"quantiles must be rationals in (0, 1]: $qs")
    val gcols = groupCols.map(col)
    val base = df.select(gcols :+ valueCol.cast("long").as("__v"): _*)
      .filter(col("__v").isNotNull)
    val stats = base.groupBy(gcols: _*)
      .agg(min(col("__v")).as("__mn"), max(col("__v")).as("__mx"),
        count(lit(1)).as("__n"))
    val hist = base
      .join(broadcast(stats), groupCols)
      .withColumn("__w", expr(s"(__mx - __mn) div $bins + 1"))
      .withColumn("__bin", expr("(__v - __mn) div __w"))
      .groupBy(gcols ++ Seq(col("__bin"), col("__mn"), col("__w"), col("__n")): _*)
      .agg(count(lit(1)).as("__ct"))
    val cumW = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*).orderBy(col("__bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val withCum = hist.withColumn("__cum", sum(col("__ct")).over(cumW))
    val ests = qs.map { case (num, den) =>
      // first qualifying bin has the smallest edge, so min() selects it
      min(when(col("__cum") >= expr(s"(__n * $num + ${den - 1}) div $den"),
        col("__mn") + col("__bin") * col("__w"))).as(s"est_${num}_$den")
    }
    withCum.groupBy(gcols: _*)
      .agg(max(col("__n")).as("n"), ests: _*)
  }

  /** [[histQuantiles]] over a CALLER-FIXED frame (lo, hi, bins): values
    * outside [lo, hi] clamp into the edge bins instead of re-deriving the
    * frame from the data. A fixed frame is what makes histograms BIN-WISE
    * ADDABLE across micro-batches — re-framing would re-bin history a
    * sketch store no longer has — so this is the batch twin
    * [[graft.streaming.IncrementalHist]] folds against (spec-anchored
    * parity at every horizon). ONE map-side-combined pass — fixing the
    * frame eliminates [[histQuantiles]]'s stats pass entirely (PlanSpec
    * pins the joinless plan); the clamp trades edge-bin resolution for
    * mergeability, the standard streaming-histogram contract.
    *
    * @return (group cols..., n, est_{num}_{den}...) */
  def histQuantilesFramed(df: DataFrame, groupCols: Seq[String],
      valueCol: Column, lo: Long, hi: Long, bins: Int = 1024,
      qs: Seq[(Int, Int)] = Seq((1, 2), (9, 10), (99, 100))): DataFrame = {
    require(groupCols.nonEmpty, "histQuantilesFramed needs a group column")
    require(hi >= lo, s"frame must satisfy hi >= lo, got [$lo, $hi]")
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(qs.nonEmpty && qs.forall { case (n, d) => n >= 1 && n <= d },
      s"quantiles must be rationals in (0, 1]: $qs")
    val w = (hi - lo) / bins + 1
    val gcols = groupCols.map(col)
    val hist = df.select(gcols :+ valueCol.cast("long").as("__v"): _*)
      .filter(col("__v").isNotNull)
      .withColumn("__bin",
        expr(s"least(greatest((__v - $lo) div $w, 0L), ${bins - 1}L)"))
      .groupBy(gcols :+ col("__bin"): _*)
      .agg(count(lit(1)).as("__ct"))
    histEstimates(hist, groupCols, lo, w, qs)
  }

  /** The cumulative-walk quantile selection shared by
    * [[histQuantilesFramed]] and the streaming fold: `hist` holds
    * (group cols..., __bin, __ct) rows over the frame (lo, binWidth). */
  private[graft] def histEstimates(hist: DataFrame, groupCols: Seq[String],
      lo: Long, binWidth: Long, qs: Seq[(Int, Int)]): DataFrame = {
    val gcols = groupCols.map(col)
    val gw = org.apache.spark.sql.expressions.Window.partitionBy(gcols: _*)
    val cumW = gw.orderBy(col("__bin")).rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val withCum = hist
      .withColumn("__n", sum(col("__ct")).over(gw))
      .withColumn("__cum", sum(col("__ct")).over(cumW))
    val ests = qs.map { case (num, den) =>
      min(when(col("__cum") >= expr(s"(__n * $num + ${den - 1}) div $den"),
        lit(lo) + col("__bin") * binWidth)).as(s"est_${num}_$den")
    }
    withCum.groupBy(gcols: _*).agg(max(col("__n")).as("n"), ests: _*)
  }

  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      k: Int = 256): DataFrame = {
    require(groupCols.nonEmpty, "kmvDistinct needs at least one group column")
    require(k >= 3, s"k must be >= 3 (estimator needs k-1 >= 2), got $k")
    val h = conv(substring(md5(valueCol.cast("string")), 1, 8), 16, 10)
      .cast("long")
    val gcols = groupCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*).orderBy(col("__h"))
    df.select(gcols :+ h.as("__h"): _*)
      .filter(col("__h").isNotNull) // null values don't count, as count_distinct
      .distinct()
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .groupBy(gcols: _*)
      .agg(count(lit(1)).as("n_seen"), max(col("__h")).as("__hk"))
      .withColumn("kmv_est",
        when(col("n_seen") < k, col("n_seen"))
          .otherwise(expr(s"(${k - 1} * 4294967296L) div __hk")))
      .select(gcols ++ Seq(col("n_seen"), col("kmv_est")): _*)
  }

  /** The `d` salted md5-slice cell positions of `key` in a flattened
    * `d × w` count-min table: row r's hash is the first 32 bits of
    * `md5("r:" + key)` reduced mod `w`, offset by `r·w` — deterministic,
    * engine-portable (the SQL twin computes the identical positions), and
    * independent across rows by the salt prefix. */
  private[graft] def cmsCellArray(key: Column, d: Int, w: Int): Column =
    array((0 until d).map { r =>
      lit(r.toLong * w) +
        conv(substring(md5(concat(lit(s"$r:"), key)), 1, 8), 16, 10)
          .cast("long") % w
    }: _*)

  /** Count-min frequency sketch as a per-group CELL TABLE — the
    * DataFrame-native, hash-ORACLE-ABLE twin of the typed
    * `functions/CountMin` aggregator (which carries its 128 KiB dense
    * buffer through Spark's typed-aggregation path and hashes with JVM
    * murmur3, so only a spec can check it). Here the sketch IS data:
    * `d` salted md5-slice hash rows × `w` counters, stored sparse as
    * (group, cell, ct) rows — every step exact integer arithmetic on a
    * deterministic hash, so the whole sketch (and every estimate read
    * from it) is a pure function of the key multiset, reproducible on any
    * engine.
    *
    * Mergeable by construction: cell tables over the same (d, w) add
    * bin-wise (count-min's defining property), which is what makes the
    * cross-batch fold [[graft.streaming.IncrementalCms]] lossless.
    *
    * Shape at scale: one explode(×d) over the scan feeding a map-side-
    * combined (group, cell) count — no key shuffle wider than
    * groups·d·w rows ever, vs the exact alternative shuffling the full
    * per-key count table. Estimates never undercount; overcount ≤ εN
    * with ε ≈ e/w at probability 1 − e^−d.
    *
    * @return (group cols..., cell, ct) — sparse: only touched cells */
  def cmsCells(df: DataFrame, groupCols: Seq[String], keyCol: Column,
      d: Int = 4, w: Int = 4096): DataFrame = {
    require(groupCols.nonEmpty, "cmsCells needs at least one group column")
    require(d >= 1 && w >= 2, s"need d >= 1 hash rows and w >= 2, got ($d, $w)")
    val gcols = groupCols.map(col)
    df.select(gcols :+ keyCol.cast("string").as("__k"): _*)
      .filter(col("__k").isNotNull)
      .select(gcols :+ explode(cmsCellArray(col("__k"), d, w)).as("cell"): _*)
      .groupBy(gcols :+ col("cell"): _*)
      .agg(count(lit(1)).as("ct"))
  }

  /** Point estimates for `probes` (group cols + `keyCol`) from a finished
    * [[cmsCells]] table: the MIN of the key's `d` counters, 0 for a key
    * whose cells were never touched. `cells` must have been built with the
    * same (d, w). @return probes + `cms_est` */
  def cmsEstimate(cells: DataFrame, probes: DataFrame, groupCols: Seq[String],
      keyCol: Column, d: Int = 4, w: Int = 4096): DataFrame = {
    require(groupCols.nonEmpty, "cmsEstimate needs at least one group column")
    val gcols = groupCols.map(col)
    probes.select(gcols :+ keyCol.cast("string").as("key"): _*)
      .select(gcols ++ Seq(col("key"),
        explode(cmsCellArray(col("key"), d, w)).as("cell")): _*)
      .join(cells.select(gcols ++ Seq(col("cell"), col("ct")): _*),
        groupCols :+ "cell", "left_outer")
      .groupBy(gcols :+ col("key"): _*)
      .agg(min(coalesce(col("ct"), lit(0L))).as("cms_est"))
  }

  /** HyperLogLog REGISTER TABLE, per group — the DataFrame-native,
    * hash-ORACLE-ABLE twin of the typed `functions/Hll` aggregator (and of
    * `approx_count_distinct`, whose HLL++ sketch is opaque bytes): 2^p
    * registers over the 32-bit md5 slice of the value, register index =
    * the top p bits, rank = leading zeros of the remaining 32−p bits + 1
    * (computed portably as `(32−p+1) − length(bin(low))` — both engines'
    * `bin` renders without leading zeros). Stored sparse as
    * (group, idx, rank) with rank = the register max; a pure function of
    * the value SET on any engine.
    *
    * Mergeable by construction AND idempotent: register tables union by
    * per-register max, so the cross-batch fold
    * [[graft.streaming.IncrementalHll]] needs no replay high-water mark
    * (the Bloom stance, not the counting sketches').
    *
    * @return (group cols..., idx, rank) — sparse: only hit registers */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      p: Int = 11): DataFrame = {
    require(groupCols.nonEmpty, "hllRegisters needs at least one group column")
    require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")
    val gcols = groupCols.map(col)
    val lowBits = 32 - p
    val h = conv(substring(md5(valueCol.cast("string")), 1, 8), 16, 10)
      .cast("long")
    df.select(gcols :+ h.as("__h"): _*)
      .filter(col("__h").isNotNull)
      .withColumn("idx", expr(s"__h div ${1L << lowBits}"))
      .withColumn("__low", expr(s"__h % ${1L << lowBits}"))
      .withColumn("__rank",
        when(col("__low") === 0, lit(lowBits + 1))
          .otherwise(lit(lowBits + 1) - length(bin(col("__low")))))
      .groupBy(gcols :+ col("idx"): _*)
      .agg(max(col("__rank")).cast("long").as("rank"))
  }

  /** Integer-exact summary of a [[hllRegisters]] table: `zeros` = never-hit
    * registers, `h_num` = Σ 2^(rmax − rank) over hit registers (rmax =
    * 32−p+1) — the harmonic denominator scaled to an exact BIGINT, so the
    * summary hash-oracles where the floating estimate could not. The
    * estimate is recovered as `α·m²·2^rmax / (zeros·2^rmax + h_num)` (with
    * the usual small-range linear-counting switch) — see [[hllEstimate]].
    * @return (group cols..., zeros, h_num) */
  def hllSummary(registers: DataFrame, groupCols: Seq[String],
      p: Int = 11): DataFrame = {
    val gcols = groupCols.map(col)
    val m = 1L << p
    val rmax = 32 - p + 1
    registers.groupBy(gcols: _*)
      .agg((lit(m) - count(lit(1))).as("zeros"),
        sum(expr(s"shiftleft(1L, cast($rmax - rank as int))")).as("h_num"))
  }

  /** Key-skew report — the statistics a 100 TB job reads BEFORE choosing a
    * partitioning: per-key group sizes summarized to exact integer skew
    * measures. `hot_x1000` is the hot-key multiplier (1000 ≡ perfectly
    * uniform ×1000): the EXACT `max·1000·n_keys div n_rows` whenever that
    * product fits a Long (every realistic case — the branch predicate is
    * part of the expression, identically in the SQL twin), falling back
    * to `max·1000 div floor-avg` only in the overflow regime where the
    * exact form would wrap silently (the fallback overstates by < 2×
    * when the average share is small, which the overflow regime never
    * is); a value ≫ 1000 says the biggest key owns that many × its fair
    * share — the signal that routes the job to
    * `ops/Scale.saltedAggregate` or AQE skew handling instead of a plain
    * shuffle. Quantiles of the SIZE distribution come from the
    * [[histQuantiles]] sketch (deterministic, merge-safe); every output is
    * exact integer arithmetic, so the whole report hash-oracles.
    *
    * Shape at scale: one map-side-combined key count (the only key-width
    * shuffle), then O(keys)-row aggregates; nothing touches raw rows
    * twice.
    *
    * @return one row: (n_rows, n_keys, max_ct, p50_ct, p99_ct,
    *         hot_x1000) */
  def skewReport(df: DataFrame, keyCol: Column): DataFrame = {
    val sizes = df.select(keyCol.as("__k")).filter(col("__k").isNotNull)
      .groupBy("__k").agg(count(lit(1)).as("__ct"))
      .withColumn("__g", lit("all"))
    val stats = sizes.groupBy("__g").agg(
      sum(col("__ct")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("__ct")).as("max_ct"))
    val quant = histQuantiles(sizes, Seq("__g"), col("__ct"),
      bins = 1024, qs = Seq((1, 2), (99, 100)))
    stats.join(quant, Seq("__g"))
      .select(col("n_rows"), col("n_keys"), col("max_ct"),
        col("est_1_2").as("p50_ct"), col("est_99_100").as("p99_ct"),
        expr("CASE WHEN max_ct <= 9223372036854775807 div 1000 div n_keys" +
          " THEN max_ct * 1000 * n_keys div n_rows" +
          " ELSE max_ct * 1000 div (n_rows div n_keys) END")
          .as("hot_x1000"))
  }

  /** Referential-integrity audit — the data-quality pre-flight a warehouse
    * runs before trusting a join (the reference's DWD layer joins facts to
    * dims with no such check; a silent orphan there becomes a silently
    * dropped fact row): for one child-FK → parent-PK relationship, exact
    * integer counts of the ways the join can lose or multiply rows —
    * null FKs (dropped by any equi-join), orphan rows/keys (dropped by an
    * inner join, nulled by a left), and duplicate parent keys (each one
    * MULTIPLIES matching facts — the fan-out bug).
    *
    * Plan shape: one child-side aggregate, one anti-join of the child's
    * DISTINCT keys against the parent keys (keys only — the narrowest
    * shuffle the question permits; orphan ROW counts ride the distinct-key
    * aggregate, not a second corpus pass), one parent-side aggregate; the
    * three 1-row results cross-join as scalar attaches.
    * @return one row: (child_rows, null_fk_rows, orphan_rows, orphan_keys,
    *         parent_rows, dup_parent_keys) */
  def fkAudit(child: DataFrame, childKey: Column,
      parent: DataFrame, parentKey: Column): DataFrame = {
    val c = child.select(childKey.as("__fk"))
    val p = parent.select(parentKey.as("__pk"))
    val cAgg = c.agg(count(lit(1)).as("child_rows"),
      // coalesce: sum over an EMPTY child is NULL, and the honest answer
      // for "rows with a null FK" in an empty table is 0 (oracle parity)
      coalesce(sum(when(col("__fk").isNull, 1L).otherwise(0L)), lit(0L))
        .as("null_fk_rows"))
    val ck = c.filter(col("__fk").isNotNull)
      .groupBy(col("__fk")).agg(count(lit(1)).as("__n"))
    val orph = ck.join(p.select(col("__pk").as("__fk")), Seq("__fk"),
        "left_anti")
      .agg(coalesce(sum(col("__n")), lit(0L)).as("orphan_rows"),
        count(lit(1)).as("orphan_keys"))
    val pAgg = p.agg(count(lit(1)).as("parent_rows"))
    val pDup = p.filter(col("__pk").isNotNull)
      .groupBy(col("__pk")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .agg(count(lit(1)).as("dup_parent_keys"))
    cAgg.crossJoin(orph).crossJoin(pAgg).crossJoin(pDup)
  }

  /** Exact pairwise covariance components over numeric columns — the
    * feature-screening pass (which quality signals co-vary, which are
    * redundant) in ENGINE-EXACT integer arithmetic: each value is floored
    * to `1/10^scale` fixed point (an IEEE multiply + floor, identical on
    * every engine — never a double→decimal cast, whose rounding modes
    * differ), and per ordered column pair the five power sums
    * (n, Σx, Σy, Σxy, Σx², Σy²) accumulate as DECIMAL(38,0). From these
    * any consumer derives covariance `(n·Σxy − Σx·Σy)` — emitted here —
    * and Pearson r²; r itself needs a sqrt, so the FLOAT ratio is the
    * spec's job, not the oracle's (the [[hllEstimate]] split). Non-finite
    * values (NaN/±Inf) are treated like null — excluded pairwise — since
    * their floor would silently skew the sums.
    *
    * One aggregate pass for ALL pairs (k columns = k(k+1)/2 pair rows from
    * ONE map-side-combined scan, never k² scans); rows where either column
    * is null are excluded per pair (pairwise deletion, each pair's n
    * reported). Overflow: |x·10^scale| must stay ≤ ~3·10⁹ per value for
    * the Σxy products to fit decimal(38,0) at 10¹⁸ rows — far beyond any
    * profiled feature column.
    *
    * @return one row per ordered pair (x ≤ y): (x, y, n, sx, sy, sxy,
    *         sxx, syy, cov_num) — cov_num = n·Σxy − Σx·Σy, all exact */
  def covComponents(df: DataFrame, cols: Seq[String], scale: Int = 6): DataFrame = {
    require(cols.size >= 2, "covComponents needs at least two columns")
    require(cols.distinct.size == cols.size, "columns must be unique")
    val idx = cols.zipWithIndex.toMap
    val pairs = for (i <- cols.indices; j <- i until cols.size)
      yield (cols(i), cols(j))
    val fp = math.pow(10, scale)
    // a value participates only if FINITE: NaN/±Inf are not null, but
    // floor(NaN) feeds 0 and floor(Inf) feeds Long.Max into the sums
    // (silently skewed statistics) while the DuckDB twin ERRORS on the
    // cast — treat non-finite like null (pairwise deletion).
    // The fixed-point value and the finiteness flag are computed ONCE PER
    // COLUMN in a projection — per-pair derivation would evaluate the
    // cast/floor/decimal chain ~5·k times per row (measured ~30 % of the
    // scan at k = 3)
    val prep = df.select(cols.map { c =>
      val d = col(c).cast("double")
      val finite = d.isNotNull && !isnan(d) &&
        d =!= Double.PositiveInfinity && d =!= Double.NegativeInfinity
      when(finite, floor(d * fp).cast("decimal(38,0)")).as(s"__v_${idx(c)}")
    }: _*)
    // aliases carry the PAIR INDEX, never the joined names — "a_b"/"c" vs
    // "a"/"b_c" would collide to one ambiguous alias string
    val aggs = pairs.zipWithIndex.flatMap { case ((x, y), i) =>
      val (vx, vy) = (col(s"__v_${idx(x)}"), col(s"__v_${idx(y)}"))
      val both = vx.isNotNull && vy.isNotNull
      def s(e: org.apache.spark.sql.Column, tag: String) =
        coalesce(sum(when(both, e)), lit(0).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as(s"__${tag}_$i")
      Seq(coalesce(sum(when(both, 1L)), lit(0L)).as(s"__n_$i"),
        s(vx, "sx"), s(vy, "sy"), s(vx * vy, "sxy"),
        s(vx * vx, "sxx"), s(vy * vy, "syy"))
    }
    prep.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(pairs.zipWithIndex.map { case ((x, y), i) =>
        struct(lit(x).as("x"), lit(y).as("y"),
          col(s"__n_$i").as("n"),
          col(s"__sx_$i").as("sx"), col(s"__sy_$i").as("sy"),
          col(s"__sxy_$i").as("sxy"),
          col(s"__sxx_$i").as("sxx"), col(s"__syy_$i").as("syy"))
      }: _*)).as("__p"))
      .select(col("__p.*"))
      .withColumn("cov_num",
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("decimal(38,0)"))
  }

  /** Join-size pre-flight — [[skewReport]] for a JOIN: the exact output
    * cardinality an equi-join would produce and the keys that dominate it,
    * from two key-width aggregates and a key-count join (never the join
    * itself — the point is to price the 100 TB shuffle before paying it).
    * Top `topK` keys by their output contribution `l_ct · r_ct` (ties by
    * key), plus one TOTAL row (key NULL): matched left rows, matched right
    * rows, exact join output size as decimal(38,0).
    *
    * Null keys never match an equi-join and are excluded (count them with
    * [[fkAudit]]); `hot · 1000 div total` on the top row is the salting
    * gate, exactly the [[skewReport]] reading applied to join output. */
  def joinPreflight(left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column, topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val lc = left.select(leftKey.cast("string").as("k"))
      .filter(col("k").isNotNull).groupBy("k").agg(count(lit(1)).as("l_ct"))
    val rc = right.select(rightKey.cast("string").as("k"))
      .filter(col("k").isNotNull).groupBy("k").agg(count(lit(1)).as("r_ct"))
    val m = lc.join(rc, "k")
      .withColumn("out_rows",
        (col("l_ct").cast("decimal(38,0)") * col("r_ct")).cast("decimal(38,0)"))
    // orderBy + limit, NOT a global window: Catalyst plans this as
    // TakeOrderedAndProject (per-partition top-K, merged) — the key table
    // never funnels through one task's sort
    val top = m.orderBy(col("out_rows").desc, col("k")).limit(topK)
    val total = m.agg(
      coalesce(sum(col("l_ct")), lit(0L)).as("l_ct"),
      coalesce(sum(col("r_ct")), lit(0L)).as("r_ct"),
      coalesce(sum(col("out_rows")), lit(0).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as("out_rows"))
      .select(lit(null).cast("string").as("k"), col("l_ct"), col("r_ct"),
        col("out_rows"))
    top.unionByName(total)
  }

  /** [[dqCheck]] per cohort — WHICH source/language/shard is dirty, not
    * just whether the table is: the same one-pass rule suite under a
    * groupBy, so k rules × g cohorts still cost one map-side-combined
    * scan. Null cohorts are reported under their own row (a dirty cohort
    * you cannot name is still dirty — route them, don't lose them).
    * @return one row per (cohort, check): (g, check_name, n_rows,
    *         n_violations) */
  def dqCheckBy(df: DataFrame, groupCol: Column,
      checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "dqCheckBy needs at least one check")
    require(checks.map(_._1).distinct.size == checks.size,
      "check names must be unique")
    val aggs = count(lit(1)).as("__rows") +: checks.zipWithIndex.map {
      case ((_, v), i) =>
        coalesce(sum(when(coalesce(v, lit(true)), 1L).otherwise(0L)), lit(0L))
          .as(s"__v_$i")
    }
    df.groupBy(groupCol.cast("string").as("g"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("g"), explode(array(checks.zipWithIndex.map {
        case ((name, _), i) =>
          struct(lit(name).as("check_name"), col("__rows").as("n_rows"),
            col(s"__v_$i").as("n_violations"))
      }: _*)).as("__c"))
      .select(col("g"), col("__c.*"))
  }

  /** Batch exponentially decayed counts — the BATCH twin of
    * [[graft.streaming.IncrementalDecay]] (one fold per period over a
    * static table instead of per micro-batch over a stream): per key,
    * periods fold oldest-first as
    *
    *   w ← (w >> gap_to_previous_touched_period) + count(period) · unit
    *
    * then shift down to the GLOBAL max period, so a key silent for the
    * recent past decays toward zero exactly like the stream form. All
    * pure integer shift/add (halving per period = `div 2` composed, and
    * floor composes exactly for pure halvings), so batch(table at period
    * clock) ≡ stream folds(one batch per period) bit-for-bit — spec-pinned
    * — and the result hash-oracles against a recursive-CTE fold.
    * Keys decayed to exactly 0 are dropped (the stream form's tombstone).
    *
    * Shape at scale: one map-side-combined (key, period) count — the only
    * corpus-width shuffle — then a key-width collect of each key's TOUCHED
    * periods (calendar-bounded per key: 365 rows/key/year, the CEP
    * row-local-fold footprint) folded by a row-local `aggregate`; the
    * period bounds are one MAP-SIDE min/max scan read driver-side (the
    * `dimBounds` stance — it also fails fast on negative periods; one
    * extra scan, never a second shuffle). Shift gaps clamp at 63
    * (Java/Spark shift semantics use the low 6 bits — an unclamped 64-gap
    * would be a NO-OP shift, not zero; any true gap ≥ 63 means w = 0 for
    * every representable weight).
    *
    * @param periodCol non-negative integer period (e.g. epoch-day); the
    *   clock whose ticks halve
    * @return (key, w) for keys with w > 0, w in `unit` fixed point */
  def decayedCounts(df: DataFrame, keyCol: Column, periodCol: Column,
      unit: Long = 1000000L): DataFrame = {
    require(unit >= 1, s"unit must be >= 1, got $unit")
    val base = df
      .select(keyCol.cast("string").as("key"), periodCol.cast("long").as("period"))
      .filter(col("key").isNotNull && col("period").isNotNull)
    val counts = base.groupBy("key", "period").agg(count(lit(1)).as("ct"))
    // 1-row scalar bounds (the dimBounds stance): pmax becomes a literal in
    // the fold, and a negative period fails fast instead of feeding Java's
    // low-6-bit shift semantics garbage. Bounds come from BASE, not counts —
    // same rows (identical filter), but a map-side min/max agg instead of
    // re-running the corpus-width groupBy shuffle a second time
    val mm = base.agg(min(col("period")), max(col("period"))).head()
    if (mm.isNullAt(1))
      return counts.select(col("key"), col("ct").as("w")).limit(0)
    require(mm.getLong(0) >= 0L,
      s"periods must be non-negative, got min ${mm.getLong(0)}")
    val pmax = mm.getLong(1)
    counts
      .groupBy("key")
      .agg(sort_array(collect_list(struct(col("period"), col("ct")))).as("__ps"))
      .withColumn("w", expr(s"""
        aggregate(__ps, named_struct('w', 0L, 'prev', 0L),
          (acc, x) -> named_struct(
            'w', shiftright(acc.w,
                   cast(least(x.period - acc.prev, 63L) as int)) + x.ct * ${unit}L,
            'prev', x.period),
          acc -> shiftright(acc.w,
                   cast(least(${pmax}L - acc.prev, 63L) as int)))"""))
      .filter(col("w") > 0)
      .select(col("key"), col("w"))
  }

  /** Declarative data-quality constraint check — the Deequ-style gate a
    * pipeline runs before promoting a table ([[fkAudit]] audits one
    * relationship; this audits ROW-LEVEL rules): each check is a named
    * VIOLATION predicate, and the whole suite evaluates in ONE
    * map-side-combined aggregate pass — k rules cost one scan, never k.
    * Exact integer counts (never booleans: "0.3 % of rows violate the
    * range rule" routes differently than "some do"), so the report
    * hash-oracles.
    *
    * Rules this shape covers: completeness (`c.isNull`), ranges
    * (`c < lit(0)`), allowed sets (`!c.isin(...)`), format conformance
    * (`!c.rlike("...")` — keep patterns in the RE2-portable subset if an
    * engine twin replays them), cross-column invariants (`a > b`). A NULL
    * predicate result counts as a violation (a rule that cannot evaluate
    * has not passed — the conservative gate). Uniqueness and referential
    * rules need a key-width aggregate, not a row predicate — that is
    * [[fkAudit]] (dup_parent_keys / orphans) by construction.
    *
    * @param checks (name, violation predicate) pairs, evaluated per row
    * @return one row per check: (check_name, n_rows, n_violations) */
  def dqCheck(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "dqCheck needs at least one check")
    require(checks.map(_._1).distinct.size == checks.size,
      "check names must be unique")
    // index aliases, not name-derived ones: a check named "a.b" would make
    // col("__v_a.b") parse as a struct access (the covComponents lesson)
    val aggs = count(lit(1)).as("__rows") +: checks.zipWithIndex.map {
      case ((_, v), i) =>
        // coalesce INSIDE per row: a null predicate is a violation;
        // outside: an empty table has zero violations, not null
        coalesce(sum(when(coalesce(v, lit(true)), 1L).otherwise(0L)), lit(0L))
          .as(s"__v_$i")
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(checks.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("check_name"), col("__rows").as("n_rows"),
          col(s"__v_$i").as("n_violations"))
      }: _*)).as("__c"))
      .select(col("__c.*"))
  }

  /** The floating HLL estimate from a [[hllSummary]] row — Scala-side only
    * (libm `log` in the small-range branch is not engine-portable; the
    * oracle pins the integer summary instead, the estimate is spec-checked
    * against exact counts). */
  def hllEstimate(zeros: Long, hNum: Long, p: Int = 11): Long = {
    val m = (1L << p).toDouble
    val rmax = 32 - p + 1
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val sum = (zeros * math.pow(2.0, rmax) + hNum) / math.pow(2.0, rmax)
    val raw = alpha * m * m / sum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m / zeros)
      else raw
    math.round(est)
  }
}
