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
}
