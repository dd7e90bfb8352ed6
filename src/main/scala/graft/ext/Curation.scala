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
}
