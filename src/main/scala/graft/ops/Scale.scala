package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Scale helpers: skew-salted aggregation and co-location
  * (SURVEY.md §7.1 100 TB posture).
  *
  * AQE handles skewed *joins* at runtime; skewed *aggregation* keys (one hot
  * mid/sku absorbing a partition) are pre-split here with a salt so the first
  * shuffle spreads a hot key over `buckets` reducers, then a second (tiny)
  * shuffle merges the partials. The result is bitwise-identical for the
  * algebraic aggregates exposed (sum/count/min/max over exact types).
  */
object Scale {

  /** Supported algebraic aggregates: (partial, merge) pairs. */
  private def partialMerge(fn: String, c: Column, out: String): (Column, Column) =
    fn match {
      case "sum"   => (sum(c).as(out), sum(col(out)).as(out))
      case "count" => (count(c).as(out), sum(col(out)).as(out))
      case "min"   => (min(c).as(out), min(col(out)).as(out))
      case "max"   => (max(c).as(out), max(col(out)).as(out))
      case other   => throw new IllegalArgumentException(s"unsupported agg: $other")
    }

  /** Two-stage salted aggregation: groupBy(keys + salt) → groupBy(keys).
    *
    * The salt is a DETERMINISTIC hash of the whole row, never
    * `rand()`/`monotonically_increasing_id()`: a nondeterministic salt can
    * change on task recomputation after a shuffle-fetch failure, landing
    * recomputed rows in different stage-1 buckets than the partials a reducer
    * already fetched (the SPARK-23207 correctness class). Rows identical in
    * EVERY column share a salt and stay together — the realistic hot key
    * (one id, varying payload) still fans out.
    *
    * Keys may be arbitrary expressions: stage 1 aliases each key to its
    * resolved name and stage 2 re-groups by those names, so `col("ts") % 3600`
    * works as a key, not just plain column references.
    *
    * @param aggs (outputName, fn, inputColumn); fn ∈ sum|count|min|max.
    *             Use decimal-cast inputs for float sums if cross-run bitwise
    *             stability matters (salting reorders float addition).
    * @param buckets salt fan-out for a hot key (≈ executor count). */
  def saltedAggregate(df: DataFrame, keys: Seq[Column],
      aggs: Seq[(String, String, Column)], buckets: Int = 64): DataFrame = {
    val pm = aggs.map { case (out, fn, c) => partialMerge(fn, c, out) }
    val keyNames = keys.map(k => df.select(k).columns.head)
    require(keyNames.distinct.size == keyNames.size,
      s"salted-aggregate keys resolve to duplicate names (${keyNames.mkString(", ")}) — " +
        "stage 2 would silently merge them; alias the expressions distinctly")
    // hash() rejects MapType inputs (and a map has no canonical order anyway):
    // route any map-bearing column through its string rendering, which is
    // deterministic per value — the CDC envelope's `data: map<string,string>`
    // column stays salt-eligible instead of throwing.
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = {
      import org.apache.spark.sql.types._
      dt match {
        case _: MapType        => false
        case ArrayType(e, _)   => hashable(e)
        case StructType(flds)  => flds.forall(f => hashable(f.dataType))
        case _                 => true
      }
    }
    val saltInputs = df.schema.fields.map(fld =>
      if (hashable(fld.dataType)) col(fld.name) else col(fld.name).cast("string"))
    val salted = df.withColumn("__salt",
      pmod(hash(saltInputs.toIndexedSeq: _*), lit(buckets)))
    val stage1 = salted
      .groupBy(keys.zip(keyNames).map { case (k, n) => k.as(n) } :+ col("__salt"): _*)
      .agg(pm.head._1, pm.tail.map(_._1): _*)
    stage1.groupBy(keyNames.map(col): _*).agg(pm.head._2, pm.tail.map(_._2): _*)
  }

  /** Co-locate a DataFrame on join/agg keys ahead of several consumers so the
    * exchange happens once and is reused across stages. */
  def colocate(df: DataFrame, keys: Seq[Column], partitions: Int): DataFrame =
    df.repartition(partitions, keys: _*)

  /** Two-stage salted fold for TYPED per-group processing — the regime where
    * key skew actually bites. For the algebraic aggregates above, Spark's
    * map-side partial aggregation already neutralizes a hot key (each reducer
    * receives at most one partial per key per map task — measured at parity
    * in `tools/SkewProbe`); but `groupByKey(...).mapGroups` has NO partial
    * aggregation: every raw row of the hot key lands in ONE reducer task,
    * which then processes 90% of the data single-threaded while the rest of
    * the cluster idles. When the per-group logic is an associative fold,
    * stage 1 folds each (key, salt) sub-group in parallel and stage 2 merges
    * the `buckets` partials per key — the hot key fans out over `buckets`
    * tasks (measured ≥5× on the engineered skew fixture; see SCALING.md).
    *
    * The salt is the value's own `hashCode` — deterministic per value for
    * case classes / tuples / primitives (Scala value-based hashing), so task
    * retries re-bucket identically (the SPARK-23207 correctness class; same
    * rationale as [[saltedAggregate]]'s whole-row hash). Don't pass types
    * with identity hashCodes (plain classes, arrays).
    *
    * @param key     group key extractor
    * @param fold    per-(key, salt-bucket) fold — must be associative-merge
    *                compatible with `merge`
    * @param merge   combines two bucket partials of the same key
    * @param buckets hot-key fan-out (≈ cluster parallelism) */
  def saltedFoldGroups[V, K, S](ds: Dataset[V], key: V => K, buckets: Int = 64)(
      fold: (K, Iterator[V]) => S)(merge: (S, S) => S)(
      implicit ksalt: Encoder[(K, Int)], kEnc: Encoder[K],
      ks: Encoder[(K, S)]): Dataset[(K, S)] = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    ds.groupByKey(v => (key(v), math.floorMod(v.hashCode, buckets)))
      .mapGroups((ks: (K, Int), it: Iterator[V]) => (ks._1, fold(ks._1, it)))
      .groupByKey(_._1)
      .mapGroups((k, it) => (k, it.map(_._2).reduce(merge)))
  }

  /** Z-order (Morton) curve value: interleave the low `bits` bits of two
    * non-negative dimension expressions — the multi-column layout key behind
    * Delta/Iceberg OPTIMIZE ZORDER. Sorting a table by this single value
    * co-locates rows that are close in BOTH dimensions, so per-file min/max
    * stats prune scans filtered on either column (a sort by (x, y) prunes
    * only on x). Pure shift/mask/add arithmetic — whole-stage codegen, no
    * UDF, and the identical expression is replayable in any engine.
    *
    * The dimensions must occupy COMPARABLE ranges: bits of one dimension
    * above the other's range interleave with constant zeros, so the wider
    * dimension alone decides the curve's coarse order and the narrower one
    * degrades toward a secondary sort key (measured in
    * `tools/ScaleProbe zorder`: a 20-bit price against a 14-bit custkey
    * pruned price-only scans 8× but custkey-only scans not at all).
    * Pre-scale with [[normalizeDim]] unless the domains already match. */
  def zorderValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be 1..31, got $bits")
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Linear domain normalization for a z-order dimension: map `[lo, hi]`
    * onto `[0, 2^bits)` so both interleaved dimensions occupy the same bit
    * width (see the [[zorderValue]] range caveat). Values outside `[lo, hi]`
    * clamp — out-of-profile stragglers land in the curve's edge cells rather
    * than corrupting high bits. `lo`/`hi` come from profile stats (min/max
    * or quantiles); rank-based normalization (Delta's OPTIMIZE approach) is
    * `percent_rank() * ((1 << bits) - 1)` over a window when the
    * distribution is too skewed for a linear map. */
  def normalizeDim(c: Column, lo: Long, hi: Long, bits: Int = 16): Column = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    require(bits >= 1 && bits <= 31, s"bits must be 1..31, got $bits")
    val span = hi - lo
    val top = (1L << bits) - 1
    least(greatest((c.cast("long") - lit(lo)) * lit(top) / lit(span), lit(0L)),
      lit(top)).cast("long")
  }

  /** One-pass profile of the two layout dimensions: ((x_lo, x_hi),
    * (y_lo, y_hi)) from a single min/max aggregate — the stats pass that
    * feeds [[normalizeDim]] when the caller has no table profile. Min/max
    * aggregate over the layout input is one map-side-combining pass (at a
    * warehouse this is read from table stats / parquet footers instead);
    * the four scalars are the only driver-side values. Throws on an empty
    * or all-null dimension — silently laying out on a null domain would
    * produce a corrupt curve, not a degraded one. */
  def dimBounds(df: DataFrame, x: Column, y: Column): ((Long, Long), (Long, Long)) = {
    val r = df.agg(min(x.cast("long")).as("xlo"), max(x.cast("long")).as("xhi"),
      min(y.cast("long")).as("ylo"), max(y.cast("long")).as("yhi")).head()
    require(!r.anyNull, "dimBounds needs at least one non-null row per dimension")
    ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))
  }

  /** [[zorderLayout]] with each domain normalized by bounds profiled from
    * the data ([[dimBounds]]) — the auto-stats form of the normalization
    * `tools/ScaleProbe zorder` showed is load-bearing (a wider raw dimension
    * otherwise owns the curve's high bits). A CONSTANT dimension (lo == hi)
    * normalizes to 0: it carries no locality, so the curve degrades to a
    * plain sort on the other dimension instead of refusing the layout. */
  def zorderLayoutAuto(df: DataFrame, x: Column, y: Column, partitions: Int,
      bits: Int = 16): DataFrame = {
    val ((xlo, xhi), (ylo, yhi)) = dimBounds(df, x, y)
    zorderLayout(df, normalizeDimOrZero(x, xlo, xhi, bits),
      normalizeDimOrZero(y, ylo, yhi, bits), partitions, bits)
  }

  /** [[normalizeDim]] with the constant-dimension degradation
    * [[zorderLayoutAuto]] documents (lo == hi → the dimension carries no
    * locality, normalize to 0) — the form every auto-profiled caller should
    * use, so a degenerate corpus degrades instead of throwing. */
  def normalizeDimOrZero(c: Column, lo: Long, hi: Long, bits: Int = 16): Column =
    if (hi > lo) normalizeDim(c, lo, hi, bits) else lit(0L)

  /** The DuckDB twin of [[normalizeDim]] — same clamp-then-scale formula
    * over SQL sub-expressions (`lo`/`hi`/the column may reference a stats
    * CTE, which is how an oracle replays [[dimBounds]]). Uses DuckDB's `//`
    * integer floor division; Spark's double divide + long cast truncates
    * instead, but every value reaching the division here is a non-negative
    * exact integer ≤ ~2^40, where floor and truncate agree and the double
    * path is exact. */
  def normalizeSql(c: String, lo: String, hi: String, bits: Int = 16): String = {
    val top = (1L << bits) - 1
    s"least(greatest(((($c) - ($lo)) * $top) // (($hi) - ($lo)), 0), $top)"
  }

  /** The DuckDB twin of [[normalizeDimOrZero]]: the guarded form, so an
    * oracle replaying auto-profiled bounds degrades on a constant dimension
    * exactly like the Spark side instead of dividing by zero. */
  def normalizeSqlOrZero(c: String, lo: String, hi: String, bits: Int = 16): String =
    s"(CASE WHEN ($hi) > ($lo) THEN ${normalizeSql(c, lo, hi, bits)} ELSE 0 END)"

  /** The DuckDB/SQL twin of [[zorderValue]] — generated from the same loop so
    * the two expressions can never drift. `x`/`y` are SQL sub-expressions. */
  def zorderSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) * ${1L << (2 * i)} + (($y >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")

  /** Dense deterministic ids 0..n−1 in `ord` order WITHOUT a global sort —
    * the corpus-preparation primitive (shard-stable example numbering,
    * embedding-table row ids) that `row_number() OVER (ORDER BY …)` gets
    * wrong at scale (one partition sorts the world). Two-level ranking
    * instead: rows rank locally inside `bucketCol` groups (one hash
    * exchange on the bucket — the only corpus-scale movement), bucket
    * sizes aggregate map-side into a buckets-sized table whose running
    * sum yields each bucket's global offset (a window over metadata, not
    * data), and `id = offset + local_rank − 1` broadcasts back.
    *
    * CONTRACT: `bucketCol` must be a MONOTONE coarsening of `ord` (e.g.
    * `ord = (doc_id)`, `bucket = doc_id div 4096`) — then (bucket, ord)
    * order IS global ord order and ids match the global row_number; and
    * `ord` must totally order rows within a bucket (ties would make the
    * assignment among tied rows arbitrary). Bucket width trades skew
    * (one giant bucket = one giant sort) against offset-table size;
    * ~thousands of rows per bucket is the right grain.  Unlike RDD
    * zipWithIndex this is pure DataFrame (plans, AQE, codegen) and
    * unlike monotonically_increasing_id the ids are DENSE and stable
    * across runs, partitionings, and cluster sizes. */
  def denseIds(df: DataFrame, bucketCol: Column, ord: Seq[Column],
      as: String = "dense_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bkt")).orderBy(ord: _*)
    val b = df.withColumn("__bkt", bucketCol)
    val offsets = b.groupBy(col("__bkt")).agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("__bkt"))
            .rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select(col("__bkt"), col("__off"))
    b.join(broadcast(offsets), Seq("__bkt"))
      .withColumn(as, col("__off") + row_number().over(w) - 1)
      .drop("__bkt", "__off")
  }

  /** Lay a table out along the z-curve: range-partition on the z-value, sort
    * within partitions — each output file covers one compact z-range, which
    * is what makes min/max data skipping fire on both dimensions. */
  def zorderLayout(df: DataFrame, x: Column, y: Column, partitions: Int,
      bits: Int = 16): DataFrame = {
    val z = zorderValue(x, y, bits)
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
