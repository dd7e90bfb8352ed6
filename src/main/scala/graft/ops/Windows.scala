package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Windowed aggregation toolbox for the DWS layer (SURVEY.md §2.9).
  *
  * The reference declares 8 DWS summary tables (`Constant.java:40-47`) but
  * ships no code; these are the operator classes they imply: tumbling
  * event-time windows, hash aggregation (count/sum), exact + approximate
  * distinct, dim enrichment after aggregation.
  *
  * Scale posture: aggregations are partial (map-side combine) by construction;
  * windows are derived with the built-in `window()` TimeWindow expression so
  * the same code runs under Structured Streaming with a watermark; dims join
  * AFTER aggregation (group first, enrich the few output rows, broadcast the
  * dim) — never enrich the raw stream.
  */
object Windows {

  /** Tumbling event-time window from an epoch-ms column; adds `ws` = window
    * start in epoch seconds (bigint — engine-portable, sorts/joins cheap). */
  def withTumbleWs(df: DataFrame, tsMs: Column, duration: String): DataFrame =
    df.withColumn("__w", window(timestamp_millis(tsMs), duration))
      .withColumn("ws", expr("unix_millis(__w.start) div 1000"))
      .drop("__w")

  /** CUMULATE window assignment — the fourth Flink window TVF beside
    * tumble/hop/session (FLIP-145; the "running daily total, emitted
    * hourly" shape every DWS dashboard wants): within each `sizeMs`
    * window, an event joins EVERY step boundary at or after its own
    * time, so aggregating by (ws, boundary) yields cumulative-to-boundary
    * values. Emitted columns: `ws` (window start) and `bound` (the step
    * boundary this row feeds), both epoch-SECONDS bigints (the
    * [[withTumbleWs]] portability stance).
    *
    * Batch/stream duality: in streaming this is tumble(step) + an
    * upsert-mode running sum; the batch form here replays the emitted
    * row set exactly, so a drive can hash-oracle against it.
    *
    * Scale: each event explodes into its REMAINING boundaries — a
    * size/step row multiplier (e.g. 4 for day/6 h) priced before the one
    * map-side-combined (ws, bound, keys...) aggregate; never a self-join
    * or a window function over the corpus.
    *
    * @param sizeMs window size; must be a positive multiple of `stepMs` */
  def withCumulate(df: DataFrame, tsMs: Column, stepMs: Long,
      sizeMs: Long): DataFrame = {
    require(stepMs >= 1 && sizeMs >= stepMs && sizeMs % stepMs == 0,
      s"size ($sizeMs) must be a positive multiple of step ($stepMs)")
    require(stepMs % 1000 == 0 && sizeMs % 1000 == 0,
      "step and size must be whole seconds (ws/bound are epoch-second columns)")
    val steps = sizeMs / stepMs
    df.withColumn("__t", tsMs.cast("long"))
      // FLOOR division, not Spark's truncate-toward-zero `div`: a pre-epoch
      // (negative) timestamp must land in the window that STARTS BEFORE it,
      // and the in-window remainder must be non-negative — this is also
      // exactly DuckDB's `//`, so the twin floors identically
      .withColumn("__fd", expr(
        s"(__t div $sizeMs) - (CASE WHEN __t % $sizeMs < 0 THEN 1 ELSE 0 END)"))
      .withColumn("ws", expr(s"__fd * ${sizeMs / 1000}"))
      // first boundary covering the event, from the floor-remainder — an
      // event AT a boundary belongs to the next one (window end exclusive,
      // the TimeWindow contract)
      .withColumn("__k0",
        expr(s"(__t - __fd * $sizeMs) div $stepMs + 1"))
      .withColumn("__k", explode(expr(s"sequence(__k0, ${steps}L)")))
      .withColumn("bound", expr(s"ws + __k * ${stepMs / 1000}"))
      .drop("__t", "__fd", "__k0", "__k")
  }

  /** Gap-based session journey paths — the user-behavior sequence rollup a
    * DWS layer derives funnels and path analysis from: events are grouped
    * into `session_window(gap)` sessions per user, and each session emits its
    * ordered event-type path as one `>`-joined string.
    *
    * One shuffle (the session-window aggregation on the user key); the path
    * ordering happens inside an `array_sort` over the session's own events
    * (session-sized arrays), never a global or per-user sort. Ties on the
    * timestamp are broken by `ordCol` so the path is deterministic under any
    * partitioning. `tsCol` is used AS GIVEN in the session window, so a
    * watermarked stream column keeps its watermark and the same code streams
    * in append mode (`SessionPathsStreamSpec`) — `session_window` is the
    * Structured-Streaming-native session operator.
    *
    * @param tsCol TIMESTAMP column (pre-truncate to ms if an oracle compares
    *              on epoch-ms gaps); pass the watermarked column on a stream
    * @return (user, sess_start epoch-ms, ev_ct, path) */
  def sessionPaths(df: DataFrame, userCol: Column, tsCol: Column,
      typeCol: Column, ordCol: Column, gap: String = "30 minutes"): DataFrame =
    df.groupBy(session_window(tsCol, gap), userCol.as("user_id"))
      .agg(count(lit(1)).as("ev_ct"),
        array_join(transform(
          array_sort(collect_list(struct(unix_millis(tsCol).as("__tms"),
            ordCol.as("__o"), typeCol.as("__t")))),
          e => e.getField("__t")), ">").as("path"))
      .select(col("user_id"),
        expr("unix_millis(session_window.start)").as("sess_start"),
        col("ev_ct"), col("path"))

  /** Time-series resampling with forward fill — the gap-filling pass that
    * turns an irregular event stream into a fixed-step grid (feature
    * engineering, monitoring rollups): per key, one grid point every
    * `stepMs` between the key's first and last event, each carrying the
    * payload of the latest event at or before it.
    *
    * Composition of existing scale-safe pieces: per-key bounds (one keyed
    * aggregation), a row-local `sequence` explode for the grid, and
    * [[graft.ops.Joins.asof]] — the union-sort single-shuffle as-of join —
    * to fill values. No per-key loop, no driver-side time math; cost is
    * linear in events + grid points. Events sharing (key, ts) are collapsed
    * to the `ordCol`-max row first so the fill is deterministic (an as-of
    * tie must not depend on partition order).
    *
    * @return grid rows (key, ts, payload...) */
  def resampleFfill(df: DataFrame, keyName: String, tsName: String,
      payload: Seq[String], stepMs: Long, ordCol: Column): DataFrame = {
    require(stepMs >= 1, s"stepMs must be >= 1, got $stepMs")
    val dedup = df
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(keyName), col(tsName)).orderBy(ordCol.desc)))
      .filter(col("__rk") === 1).drop("__rk")
    // Grid bounds via pmod (always non-negative for a positive step), not
    // `div`: `div` truncates toward zero, so a ceil/floor idiom built on it
    // breaks for negative (pre-1970 epoch-ms) timestamps. __start is the
    // smallest step-multiple >= __lo, __stop the largest <= __hi — exact
    // integer math, engine-agnostic (the DuckDB oracle mirrors it with a
    // sign-adjusted `%`).
    val grid = dedup.groupBy(col(keyName))
      .agg(min(col(tsName)).as("__lo"), max(col(tsName)).as("__hi"))
      .select(col(keyName),
        (col("__lo") + pmod(-col("__lo"), lit(stepMs))).as("__start"),
        (col("__hi") - pmod(col("__hi"), lit(stepMs))).as("__stop"))
      .filter(col("__start") <= col("__stop"))
      .select(col(keyName),
        explode(sequence(col("__start"), col("__stop"), lit(stepMs))).as(tsName))
    graft.ops.Joins.asof(grid, dedup.select((keyName +: tsName +: payload).map(col): _*),
      keyName, tsName, payload)
  }

  /** Tokenizer (ikanalyzer stand-in for
    * `dws_traffic_source_keyword_page_view_window`, `pom.xml:205`). The
    * reference reserves a CJK analyzer because gmall search keywords are
    * Chinese — where words are not space-delimited. Public-knowledge
    * fallback, the same scheme as Lucene's classic CJK analysis: lowercase,
    * isolate contiguous Han runs, emit latin tokens on whitespace and Han
    * runs as overlapping character BIGRAMS (a length-1 run stays a unigram).
    * "big data 大数据" → [big, data, 大数, 数据].
    *
    * Pure column expressions, no UDF. The array lambdas here are
    * CodegenFallback (HOFs) — fine for the keyword dimension this feeds; do
    * NOT reuse on a per-token hot path (see TextStats.toks for that). */
  def tokenize(text: Column): Column = {
    // space out each maximal Han run, then split on whitespace: a mixed
    // string can only yield pure-latin or pure-Han tokens
    val spaced = regexp_replace(lower(text), "(\\p{IsHan}+)", " $1 ")
    val toks = filter(split(spaced, " ", -1), t => length(t) > 0)
    flatten(transform(toks, t =>
      when(t.rlike("^\\p{IsHan}{2,}$"),
        transform(sequence(lit(1), length(t) - 1), i => t.substr(i, lit(2))))
        .otherwise(array(t))))
  }
}
