package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed-state / changelog operators (SURVEY.md §2.5 T5, §2.2 K3/K4).
  *
  * Batch forms below are the oracle-checkable equivalents; the streaming forms
  * (flatMapGroupsWithState / foreachBatch MERGE) live in graft.streaming and
  * are asserted equal to these in the test suite.
  *
  * Scale posture: all three are single-shuffle window/agg patterns on the key —
  * no global sort, no driver-side state; skewed keys are handled by AQE.
  */
object Stateful {

  /** K3 — upsert-Kafka sink semantics (`SQLUtil.getUpsertKafkaSQL:55-63`, PK at
    * `DwdTradeOrderDetail.java:86`): last value per key wins. Batch equivalent
    * of keyed compaction: `row_number() over (partition by pk order by seq desc)
    * = 1`. `seq` must totally order versions (append a unique tiebreaker). */
  def lastWriteWins(df: DataFrame, keys: Seq[Column], seqDesc: Seq[Column]): DataFrame =
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(keys: _*).orderBy(seqDesc.map(_.desc): _*)))
      .filter(col("__rn") === 1)
      .drop("__rn")

  /** K4 — HBase dim point-write/delete (`DimHBaseSinkFunction.invoke:39-75`):
    * apply puts/deletes in sequence order per rowkey; final state drops keys
    * whose last operation was a delete. */
  def mergeFinalState(df: DataFrame, keys: Seq[Column], seqDesc: Seq[Column],
      typeCol: Column, deleteType: String = "delete"): DataFrame =
    lastWriteWins(df, keys, seqDesc).filter(typeCol =!= deleteType)

  /** SCD Type-2 dimension history from a CDC changelog — the warehouse-native
    * complement of [[mergeFinalState]] (which keeps only the FINAL state, the
    * reference's HBase dim put/delete at `DimHBaseSinkFunction.invoke:39-75`):
    * instead of the last version, every distinct version of the tracked
    * attributes becomes a row with a validity interval, so facts can be
    * enriched with the dimension AS OF their event time.
    *
    * Version rules (the standard SCD2 contract):
    *   - a non-delete row OPENS a new version iff it is the key's first row,
    *     follows a delete (re-insert), or CHANGES any tracked attribute
    *     (null-safe compare — no-op updates are absorbed, so churn-heavy CDC
    *     feeds don't inflate the history);
    *   - a delete CLOSES the open version and emits nothing (facts falling in
    *     the gap see no dimension — observable, by design);
    *   - `effective_to` = the next boundary's `tsCol` (exclusive), null while
    *     current (`is_current`); `ver` numbers a key's versions from 1.
    * Versions sharing a timestamp produce empty `[t, t)` intervals — kept (the
    * history stays a complete changelog) but unmatchable by [[scd2Lookup]].
    *
    * Two window passes over one key-partitioned shuffle (boundary detection,
    * then interval close over the kept rows — same partitioning, no second
    * exchange), no state beyond the window frame: at 100 TB the history build
    * is a single sort-based pass per key.
    *
    * @param orderCols total version order within a key (extend `tsCol` with
    *                  tiebreakers, as [[lastWriteWins]] requires)
    * @param attrs     tracked (SCD2) attribute columns, emitted in the output */
  def scd2History(df: DataFrame, keys: Seq[Column], orderCols: Seq[Column],
      tsCol: Column, attrs: Seq[Column], attrNames: Seq[String],
      typeCol: Column, deleteType: String = "delete"): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(orderCols: _*)
    val attrStruct = struct(attrs: _*)
    val isDel = typeCol === deleteType
    val opens = !isDel && (lag(typeCol, 1).over(w).isNull ||
      lag(typeCol, 1).over(w) === deleteType ||
      !(lag(attrStruct, 1).over(w) <=> attrStruct))
    val kept = df
      .withColumn("__open", opens)
      .filter(col("__open") || isDel)
    val w2 = Window.partitionBy(keys: _*).orderBy(orderCols: _*)
    kept
      .withColumn("__to", lead(tsCol, 1).over(w2))
      .filter(col("__open"))
      .withColumn("ver", row_number().over(w2))
      .select(keys ++ attrs.zip(attrNames).map { case (c, n) => c.as(n) } :+
        tsCol.as("effective_from") :+ col("__to").as("effective_to") :+
        col("__to").isNull.as("is_current") :+ col("ver"): _*)
  }

  /** Fact enrichment against an SCD2 history: each fact row left-joins the
    * dimension version valid AT its event time (`effective_from <= ts <
    * effective_to`, open versions unbounded). Facts inside a delete gap (or
    * before the first version) keep null dimension columns — the honest
    * reading of a point-in-time lookup.
    *
    * Plan shape: an equi-join on the key with the interval predicate as a
    * join-level filter — one key-hash shuffle (or a broadcast when the
    * history is small), never a range cross-product; per-key version lists
    * are short by construction (no-op updates were absorbed upstream), so
    * the per-row interval scan is O(versions). The [t, t) empty intervals
    * [[scd2History]] documents are unmatchable here, and version intervals
    * are disjoint per key, so each fact matches at most one version. */
  def scd2Lookup(facts: DataFrame, history: DataFrame, keys: Seq[String],
      factTs: Column): DataFrame = {
    val cond = keys.map(k => facts(k) === history(k)).reduce(_ && _) &&
      history("effective_from") <= factTs &&
      (history("effective_to").isNull || factTs < history("effective_to"))
    keys.foldLeft(facts.join(history, cond, "left_outer")) {
      (d, k) => d.drop(history(k)) }
  }

  /** T5 — new-visitor repair (`DwdBaseLog.isNewFix:135-183`, rules :154-178).
    * Batch equivalent over a complete log, exactly mirroring the streaming
    * `ValueState` rules: the state is set by the mid's FIRST event (in
    * `orderCols` order) and never changes — to that event's date if it claimed
    * `is_new=1`, else to the day BEFORE it (the reference's "old visitor"
    * backfill). An `is_new=1` row keeps 1 iff its date equals that state; so
    * a mid whose first event was `is_new=0` rewrites even same-day `is_new=1`
    * claims to 0. Streaming twin: graft.streaming.IsNewFix (asserted equal in
    * IsNewFixStreamSpec, including the mixed same-day case).
    *
    * @param dtCol     `yyyy-MM-dd` event date column
    * @param midCol    device id column
    * @param orderCols total arrival order within a mid (e.g. ts, event_id) */
  def isNewFixBatch(lg: DataFrame, midCol: Column, dtCol: Column,
      isNewCol: Column, orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(midCol).orderBy(orderCols: _*)
    val stateDt = when(first(isNewCol).over(w) === "1", first(dtCol).over(w))
      .otherwise(date_format(date_sub(to_date(first(dtCol).over(w)), 1), "yyyy-MM-dd"))
    lg.withColumn("is_new_fixed",
      when(isNewCol === "1" && dtCol === stateDt, "1").otherwise("0"))
  }
}
