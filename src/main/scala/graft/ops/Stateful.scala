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
