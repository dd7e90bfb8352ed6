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
    * Batch equivalent over a complete log: the keyed `first_login_dt` state is
    * the mid's earliest event date, so `is_new=1` stays 1 only on that date and
    * is rewritten to 0 afterwards; `is_new=0` rows always stay 0 (the state
    * backfill to "yesterday" only affects the unobservable state, never the
    * emitted value). Streaming twin: graft.streaming.IsNewFix.
    *
    * @param dtCol  `yyyy-MM-dd` event date column
    * @param midCol device id column */
  def isNewFixBatch(lg: DataFrame, midCol: Column, dtCol: Column,
      isNewCol: Column): DataFrame = {
    val firstDt = min(dtCol).over(Window.partitionBy(midCol))
    lg.withColumn("is_new_fixed",
      when(isNewCol === "1" && dtCol === firstDt, "1").otherwise("0"))
  }
}
