package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Envelopes
import graft.ops.Windows

/** Ranking / session-window / rollup aggregations — the "top-k-ready outputs"
  * operator class SURVEY.md §2.9 calls out, plus gap-based sessionization
  * (the reference's session metric is `last_page_id IS NULL` starts; the
  * Spark-native form is `session_window`, verified against a lag/gap oracle).
  */
object AggQueries {
  type QFn = (SparkSession, String) => DataFrame

  val queries: Map[String, QFn] = Map(
    // Per-window top-3 SKUs by exact decimal amount (row_number ranking).
    "q_topk_sku" -> { (s, dir) =>
      val od = Envelopes.orderDetail(s, dir)
      val agged = Windows.withTumbleWs(od, (col("ts") * 1000).as("ts_ms"), "24 hours")
        .groupBy(col("ws"), col("sku_id"))
        .agg(Envelopes.moneySum(col("split_total_amount")).as("amount"))
      agged.withColumn("rk", row_number().over(
          Window.partitionBy(col("ws")).orderBy(col("amount").desc, col("sku_id"))))
        .filter(col("rk") <= 3)
        .select(col("ws"), col("rk"), col("sku_id"), col("amount"))
        .orderBy(col("ws"), col("rk"))
    },

    // Gap-based session windows (30 min) per user over events. The timestamp
    // is truncated to milliseconds first: the oracle compares gaps on
    // epoch_ms, and a micro-precision gap of 1799999.6 ms would merge in
    // Spark but split in the floored-ms oracle.
    "q_session_window" -> { (s, dir) =>
      val ev = Envelopes.events(s, dir)
        .withColumn("ts", timestamp_millis(expr("unix_millis(ts)")))
      val sessions = ev.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("ev_ct"))
      sessions.groupBy(col("user_id"))
        .agg(count(lit(1)).as("session_ct"), sum(col("ev_ct")).as("event_ct"))
        .orderBy(col("user_id"))
    },

    // Hopping (sliding) windows: 1-hour windows every 30 min — each event
    // lands in exactly two windows; pv per (window, event_type).
    "q_dws_sliding" -> { (s, dir) =>
      Envelopes.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("pv"))
        .select(expr("unix_millis(window.start) div 1000").as("ws"),
          col("event_type"), col("pv"))
        .orderBy(col("ws"), col("event_type"))
    },

    // Province × month rollup (subtotals + grand total).
    "q_rollup_province" -> { (s, dir) =>
      Envelopes.orderInfo(s, dir)
        .withColumn("mon", date_format(timestamp_seconds(col("order_ts")), "yyyy-MM"))
        .rollup(col("province_id"), col("mon"))
        .agg(count(lit(1)).as("order_ct"))
        .orderBy(col("province_id").asc_nulls_first, col("mon").asc_nulls_first)
    })

  import Envelopes.{odCte, oiCte}

  val oracles: Map[String, String] = Map(
    "q_topk_sku" ->
      s"""WITH $odCte,
         |agged AS (
         |  SELECT (ts // 86400) * 86400 AS ws, sku_id,
         |         CAST(SUM(CAST(split_total_amount AS DECIMAL(18,6))) AS DOUBLE) AS amount
         |  FROM od GROUP BY 1, 2)
         |SELECT ws, rk, sku_id, amount FROM (
         |  SELECT ws, sku_id, amount,
         |         row_number() OVER (PARTITION BY ws ORDER BY amount DESC, sku_id) AS rk
         |  FROM agged)
         |WHERE rk <= 3 ORDER BY ws, rk""".stripMargin,

    "q_session_window" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
        |marked AS (
        |  SELECT user_id,
        |         CASE WHEN lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms) IS NULL
        |                OR ts_ms - lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms) >= 1800000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM ev)
        |SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS session_ct, COUNT(*) AS event_ct
        |FROM marked GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_dws_sliding" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_ms(ts) // 1000 AS ts_s FROM events),
        |hopped AS (
        |  SELECT event_type,
        |         unnest([ (ts_s // 1800) * 1800, (ts_s // 1800) * 1800 - 1800 ]) AS ws
        |  FROM ev)
        |SELECT ws, event_type, COUNT(*) AS pv
        |FROM hopped GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_rollup_province" ->
      s"""WITH $oiCte
         |SELECT province_id, strftime(make_timestamp(order_ts * 1000000), '%Y-%m') AS mon,
         |       COUNT(*) AS order_ct
         |FROM oi GROUP BY ROLLUP (province_id, mon)
         |ORDER BY province_id NULLS FIRST, mon NULLS FIRST""".stripMargin)
}
