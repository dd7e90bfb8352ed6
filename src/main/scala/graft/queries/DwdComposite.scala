package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Envelopes
import graft.ops.{Joins, Stateful}

/** The reference's flagship DWD app as ONE composite query
  * (`DwdTradeOrderDetail.java:24-120`): order_detail ⋈ order_info inner join,
  * double left join to activity/coupon, final per-PK state via upsert
  * compaction (PK = detail id, `DwdTradeOrderDetail.java:86`) — the end-to-end
  * path a user of the reference actually runs. */
object DwdComposite {
  type QFn = (SparkSession, String) => DataFrame

  val queries: Map[String, QFn] = Map(
    "q_dwd_order_detail" -> { (s, dir) =>
      val od  = Envelopes.orderDetail(s, dir)
      val oi  = Envelopes.orderInfo(s, dir)
      val oda = Envelopes.orderDetailActivity(s, dir)
      val odc = Envelopes.orderDetailCoupon(s, dir)
      val joined = Joins.leftOuter(
          Joins.leftOuter(
            Joins.inner(od, oi, od("order_id") === oi("id")),
            oda, od("id") === oda("id")),
          odc, od("id") === odc("id"))
        .select(od("id"), od("order_id"), oi("user_id"), oi("province_id"),
          od("sku_id"), od("sku_num"), od("split_total_amount"),
          coalesce(oda("activity_id"), lit(-1L)).as("activity_id"),
          coalesce(odc("coupon_id"), lit(-1L)).as("coupon_id"),
          od("ts"))
      // upsert-Kafka PK semantics: last version per detail id wins; the
      // version order is extended to a total order (duplicate ids exist in
      // the synthetic lineitem).
      Stateful.lastWriteWins(joined, Seq(col("id")),
          Seq(col("ts"), col("sku_num"), col("sku_id"), col("split_total_amount"),
            col("activity_id"), col("coupon_id")))
        .orderBy(col("id"))
    })

  import Envelopes.{odCte, oiCte, odaCte, odcCte}

  val oracles: Map[String, String] = Map(
    "q_dwd_order_detail" ->
      s"""WITH $odCte, $oiCte, $odaCte, $odcCte
         |SELECT id, order_id, user_id, province_id, sku_id, sku_num,
         |       split_total_amount, activity_id, coupon_id, ts FROM (
         |  SELECT od.id, od.order_id, oi.user_id, oi.province_id, od.sku_id,
         |         od.sku_num, od.split_total_amount,
         |         COALESCE(oda.activity_id, -1) AS activity_id,
         |         COALESCE(odc.coupon_id, -1) AS coupon_id, od.ts
         |  FROM od JOIN oi ON od.order_id = oi.id
         |          LEFT JOIN oda ON od.id = oda.id
         |          LEFT JOIN odc ON od.id = odc.id)
         |QUALIFY row_number() OVER (PARTITION BY id
         |  ORDER BY ts DESC, sku_num DESC, sku_id DESC, split_total_amount DESC,
         |           activity_id DESC, coupon_id DESC) = 1
         |ORDER BY id""".stripMargin)
}
