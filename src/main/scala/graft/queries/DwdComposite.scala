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

  // lazy: commentQueries is defined below (single registration point for the
  // whole composite family — SparkEntry wires only queries/oracles)
  lazy val queries: Map[String, QFn] = commentQueries ++ Map(
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

  /** Second composite: the interaction-comment app
    * (`DwdInteractionCommentInfo.java:22-103`) — route → map-project → lookup
    * join against the dim snapshot, end-to-end. */
  private val commentQueries: Map[String, QFn] = Map(
    "q_dwd_comment" -> { (s, dir) =>
      val routed = graft.ops.Project.routeFilter(
        Envelopes.maxwell(s, dir), "cart_info", Seq("insert"))
      val c = graft.ops.Project.mapProject(routed, Seq("id", "user_id", "sku_id"),
          Seq(col("ts")))
        .withColumn("appraise",
          (col("sku_id").cast("long") % 25).cast("string"))
      val dim = Envelopes.dimBaseDic(s, dir)
      Joins.lookup(c, dim, col("appraise") === col("rowkey"))
        .select(col("id"), col("user_id"), col("sku_id"), col("appraise"),
          col("dic_name"), col("ts"))
        // duplicate (l_orderkey, l_linenumber) ids exist in the synthetic
        // data: user_id extends the sort to a provably total order
        .orderBy(col("id").cast("long"), col("sku_id"), col("user_id"), col("ts"))
    })

  import Envelopes.{maxwellCte => MX, odCte, oiCte, odaCte, odcCte, dimCte}

  private val commentOracles: Map[String, String] = Map(
    "q_dwd_comment" ->
      s"""WITH $MX, $dimCte
         |SELECT id, user_id, sku_id, CAST(CAST(sku_id AS BIGINT) % 25 AS VARCHAR) AS appraise,
         |       dic_name, ts
         |FROM mx JOIN dic ON CAST(CAST(sku_id AS BIGINT) % 25 AS VARCHAR) = rowkey
         |WHERE db = 'gmall' AND tbl = 'cart_info' AND typ = 'insert'
         |ORDER BY CAST(id AS BIGINT), sku_id, user_id, ts""".stripMargin)

  val oracles: Map[String, String] = commentOracles ++ Map(
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
