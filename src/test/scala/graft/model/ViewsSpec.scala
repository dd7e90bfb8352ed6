package graft.model

import graft.SparkSpec

/** SQL surface: the registered views answer reference-shaped Flink-SQL-style
  * queries through `spark.sql`, with pushdown intact. */
class ViewsSpec extends SparkSpec {

  test("registered views answer reference-shaped SQL") {
    val names = Views.register(spark, sfDir())
    assert(names.contains("graft_topic_db") && names.contains("graft_log"))

    // filterPaymentTable (DwdTradeOrderPaySucDetail.java:177-203) verbatim-ish
    val pays = spark.sql(
      """SELECT data['id'] id, data['order_id'] order_id, ts
        |FROM graft_topic_db
        |WHERE `database` = 'gmall' AND `table` = 'cart_info' AND `type` = 'update'
        |  AND old['payment_status'] IS NOT NULL
        |  AND data['payment_status'] = '1602'""".stripMargin)
    assert(pays.count() > 0)

    // lookup-join shape (BaseSQLAPP.createBaseDic consumer)
    val joined = spark.sql(
      """SELECT d.dic_name, count(*) ct
        |FROM graft_order_detail od
        |JOIN graft_base_dic d ON CAST(od.sku_id % 25 AS STRING) = d.rowkey
        |GROUP BY d.dic_name""".stripMargin)
    assert(joined.count() > 0)

    // column pruning survives the view: scanning one column of the log view
    // must not read the full events schema
    val plan = spark.sql("SELECT ts FROM graft_log").queryExecution
      .executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("event_type"),
      "view must not defeat column pruning")
  }
}
