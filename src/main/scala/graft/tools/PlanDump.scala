package graft.tools
import graft.SparkEntry
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.001"
    val spark = graft.GraftSession.builder(Some("local[4]"), Some(4))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q_dws_sku", "q_dwd_pay_suc", "q_dwd_base_log",
        "q_dedup_minhash", "q_ann_ivf")
    for (q <- qs) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
