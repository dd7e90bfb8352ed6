package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: run named SparkEntry queries at a given sf dir, print row count
  * and an order-insensitive checksum (same spirit as the driver's gate). */
object OracleOne {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.builder(Some("local[8]"), Some(8)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args(0).split(",").foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val cols = df.columns.sorted.map(c => col(c).cast("string"))
      val chk = df.select(md5(concat_ws("", cols: _*)).as("h"))
        .agg(org.apache.spark.sql.functions.sum(
          conv(substring(col("h"), 1, 8), 16, 10).cast("decimal(38,0)")))
        .collect()(0).get(0)
      println(s"ORACLE $name rows=${df.count()} checksum=$chk")
    }
    spark.stop()
  }
}
