package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Project

/** S1 — null-tolerant value handling (`FlinkSourceUtil.java:42-48`): corrupt
  * JSON and tombstone (null) Kafka values must survive decode without killing
  * the job and fall out at the ETL filter. Plus the approximate-distinct
  * operator class (§2.9) against its exact twin. */
class DecodeRobustnessSpec extends SparkSpec {

  test("corrupt and null values decode to null envelopes and are filtered, not thrown") {
    val s = spark
    import s.implicits._
    val raw = Seq(
      """{"database":"gmall","table":"cart_info","type":"insert","data":{"id":"1"},"ts":1}""",
      """not json at all""",
      """{"database":"gmall","table":""", // truncated
      null.asInstanceOf[String],
      """{"database":"other","table":"x","type":"insert","data":{"id":"9"},"ts":2}"""
    ).toDF("value")
    // decode path shared with the Kafka source (watermark column included)
    val decoded = Streams.decodeMaxwell(raw)
    assert(decoded.count() == 5) // nothing dropped, nothing thrown at decode
    val kept = Project.etlFilter(decoded)
      .select(element_at(col("data"), "id")).as[String].collect().toSeq
    assert(kept == Seq("1")) // dirty rows fell out at the P1 filter
  }

  test("approx_count_distinct tracks exact distinct within tolerance") {
    val ev = graft.model.Envelopes.events(spark, sfDir("sf0.01"))
    val r = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.02).as("approx")).head()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }
}
