package graft

import org.apache.spark.sql.functions._

/** AQE skew-join splitting — the no-code-change half of the skew story
  * (the salted-fold operator in `ops/Scale` is the explicit half, measured
  * in SCALING.md): at runtime AQE observes one shuffle partition dwarfing
  * the rest and splits it into sub-partitions, replicating the matching
  * build side, so one hot key no longer serializes a 1000-executor join.
  * Production thresholds (256 MB partitions) never trip at test scale, so
  * the spec lowers them over an engineered 90 %-hot-key fixture and pins
  * (1) the split actually happening (`isSkew` in the executed plan) and
  * (2) a bit-identical join result. */
class SkewJoinSpec extends SparkSpec {

  private val Keys = Seq(
    "spark.sql.adaptive.skewJoin.enabled",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    "spark.sql.adaptive.coalescePartitions.enabled",
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.autoBroadcastJoinThreshold")

  private def withConf[T](kv: Map[String, String])(f: => T): T = {
    val saved = Keys.map(k => k -> spark.conf.getOption(k))
    try { kv.foreach { case (k, v) => spark.conf.set(k, v) }; f }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the hot partition of a skewed join, result unchanged") {
    import spark.implicits._
    // 90% of fact rows share one key; pad makes the hot partition's bytes
    // dominate so the (lowered) skew detector has something to see
    val fact = spark.range(0, 20000)
      .select((when(col("id") % 10 < 9, 7L).otherwise(col("id") % 1000)).as("k"),
        concat(lit("x"), col("id").cast("string")).as("payload"),
        lpad(lit("p"), 200, "p").as("pad"))
    val dim = spark.range(0, 1000).select(col("id").as("k"),
      concat(lit("d"), col("id").cast("string")).as("dval"))
    def run(): Map[String, String] =
      fact.join(dim, "k").select(col("payload"), col("dval"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val baseline = run()
    withConf(Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      // production: 256 MB; the engineered hot partition is ~KBs
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")) {
      val q = fact.join(dim, "k").select(col("payload"), col("dval"))
      val got = q.collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("isSkew=true") || p.contains("skew=true"),
        "AQE did not mark/split the hot partition:\n" + p.take(1200))
      assert(got == baseline && got.size == 20000,
        "skew-split join changed the result")
    }
  }
}
