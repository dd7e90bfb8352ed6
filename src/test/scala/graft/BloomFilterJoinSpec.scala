package graft

import org.apache.spark.sql.functions._
import graft.model.Envelopes

/** Runtime bloom-filter join pruning — the 100 TB shuffle-volume reducer:
  * when one side of a shuffle join carries a selective predicate, Catalyst
  * can build a bloom filter from that side's join keys and apply it to the
  * other side BEFORE its shuffle, so non-matching fact rows never leave the
  * map stage. At the default thresholds the application side must scan
  * > 10 GB (exactly the 100 TB regime; never true at test scale), so this
  * spec lowers the thresholds to pin two things:
  *  (1) the engine's sessions have the rule available and it actually
  *      injects on our fact-dim join shape, and
  *  (2) the pruned plan returns bit-identical results.
  * SCALING.md records the production conf recipe this spec encodes. */
class BloomFilterJoinSpec extends SparkSpec {

  private val Keys = Seq(
    "spark.sql.optimizer.runtime.bloomFilter.enabled",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
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

  /** Fact-dim join with a selective dim predicate, forced onto the shuffle
    * path (broadcast disabled) — the shape where a runtime bloom filter
    * pays for itself at scale. */
  private def shape() = {
    val li = Envelopes.table(spark, sfDir("sf0.01"), "lineitem")
      .select("l_orderkey", "l_quantity")
    val ord = Envelopes.table(spark, sfDir("sf0.01"), "orders")
      .filter(col("o_totalprice") > 350000.0) // selective: few orders qualify
      .select("o_orderkey", "o_totalprice")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey").agg(sum("l_quantity").as("qty"))
  }

  test("bloom filter injects on the fact side of a selective shuffle join, result unchanged") {
    val baseline = shape().collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    withConf(Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // at test scale the fact scan is KB-sized; drop the 10 GB production
      // gate so the injection decision itself is what's under test
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")) {
      val q = shape()
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("might_contain"),
        "no bloom filter injected on the application side:\n" + p.take(1200))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "join unexpectedly left the shuffle path:\n" + p.take(600))
      val got = q.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      assert(got == baseline && got.nonEmpty,
        "bloom-pruned join changed the result")
    }
  }
}
