package graft

import org.apache.spark.sql.functions._
import graft.model.Envelopes

/** Bucketed co-located joins — the "pre-shuffle once, join forever" layout
  * for repeated fact-fact joins at 100 TB: both sides written with
  * `bucketBy(n, key)` hash-partition their files identically, so a later
  * equi-join on the bucket key reads matching buckets pairwise and the
  * shuffle disappears from the plan entirely. This is the storage-layout
  * complement of the broadcast (small dim) and bloom-prune (selective dim)
  * join strategies the engine already pins. */
class BucketedJoinSpec extends SparkSpec {

  test("equi-join of two tables bucketed on the key plans with ZERO exchanges") {
    val li = Envelopes.table(spark, sfDir(), "lineitem")
      .select("l_orderkey", "l_quantity")
    val ord = Envelopes.table(spark, sfDir(), "orders")
      .select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS graft_li_bkt")
    spark.sql("DROP TABLE IF EXISTS graft_ord_bkt")
    li.write.format("parquet").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", "/tmp/graft_bucketed/li").mode("overwrite")
      .saveAsTable("graft_li_bkt")
    ord.write.format("parquet").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", "/tmp/graft_bucketed/ord").mode("overwrite")
      .saveAsTable("graft_ord_bkt")
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // SMJ path
      val j = spark.table("graft_li_bkt")
        .join(spark.table("graft_ord_bkt"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").agg(sum(col("l_quantity").cast("decimal(18,6)")).as("qty"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.take(600))
      assert(!p.contains("Exchange"),
        "bucket co-location must eliminate every shuffle (join AND the " +
          "following same-key aggregation):\n" + p.take(1200))
      // bucketed result == plain-join result
      val got = j.collect().map(r => (r.getLong(0), r.getDecimal(1))).toMap
      val want = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").agg(sum(col("l_quantity").cast("decimal(18,6)")).as("qty"))
        .collect().map(r => (r.getLong(0), r.getDecimal(1))).toMap
      assert(got == want && got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS graft_li_bkt")
      spark.sql("DROP TABLE IF EXISTS graft_ord_bkt")
    }
  }
}
