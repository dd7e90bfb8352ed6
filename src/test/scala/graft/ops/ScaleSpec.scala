package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Envelopes

/** Salted aggregation equals the direct single-shuffle aggregation. */
class ScaleSpec extends SparkSpec {

  test("salted two-stage aggregation matches direct groupBy") {
    val li = Envelopes.table(spark, sfDir(), "lineitem")
    val direct = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"),
        count(lit(1)).as("n"), max(col("l_partkey")).as("mx"))
      .collect().map(r => r.getString(0) -> ((r.getDecimal(1), r.getLong(2), r.getLong(3)))).toMap
    val salted = Scale.saltedAggregate(li, Seq(col("l_returnflag")), Seq(
        ("q", "sum", col("l_quantity").cast("decimal(18,2)")),
        ("n", "count", lit(1)),
        ("mx", "max", col("l_partkey"))), buckets = 8)
      .collect().map(r => r.getString(0) -> ((r.getDecimal(1), r.getLong(2), r.getLong(3)))).toMap
    assert(salted == direct)
  }

  test("salted aggregation accepts expression keys, not just column refs") {
    val li = Envelopes.table(spark, sfDir(), "lineitem")
    val key = col("l_linenumber") % 3
    val direct = li.groupBy(key).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val salted = Scale.saltedAggregate(li, Seq(key),
        Seq(("n", "count", lit(1))), buckets = 8)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("salting a frame carrying a map column works (CDC envelope shape)") {
    // hash() rejects MapType — the salt must route map columns through a
    // deterministic string rendering instead of throwing
    val env = Envelopes.maxwell(spark, sfDir()) // data: map<string,string>
    val direct = env.groupBy(col("table")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Scale.saltedAggregate(env, Seq(col("table")),
        Seq(("n", "count", lit(1))), buckets = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("keys resolving to duplicate names are rejected, not silently merged") {
    val li = Envelopes.table(spark, sfDir(), "lineitem")
    intercept[IllegalArgumentException] {
      Scale.saltedAggregate(li,
        Seq(col("l_linenumber").as("k"), col("l_returnflag").as("k")),
        Seq(("n", "count", lit(1))))
    }
  }

  test("saltedFoldGroups equals the unsalted mapGroups fold on a skewed key") {
    import spark.implicits._
    // 80% of rows on key 0 — the shape the operator exists for.
    val ds = spark.range(20000).select(
        when(pmod(col("id"), lit(5)) < 4, 0L).otherwise(pmod(col("id"), lit(97L)) + 1L).as("k"),
        col("id").as("v")).as[(Long, Long)]
    val naive = ds.groupByKey(_._1)
      .mapGroups((k, it) => (k, it.map(_._2).foldLeft((0L, Long.MinValue)) {
        case ((n, mx), v) => (n + 1, math.max(mx, v)) }))
      .collect().toMap
    val salted = Scale.saltedFoldGroups(ds, (r: (Long, Long)) => r._1, buckets = 8) {
        (_, it) => it.map(_._2).foldLeft((0L, Long.MinValue)) {
          case ((n, mx), v) => (n + 1, math.max(mx, v)) }
      } { case ((n1, m1), (n2, m2)) => (n1 + n2, math.max(m1, m2)) }
      .collect().toMap
    assert(salted == naive)
    assert(naive(0L)._1 == 16000L) // the hot key really is hot
  }

  test("saltedFoldGroups bucketing is deterministic per value") {
    import spark.implicits._
    val ds = spark.range(5000).select(lit(7L).as("k"), pmod(col("id"), lit(100L)).as("v"))
      .as[(Long, Long)]
    // identical input → identical partials regardless of physical layout
    val a = Scale.saltedFoldGroups(ds, (r: (Long, Long)) => r._1, buckets = 16)(
      (_, it) => it.size.toLong)(_ + _).collect().toMap
    val b = Scale.saltedFoldGroups(ds.repartition(13), (r: (Long, Long)) => r._1,
      buckets = 16)((_, it) => it.size.toLong)(_ + _).collect().toMap
    assert(a == b && a(7L) == 5000L)
  }

  test("colocate pre-partitions so the downstream aggregation adds no exchange") {
    val li = Envelopes.table(spark, sfDir(), "lineitem")
    val plan = Scale.colocate(li, Seq(col("l_returnflag")), 8)
      .groupBy(col("l_returnflag")).agg(count(lit(1)))
      .queryExecution.executedPlan.toString
    // exactly one exchange: the explicit repartition; the groupBy reuses it
    assert(plan.split("Exchange").length - 1 == 1, plan.take(800))
  }
}
