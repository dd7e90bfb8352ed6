package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Envelopes

/** Typed HLL sketch: mergeable across partitions, within tolerance of exact
  * distinct counts at several cardinalities. */
class HllSpec extends SparkSpec {

  test("estimates distinct counts within ~5% across cardinalities") {
    val s = spark
    import s.implicits._
    for (n <- Seq(100, 5000, 60000)) {
      // repartition: the estimate must survive partial-aggregate merges
      val ds = s.range(n * 3).select((col("id") % n).cast("string").as("v"))
        .repartition(8).as[String]
      val est = ds.select(Hll.stringDistinct.toColumn).head()
      val err = math.abs(est - n).toDouble / n
      assert(err < 0.05, s"n=$n est=$est err=$err")
    }
  }

  test("multi-group typed aggregation keeps groups independent") {
    // Regression: Spark's sort-based typed aggregation calls zero() once per
    // operator and re-points every group at that instance — an in-place-
    // mutating aggregator then leaks state across groups (group N's estimate
    // absorbed groups 1..N−1). The copy-on-first-touch protocol fixes it;
    // this pins the fix for BOTH mutating sketches, single- and multi-
    // partition (the single-partition sort path is where sharing bites).
    val s = spark
    import s.implicits._
    for (parts <- Seq(1, 8)) {
      val ds = s.range(999).selectExpr("cast(id as string) AS v", "id % 3 AS g")
        .repartition(parts).as[(String, Long)]
      val hll = ds.groupByKey(_._2).mapValues(_._1)
        .agg(Hll.stringDistinct.toColumn).collect().toMap
      hll.foreach { case (g, est) =>
        assert(math.abs(est - 333).toDouble / 333 < 0.05,
          s"parts=$parts group $g est=$est (cross-group leak?)")
      }
      val cm = ds.groupByKey(_._2).mapValues(_._1)
        .agg(CountMin.stringFreq.toColumn).collect().toMap
      cm.foreach { case (g, sk) =>
        assert(sk.sum == 333L * CountMin.D,
          s"parts=$parts group $g total=${sk.sum} (cross-group leak?)")
      }
    }
  }

  test("sketches real key columns close to exact") {
    val s = spark
    import s.implicits._
    val li = Envelopes.table(s, sfDir("sf0.01"), "lineitem")
      .select(col("l_orderkey").cast("string").as("v")).as[String]
    val est = li.select(Hll.stringDistinct.toColumn).head()
    val exact = li.distinct().count()
    assert(math.abs(est - exact).toDouble / exact < 0.05, s"est=$est exact=$exact")
  }
}
