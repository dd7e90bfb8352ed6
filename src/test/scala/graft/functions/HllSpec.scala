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
