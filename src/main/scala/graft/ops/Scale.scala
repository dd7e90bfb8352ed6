package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale helpers: skew-salted aggregation and co-location
  * (SURVEY.md §7.1 100 TB posture).
  *
  * AQE handles skewed *joins* at runtime; skewed *aggregation* keys (one hot
  * mid/sku absorbing a partition) are pre-split here with a salt so the first
  * shuffle spreads a hot key over `buckets` reducers, then a second (tiny)
  * shuffle merges the partials. The result is bitwise-identical for the
  * algebraic aggregates exposed (sum/count/min/max over exact types).
  */
object Scale {

  /** Supported algebraic aggregates: (partial, merge) pairs. */
  private def partialMerge(fn: String, c: Column, out: String): (Column, Column) =
    fn match {
      case "sum"   => (sum(c).as(out), sum(col(out)).as(out))
      case "count" => (count(c).as(out), sum(col(out)).as(out))
      case "min"   => (min(c).as(out), min(col(out)).as(out))
      case "max"   => (max(c).as(out), max(col(out)).as(out))
      case other   => throw new IllegalArgumentException(s"unsupported agg: $other")
    }

  /** Two-stage salted aggregation: groupBy(keys + salt) → groupBy(keys).
    *
    * @param aggs (outputName, fn, inputColumn); fn ∈ sum|count|min|max.
    *             Use decimal-cast inputs for float sums if cross-run bitwise
    *             stability matters (salting reorders float addition).
    * @param buckets salt fan-out for a hot key (≈ executor count). */
  def saltedAggregate(df: DataFrame, keys: Seq[Column],
      aggs: Seq[(String, String, Column)], buckets: Int = 64): DataFrame = {
    val pm = aggs.map { case (out, fn, c) => partialMerge(fn, c, out) }
    val salted = df.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(buckets)))
    val stage1 = salted.groupBy(keys :+ col("__salt"): _*)
      .agg(pm.head._1, pm.tail.map(_._1): _*)
    stage1.groupBy(keys: _*).agg(pm.head._2, pm.tail.map(_._2): _*)
  }

  /** Co-locate a DataFrame on join/agg keys ahead of several consumers so the
    * exchange happens once and is reused across stages. */
  def colocate(df: DataFrame, keys: Seq[Column], partitions: Int): DataFrame =
    df.repartition(partitions, keys: _*)
}
