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
    * The salt is a DETERMINISTIC hash of the whole row, never
    * `rand()`/`monotonically_increasing_id()`: a nondeterministic salt can
    * change on task recomputation after a shuffle-fetch failure, landing
    * recomputed rows in different stage-1 buckets than the partials a reducer
    * already fetched (the SPARK-23207 correctness class). Rows identical in
    * EVERY column share a salt and stay together — the realistic hot key
    * (one id, varying payload) still fans out.
    *
    * Keys may be arbitrary expressions: stage 1 aliases each key to its
    * resolved name and stage 2 re-groups by those names, so `col("ts") % 3600`
    * works as a key, not just plain column references.
    *
    * @param aggs (outputName, fn, inputColumn); fn ∈ sum|count|min|max.
    *             Use decimal-cast inputs for float sums if cross-run bitwise
    *             stability matters (salting reorders float addition).
    * @param buckets salt fan-out for a hot key (≈ executor count). */
  def saltedAggregate(df: DataFrame, keys: Seq[Column],
      aggs: Seq[(String, String, Column)], buckets: Int = 64): DataFrame = {
    val pm = aggs.map { case (out, fn, c) => partialMerge(fn, c, out) }
    val keyNames = keys.map(k => df.select(k).columns.head)
    require(keyNames.distinct.size == keyNames.size,
      s"salted-aggregate keys resolve to duplicate names (${keyNames.mkString(", ")}) — " +
        "stage 2 would silently merge them; alias the expressions distinctly")
    // hash() rejects MapType inputs (and a map has no canonical order anyway):
    // route any map-bearing column through its string rendering, which is
    // deterministic per value — the CDC envelope's `data: map<string,string>`
    // column stays salt-eligible instead of throwing.
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = {
      import org.apache.spark.sql.types._
      dt match {
        case _: MapType        => false
        case ArrayType(e, _)   => hashable(e)
        case StructType(flds)  => flds.forall(f => hashable(f.dataType))
        case _                 => true
      }
    }
    val saltInputs = df.schema.fields.map(fld =>
      if (hashable(fld.dataType)) col(fld.name) else col(fld.name).cast("string"))
    val salted = df.withColumn("__salt",
      pmod(hash(saltInputs.toIndexedSeq: _*), lit(buckets)))
    val stage1 = salted
      .groupBy(keys.zip(keyNames).map { case (k, n) => k.as(n) } :+ col("__salt"): _*)
      .agg(pm.head._1, pm.tail.map(_._1): _*)
    stage1.groupBy(keyNames.map(col): _*).agg(pm.head._2, pm.tail.map(_._2): _*)
  }

  /** Co-locate a DataFrame on join/agg keys ahead of several consumers so the
    * exchange happens once and is reused across stages. */
  def colocate(df: DataFrame, keys: Seq[Column], partitions: Int): DataFrame =
    df.repartition(partitions, keys: _*)
}
